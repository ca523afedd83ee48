"""End-to-end integration: synthetic Matterport3D tree -> dataset batches ->
saved "generation" results -> EvalPanoGen scoring (stubbed extractors).

This pins the full data contract chain the reference exercises through
fit/test/eval (SURVEY.md §3.1/§3.3): split files, pano + caption layout on
disk, e2p view crops, results scanning/merging, and the metric harness."""
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def mp3d_tree(tmp_path_factory):
    """Two scenes x one view each, 64x128 panos + captions (+ layout JSON)."""
    root = tmp_path_factory.mktemp("mp3d")
    rng = np.random.default_rng(0)
    entries = []
    for scene, view in (("sceneA", "v0"), ("sceneB", "v1")):
        sdir = root / scene
        (sdir / "matterport_stitched_images").mkdir(parents=True)
        (sdir / "matterport_aligned_images").mkdir()
        (sdir / "blip3_stitched").mkdir()
        (sdir / "blip3").mkdir()
        pano = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
        Image.fromarray(pano).save(
            sdir / "matterport_stitched_images" / f"{view}.png"
        )
        Image.fromarray(pano).save(
            sdir / "matterport_aligned_images" / f"{view}.png"
        )
        (sdir / "blip3_stitched" / f"{view}.txt").write_text(f"a room in {scene}\n")
        for i in range(8):
            (sdir / "blip3" / f"{view}_{i * 45}.txt").write_text(
                f"view {i} of {scene}\n"
            )
        entries.append(f"{scene}/matterport_stitched_images/{view}_x")
    np.save(root / "train.npy", np.array([[e] for e in entries]))
    np.save(root / "test.npy", np.array([[e] for e in entries]))
    # layout-run split lists (lo_<split>.txt, Matterport3D.py load_split)
    for split in ("train", "val", "test"):
        (root / f"lo_{split}.txt").write_text("sceneA_v0\nsceneB_v1")

    # layout annotations (square room)
    anno = tmp_path_factory.mktemp("anno")
    (anno / "label_data").mkdir()
    for scene, view in (("sceneA", "v0"), ("sceneB", "v1")):
        label = {
            "cameraHeight": 1.6,
            "layoutHeight": 3.0,
            "layoutPoints": {
                "points": [
                    {"coords": [0.125, 0.5], "xyz": [-2.0, 0.0, -2.0]},
                    {"coords": [0.375, 0.5], "xyz": [2.0, 0.0, -2.0]},
                    {"coords": [0.625, 0.5], "xyz": [2.0, 0.0, 2.0]},
                    {"coords": [0.875, 0.5], "xyz": [-2.0, 0.0, 2.0]},
                ]
            },
        }
        (anno / "label_data" / f"{scene}_{view}_label.json").write_text(
            json.dumps(label)
        )
    return str(root), str(anno)


def make_dm(mp3d_tree, **overrides):
    from panfusion_tpu.data.matterport3d import Matterport3D

    root, anno = mp3d_tree
    return Matterport3D(
        data_dir=root, layout_anno_dir=anno, pano_height=64,
        pers_resolution=32, num_workers=0, **overrides,
    )


class TestDatasetContract:
    def test_train_batch_contract(self, mp3d_tree):
        dm = make_dm(mp3d_tree)
        dm.setup("fit")
        loader = dm.train_dataloader()
        batch = next(iter(loader))
        # the reference batch-dict contract (SURVEY.md §1-L2)
        assert batch["pano"].shape == (1, 1, 64, 128, 3)
        m = batch["images"].shape[1]
        assert batch["images"].shape == (1, m, 32, 32, 3)
        assert batch["cameras"]["K"].shape == (1, m, 3, 3)
        assert batch["cameras"]["R"].shape == (1, m, 3, 3)
        assert len(batch["pano_prompt"]) == 1
        assert len(batch["prompt"]) == 8  # 8 per-view captions transposed
        assert batch["pano"].min() >= -1.0 and batch["pano"].max() <= 1.0

    def test_manhattan_layout_loading(self, mp3d_tree):
        dm = make_dm(mp3d_tree, manhattan_layout=True, horizon_layout=True)
        dm.setup("test")
        batch = next(iter(dm.test_dataloader()))
        assert batch["manhattan_layout"].shape == (1, 8, 2)
        assert batch["horizon_layout"]["bon"].shape == (1, 2, 128)
        assert batch["horizon_layout"]["cor"].shape == (1, 1, 128)

    @pytest.mark.slow  # drives the full eval harness over saved results, ~7.5 min cold
    def test_results_roundtrip_and_eval(self, mp3d_tree, tmp_path, monkeypatch):
        """Save fake generations in the results layout, reload them through
        the dataset, and score with the harness."""
        root, _ = mp3d_tree
        result_dir = tmp_path / "test"
        rng = np.random.default_rng(1)
        for pano_id in ("sceneA_v0", "sceneB_v1"):
            d = result_dir / pano_id
            d.mkdir(parents=True)
            Image.fromarray(
                (rng.random((64, 128, 3)) * 255).astype(np.uint8)
            ).save(d / "pano.png")
            for i in range(8):
                Image.fromarray(
                    (rng.random((32, 32, 3)) * 255).astype(np.uint8)
                ).save(d / f"{i}.png")
            (d / "prompt.txt").write_text("x\n")

        dm = make_dm(mp3d_tree, result_dir=str(result_dir), batch_size=1,
                     cam_sampler="horizon")
        dm.setup("test")
        batches = list(dm.test_dataloader())
        assert len(batches) == 2
        assert batches[0]["pano_pred"].shape == (1, 1, 64, 128, 3)
        assert batches[0]["images_pred"].shape[1] == 8

        # harness with stubbed extractors (real ones are exercised in
        # tests/test_metrics.py)
        import panfusion_tpu.metrics.image_metrics as im
        from panfusion_tpu.models.eval_pano_gen import EvalConfig, EvalPanoGen

        def fake_extractor():
            def run(x):
                x = np.asarray(x)
                f = x.reshape(x.shape[0], -1, 3).mean(1)
                return (
                    np.tile(f, (1, 683))[:, :2048],
                    np.full((x.shape[0], 1000), 1e-3),
                )

            return im.FeatureExtractor(
                run, lambda u8: np.asarray(u8, np.float32), 2048, "stub"
            )

        monkeypatch.setattr(im, "_feature_extractor", fake_extractor)
        monkeypatch.setattr(
            im, "_clip_fns",
            lambda: lambda x: np.ones((np.asarray(x).shape[0], 512)),
        )
        monkeypatch.setattr(
            im, "default_text_embed_fn",
            lambda: lambda texts: np.ones((len(texts), 512)),
        )
        ev = EvalPanoGen(EvalConfig(pano_height=64, num_eval_crops=2,
                                    layout_metric=False))

        class _Faed:
            update_called = False

            def update(self, *a, **k):
                self.update_called = True

            def compute(self):
                return 0.0

        ev._faed = _Faed()
        for i, batch in enumerate(batches):
            ev.test_step(batch, i)
        out = ev.on_test_end()
        assert {"FID", "IS", "CS", "rot_FID", "crop_FID", "seam_FID",
                "mv_FID", "pers_FID", "pers_IS"} <= set(out)

    def test_gt_as_result_fixture(self, mp3d_tree):
        """gt_as_result feeds GT as the prediction — the reference's metric
        self-test fixture (dataset/PanoDataset.py:187-189)."""
        dm = make_dm(mp3d_tree, gt_as_result=True)
        dm.setup("test")
        batch = next(iter(dm.test_dataloader()))
        np.testing.assert_array_equal(batch["pano_pred"], batch["pano"])

    def test_predict_scan_and_repeat(self, mp3d_tree):
        dm = make_dm(mp3d_tree, repeat_predict=3)
        dm.setup("predict")
        loader = dm.predict_dataloader()
        items = list(loader)
        assert len(items) == 2 * 3
        ids = [b["pano_id"][0] for b in items]
        assert len(set(ids)) == 6  # repeat ids distinct

    def test_predict_stamps_provenance(self, mp3d_tree, tmp_path):
        """runner.predict writes provenance.json next to every sample
        (VERDICT r4 weak #1): the snapshot/ckpt context from the CLI plus
        the resolved sampling config, so a committed artifact can always
        be checked against the run that produced it."""
        import dataclasses

        from panfusion_tpu import runner

        @dataclasses.dataclass
        class _Cfg:
            guidance_scale: float = 2.0
            diff_timestep: int = 7
            prediction_type: str = "v_prediction"
            timestep_spacing: str = "trailing"
            zero_snr: bool = True
            ddim_eta: float = 0.0
            preset: str = "demo"

        class _Model:
            cfg = _Cfg()

            def inference(self, params, batch, rng, mesh=None):
                pano = np.zeros((1, 8, 16, 3), np.uint8)
                return np.zeros((1, 2, 4, 4, 3), np.uint8), pano

        class _Logger:
            save_dir = str(tmp_path)
            run_context = {"snapshot": "config.predict.0.json",
                           "command": "predict", "ckpt_path": "ck/last"}

        dm = make_dm(mp3d_tree, repeat_predict=1)
        runner.predict(_Model(), None, dm, _Logger(), mode="predict")
        dirs = sorted(os.listdir(tmp_path / "predict"))
        assert dirs
        prov = json.load(
            open(tmp_path / "predict" / dirs[0] / "provenance.json"))
        assert prov["snapshot"] == "config.predict.0.json"
        assert prov["guidance_scale"] == 2.0
        assert prov["prediction_type"] == "v_prediction"
        assert prov["ckpt_path"] == "ck/last"


class TestCLIOverrideValidation:
    """A mistyped flag must ERROR, not silently no-op (round-5 incident:
    --data.limit_train_items — no such field — was dropped on the floor
    and the run trained on the full split; a bare --log_dir flag was
    likewise ignored). Mirrors the reference CLI's unknown-arg rejection
    (jsonargparse, main.py:54-72)."""

    def test_unknown_field_errors(self):
        from panfusion_tpu.cli import apply_overrides
        from panfusion_tpu.data.pano_dataset import DataConfig

        with pytest.raises(SystemExit, match="no field"):
            apply_overrides(DataConfig(), {"data.limit_train_items": "4"},
                            "data")

    def test_known_field_still_applies(self):
        from panfusion_tpu.cli import apply_overrides
        from panfusion_tpu.data.pano_dataset import DataConfig

        cfg = apply_overrides(DataConfig(), {"data.predict_limit": "6"},
                              "data")
        assert cfg.predict_limit == 6

    def test_unknown_namespace_errors(self):
        from panfusion_tpu.cli import main

        with pytest.raises(SystemExit, match="unrecognized argument"):
            main(["fit", "--data=Demo", "--log_dir=/tmp/x"])


class TestLoggerResumeHygiene:
    def test_truncate_after_step_drops_aborted_tail(self, tmp_path):
        """Resume hygiene (round-4 postmortem): rows beyond the resumed
        checkpoint step come from an aborted continuation (possibly NaN)
        and must not interleave with the replayed history."""
        from panfusion_tpu.train.logging import ExperimentLogger

        lg = ExperimentLogger(log_dir=str(tmp_path), run_id="r")
        for s in (1, 2, 3):
            lg.log({"train/loss": 1.0 / s}, step=s)
        lg.log({"eval/x": 5.0})  # no _step: must survive
        for s in (4, 5):
            lg.log({"train/loss": float("nan")}, step=s)
        dropped = lg.truncate_after_step(3)
        assert dropped == 2
        rows = [json.loads(l) for l in
                open(tmp_path / "r" / "metrics.jsonl") if l.strip()]
        steps = [r["_step"] for r in rows if "_step" in r]
        assert steps == [1, 2, 3]
        assert any("eval/x" in r for r in rows)
        # the stream stays appendable after truncation
        lg.log({"train/loss": 0.2}, step=4)
        rows = [json.loads(l) for l in
                open(tmp_path / "r" / "metrics.jsonl") if l.strip()]
        assert [r["_step"] for r in rows if "_step" in r] == [1, 2, 3, 4]

    def test_fresh_fit_truncates_whole_stale_curve(self, tmp_path):
        """Fresh-fit hygiene (round-5 incident): a from-scratch fit into a
        directory holding a PREVIOUS run's metrics.jsonl (checked out of
        git on a host whose checkpoints/ was never committed) must not
        append step-10,20,... rows after the old curve — runner.fit calls
        truncate_after_step(-1) when there is no checkpoint to resume."""
        from panfusion_tpu.train.logging import ExperimentLogger

        lg = ExperimentLogger(log_dir=str(tmp_path), run_id="r")
        for s in (10, 600):
            lg.log({"train/loss": 0.5}, step=s)
        dropped = lg.truncate_after_step(-1)  # the runner's fresh-fit call
        assert dropped == 2
        lg.log({"train/loss": 1.0}, step=10)
        rows = [json.loads(l) for l in
                open(tmp_path / "r" / "metrics.jsonl") if l.strip()]
        assert [r["_step"] for r in rows if "_step" in r] == [10]
