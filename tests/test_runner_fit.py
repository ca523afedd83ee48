"""Runner fit loop: one real optimization step through runner.fit with the
synthetic MP3D tree — covers device-batch building, the jitted train step,
time-interval checkpointing, save/resume, and epoch-end validation."""
import os

import numpy as np
import pytest

# heavy: compiles full train/fit steps on single-core XLA:CPU (minutes cold)
pytestmark = pytest.mark.slow


@pytest.fixture()
def tiny_model():
    import jax.numpy as jnp

    from panfusion_tpu.models.panfusion import PanFusion, PanFusionConfig

    cfg = PanFusionConfig(
        pano_height=64, pers_resolution=32, num_views=8, diff_timestep=2,
        latent_pad=1, scan_chunk=0,
        unet_kwargs=dict(block_out_channels=(8, 16), heads=(1, 1),
                         dim_head=8, context_dim=16, layers_per_block=1),
        vae_kwargs=dict(block_out_channels=(4, 4, 4, 4), layers_per_block=1),
        text_kwargs=dict(hidden_size=16, intermediate_size=32, num_layers=1,
                         num_heads=1),
    )
    return PanFusion(cfg)


def _make_tree(tmp_path):
    """Minimal one-scene MP3D tree (no fixture reuse across files)."""
    from PIL import Image

    root = tmp_path / "mp3d"
    sdir = root / "s1"
    (sdir / "matterport_stitched_images").mkdir(parents=True)
    (sdir / "blip3_stitched").mkdir()
    (sdir / "blip3").mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((64, 128, 3)) * 255).astype(np.uint8)).save(
        sdir / "matterport_stitched_images" / "v.png"
    )
    (sdir / "blip3_stitched" / "v.txt").write_text("a tiny room\n")
    for i in range(8):
        (sdir / "blip3" / f"v_{i * 45}.txt").write_text(f"view {i}\n")
    np.save(root / "train.npy", np.array([["s1/matterport_stitched_images/v_x"]]))
    np.save(root / "test.npy", np.array([["s1/matterport_stitched_images/v_x"]]))
    return root


def test_fit_step_checkpoint_resume(tiny_model, tmp_path):
    pytest.importorskip("orbax.checkpoint")

    root = _make_tree(tmp_path)

    from panfusion_tpu.data.matterport3d import Matterport3D
    from panfusion_tpu.runner import fit
    from panfusion_tpu.train.logging import ExperimentLogger
    from panfusion_tpu.train.loop import TrainConfig

    dm = Matterport3D(
        data_dir=str(root), pano_height=64, pers_resolution=32,
        cam_sampler="horizon", num_workers=0, batch_size=1,
    )
    logger = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="t1")
    tc = TrainConfig(max_epochs=1)
    state = fit(tiny_model, dm, tc, logger, max_steps=1, seed=0)
    assert int(state.step) == 1

    ckpt_dir = os.path.join(logger.save_dir, "checkpoints", "last")
    assert os.path.isdir(ckpt_dir)

    # resume: a second fit restores step 1 and runs one more epoch
    logger2 = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="t1")
    tc2 = TrainConfig(max_epochs=2)
    state2 = fit(tiny_model, dm, tc2, logger2, max_steps=2, seed=0)
    assert int(state2.step) == 2

    # restored FROZEN leaves must be device arrays, not the host numpy that
    # orbax returns: numpy frozen leaves are never overwritten by the train
    # step, so every step would re-transfer the full frozen tree
    # host->device (observed: 35% slower resumed steps + host-buffer leak
    # to OOM on the tunneled chip)
    import jax as _jax

    for leaf in _jax.tree.leaves(state2.frozen):
        assert isinstance(leaf, _jax.Array), type(leaf)

    # eval-side load: the fit-saved TrainState must restore into a plain
    # param tree (test/predict --ckpt_path after fit)
    import jax
    from flax import traverse_util

    params = tiny_model.load_or_init_params(ckpt_dir, seed=0)
    flat = traverse_util.flatten_dict(params["dual"])
    flat_trained = traverse_util.flatten_dict(state2.trainable["dual"])
    n_checked = 0
    for k, v in flat_trained.items():
        assert k in flat
        np.testing.assert_allclose(
            np.asarray(flat[k], np.float32), np.asarray(v, np.float32),
            atol=1e-6,
        )
        n_checked += 1
    assert n_checked > 0

    # warm start: a fresh fit seeded from the checkpoint starts with the
    # trained weights merged in
    logger3 = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="t3")
    state3 = fit(tiny_model, dm, TrainConfig(max_epochs=1), logger3,
                 max_steps=1, seed=1, warm_start=ckpt_dir)
    assert int(state3.step) == 1


def test_fit_vae_recon_objective(tiny_model, tmp_path):
    """--trainer.objective=vae_recon: only the VAE trains, the recon loss
    falls over a few steps, and the epoch-end hook logs recon panels
    instead of running the diffusion sampler (from-scratch stage 0)."""
    pytest.importorskip("orbax.checkpoint")

    import jax

    root = _make_tree(tmp_path)
    # 12 copies of the one sample => 12 steps in one epoch (the JSONL
    # logger flushes scalars every 10 steps)
    np.save(root / "train.npy",
            np.array([["s1/matterport_stitched_images/v_x"]] * 12))

    from panfusion_tpu.data.matterport3d import Matterport3D
    from panfusion_tpu.runner import fit
    from panfusion_tpu.train.logging import ExperimentLogger
    from panfusion_tpu.train.loop import TrainConfig

    dm = Matterport3D(
        data_dir=str(root), pano_height=64, pers_resolution=32,
        cam_sampler="horizon", num_workers=0, batch_size=1,
    )
    logger = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="vr")
    tc = TrainConfig(max_epochs=1, objective="vae_recon", lr=1e-3,
                     use_cosine=False)
    init = tiny_model.init_params(jax.random.PRNGKey(0))
    state = fit(tiny_model, dm, tc, logger, max_steps=12, seed=0)

    # only the VAE weights are trainable; the latent_norm calibration
    # variables stay frozen (AdamW weight decay would corrupt the data
    # statistics despite zero gradients)
    assert set(state.trainable) == {"vae"}
    assert set(state.frozen["vae"]) == {"latent_norm"}, state.frozen.get("vae")

    # the trained VAE moved away from init
    leaves0 = jax.tree.leaves(init["vae"]["params"])
    leaves1 = jax.tree.leaves(state.trainable["vae"]["params"])
    assert len(leaves0) == len(leaves1)
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(leaves0, leaves1)
    )
    assert moved > 1e-4

    # recon metrics stream in the JSONL log
    import json

    metrics_path = os.path.join(logger.save_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    recon = [r["train/recon_pano"] for r in rows if "train/recon_pano" in r]
    assert recon, rows


def test_latent_stats_warning(tiny_model, capsys):
    """A random-init VAE under the SD2 scaling factor produces latents far
    from N(0,1); the fit-startup check must warn and point to the
    calibration tool (the silent failure mode: eps-loss converges, samples
    stay noise)."""
    import types

    import jax

    from panfusion_tpu.runner import _check_latent_stats

    params = tiny_model.init_params(jax.random.PRNGKey(0))
    state = types.SimpleNamespace(trainable={}, frozen=params)
    batch = {"pano": np.random.default_rng(0)
             .normal(size=(1, 1, 64, 128, 3)).astype(np.float32)}
    _check_latent_stats(tiny_model, state, [batch])
    out = capsys.readouterr().out
    assert "calibrate_latents" in out, out

    # and a well-normalized latent space stays silent: invert the measured
    # stats and re-check
    import jax.numpy as jnp

    z = tiny_model.encode_pano(params, jnp.asarray(batch["pano"][:, 0]),
                               jax.random.PRNGKey(0))
    z = np.asarray(z.astype(jnp.float32))
    import dataclasses

    cfg2 = dataclasses.replace(
        tiny_model.cfg,
        latent_scale=float(0.18215 / z.std()),
        latent_shift=float(z.mean() / 0.18215),
    )
    from panfusion_tpu.models.panfusion import PanFusion

    model2 = PanFusion(cfg2)
    # the calibration lives in the latent_norm VARIABLES, so re-init: the
    # first model's params carry the SD defaults, not cfg2's values
    params2 = model2.init_params(jax.random.PRNGKey(0))
    state2 = types.SimpleNamespace(trainable={}, frozen=params2)
    _check_latent_stats(model2, state2, [batch])
    out2 = capsys.readouterr().out
    assert "WARNING" not in out2, out2
