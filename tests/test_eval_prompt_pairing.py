"""Pin the mv_CS / pers_CS prompt-pairing branches (VERDICT r1, Weak #6).

mv_CS pairs the horizon-8 crops with the 8 per-view captions when the
batch carries exactly b*8 of them (the Matterport3D contract: 8x45-degree
blip3 captions), and falls back to replicating the pano prompt otherwise
(e.g. icosahedron-20 training prompts). pers_CS only fires when the saved
view count matches the prompt count. The round-1 suite never pinned which
branch real batches take — these tests do, by recording what each metric
receives.
"""
import numpy as np

from panfusion_tpu.models.eval_pano_gen import EvalConfig, EvalPanoGen


class _Recorder:
    def __init__(self):
        self.calls = []
        self.update_called = False

    def update(self, *args, **kwargs):
        self.calls.append((args, kwargs))
        self.update_called = True

    def reset(self):
        self.calls = []


def _batch(n_prompts: int, m_views: int = 0, h: int = 64):
    b = 1
    batch = {
        "pano": np.zeros((b, 1, h, 2 * h, 3), np.uint8),
        "pano_pred": np.zeros((b, 1, h, 2 * h, 3), np.uint8),
        "pano_id": ["sceneA_v0"],
        "pano_prompt": ["a pano prompt"],
        "prompt": [[f"view {i} caption"] for i in range(n_prompts)],
        "height": np.array([h]),
        "width": np.array([2 * h]),
    }
    if m_views:
        batch["images_pred"] = np.zeros((b, m_views, 32, 32, 3), np.uint8)
        batch["cameras"] = {
            "theta": np.zeros((b, m_views), np.float32),
            "phi": np.zeros((b, m_views), np.float32),
            "FoV": np.full((b, m_views), 90.0, np.float32),
        }
    return batch


def _run(batch):
    ev = EvalPanoGen(EvalConfig(pano_height=64))
    for k in ev.eval_metrics:
        ev.eval_metrics[k] = _Recorder()
    ev.test_step(batch, 0)
    return ev.eval_metrics


def test_mv_cs_uses_view_captions_when_8():
    M = _run(_batch(n_prompts=8))
    (args, _), = M["mv_CS"].calls
    assert args[1] == [f"view {i} caption" for i in range(8)]


def test_mv_cs_falls_back_to_pano_prompt_when_not_8():
    M = _run(_batch(n_prompts=20))
    (args, _), = M["mv_CS"].calls
    assert args[1] == ["a pano prompt"] * 8


def test_pers_cs_fires_only_on_matching_view_count():
    M = _run(_batch(n_prompts=8, m_views=8))
    assert len(M["pers_CS"].calls) == 1
    (args, _), = M["pers_CS"].calls
    assert args[1] == [f"view {i} caption" for i in range(8)]

    M = _run(_batch(n_prompts=8, m_views=20))
    assert M["pers_CS"].calls == []  # count mismatch: metric skipped
