"""Discriminative-power tests for the quality metrics (VERDICT r1, Next #4).

The round-1 gt_as_result self-test proved the *ideal-score* contract
(FID=0/IS=1/FAED=0 when GT is fed as the prediction) but said nothing about
whether the metrics can tell good from bad. These tests assert the other
half: FID grows monotonically as the fake set is corrupted harder, and the
FAED distance separates clean panoramas from noisy / seam-broken ones —
with the FAED encoder *trained* on the synthetic-rooms distribution when a
trained checkpoint is available (logs/synfaed, tools/gen_synthetic_rooms.py
+ `fit --model=FAED`), random-init otherwise (still discriminative: the
cos-lat pooled conv features respond to corruption either way).
"""
import os
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


def _rooms(n, h=64, seed=0):
    """n procedural room panos (h, 2h) uint8 — the synthetic-rooms
    distribution of tools/gen_synthetic_rooms.py."""
    from gen_synthetic_rooms import make_layout, render_room

    out = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1009 + i)
        layout = make_layout(rng)
        pano, _ = render_room(layout, rng, h, 2 * h)
        out.append(pano)
    return np.stack(out)


def _blur(imgs, k):
    import cv2

    return np.stack([cv2.blur(im, (k, k)) for im in imgs])


def _noisy(imgs, sigma, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.normal(0, sigma, imgs.shape)
    return np.clip(imgs.astype(np.float64) + noise, 0, 255).astype(np.uint8)


def _seam_broken(imgs):
    """Roll the right half only: a hard vertical seam at w/2 and at 0."""
    out = imgs.copy()
    w = imgs.shape[2]
    out[:, :, w // 2:] = np.roll(imgs[:, :, w // 2:], imgs.shape[1] // 3, 1)
    return out


@pytest.mark.slow  # two inception-sized FID batteries, ~9 min cold on 1-CPU XLA
class TestFIDPower:
    def test_fid_monotone_under_blur(self):
        from panfusion_tpu.metrics.image_metrics import (
            FrechetInceptionDistance)

        real = _rooms(24)
        fids = []
        for corrupt in (None, 5, 11, 21):
            m = FrechetInceptionDistance()
            m.update(real, real=True)
            fake = real if corrupt is None else _blur(real, corrupt)
            m.update(fake, real=False)
            fids.append(m.compute())
        assert fids[0] < 1e-3  # identical sets
        assert fids[0] < fids[1] < fids[2] < fids[3], fids

    def test_fid_monotone_under_noise(self):
        from panfusion_tpu.metrics.image_metrics import (
            FrechetInceptionDistance)

        real = _rooms(24)
        fids = []
        for sigma in (0, 20, 60):
            m = FrechetInceptionDistance()
            m.update(real, real=True)
            m.update(_noisy(real, sigma) if sigma else real, real=False)
            fids.append(m.compute())
        assert fids[0] < fids[1] < fids[2], fids


class TestRoomNetFIDPower:
    """The trained FID/IS stand-in (metrics/roomnet.py, VERDICT r4 missing
    #2): with weights/roomnet.npz committed, the Inception slot
    auto-switches to trained features and the FID family must separate the
    clean synthetic-rooms distribution from blur / noise / the round-3
    diffusion-mush failure mode. Cheap (256-d convnet), so NOT slow-tier —
    this is the committed-weights contract test."""

    def test_roomnet_slot_discriminative(self):
        from panfusion_tpu.metrics import roomnet
        from panfusion_tpu.metrics import image_metrics as im

        if not os.path.exists(roomnet.WEIGHTS_PATH):
            pytest.skip("no trained weights/roomnet.npz")
        if os.path.exists(os.path.join("weights", "inception_v3.npz")):
            pytest.skip("real inception weights present")
        im._feature_extractor.cache_clear()
        try:
            fx = im._feature_extractor()
            assert fx.kind == "roomnet"
            real = _rooms(32, h=96)
            other = _rooms(32, h=96, seed=7)

            def fid_of(fake):
                m = im.FrechetInceptionDistance()
                m.update(real, real=True)
                m.update(fake, real=False)
                return m.compute()

            d_same = fid_of(other)
            d_blur = fid_of(_blur(other, 15))
            d_noise = fid_of(_noisy(other, 60))
            mush = _blur(other, 49)  # the r3 smooth-mush failure mode
            d_mush = fid_of(mush)
            # trained features must separate every corruption from the
            # same-distribution floor with real margin (the small-n
            # self-floor is ~half the distance at n=32; the trainer's
            # held-out probe at n=60 measures 4-4.8x — logs/roomnet)
            assert d_blur > 2 * d_same, (d_same, d_blur)
            assert d_noise > 2 * d_same, (d_same, d_noise)
            assert d_mush > 2 * d_same, (d_same, d_mush)

            # IS: trained wall-head on clean rooms must be confident and
            # diverse => IS well above the random-feature collapse (1.0)
            s = im.InceptionScore()
            s.update(real)
            is_mean, _ = s.compute(splits=3)
            assert is_mean > 1.5, is_mean
        finally:
            im._feature_extractor.cache_clear()


class TestTinyCLIPPower:
    """The trained CLIP-Score stand-in (metrics/tinyclip.py): with
    weights/tinyclip.npz committed, ClipScore must score matched
    (pano, caption) pairs well above mismatched ones."""

    def test_clip_score_prefers_matched_captions(self):
        from panfusion_tpu.metrics import tinyclip
        from panfusion_tpu.metrics import image_metrics as im

        if not os.path.exists(tinyclip.WEIGHTS_PATH):
            pytest.skip("no trained weights/tinyclip.npz")
        if os.path.exists(os.path.join("weights", "clip_vision.npz")):
            pytest.skip("real CLIP weights present")
        for f in (im._clip_slot_kind, im._tinyclip, im._clip_fns,
                  im.default_text_embed_fn):
            f.cache_clear()
        try:
            assert im._clip_slot_kind() == "tinyclip"
            import sys
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools"))
            from train_tinyclip import render_pool

            panos, captions = render_pool(12, 96, seed0=424242)
            matched = im.ClipScore()
            matched.update(panos, captions)
            mismatched = im.ClipScore()
            mismatched.update(panos, captions[::-1])
            m, x = matched.compute(), mismatched.compute()
            assert m > x + 3.0, (m, x)
        finally:
            for f in (im._clip_slot_kind, im._tinyclip, im._clip_fns,
                      im.default_text_embed_fn):
                f.cache_clear()


class TestFAEDPower:
    def _metric(self, pano_height):
        """FAED metric on the trained synthetic-rooms encoder if present
        (logs/synfaed/checkpoints), else random init."""
        import jax

        from panfusion_tpu.models.faed import FAED, FAEDConfig

        faed = FAED(FAEDConfig(pano_height=pano_height))
        ckpt_dir = os.path.join("logs", "synfaed", "checkpoints")
        variables = faed.init_params(jax.random.PRNGKey(0))
        trained = False
        if os.path.isdir(ckpt_dir):
            from panfusion_tpu.train.checkpoints import CheckpointManager

            restored = CheckpointManager(ckpt_dir).restore_raw("last")
            if restored is not None and "params" in restored:
                variables = {"params": restored["params"],
                             "batch_stats": restored["batch_stats"]}
                trained = True
        return faed.make_metric(variables), trained

    def test_faed_separates_clean_from_corrupted(self):
        h = 64
        real = _rooms(16, h=h)
        other = _rooms(16, h=h, seed=7)  # same distribution, fresh rooms
        metric, trained = self._metric(h)

        def faed_of(fake):
            metric.reset()
            metric.update(real, real=True)
            metric.update(fake, real=False)
            return metric.compute()

        d_same = faed_of(other)
        d_noise = faed_of(_noisy(other, 60))
        d_seam = faed_of(_seam_broken(other))
        assert d_same < d_noise, (trained, d_same, d_noise)
        assert d_same < d_seam, (trained, d_same, d_seam)

    @pytest.mark.slow
    def test_trained_encoder_reconstructs(self):
        """With the trained checkpoint: near-zero reconstruction error on
        in-distribution rooms (the reference trains FAED by L1 recon,
        FAED.py:23-32; this pins that our `fit --model=FAED` run actually
        learned the distribution)."""
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.models.faed import FAED, FAEDConfig
        from panfusion_tpu.train.checkpoints import CheckpointManager

        ckpt_dir = os.path.join("logs", "synfaed", "checkpoints")
        if not os.path.isdir(ckpt_dir):
            pytest.skip("no trained FAED checkpoint (run fit --model=FAED)")
        restored = CheckpointManager(ckpt_dir).restore_raw("last")
        assert restored is not None
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        faed = FAED(FAEDConfig(pano_height=256))
        x = _rooms(4, h=256).astype(np.float32) / 127.5 - 1.0
        recon = np.asarray(jax.jit(
            lambda v, xx: faed.net.apply(v, xx, False)
        )(variables, jnp.asarray(x)))
        l1 = np.abs(recon - x).mean()
        assert l1 < 0.08, f"trained FAED recon L1 {l1}"
