"""Metric stack tests: streaming Fréchet math, IS, CLIP-score plumbing,
FAED feature contract, and the EvalPanoGen harness wiring."""
import numpy as np
import pytest

from panfusion_tpu.metrics.frechet import StreamingFrechet, frechet_distance


class TestStreamingFrechet:
    def test_identical_sets_zero(self):
        rng = np.random.default_rng(0)
        sf = StreamingFrechet(8)
        f = rng.normal(size=(64, 8))
        sf.update(f, real=True)
        sf.update(f, real=False)
        assert abs(sf.compute()) < 1e-6

    def test_mean_shift_equals_sq_distance(self):
        """For equal covariance, FD = |mu1 - mu2|^2."""
        rng = np.random.default_rng(1)
        f = rng.normal(size=(500, 4))
        shift = np.array([1.0, 0.0, -2.0, 0.5])
        sf = StreamingFrechet(4)
        sf.update(f, real=True)
        sf.update(f + shift, real=False)
        assert abs(sf.compute() - (shift ** 2).sum()) < 1e-6

    def test_streaming_matches_batch(self):
        rng = np.random.default_rng(2)
        a, b = rng.normal(size=(100, 6)), rng.normal(1.0, 2.0, size=(80, 6))
        sf1 = StreamingFrechet(6)
        sf1.update(a, True)
        sf1.update(b, False)
        sf2 = StreamingFrechet(6)
        for chunk in np.array_split(a, 7):
            sf2.update(chunk, True)
        for chunk in np.array_split(b, 5):
            sf2.update(chunk, False)
        assert np.isclose(sf1.compute(), sf2.compute(), rtol=1e-8)

    def test_merge_state_is_distributed_sum(self):
        rng = np.random.default_rng(3)
        a, b = rng.normal(size=(64, 5)), rng.normal(size=(64, 5))
        full = StreamingFrechet(5)
        full.update(a, True)
        full.update(b, False)
        w0, w1 = StreamingFrechet(5), StreamingFrechet(5)
        w0.update(a[:32], True)
        w0.update(b[:32], False)
        w1.update(a[32:], True)
        w1.update(b[32:], False)
        w0.merge_state(w1)
        assert np.isclose(full.compute(), w0.compute(), rtol=1e-8)

    def test_known_gaussians(self):
        mu1, mu2 = np.zeros(2), np.ones(2)
        c = np.eye(2)
        # equal cov: trace term cancels -> |mu|^2 = 2
        assert np.isclose(frechet_distance(mu1, c, mu2, c), 2.0)

    def test_frechet_matches_scipy_sqrtm(self):
        """The eigh-based frechet_distance equals the textbook
        scipy sqrtm(c1 c2) form (torchmetrics _compute_fid contract) on
        PSD covariances — including the rank-deficient n_samples <<
        n_features case that made recursive-Schur sqrtm pathologically
        slow (the reason for the eigh rewrite)."""
        import scipy.linalg

        rng = np.random.default_rng(0)
        for n, k in [(24, 24), (40, 6)]:  # full-rank and rank-deficient
            f1 = rng.normal(size=(k + 2, n))
            f2 = rng.normal(size=(k + 2, n)) + 0.3
            mu1, mu2 = f1.mean(0), f2.mean(0)
            c1 = np.cov(f1, rowvar=False)
            c2 = np.cov(f2, rowvar=False)
            covmean, _ = scipy.linalg.sqrtm(c1 @ c2, disp=False)
            ref = float((mu1 - mu2) @ (mu1 - mu2)
                        + np.trace(c1 + c2 - 2.0 * covmean.real))
            got = frechet_distance(mu1, c1, mu2, c2)
            assert np.isclose(got, ref, rtol=1e-6, atol=1e-8), (n, k, got, ref)


class TestInceptionScore:
    def test_uniform_vs_peaked(self):
        from panfusion_tpu.metrics.image_metrics import InceptionScore

        is_m = InceptionScore()
        # peaked, diverse predictions -> high IS
        probs = np.eye(10, 1000) * 0.999 + 1e-6
        probs = probs / probs.sum(-1, keepdims=True)
        is_m._probs = [np.tile(probs, (4, 1))]
        is_m.update_called = True
        hi, _ = is_m.compute(splits=2)
        # uniform predictions -> IS 1
        is_u = InceptionScore()
        is_u._probs = [np.full((40, 1000), 1.0 / 1000)]
        is_u.update_called = True
        lo, _ = is_u.compute(splits=2)
        assert hi > 5.0
        assert abs(lo - 1.0) < 1e-6


class TestMeanMetric:
    def test_weighted_mean(self):
        from panfusion_tpu.metrics.image_metrics import MeanMetric

        m = MeanMetric()
        m.update(1.0, n=3)
        m.update(5.0, n=1)
        assert np.isclose(m.compute(), 2.0)


class TestFAEDFeatures:
    def test_activation_vector_shape(self):
        """FAED feature = cos(lat)-weighted width-mean encoder map flattened
        channel-major to pano_height*4 dims (reference FAED.py:69-78)."""
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.models.faed import (
            FAEDAutoEncoder,
            FrechetAutoEncoderDistance,
        )

        net = FAEDAutoEncoder()
        h, w = 64, 128
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), False)

        def encode(x):
            return net.apply(v, x, method=net.encode)

        metric = FrechetAutoEncoderDistance(h, encode)
        imgs = (np.random.default_rng(0).random((2, h, w, 3)) * 255).astype(
            np.uint8
        )
        feats = metric.get_activation(imgs)
        assert feats.shape == (2, h * 4)  # 128 ch * h/32 rows


class TestEvalHarness:
    def test_crops_and_variants_update(self, tmp_path, monkeypatch):
        """Run one tiny test_step through the full harness with stubbed
        feature extractors (exercises every crop/variant code path)."""
        import panfusion_tpu.metrics.image_metrics as im
        from panfusion_tpu.models.eval_pano_gen import EvalConfig, EvalPanoGen

        # stub extractor bundle (im.FeatureExtractor contract): mean-pool
        # features, uniform-ish probs, identity preprocess
        def fake_extractor():
            def run(x):
                x = np.asarray(x)
                f = x.reshape(x.shape[0], -1, 3).mean(1)
                feats = np.tile(f, (1, 683))[:, :2048]
                probs = np.full((x.shape[0], 1000), 1.0 / 1000)
                return feats, probs

            return im.FeatureExtractor(
                run, lambda u8: np.asarray(u8, np.float32), 2048, "stub"
            )

        monkeypatch.setattr(im, "_feature_extractor", fake_extractor)
        monkeypatch.setattr(
            im, "_clip_fns", lambda: lambda x: np.ones((np.asarray(x).shape[0], 512))
        )
        monkeypatch.setattr(
            im, "default_text_embed_fn",
            lambda: lambda texts: np.ones((len(texts), 512)),
        )

        # crop_hw shrunk from the 299x299 inception contract: this test
        # exercises the crop/variant CODE PATHS with stubbed extractors, and
        # the 299x299 resample compiles alone cost ~10 min cold on 1-CPU
        # XLA:CPU (r3 VERDICT Next #7). pano 32x64 / 2 crops: every distinct
        # crop angle is its own e2p-warp compile — this test was the fast
        # tier's single worst entry (296 s cold) at 64px/3 crops.
        cfg = EvalConfig(pano_height=32, num_eval_crops=2, layout_metric=False,
                         crop_hw=(16, 16))
        ev = EvalPanoGen(cfg)
        ev._faed = _FakeFaed()

        rng = np.random.default_rng(0)
        pano = (rng.random((1, 1, 32, 64, 3)) * 255).astype(np.uint8)
        batch = {
            "pano": pano,
            "pano_pred": (rng.random((1, 1, 32, 64, 3)) * 255).astype(np.uint8),
            "pano_prompt": ["a room"],
            "pano_id": ["x"],
        }
        for i in range(2):
            ev.test_step(batch, i)
        out = ev.on_test_end()
        for key in ("FID", "IS", "CS", "rot_FID", "crop_FID", "seam_FID",
                    "mv_FID", "FAED"):
            assert key in out, (key, sorted(out))
        assert out["FID"] >= 0
        # pers_* untouched (no images_pred)
        assert "pers_FID" not in out


class _FakeFaed:
    update_called = True

    def update(self, *a, **k):
        pass

    def compute(self):
        return 0.0
