"""Training smoke tests for the eval models (FAED, HorizonNet): one real
optimizer step each through their fit loops on a synthetic dataset."""
import types

import numpy as np
import pytest

# heavy: compiles full train/fit steps on single-core XLA:CPU (minutes cold)
pytestmark = pytest.mark.slow


class _FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class _FakeDM:
    def __init__(self, batches):
        self._batches = batches

    def setup(self, stage=None):
        pass

    def train_dataloader(self):
        return _FakeLoader(self._batches)


def test_faed_fit_one_step(tmp_path):
    import jax.numpy as jnp

    from panfusion_tpu.models.faed import FAED, FAEDConfig
    from panfusion_tpu.train.logging import ExperimentLogger

    rng = np.random.default_rng(0)
    batches = [{"pano": rng.normal(size=(2, 1, 64, 128, 3)).astype(np.float32)}]
    cfg = FAEDConfig(max_epochs=1, pano_height=64)
    model = FAED(cfg)
    logger = ExperimentLogger(log_dir=str(tmp_path), run_id="faed")
    args = types.SimpleNamespace(max_steps=1, seed=0)
    out = model.fit(_FakeDM(batches), None, logger, args)
    assert "params" in out and "batch_stats" in out
    leaves = [np.asarray(x) for x in _leaves(out["params"])]
    assert all(np.isfinite(x).all() for x in leaves)


def test_horizonnet_fit_one_step(tmp_path):
    from panfusion_tpu.models.horizonnet import HorizonNet, HorizonNetConfig
    from panfusion_tpu.train.logging import ExperimentLogger

    rng = np.random.default_rng(0)
    H, W = 64, 128
    batches = [{
        "pano": rng.normal(size=(1, 1, H, W, 3)).astype(np.float32).clip(-1, 1),
        "horizon_layout": {
            "bon": np.stack([np.full((1, W), -0.5), np.full((1, W), 0.5)], 1)
            .astype(np.float32),
            "cor": rng.random((1, 1, W)).astype(np.float32),
        },
    }]
    cfg = HorizonNetConfig(max_epochs=1)
    model = HorizonNet(cfg)
    logger = ExperimentLogger(log_dir=str(tmp_path), run_id="hn")
    args = types.SimpleNamespace(max_steps=1, seed=0, ckpt_path=None)
    out = model.fit(_FakeDM(batches), None, logger, args)
    assert "params" in out
    leaves = [np.asarray(x) for x in _leaves(out["params"])]
    assert all(np.isfinite(x).all() for x in leaves)


def test_horizonnet_predict_layout_shapes():
    import jax

    from panfusion_tpu.models.horizonnet import HorizonNet, HorizonNetConfig

    model = HorizonNet(HorizonNetConfig())
    variables = model.init_variables(jax.random.PRNGKey(0), hw=(64, 128))
    pano = np.random.default_rng(0).normal(size=(1, 64, 128, 3)).clip(-1, 1)
    layouts, bon, cor, x = model.predict_layout(variables, pano.astype(np.float32))
    assert bon.shape == (1, 2, 128)
    assert cor.shape == (1, 1, 128)
    assert len(layouts) == 1
    assert layouts[0].shape[1] == 2
    # interleaved ceil/floor share columns
    assert (layouts[0][0::2, 0] == layouts[0][1::2, 0]).all()


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)
