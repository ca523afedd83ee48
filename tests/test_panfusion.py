"""End-to-end PanFusion smoke tests on a tiny architecture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panfusion_tpu.models import PanFusion, PanFusionConfig
from panfusion_tpu.train.loop import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from panfusion_tpu.train.params import count_params, default_trainable, partition_params

TINY = dict(
    pano_height=64,  # pano 64x128 -> latent 8x16
    pers_resolution=64,  # views 64 -> latent 8
    num_views=4,
    diff_timestep=4,
    latent_pad=1,
    unet_kwargs=dict(
        block_out_channels=(16, 32, 32, 32),
        layers_per_block=1,
        heads=(1, 1, 1, 1),
        dim_head=8,
        context_dim=16,
    ),
    vae_kwargs=dict(block_out_channels=(4, 8, 8, 8)),
    text_kwargs=dict(
        vocab_size=49408, hidden_size=16, intermediate_size=32,
        num_layers=2, num_heads=2,
    ),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = PanFusion(PanFusionConfig(**TINY))
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_init_and_param_partition(model_and_params):
    model, params = model_and_params
    trainable, frozen = partition_params(params, default_trainable)
    nt, nf = count_params(trainable), count_params(frozen)
    assert nt > 0 and nf > nt  # LoRA + warp blocks are a small fraction
    # warp + lora params present
    import flax.traverse_util as tu

    keys = ["/".join(k) for k in tu.flatten_dict(trainable)]
    assert any("cp_blocks_" in k for k in keys)
    assert any("lora_" in k for k in keys)


def test_inference_end_to_end(model_and_params):
    model, params = model_and_params
    batch = {"pano_prompt": ["a cozy bedroom"], "prompt": None}
    images, pano = model.inference(params, batch, jax.random.PRNGKey(1))
    assert pano.shape == (1, 64, 128, 3) and pano.dtype == np.uint8
    assert images.shape == (1, 4, 64, 64, 3)


def test_correlated_noise_init(model_and_params):
    """View noise must be a nearest-warp of the pano noise field
    (reference PanFusion.py:30-43)."""
    model, _ = model_and_params
    theta = jnp.asarray([0.0, 90.0, 180.0, 270.0])
    phi = jnp.zeros(4)
    pano_noise, view_noise = model.init_noise(
        jax.random.PRNGKey(0), 1, (8, 16), (4, 4), theta, phi
    )
    assert pano_noise.shape == (1, 8, 16, 4)
    assert view_noise.shape == (1, 4, 4, 4, 4)
    # nearest warp => every view noise value exists in the pano field
    pv = set(np.round(np.asarray(pano_noise).ravel(), 5).tolist())
    vv = set(np.round(np.asarray(view_noise).ravel(), 5).tolist())
    assert vv <= pv


@pytest.mark.slow  # compiles a full (tiny) train step, ~6 min cold on 1-CPU XLA
def test_train_step_decreases_nothing_but_runs(model_and_params):
    model, params = model_and_params
    cfg = TrainConfig(steps_per_epoch=10)
    state, opt = create_train_state(model, params, cfg)
    b, m = 1, model.cfg.num_views
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(b, m, 64, 64, 3)).astype(np.float32)) * 0.1,
        "pano": jnp.asarray(rng.normal(size=(b, 64, 128, 3)).astype(np.float32)) * 0.1,
        "pers_ctx": jnp.zeros((b, m, 77, 16)),
        "pano_ctx": jnp.zeros((b, 77, 16)),
        "fov": jnp.full((b, m), 90.0),
        "theta": jnp.asarray([[0.0, 90.0, 180.0, 270.0]]),
        "phi": jnp.zeros((b, m)),
    }
    step = make_train_step(model, opt)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_pers"]) > 0 and float(metrics["loss_pano"]) > 0
    # only trainable params changed
    diff = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()), state.trainable, state2.trainable
    )
    assert max(jax.tree.leaves(diff)) > 0
    same = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()), state.frozen, state2.frozen
    )
    assert max(jax.tree.leaves(same)) == 0


def test_pano_only_variant():
    cfg = PanFusionConfig(**{**TINY, "use_pers_branch": False})
    model = PanFusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    names = str(jax.tree_util.tree_structure(params["dual"]))
    assert "pano_unet" in names and "cp_blocks" not in names


def test_inference_batched_prompts():
    """b=2 prompt batch through the cached (batch-1) phase sites — the CFG
    tile broadcasts sites instead of requiring per-batch caches."""
    import jax

    from panfusion_tpu.models.panfusion import PanFusion, PanFusionConfig

    cfg = PanFusionConfig(
        pano_height=64, pers_resolution=32, num_views=2, diff_timestep=2,
        latent_pad=1, scan_chunk=1,
        unet_kwargs=dict(block_out_channels=(8, 16), heads=(1, 1),
                         dim_head=8, context_dim=16, layers_per_block=1),
        vae_kwargs=dict(block_out_channels=(4, 4, 4, 4), layers_per_block=1),
        text_kwargs=dict(hidden_size=16, intermediate_size=32, num_layers=1,
                         num_heads=1),
    )
    model = PanFusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    images, pano = model.inference(
        params, {"pano_prompt": ["a room", "a beach"]}, jax.random.PRNGKey(1)
    )
    assert images.shape == (2, 2, 32, 32, 3)
    assert pano.shape == (2, 64, 128, 3)
