"""ControlNet branch: zero-init no-op property and layout-cond wiring."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cn():
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.nn.controlnet import ControlNet

    cn = ControlNet(
        block_out_channels=(8, 16), layers_per_block=1, heads=(1, 1),
        dim_head=8, context_dim=16,
    )
    v = cn.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 16)), jnp.zeros((1, 64, 64, 3)),
    )
    return cn, v


def test_zero_init_residuals(tiny_cn):
    """At init every residual must be exactly zero (diffusers zero-conv
    contract) so adding the branch changes nothing."""
    import jax
    import jax.numpy as jnp

    cn, v = tiny_cn
    rng = jax.random.PRNGKey(1)
    sample = jax.random.normal(rng, (1, 8, 8, 4))
    cond = jax.random.normal(rng, (1, 64, 64, 3))
    down, mid = cn.apply(
        v, sample, jnp.asarray([5]), jnp.ones((1, 7, 16)), cond
    )
    assert len(down) == 1 + 1 * 2 + 1  # conv_in + layers + downsampler
    for r in down:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid).max()) == 0.0


def test_residual_count_matches_unet_skips(tiny_cn):
    """ControlNet must emit one residual per UNet skip (the dual traversal
    zips them 1:1 — models/dual_unet.py)."""
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.nn.unet import UNet2DCondition

    cn, v = tiny_cn
    down, _ = cn.apply(
        v, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 7, 16)), jnp.zeros((1, 64, 64, 3)),
    )
    # count skips the same way the unet traversal builds them
    unet = UNet2DCondition(
        block_out_channels=(8, 16), layers_per_block=1, heads=(1, 1),
        dim_head=8, context_dim=16,
    )
    n_skips = 1
    for i, c in enumerate((8, 16)):
        n_skips += 1  # layers_per_block=1
        if i != 1:
            n_skips += 1
    assert len(down) == n_skips


def test_conditioning_affects_output_after_training_step(tiny_cn):
    """Make the zero convs nonzero: the cond image must now change the
    residuals (the branch is actually wired to the cond input)."""
    import jax
    import jax.numpy as jnp

    cn, v = tiny_cn
    v2 = jax.tree.map(
        lambda x: x + 0.01 if x.ndim >= 2 else x, v
    )
    args = (jnp.zeros((1, 8, 8, 4)), jnp.asarray([5]), jnp.ones((1, 7, 16)))
    cond_a = jnp.zeros((1, 64, 64, 3))
    cond_b = jnp.ones((1, 64, 64, 3))
    down_a, mid_a = cn.apply(v2, *args, cond_a)
    down_b, mid_b = cn.apply(v2, *args, cond_b)
    assert float(jnp.abs(mid_a - mid_b).max()) > 0


def test_panfusion_layout_cond_init():
    """PanFusion with layout_cond builds + inits the pano ControlNet and the
    layout-cond trainable partition picks it up."""
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.models.panfusion import PanFusion, PanFusionConfig
    from panfusion_tpu.train.params import (
        controlnet_trainable,
        partition_params,
    )

    cfg = PanFusionConfig(
        pano_height=64, pers_resolution=32, num_views=2, diff_timestep=2,
        layout_cond=True, preset="tiny",
        unet_kwargs=dict(block_out_channels=(8, 16), heads=(1, 1),
                         dim_head=8, context_dim=16, layers_per_block=1),
        vae_kwargs=dict(block_out_channels=(4, 4), layers_per_block=1),
        text_kwargs=dict(hidden_size=16, intermediate_size=32, num_layers=1,
                         num_heads=1),
    )
    model = PanFusion(cfg)
    assert model.pano_cn is not None
    params = model.init_params(jax.random.PRNGKey(0))
    assert "pano_cn" in params
    trainable, frozen = partition_params(params, controlnet_trainable)
    flat = jax.tree_util.tree_flatten_with_path(trainable)[0]
    paths = ["/".join(str(k) for k in p) for p, _ in flat]
    assert any("pano_cn" in p for p in paths)
    assert any("lora" in p for p in paths)
    assert not any("cp_blocks" in p for p in paths)
