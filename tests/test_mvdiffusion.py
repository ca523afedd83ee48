"""MvDiffusion baseline: homographies, CPAttn shapes, tiny inference."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_model():
    import jax.numpy as jnp

    from panfusion_tpu.models.mvdiffusion import MvDiffusion, MvDiffusionConfig

    cfg = MvDiffusionConfig(
        pers_resolution=32, num_views=4, diff_timestep=2, pano_height=32,
        unet_kwargs=dict(block_out_channels=(8, 16), heads=(1, 1),
                         context_dim=16, layers_per_block=1),
        vae_kwargs=dict(block_out_channels=(4, 4, 4, 4), layers_per_block=1),
        text_kwargs=dict(hidden_size=16, intermediate_size=32, num_layers=1,
                         num_heads=1),
    )
    return MvDiffusion(cfg)


def test_homography_identity():
    """H[i, i] must be the identity (view to itself)."""
    import jax.numpy as jnp

    from panfusion_tpu.models.mvdiffusion import homographies

    from panfusion_tpu.geometry.rotations import get_K_R

    Ks, Rs = [], []
    for t in (0.0, 90.0, 180.0, 270.0):
        K, R = get_K_R(90.0, t, 0.0, 64, 64)
        Ks.append(K)
        Rs.append(R)
    H = homographies(jnp.stack(Rs), jnp.stack(Ks))
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(H[i, i]), np.eye(3), atol=1e-4
        )


def test_homography_maps_shared_ray():
    """A pixel on the overlap of two 90°-FoV views 90° apart must map to a
    valid pixel of the neighbor (the shared viewing ray)."""
    import jax.numpy as jnp

    from panfusion_tpu.geometry.rotations import get_K_R
    from panfusion_tpu.models.mvdiffusion import homographies

    K0, R0 = get_K_R(90.0, 0.0, 0.0, 64, 64)
    K1, R1 = get_K_R(90.0, 90.0, 0.0, 64, 64)
    H = homographies(jnp.stack([R0, R1]), jnp.stack([K0, K1]))
    # right edge of view 0 overlaps left edge of view 1
    x = jnp.asarray([60.0, 32.0, 1.0])
    mapped = np.asarray(H[0, 1] @ x)
    mx, my = mapped[0] / mapped[2], mapped[1] / mapped[2]
    assert -10 < mx < 20, mx  # lands near view 1's left edge
    assert 20 < my < 44, my


@pytest.mark.slow  # compiles the full MvDiffusion sampling loop, ~4.5 min cold
def test_inference_end_to_end(tiny_model):
    import jax

    params = tiny_model.init_params(jax.random.PRNGKey(0))
    images, pano = tiny_model.inference(
        params, {"pano_prompt": ["a room"]}, jax.random.PRNGKey(1)
    )
    assert images.shape == (1, 4, 32, 32, 3)
    assert images.dtype == np.uint8
    assert pano.shape == (1, 32, 64, 3)


def test_cp_attn_zero_init_is_identity(tiny_model):
    """CPAttn transformer has zero-init out projections: at init the CP
    block must be an exact residual identity."""
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.geometry.rotations import get_K_R
    from panfusion_tpu.models.mvdiffusion import CPAttn

    m, h = 4, 4
    Ks, Rs = [], []
    for t in (0.0, 90.0, 180.0, 270.0):
        K, R = get_K_R(90.0, t, 0.0, h * 8, h * 8)
        Ks.append(np.asarray(K))
        Rs.append(np.asarray(R))
    R = jnp.asarray(np.stack(Rs))[None]
    K = jnp.asarray(np.stack(Ks))[None]
    x = jax.random.normal(jax.random.PRNGKey(0), (1, m, h, h, 8))
    blk = CPAttn(8)
    v = blk.init(jax.random.PRNGKey(1), x, R, K, (h * 8, h * 8))
    out = blk.apply(v, x, R, K, (h * 8, h * 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
