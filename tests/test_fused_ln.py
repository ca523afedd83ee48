"""Parity tests for the fused LayerNorm->matmul Pallas kernel
(ops/fused_ln.py, the round-4 perf-plan mega-kernel).

Same methodology as the flash-attention wrapper (tests/test_attention.py):
pin the kernel against the plain-XLA reference in Pallas interpret mode on
CPU across the shapes the transformer blocks actually use; the on-chip
numeric sweep rides scripts/check_flash_parity.py on real hardware.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panfusion_tpu.ops.fused_ln import (ln_matmul, ln_matmul_reference)


def _mats(t, c, f, dtype, seed=0, bias=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(2, t // 2, c)), dtype)  # batched lead
    gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, f)) / np.sqrt(c), dtype)
    b = jnp.asarray(rng.normal(size=(f,)), jnp.float32) if bias else None
    return x, gamma, beta, w, b


# (tokens, channels, features): the qkv / q / GEGLU sites of the SD2 and
# demo UNets — both grid policies (W-resident and x-resident) are covered
SHAPES = [
    (544, 320, 960),     # level-0-ish qkv, W resident
    (256, 64, 512),      # demo-preset scale
    (136, 1280, 2560),   # C=1280 site -> f-grid (x resident)
    (272, 640, 5120),    # GEGLU at 640
]


@pytest.mark.parametrize("t,c,f", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(t, c, f, dtype):
    x, gamma, beta, w, b = _mats(t, c, f, dtype)
    ref = ln_matmul_reference(x.reshape(-1, c), gamma, beta, w, b)
    out = ln_matmul(x, gamma, beta, w, b, interpret=True)
    assert out.shape == (2, t // 2, f)
    tol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out.reshape(-1, f), np.float32),
        np.asarray(ref, np.float32), atol=tol, rtol=tol,
    )


def test_no_bias():
    x, gamma, beta, w, _ = _mats(64, 96, 128, jnp.float32, bias=False)
    out = ln_matmul(x, gamma, beta, w, None, interpret=True)
    ref = ln_matmul_reference(x.reshape(-1, 96), gamma, beta, w, None)
    np.testing.assert_allclose(np.asarray(out.reshape(-1, 128)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_matches_flax_layernorm_then_dense():
    """The kernel must agree with the exact module pair it replaces:
    flax nn.LayerNorm (use_bias/use_scale) followed by nn.Dense."""
    from flax import linen as nn

    t, c, f = 96, 160, 224
    x, gamma, beta, w, b = _mats(t, c, f, jnp.float32, seed=3)
    ln = nn.LayerNorm()
    h = ln.apply({"params": {"scale": gamma, "bias": beta}},
                 x.reshape(-1, c))
    ref = h @ w + b
    out = ln_matmul(x, gamma, beta, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out.reshape(-1, f)),
                               np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_gradients_match_reference():
    """custom-vjp backward (XLA recompute) == direct autodiff of the
    reference, for every operand."""
    t, c, f = 64, 96, 128
    x, gamma, beta, w, b = _mats(t, c, f, jnp.float32, seed=1)

    def loss_kernel(x, gamma, beta, w, b):
        y = ln_matmul(x, gamma, beta, w, b, interpret=True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_ref(x, gamma, beta, w, b):
        y = ln_matmul_reference(x.reshape(-1, c), gamma, beta, w, b)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32).reshape(np.asarray(r).shape),
            np.asarray(r, np.float32), atol=1e-4, rtol=1e-4,
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_affine_matmul_matches_reference(dtype):
    from panfusion_tpu.ops.fused_ln import (affine_matmul,
                                            affine_matmul_reference)

    rng = np.random.default_rng(5)
    b, t, c, f = 3, 128, 96, 160
    x = jnp.asarray(rng.normal(size=(b, t, c)), dtype)
    s = jnp.asarray(1.0 + 0.1 * rng.normal(size=(b, c)), jnp.float32)
    tt = jnp.asarray(0.1 * rng.normal(size=(b, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, f)) / np.sqrt(c), dtype)
    bias = jnp.asarray(rng.normal(size=(f,)), jnp.float32)
    out = affine_matmul(x, s, tt, w, bias, interpret=True)
    ref = affine_matmul_reference(x, s, tt, w, bias)
    tol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=tol, rtol=tol)


def test_spatial_transformer_entry_unchanged():
    """SpatialTransformer with the fused GN->proj_in entry still builds,
    runs, and keeps its param tree (the numeric equivalence vs the unfused
    pair is pinned by test_nn/test_convert golden tests)."""
    from panfusion_tpu.nn.layers import SpatialTransformer

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)), jnp.float32)
    st = SpatialTransformer(channels=64, heads=2, dim_head=32, depth=1,
                            context_dim=32)
    ctx = jnp.asarray(rng.normal(size=(2, 7, 32)), jnp.float32)
    v = st.init(jax.random.PRNGKey(0), x, ctx)
    y = st.apply(v, x, ctx)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_model_level_fused_equals_reference(monkeypatch):
    """Whole-TransformerBlock equivalence: the REAL Pallas kernels (via
    PANFUSION_FUSED_LN=interpret) against the XLA reference path
    (PANFUSION_FUSED_LN=0) on identical params — covers the qkv concat,
    the LoRA fold, the GEGLU fusion, and every reshape in between, not
    just the kernels in isolation."""
    from panfusion_tpu.nn.layers import TransformerBlock

    rng = np.random.default_rng(11)
    blk = TransformerBlock(dim=64, heads=2, dim_head=32, context_dim=48,
                           lora_rank=4)
    x = jnp.asarray(rng.normal(size=(2, 32, 64)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 7, 48)), jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x, ctx)
    # give LoRA a nonzero delta so the fold is actually exercised
    v = jax.tree.map(
        lambda a: a + 0.01 if a.ndim == 2 and a.shape[-1] == 4 else a, v)

    monkeypatch.setenv("PANFUSION_FUSED_LN", "0")
    ref = blk.apply(v, x, ctx)
    monkeypatch.setenv("PANFUSION_FUSED_LN", "interpret")
    fused = blk.apply(v, x, ctx)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_cpu_path_uses_reference(monkeypatch):
    """Off-TPU (and with PANFUSION_FUSED_LN=0) the public entry must route
    to the XLA reference — bit-identical, not merely close."""
    monkeypatch.setenv("PANFUSION_FUSED_LN", "0")
    x, gamma, beta, w, b = _mats(32, 64, 96, jnp.float32, seed=2)
    out = ln_matmul(x, gamma, beta, w, b)
    ref = ln_matmul_reference(x.reshape(-1, 64), gamma, beta, w, b)
    np.testing.assert_array_equal(np.asarray(out.reshape(-1, 96)),
                                  np.asarray(ref))
