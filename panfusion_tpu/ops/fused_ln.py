"""Fused LayerNorm -> matmul Pallas kernel (the round-4 "mega-kernel" plan).

Why: the denoise step is ~50% MXU-utilized and its headroom is the
bandwidth-bound tail — 18.1% reduce/norm + 10.1% data movement of the
traced step (BASELINE.md round 4 "ceiling analysis"). A standalone
GroupNorm/LayerNorm is already at its bandwidth optimum (2 reads + 1 write;
the round-4 FastGroupNorm experiment measured exactly that), so the only
way to cut the tail is CROSS-OP fusion: every transformer block computes
``LayerNorm(x) @ W`` (qkv / q / GEGLU projections), where XLA emits
  stats-read(x) + normalize-read(x) + write(xn) + matmul-read(xn) + read(W)
This kernel emits
  read(x) + read(W)
— the normalized activation never exists in HBM. Per site that removes two
reads and one write of the token tensor (the pers branch's is 26 MB at
level 0).

Grid policy: one 2-D (token-block x feature-block) grid for every site,
features iterating fastest — the x block's index is then constant across
the inner loop, so Mosaic keeps it resident (no re-DMA) while W column
slabs stream through; LN stats are recomputed per feature block (VPU cost
linear in the block, negligible next to the dot). Block caps keep the W
slab and the f32 accumulator inside the 16 MB scoped-vmem stack WITH
double buffering — the first on-chip runs OOMed (32.8M/21.1M/16.1M stacks)
under per-path policies that capped only W residency, which is what
retired the earlier token-resident/feature-resident special cases.

Training support: jax.custom_vjp whose backward recomputes the forward
with plain XLA ops and differentiates that (no hand-derived LN backward to
get wrong; backward bandwidth is unchanged vs unfused).

Reference analog: the reference runs these sites as separate torch
LayerNorm + Linear CUDA kernels (external/MVDiffusion + diffusers
BasicTransformerBlock; models/modules/transformer.py) — there is nothing
to copy; this is TPU-native engineering on top of the Pallas guide's
two-input matmul pattern.

MEASURED OUTCOME (round 5, on-chip): end-to-end the fused kernels are a
~10% REGRESSION — 8.17 panos/min fused vs 9.14 unfused, same day, same
tunnel (BASELINE.md "Measured (round 5)"). The HBM traffic the kernel
saves is smaller than what the pallas_call boundary costs: XLA was
already fusing the normalize into the surrounding elementwise chain, and
the 2-D grid re-reads W per token block. Default is therefore OFF
(PANFUSION_FUSED_LN=0); the kernels stay behind PANFUSION_FUSED_LN=1 as
a tuning surface for other chip generations, with parity pinned by
tests/test_fused_ln.py either way.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# VMEM block budgets (bytes), env-tunable like the flash block caps
# (PANFUSION_FLASH_B{Q,K}) so on-chip tuning needs no code edits. The
# Mosaic scoped-vmem stack limit is 16 MB/core and every gridded operand
# is double-buffered, so PER-BLOCK budgets must stay small: a W
# feature-column block gets _W_BLOCK_BUDGET and the f32 dot accumulator
# _OUT_BLOCK_BUDGET. (These caps were sized by the first on-chip runs'
# OOMs: 32.8M / 21.1M / 16.1M stacks vs the 16M limit when the policy
# capped only by W residency.)
_W_BLOCK_BUDGET = int(os.environ.get("PANFUSION_FLN_W_BUDGET",
                                     3 * 1024 * 1024))
_OUT_BLOCK_BUDGET = int(os.environ.get("PANFUSION_FLN_OUT_BUDGET",
                                       2 * 1024 * 1024))


def ln_matmul_reference(x, gamma, beta, w, bias=None, eps: float = 1e-5):
    """Plain-XLA reference: LayerNorm (f32 stats, flax nn.LayerNorm
    contract) then matmul. Used for CPU fallback and the custom-vjp
    backward recompute."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    xn = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    xn = xn.astype(x.dtype)
    y = jnp.dot(xn, w, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _normalize_block(x_ref, g_ref, b_ref, eps):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return xn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(
        jnp.float32)


def _kernel_tf_grid(x_ref, g_ref, b_ref, w_ref, o_ref, *, eps):
    """Unified 2-D (token x feature) grid. The grid iterates features
    fastest, so for a fixed token block Mosaic keeps the x block resident
    (unchanged block index => no re-DMA) while W feature-column blocks
    stream through. LayerNorm stats are recomputed per feature block —
    VPU work linear in the block size, negligible next to the dot."""
    xn = _normalize_block(x_ref, g_ref, b_ref, eps).astype(x_ref.dtype)
    o_ref[...] = jnp.dot(
        xn, w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _largest_divisor(n: int, cap: int, mult: int = 1) -> int:
    """Largest divisor of n that is <= cap and (unless it equals n) a
    multiple of `mult` — Mosaic requires block dims divisible by 8
    (sublane) / 128 (lane) unless they span the whole array."""
    if n <= cap:
        return n
    for d in range(min(cap, n), 0, -1):
        if n % d == 0 and d % mult == 0:
            return d
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return n


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6)
)
def _ln_matmul(x2d, gamma, beta, w, bias, eps: float, interpret: bool):
    t, c = x2d.shape
    f = w.shape[1]
    # Feature block: a (c, bf) W column slab within the W budget; token
    # block: keeps the f32 dot accumulator (bt x bf x 4) within the out
    # budget. Both are double-buffered by Pallas, which the budgets and
    # the 16 MB scoped-vmem stack headroom account for.
    bf = _largest_divisor(
        f, max(1, _W_BLOCK_BUDGET // (c * jnp.dtype(w.dtype).itemsize)),
        mult=128)
    bt = _largest_divisor(t, max(1, _OUT_BLOCK_BUDGET // (bf * 4)), mult=8)
    out = pl.pallas_call(
        functools.partial(_kernel_tf_grid, eps=eps),
        grid=(t // bt, f // bf),
        in_specs=[
            pl.BlockSpec((bt, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, bf), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bf), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, f), x2d.dtype),
        interpret=interpret,
    )(x2d, gamma[None], beta[None], w)
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x2d.dtype)
    return out


def _ln_matmul_fwd(x2d, gamma, beta, w, bias, eps, interpret):
    return (_ln_matmul(x2d, gamma, beta, w, bias, eps, interpret),
            (x2d, gamma, beta, w, bias))


def _ln_matmul_bwd(eps, interpret, res, g):
    x2d, gamma, beta, w, bias = res
    _, vjp = jax.vjp(
        lambda *a: ln_matmul_reference(*a, eps=eps), x2d, gamma, beta, w,
        bias,
    )
    return vjp(g)


_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def _affine_matmul_kernel(x_ref, s_ref, t_ref, w_ref, o_ref):
    xf = x_ref[0].astype(jnp.float32)
    xn = (xf * s_ref[0].astype(jnp.float32)
          + t_ref[0].astype(jnp.float32)).astype(x_ref.dtype)
    o_ref[0] = jnp.dot(
        xn, w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def affine_matmul_reference(x, s, t, w, bias=None):
    y = jnp.einsum(
        "btc,cf->btf",
        (x.astype(jnp.float32) * s[:, None].astype(jnp.float32)
         + t[:, None].astype(jnp.float32)).astype(x.dtype),
        w, preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _affine_matmul(x, s, t, w, bias, interpret: bool):
    b, tt, c = x.shape
    f = w.shape[1]
    # W stays resident here: the affine sites are the square proj_in /
    # proj_out matrices (<= 1280^2 bf16 = 3.3 MB, verified on-chip).
    if c * f * jnp.dtype(w.dtype).itemsize > 6 * 1024 * 1024:
        return affine_matmul_reference(x, s, t, w, bias)
    bt = _largest_divisor(tt, max(1, _OUT_BLOCK_BUDGET // (f * 4)), mult=8)
    out = pl.pallas_call(
        _affine_matmul_kernel,
        grid=(b, tt // bt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
            # (b, 1, c) so the block's trailing dims span the array —
            # Mosaic rejects a (1, c) block over a (b, c) array (sublane
            # dim 1 neither divisible by 8 nor the full b)
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, f), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, f), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tt, f), x.dtype),
        interpret=interpret,
    )(x, s[:, None], t[:, None], w)
    if bias is not None:
        out = (out.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
            x.dtype)
    return out


def _affine_matmul_fwd(x, s, t, w, bias, interpret):
    return _affine_matmul(x, s, t, w, bias, interpret), (x, s, t, w, bias)


def _affine_matmul_bwd(interpret, res, g):
    x, s, t, w, bias = res
    _, vjp = jax.vjp(affine_matmul_reference, x, s, t, w, bias)
    return vjp(g)


_affine_matmul.defvjp(_affine_matmul_fwd, _affine_matmul_bwd)


def affine_matmul(x, s, t, w, bias=None, *, interpret: bool = False):
    """``(x * s + t) @ w (+ bias)`` in one HBM pass — the GroupNorm-apply ->
    projection site of SpatialTransformer. x: (b, T, C); s/t: (b, C)
    per-sample per-channel affine vectors (the group stats folded per
    channel, FastGroupNorm-style); w: (C, F)."""
    if not (interpret or _use_pallas()):
        return affine_matmul_reference(x, s, t, w, bias)
    return _affine_matmul(x, s, t, w, bias,
                          interpret or _interpret_default())


def _use_pallas() -> bool:
    mode = os.environ.get("PANFUSION_FUSED_LN", "0")
    if mode == "0":
        return False
    if mode == "interpret":
        # run the REAL kernels through the Pallas interpreter on any
        # backend — lets model-level fused-vs-reference equivalence run in
        # CPU CI (tests/test_fused_ln.py model-level test)
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret_default() -> bool:
    return os.environ.get("PANFUSION_FUSED_LN", "0") == "interpret"


def ln_matmul(x, gamma, beta, w, bias=None, *, eps: float = 1e-5,
              interpret: bool = False):
    """``LayerNorm(x; gamma, beta, eps) @ w (+ bias)`` in one HBM pass.

    x: (..., T, C); w: (C, F); gamma/beta: (C,); bias: (F,) or None.
    Runs the Pallas kernel on TPU (PANFUSION_FUSED_LN=0 disables), the XLA
    reference elsewhere. Differentiable (custom VJP, XLA-recompute
    backward)."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    x2d = x.reshape(-1, c)
    if not (interpret or _use_pallas()):
        out = ln_matmul_reference(x2d, gamma, beta, w, bias, eps)
    else:
        out = _ln_matmul(x2d, gamma, beta, w, bias, eps,
                         interpret or _interpret_default())
    return out.reshape(*lead, w.shape[1])
