"""Shared neural building blocks for the SD2 stack (flax.linen, NHWC).

Re-designed TPU-first: activations are NHWC (XLA:TPU's native conv layout),
attention uses jax.nn.dot_product_attention with an optional additive float
bias (the EPP mask contract — reference models/modules/transformer.py:71
passes a dense [-1,1] float ``attn_bias`` to xformers), and LoRA adapters are
first-class optional submodules of every attention projection (reference
injects diffusers LoRAAttnProcessor post-hoc, models/pano/PanoGenerator.py:
132-151).

Architecture constants follow stabilityai/stable-diffusion-2-base so that
converted reference checkpoints drop in (see tools/convert_ckpt.py).
"""
from __future__ import annotations

import math
from math import gcd
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers Timesteps contract for SD2:
    flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)



def _num_groups(channels: int, target: int = 32) -> int:
    """32 groups for SD2-sized channels; the largest divisor <= 32 for tiny
    test configs (every production channel count is divisible by 32)."""
    return target if channels % target == 0 else gcd(target, channels)


class TimestepEmbedding(nn.Module):
    """2-layer MLP lifting the sinusoidal embedding to time_embed_dim."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)


class FastGroupNorm(nn.Module):
    """TPU-native GroupNorm, numerically equivalent to flax nn.GroupNorm.

    flax's implementation reshapes (..., C) to (..., G, C/G) and reduces the
    trailing pair — splitting the 128-wide TPU lane axis into C/G-wide
    slivers (10 wide for SD2's 320-channel levels), which XLA services with
    relayouts and latency-bound partial reductions: measured 18% of the
    whole denoise step (BASELINE.md round 4). This formulation never splits
    the lane axis:
      1. per-CHANNEL spatial sums of x and x^2 (layout-friendly reduce),
      2. channel->group aggregation as a tiny (C, G) 0/1 matmul (MXU),
      3. group stats broadcast back per channel via (G, C), then one
         per-channel affine pass.
    Parameters are identical to nn.GroupNorm ('scale'/'bias' of shape (C,))
    so existing checkpoints and converters are unaffected; autodiff works
    natively (no custom kernel)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_affine: bool = False):
        import numpy as np

        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        spatial_axes = tuple(range(1, x.ndim - 1))
        cnt = float(np.prod(x.shape[1:-1]) * (c // g))
        s1 = jnp.sum(xf, spatial_axes)        # (N, C)
        s2 = jnp.sum(xf * xf, spatial_axes)   # (N, C)
        # channel i belongs to group i // (C/G) (flax reshape order)
        member = jnp.asarray(
            np.kron(np.eye(g), np.ones((c // g, 1))), jnp.float32
        )  # (C, G)
        mean = (s1 @ member) / cnt            # (N, G)
        # E[x^2]-mu^2 cancels catastrophically for near-constant features
        # with large means (|mu|^2 * 2^-23 can exceed epsilon), going
        # slightly NEGATIVE -> rsqrt = NaN. Observed: finite-loss resume of
        # the trained demo checkpoint went NaN in one step; random-weight
        # benches never trip it. Clamp like flax's _compute_stats does.
        var = jnp.maximum((s2 @ member) / cnt - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        mean_c = mean @ member.T              # (N, C)
        inv_c = inv @ member.T
        w = inv_c * scale[None]
        b = bias[None] - mean_c * w
        if return_affine:
            # the folded per-(sample, channel) affine, for fusing the apply
            # pass into a following matmul (ops/fused_ln.affine_matmul):
            # GN(x) == x * w + b
            return w, b
        bshape = (x.shape[0],) + (1,) * len(spatial_axes) + (c,)
        y = xf * w.reshape(bshape) + b.reshape(bshape)
        return y.astype(self.dtype)


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis of NHWC tensors."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # name pinned to the auto-name the old nn.GroupNorm child got, so
        # checkpoint param paths are unchanged
        return FastGroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon,
            dtype=self.dtype, name="GroupNorm_0",
        )(x)


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense: declares the identical param tree
    (kernel [+ bias], f32, same initializers) WITHOUT computing, so callers
    can fold adapters and fuse the matmul with a preceding LayerNorm
    (ops/fused_ln.py). Checkpoint paths are unchanged — a module named
    'base' here produces .../base/kernel exactly like an nn.Dense child."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_dim, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return kernel, bias


class _LoRAKernel(nn.Module):
    """Effective kernel of a LoRADense: W + A@B (scale 1, diffusers
    LoRALinearLayer semantics). Folding is exact — x@W + (x@A)@B ==
    x@(W + A@B) — and lets the q/k/v projections ride one fused
    LayerNorm->matmul kernel; gradients flow to A/B through the fold.
    Param tree identical to LoRADense (base/, lora_down/, lora_up/)."""

    features: int
    use_bias: bool = False
    lora_rank: int = 0

    @nn.compact
    def __call__(self, in_dim: int):
        k, b = _DenseParams(self.features, self.use_bias, name="base")(in_dim)
        if self.lora_rank > 0:
            a, _ = _DenseParams(
                self.lora_rank, False,
                kernel_init=nn.initializers.normal(1.0 / self.lora_rank),
                name="lora_down",
            )(in_dim)
            u, _ = _DenseParams(
                self.features, False, kernel_init=nn.initializers.zeros,
                name="lora_up",
            )(self.lora_rank)
            k = k + a @ u
        return k, b


class LoRADense(nn.Module):
    """Dense layer with an optional rank-r LoRA delta.

    y = x W (+ b) + (x A) B, with A ~ N(0, 1/r) and B zero-init so the
    adapter starts as identity. Parity with diffusers LoRALinearLayer
    semantics used by the reference (PanoGenerator.py:132-151, rank 4,
    network_alpha None => scale 1).
    """

    features: int
    use_bias: bool = False
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype, name="base"
        )(x)
        if self.lora_rank > 0:
            down = nn.Dense(
                self.lora_rank,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(1.0 / self.lora_rank),
                name="lora_down",
            )(x)
            up = nn.Dense(
                self.features,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="lora_up",
            )(down)
            y = y + up
        return y


class _LNParams(nn.Module):
    """Parameter-only twin of nn.LayerNorm (scale/bias, flax defaults)."""

    @nn.compact
    def __call__(self, dim: int):
        return (
            self.param("scale", nn.initializers.ones, (dim,)),
            self.param("bias", nn.initializers.zeros, (dim,)),
        )


# flax nn.LayerNorm default — the eps every checkpoint here trained with
LN_EPS = 1e-6


class CrossAttention(nn.Module):
    """Multi-head attention, self- or cross-, with optional additive bias.

    The bias is a dense float tensor broadcast over heads — the EPP mask
    contract (reference models/modules/transformer.py:57-74). Projections
    optionally carry LoRA adapters (folded into the kernels — exact).

    ``ln=(gamma, beta)``: fuse the caller's pre-LayerNorm into the q (and,
    for self-attention, qkv) projection via ops/fused_ln.py — one HBM pass
    instead of norm-write + matmul-read (the round-4 perf plan). Callers
    that pre-normalize themselves (EPP's shared norm) pass ln=None.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    context_dim: Optional[int] = None
    lora_rank: int = 0
    out_zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, bias=None, ln=None, ln_kv=None):
        self_attn = context is None
        src = x if self_attn else context
        inner = self.heads * self.dim_head
        dt = self.dtype
        wq, _ = _LoRAKernel(inner, False, self.lora_rank, name="to_q")(
            x.shape[-1])
        wk, _ = _LoRAKernel(inner, False, self.lora_rank, name="to_k")(
            src.shape[-1])
        wv, _ = _LoRAKernel(inner, False, self.lora_rank, name="to_v")(
            src.shape[-1])
        if ln is not None and self_attn:
            from ..ops.fused_ln import ln_matmul

            w_qkv = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            qkv = ln_matmul(x, ln[0], ln[1], w_qkv, eps=LN_EPS)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif ln is not None:
            from ..ops.fused_ln import ln_matmul

            q = ln_matmul(x, ln[0], ln[1], wq.astype(dt), eps=LN_EPS)
            if ln_kv is not None:
                # EPP's shared pre-norm normalizes the context too
                # (reference transformer.py:131-162) — fuse it into one
                # kv projection
                w_kv = jnp.concatenate([wk, wv], axis=1).astype(dt)
                kv = ln_matmul(src, ln_kv[0], ln_kv[1], w_kv, eps=LN_EPS)
                k, v = jnp.split(kv, 2, axis=-1)
            else:
                k = src.astype(dt) @ wk.astype(dt)
                v = src.astype(dt) @ wv.astype(dt)
        else:
            q = x.astype(dt) @ wq.astype(dt)
            k = src.astype(dt) @ wk.astype(dt)
            v = src.astype(dt) @ wv.astype(dt)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)

        from ..ops.attention import bias_attention

        if bias is not None:
            bias = bias[:, None, :, :].astype(q.dtype)  # (b, 1, n, m) over heads
        out = bias_attention(q, k, v, bias)
        out = out.reshape(b, n, inner)

        if self.out_zero_init:
            # the EPP transformer zero-inits its out projection so the warp
            # block starts as identity (reference transformer.py:54-56)
            proj = nn.Dense(
                self.query_dim,
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                name="to_out",
            )
            return proj(out)
        return LoRADense(
            self.query_dim, True, self.lora_rank, self.dtype, name="to_out"
        )(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None):
        wp, bp = _DenseParams(self.dim_out * 2, True, name="proj")(
            x.shape[-1])
        if ln is not None:
            from ..ops.fused_ln import ln_matmul

            h = ln_matmul(x, ln[0], ln[1], wp.astype(self.dtype), bp,
                          eps=LN_EPS)
        else:
            h = (x.astype(self.dtype) @ wp.astype(self.dtype)
                 + bp.astype(self.dtype))
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    zero_init_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None):
        inner = int(self.dim * self.mult)
        x = GEGLU(inner, dtype=self.dtype, name="net_0")(x, ln=ln)
        out = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=(
                nn.initializers.zeros
                if self.zero_init_out
                else nn.initializers.lecun_normal()
            ),
            bias_init=nn.initializers.zeros,
            name="net_2",
        )
        return out(x)


class TransformerBlock(nn.Module):
    """SD-style basic transformer block: self-attn, cross-attn, GEGLU FF."""

    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        # every pre-norm is fused into the projection it feeds
        # (ops/fused_ln.py): the normalized activation never round-trips
        # HBM. Param tree is unchanged (normN/{scale,bias} via _LNParams).
        ln1 = _LNParams(name="norm1")(self.dim)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, None, self.lora_rank,
            dtype=self.dtype, name="attn1",
        )(x, ln=ln1)
        ln2 = _LNParams(name="norm2")(self.dim)
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, self.context_dim,
            self.lora_rank, dtype=self.dtype, name="attn2",
        )(x, context=context, ln=ln2)
        ln3 = _LNParams(name="norm3")(self.dim)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(x, ln=ln3)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN -> linear proj -> blocks -> linear proj + skip.

    SD2 uses linear (not 1x1-conv) projections (use_linear_projection=True).
    """

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        residual = x
        # entry GroupNorm fused into proj_in: stats via FastGroupNorm's
        # affine fold (one read), apply+matmul in one Pallas pass — the
        # normalized activation never lands in HBM
        s, t = FastGroupNorm(
            num_groups=_num_groups(c), epsilon=1e-6, dtype=self.dtype,
            name="norm",
        )(x, return_affine=True)
        wp, bp = _DenseParams(self.heads * self.dim_head, True,
                              name="proj_in")(c)
        from ..ops.fused_ln import affine_matmul

        x = affine_matmul(
            x.reshape(b, h * w, c), s, t, wp.astype(self.dtype), bp
        )
        for i in range(self.depth):
            x = TransformerBlock(
                self.heads * self.dim_head, self.heads, self.dim_head,
                self.context_dim, self.lora_rank, dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, context=context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class ResnetBlock(nn.Module):
    """SD resnet block: GN-silu-conv, +time, GN-silu-conv, skip 1x1.

    epsilon: diffusers uses 1e-5 in the UNet (resnet_eps default) but 1e-6
    in the AutoencoderKL resnets — VAE callers must pass 1e-6 or converted
    weights drift."""

    out_channels: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        h = FastGroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=self.epsilon, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = FastGroupNorm(num_groups=_num_groups(self.out_channels), epsilon=self.epsilon, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample(nn.Module):
    """3x3 stride-2 conv (diffusers Downsample2D).

    The UNet uses symmetric zero pad 1; the VAE encoder uses diffusers'
    asymmetric F.pad(x, (0, 1, 0, 1)) (downsample_padding=0) — with pad 1
    on both sides a converted checkpoint would sample a one-pixel-shifted
    grid (columns 0,2,4,.. instead of 1,3,5,..)."""

    channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else 1
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (diffusers Upsample2D)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
