"""AutoencoderKL (the SD VAE) in flax.linen, NHWC.

Architecture parity with diffusers AutoencoderKL of
stabilityai/stable-diffusion-2-base (reference loads it frozen fp16 in
models/pano/PanoGenerator.py:123-127): block_out_channels (128, 256, 512,
512), 2 layers/block, latent 4ch, scaling_factor 0.18215.

TPU notes: runs in bfloat16 at inference; the panorama path wraps
encode/decode with width-circular padding at the *pixel* level (the
reference's pad-encode-unpad trick, PanoGenerator.py:227-238) which callers
do via geometry.pad_pano.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (Downsample, FastGroupNorm, ResnetBlock,
                     Upsample, _num_groups)

SD_VAE_SCALING_FACTOR = 0.18215


class VAEAttention(nn.Module):
    """Single-head spatial self-attention block (VAE mid block)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = FastGroupNorm(num_groups=_num_groups(c), epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                x = ResnetBlock(c, epsilon=1e-6, dtype=self.dtype, name=f"down_{i}_res_{j}")(x)
            if i < len(ch) - 1:
                # diffusers VAE: downsample_padding=0 + F.pad (0,1,0,1)
                x = Downsample(c, asymmetric_pad=True, dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = ResnetBlock(ch[-1], epsilon=1e-6, dtype=self.dtype, name="mid_res_0")(x)
        x = VAEAttention(ch[-1], dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[-1], epsilon=1e-6, dtype=self.dtype, name="mid_res_1")(x)
        x = FastGroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        # diffusers applies an extra 1x1 quant_conv
        return nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv")(x)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        z = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock(ch[0], epsilon=1e-6, dtype=self.dtype, name="mid_res_0")(x)
        x = VAEAttention(ch[0], dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(ch[0], epsilon=1e-6, dtype=self.dtype, name="mid_res_1")(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock(c, epsilon=1e-6, dtype=self.dtype, name=f"up_{i}_res_{j}")(x)
            if i < len(ch) - 1:
                x = Upsample(c, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = FastGroupNorm(num_groups=_num_groups(x.shape[-1]), epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(latent) -> image. NHWC.

    latent_scale / latent_shift normalize the latent space the diffusion
    model sees: z' = (z - shift) * scale, decode inverts it. The defaults
    reproduce the SD convention (scale = scaling_factor 0.18215, shift 0 —
    reference PanoGenerator.py:213-225). For a from-scratch VAE the SD
    constant is wrong — 0.18215 is 1/std of *SD's* latents — so training
    recipes calibrate these from data (tools/calibrate_latents.py);
    per-channel tuples are accepted and broadcast over NHWC.
    """

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32
    latent_scale: Sequence[float] | float = SD_VAE_SCALING_FACTOR
    latent_shift: Sequence[float] | float = 0.0

    def setup(self):
        self.encoder = Encoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            dtype=self.dtype, name="encoder",
        )
        self.decoder = Decoder(
            self.block_out_channels, self.layers_per_block, self.latent_channels,
            dtype=self.dtype, name="decoder",
        )
        # The normalization RIDES IN THE CHECKPOINT as a (non-trainable)
        # variable collection, initialized from the static attributes: a
        # fit run calibrated via CLI flags saves its scale/shift, and a
        # later predict/test restores them without re-passing the flags —
        # otherwise a silently mismatched normalization between fit and
        # predict decodes garbage while every loss looks healthy.
        c = (self.latent_channels,)
        self._scale_var = self.variable(
            "latent_norm", "scale",
            lambda: jnp.broadcast_to(
                jnp.asarray(self.latent_scale, jnp.float32), c
            ),
        )
        self._shift_var = self.variable(
            "latent_norm", "shift",
            lambda: jnp.broadcast_to(
                jnp.asarray(self.latent_shift, jnp.float32), c
            ),
        )

    def encode(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_latent(self, x, rng):
        """Sample from the posterior and normalize with the latent
        scale/shift (reference encode_image, PanoGenerator.py:213-225):
        z' = (z - shift) * scale. With the default shift 0 this is exactly
        the SD z*0.18215 convention (x - 0.0 == x bitwise for floats)."""
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        z = z - self._shift_var.value.astype(z.dtype)
        return z * self._scale_var.value.astype(z.dtype)

    def decode(self, z):
        z = z / self._scale_var.value.astype(z.dtype)
        z = z + self._shift_var.value.astype(z.dtype)
        return self.decoder(z)

    def __call__(self, x, rng):
        z = self.sample_latent(x, rng)
        return self.decode(z)
