"""ControlNet in flax (NHWC) — the layout-conditioning branch.

Parity with diffusers ``ControlNetModel.from_unet`` as the reference uses it
(models/pano/PanoGenerator.py:153-157, conditioning via the rendered layout
distance map, dataset/PanoDataset.py:155-168): a copy of the UNet encoder
(conv_in, time embedding, down blocks, mid block) plus

* a conditioning embedder: 3-channel cond image -> stride-2 conv pyramid
  (16, 32, 96, 256) -> zero-init projection added to conv_in's output;
* one zero-init 1x1 "zero conv" per skip connection and one for the mid
  block, so the branch starts as an exact no-op.

Outputs (down_block_residuals tuple, mid_residual) that the dual traversal
adds to the base UNet's skips (models/dual_unet.py, reference
MVGenModel.py:154-170, 200-203).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import TimestepEmbedding, timestep_embedding
from .unet import DownBlock, MidBlock


class ControlNetConditioningEmbedding(nn.Module):
    """cond image (b, 8h, 8w, 3) -> (b, h, w, ch0) feature (diffusers
    ControlNetConditioningEmbedding: silu conv chain, zero conv out)."""

    out_channels: int
    block_out_channels: Sequence[int] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        ch = self.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(ch) - 1):
            x = nn.Conv(ch[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i}")(x)
            x = nn.silu(x)
            x = nn.Conv(ch[i + 1], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i + 1}")(x)
            x = nn.silu(x)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_out",
        )(x)


class ControlNet(nn.Module):
    """UNet-encoder copy + zero convs. Same architecture hyper-parameters as
    the paired UNet2DCondition so from_unet weight copying is 1:1."""

    in_channels: int = 4
    cond_channels: int = 3
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: Sequence[int] = (5, 10, 20, 20)
    dim_head: int = 64
    context_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ch = self.block_out_channels
        self.conv_in = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                               name="conv_in")
        self.time_embedding = TimestepEmbedding(
            ch[0] * 4, dtype=self.dtype, name="time_embedding"
        )
        self.cond_embedding = ControlNetConditioningEmbedding(
            ch[0], dtype=self.dtype, name="controlnet_cond_embedding"
        )

        down = []
        for i, c in enumerate(ch):
            is_last = i == len(ch) - 1
            down.append(
                DownBlock(
                    out_channels=c,
                    num_layers=self.layers_per_block,
                    heads=0 if is_last else self.heads[i],
                    dim_head=self.dim_head,
                    context_dim=self.context_dim,
                    add_downsample=not is_last,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )
            )
        self.down_blocks = tuple(down)
        self.mid_block = MidBlock(
            ch[-1], self.heads[-1], self.dim_head, self.context_dim,
            dtype=self.dtype, name="mid_block",
        )

        zero = dict(kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype)
        n_skips = 1 + sum(
            self.layers_per_block + (0 if i == len(ch) - 1 else 1)
            for i in range(len(ch))
        )
        skip_ch = [ch[0]]
        for i, c in enumerate(ch):
            skip_ch += [c] * self.layers_per_block
            if i != len(ch) - 1:
                skip_ch += [c]
        assert len(skip_ch) == n_skips
        self.controlnet_down_blocks = tuple(
            nn.Conv(c, (1, 1), **zero, name=f"controlnet_down_blocks_{i}")
            for i, c in enumerate(skip_ch)
        )
        self.controlnet_mid_block = nn.Conv(
            ch[-1], (1, 1), **zero, name="controlnet_mid_block"
        )

    def __call__(
        self,
        sample: jnp.ndarray,       # (b, h, w, 4) noisy latent
        timesteps: jnp.ndarray,    # (b,)
        encoder_hidden_states: jnp.ndarray,
        cond: jnp.ndarray,         # (b, 8h, 8w, cond_channels)
        conditioning_scale: float = 1.0,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.block_out_channels[0]).astype(
                self.dtype
            )
        )
        x = self.conv_in(sample) + self.cond_embedding(cond)
        skips = [x]
        for block in self.down_blocks:
            x, s = block(x, temb, encoder_hidden_states)
            skips.extend(s)
        x = self.mid_block(x, temb, encoder_hidden_states)

        down_res = tuple(
            zero_conv(s) * conditioning_scale
            for zero_conv, s in zip(self.controlnet_down_blocks, skips)
        )
        mid_res = self.controlnet_mid_block(x) * conditioning_scale
        return down_res, mid_res
