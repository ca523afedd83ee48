"""SD2 UNet2DCondition in flax.linen (NHWC), with block-level access.

Architecture parity with diffusers' UNet2DConditionModel config of
stabilityai/stable-diffusion-2-base (reference loads it in
models/pano/PanoGenerator.py:159-163): block_out_channels (320, 640, 1280,
1280), 2 layers/block, cross_attention_dim 1024, heads (5, 10, 20, 20) with
dim_head 64, linear transformer projections.

Design: unlike diffusers' monolithic ``forward``, every block (resnets /
attentions / samplers) is an addressable submodule so the PanFusion dual
traversal (reference models/pano/MVGenModel.py:38-297) can step the pano and
perspective UNets in lockstep with circularly padded pano convs and WarpAttn
exchanges in between, all inside one jitted function.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    Downsample,
    FastGroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedding,
    Upsample,
    timestep_embedding,
)


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    heads: int = 0  # 0 => no cross attention
    dim_head: int = 64
    context_dim: Optional[int] = None
    add_downsample: bool = True
    lora_rank: int = 0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer
        self.resnets = tuple(
            Res(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")
            for i in range(self.num_layers)
        )
        if self.heads:
            self.attentions = tuple(
                Attn(
                    self.out_channels, self.heads, self.dim_head, 1,
                    self.context_dim, self.lora_rank, dtype=self.dtype,
                    name=f"attentions_{i}",
                )
                for i in range(self.num_layers)
            )
        else:
            self.attentions = None
        self.downsamplers = (
            (Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0"),)
            if self.add_downsample
            else None
        )

    def __call__(self, x, temb, context=None):
        skips = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    channels: int
    heads: int
    dim_head: int = 64
    context_dim: Optional[int] = None
    lora_rank: int = 0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer
        self.resnets = (
            Res(self.channels, dtype=self.dtype, name="resnets_0"),
            Res(self.channels, dtype=self.dtype, name="resnets_1"),
        )
        self.attentions = (
            Attn(
                self.channels, self.heads, self.dim_head, 1, self.context_dim,
                self.lora_rank, dtype=self.dtype, name="attentions_0",
            ),
        )

    def __call__(self, x, temb, context=None):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        x = self.resnets[1](x, temb)
        return x


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int = 3
    heads: int = 0
    dim_head: int = 64
    context_dim: Optional[int] = None
    add_upsample: bool = True
    lora_rank: int = 0
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(SpatialTransformer) if self.remat else SpatialTransformer
        self.resnets = tuple(
            Res(self.out_channels, dtype=self.dtype, name=f"resnets_{i}")
            for i in range(self.num_layers)
        )
        if self.heads:
            self.attentions = tuple(
                Attn(
                    self.out_channels, self.heads, self.dim_head, 1,
                    self.context_dim, self.lora_rank, dtype=self.dtype,
                    name=f"attentions_{i}",
                )
                for i in range(self.num_layers)
            )
        else:
            self.attentions = None
        self.upsamplers = (
            (Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0"),)
            if self.add_upsample
            else None
        )

    def __call__(self, x, skips, temb, context=None):
        for i, resnet in enumerate(self.resnets):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = resnet(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNet2DCondition(nn.Module):
    """The SD2 denoiser. NHWC in/out: (b, h, w, 4)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: Sequence[int] = (5, 10, 20, 20)
    dim_head: int = 64
    context_dim: int = 1024
    lora_rank: int = 0
    # rematerialize resnet/attention blocks in the backward pass (the
    # reference enables gradient checkpointing on both UNets,
    # PanoGenerator.py:164); no-op for inference
    remat: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ch = self.block_out_channels
        self.conv_in = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")
        self.time_embedding = TimestepEmbedding(ch[0] * 4, dtype=self.dtype, name="time_embedding")

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
                    lora_rank=self.lora_rank,
                    remat=self.remat,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )
            )
        self.down_blocks = tuple(down)

        self.mid_block = MidBlock(
            ch[-1], self.heads[-1], self.dim_head, self.context_dim,
            self.lora_rank, remat=self.remat, dtype=self.dtype,
            name="mid_block",
        )

        up = []
        rev = list(reversed(ch))  # (1280, 1280, 640, 320)
        rev_heads = list(reversed(list(self.heads)))
        for i, c in enumerate(rev):
            is_first = i == 0
            is_last = i == len(rev) - 1
            up.append(
                UpBlock(
                    out_channels=c,
                    num_layers=self.layers_per_block + 1,
                    heads=0 if is_first else rev_heads[i],
                    dim_head=self.dim_head,
                    context_dim=self.context_dim,
                    add_upsample=not is_last,
                    lora_rank=self.lora_rank,
                    remat=self.remat,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )
            )
        self.up_blocks = tuple(up)

        from .layers import _num_groups

        self.conv_norm_out = FastGroupNorm(
            num_groups=_num_groups(ch[0]), epsilon=1e-5, dtype=self.dtype,
            name="conv_norm_out",
        )
        self.conv_out = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )

    def time_embed(self, timesteps):
        t_emb = timestep_embedding(timesteps, self.block_out_channels[0])
        return self.time_embedding(t_emb.astype(self.dtype))

    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        temb = self.time_embed(timesteps)
        ctx = encoder_hidden_states

        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            x, s = block(x, temb, ctx)
            skips.extend(s)

        if down_block_additional_residuals is not None:
            if len(down_block_additional_residuals) != len(skips):
                raise ValueError(
                    f"{len(down_block_additional_residuals)} down-block "
                    f"residuals for {len(skips)} skips (diffusers includes "
                    "the conv_in activation as the first residual)"
                )
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]

        x = self.mid_block(x, temb, ctx)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual

        for block in self.up_blocks:
            n = len(block.resnets)
            x = block(x, skips[-n:], temb, ctx)
            del skips[-n:]

        x = nn.silu(self.conv_norm_out(x))
        return self.conv_out(x)
