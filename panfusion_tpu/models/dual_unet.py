"""PanFusion's dual-branch denoiser: two SD2 UNets in lockstep + EPP warps.

Re-design of the reference MultiViewBaseModel traversal
(models/pano/MVGenModel.py:8-297): the perspective branch runs batched over
(b*m) views, the panorama branch wraps every conv with width-circular
padding (pad/unpad schedule of MVGenModel.py:87-294), and the two exchange
information through 7 WarpAttn blocks — after each encoder downsample,
at the mid block, and before each decoder upsample.

Everything is one flax module so the whole traversal jits as a single XLA
program; EPP masks arrive as precomputed ``EPPSite`` inputs (see
panfusion_tpu/models/epp.py). NHWC; the pano width axis is axis 2.

ControlNet residual injection points match the reference
(MVGenModel.py:154-170, 200-203): down-block residuals add to the skip
stack, the mid residual adds after the mid block.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.epp import EPPSite, WarpAttn
from ..nn.unet import UNet2DCondition


def pad_w(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Circular pad of the NHWC width axis."""
    if p <= 0:
        return x
    return jnp.concatenate([x[:, :, -p:], x, x[:, :, :p]], axis=2)


def unpad_w(x: jnp.ndarray, p: int) -> jnp.ndarray:
    if p <= 0:
        return x
    return x[:, :, p:-p]


class DualUNet(nn.Module):
    """unet (perspective, optional) + pano_unet + 7 WarpAttn blocks.

    With ``use_pers_branch=False`` this degrades to the PanoOnly ablation
    (reference models/pano/PanoOnly.py: MultiViewBaseModel(None, pano_unet)).
    """

    use_pers_branch: bool = True
    pano_pad: bool = True
    lora_rank: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: Sequence[int] = (5, 10, 20, 20)
    dim_head: int = 64
    context_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            heads=self.heads,
            dim_head=self.dim_head,
            context_dim=self.context_dim,
            lora_rank=self.lora_rank,
            dtype=self.dtype,
        )
        self.pano_unet = UNet2DCondition(**kw, name="pano_unet")
        if self.use_pers_branch:
            self.unet = UNet2DCondition(**kw, name="unet")
            ch = self.block_out_channels
            # encoder warp dims = downsampler out channels (ch[0..2]);
            # mid = ch[-1]; decoder = upsampler channels reversed(ch)[0..2]
            self.cp_blocks_encoder = tuple(
                WarpAttn(ch[i], dtype=self.dtype, name=f"cp_blocks_encoder_{i}")
                for i in range(len(ch) - 1)
            )
            self.cp_blocks_mid = WarpAttn(ch[-1], dtype=self.dtype, name="cp_blocks_mid")
            rev = list(reversed(list(ch)))
            self.cp_blocks_decoder = tuple(
                WarpAttn(rev[i], dtype=self.dtype, name=f"cp_blocks_decoder_{i}")
                for i in range(len(ch) - 1)
            )

    def _pano_resnet(self, resnet, x, temb):
        if self.pano_pad:
            return unpad_w(resnet(pad_w(x, 2), temb), 2)
        return resnet(x, temb)

    def __call__(
        self,
        pers_latents: Optional[jnp.ndarray],  # (b, m, ph, pw, 4)
        pano_latent: jnp.ndarray,  # (b, eh, ew, 4)
        timesteps: jnp.ndarray,  # (b,)
        pers_ctx: Optional[jnp.ndarray],  # (b, m, L, C)
        pano_ctx: jnp.ndarray,  # (b, L, C)
        sites: Optional[List[EPPSite]] = None,
        pers_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        pano_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        pers_mid_residual: Optional[jnp.ndarray] = None,
        pano_mid_residual: Optional[jnp.ndarray] = None,
    ):
        pano = pano_latent
        b = pano.shape[0]
        use_pers = self.use_pers_branch and pers_latents is not None

        pano_temb = self.pano_unet.time_embed(timesteps)

        if use_pers:
            n_sites = 2 * (len(self.block_out_channels) - 1) + 1
            if sites is None or len(sites) != n_sites:
                raise ValueError(
                    f"the perspective branch needs {n_sites} EPP sites "
                    f"(got {None if sites is None else len(sites)}); build "
                    "them with models.epp.build_epp_sites(n_levels="
                    f"{len(self.block_out_channels)})"
                )
            m = pers_latents.shape[1]
            x = pers_latents.reshape(b * m, *pers_latents.shape[2:])
            ctx = pers_ctx.reshape(b * m, *pers_ctx.shape[2:])
            temb = self.unet.time_embed(jnp.repeat(timesteps, m))
            site_it = iter(sites)

        # conv_in
        if use_pers:
            x = self.unet.conv_in(x)
            skips = [x]
        if self.pano_pad:
            pano = unpad_w(self.pano_unet.conv_in(pad_w(pano, 1)), 1)
        else:
            pano = self.pano_unet.conv_in(pano)
        pano_skips = [pano]

        # encoder: the pers branch runs whole SD2 down blocks (one source
        # of block semantics, nn/unet.py DownBlock); only the pano branch
        # needs the custom per-resnet circular-pad traversal
        for i, pano_block in enumerate(self.pano_unet.down_blocks):
            if use_pers:
                x, blk_skips = self.unet.down_blocks[i](x, temb, ctx)
                skips.extend(blk_skips)
            n_res = len(pano_block.resnets)
            for j in range(n_res):
                pano = self._pano_resnet(pano_block.resnets[j], pano, pano_temb)
                if pano_block.attentions is not None:
                    pano = pano_block.attentions[j](pano, pano_ctx)
                pano_skips.append(pano)
            if pano_block.downsamplers is not None:
                if self.pano_pad:
                    pano = unpad_w(pano_block.downsamplers[0](pad_w(pano, 2)), 1)
                else:
                    pano = pano_block.downsamplers[0](pano)
                pano_skips.append(pano)
                if use_pers:
                    x, pano = self.cp_blocks_encoder[i](x, pano, next(site_it))

        # ControlNet encoder residuals (counts must match or the up-path
        # skip stack silently corrupts)
        if use_pers and pers_residuals is not None:
            if len(pers_residuals) != len(skips):
                raise ValueError(
                    f"{len(pers_residuals)} pers residuals for "
                    f"{len(skips)} skips"
                )
            skips = [s + r for s, r in zip(skips, pers_residuals)]
        if pano_residuals is not None:
            if len(pano_residuals) != len(pano_skips):
                raise ValueError(
                    f"{len(pano_residuals)} pano residuals for "
                    f"{len(pano_skips)} skips"
                )
            pano_skips = [s + r for s, r in zip(pano_skips, pano_residuals)]

        # mid
        if use_pers:
            x = self.unet.mid_block(x, temb, ctx)
        pano_mid = self.pano_unet.mid_block
        pano = self._pano_resnet(pano_mid.resnets[0], pano, pano_temb)
        pano = pano_mid.attentions[0](pano, pano_ctx)
        pano = self._pano_resnet(pano_mid.resnets[1], pano, pano_temb)

        if use_pers and pers_mid_residual is not None:
            x = x + pers_mid_residual
        if pano_mid_residual is not None:
            pano = pano + pano_mid_residual

        if use_pers:
            x, pano = self.cp_blocks_mid(x, pano, next(site_it))

        # decoder
        for i, pano_block in enumerate(self.pano_unet.up_blocks):
            n_res = len(pano_block.resnets)
            for j in range(n_res):
                if use_pers:
                    blk = self.unet.up_blocks[i]
                    x = jnp.concatenate([x, skips.pop()], axis=-1)
                    x = blk.resnets[j](x, temb)
                    if blk.attentions is not None:
                        x = blk.attentions[j](x, ctx)
                pano = jnp.concatenate([pano, pano_skips.pop()], axis=-1)
                pano = self._pano_resnet(pano_block.resnets[j], pano, pano_temb)
                if pano_block.attentions is not None:
                    pano = pano_block.attentions[j](pano, pano_ctx)
            if pano_block.upsamplers is not None:
                if use_pers:
                    x, pano = self.cp_blocks_decoder[i](x, pano, next(site_it))
                    x = self.unet.up_blocks[i].upsamplers[0](x)
                if self.pano_pad:
                    pano = unpad_w(pano_block.upsamplers[0](pad_w(pano, 1)), 2)
                else:
                    pano = pano_block.upsamplers[0](pano)

        # out
        if use_pers:
            x = nn.silu(self.unet.conv_norm_out(x))
            x = self.unet.conv_out(x)
            sample = x.reshape(b, m, *x.shape[1:])
        else:
            sample = None

        pano = nn.silu(self.pano_unet.conv_norm_out(pano))
        if self.pano_pad:
            pano = unpad_w(self.pano_unet.conv_out(pad_w(pano, 1)), 1)
        else:
            pano = self.pano_unet.conv_out(pano)
        return sample, pano
