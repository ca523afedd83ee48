"""Exact diffusers/transformers state_dict key+shape manifests for
stabilityai/stable-diffusion-2-base.

The released PanFusion checkpoint wraps these exact key names
(reference models/pano/PanoGenerator.py:116-177 loads UNet2DConditionModel,
AutoencoderKL and CLIPTextModel from 'stabilityai/stable-diffusion-2-base');
tools/convert_ckpt.py must map EVERY one. diffusers is not installed in
this environment, so the manifests are generated from the documented
diffusers module layout (UNet2DConditionModel with use_linear_projection=
True, block_out_channels (320, 640, 1280, 1280), layers_per_block 2,
cross_attention_dim 1024; AutoencoderKL with block_out_channels
(128, 256, 512, 512)) — an independent encoding of the naming contract,
NOT derived from our flax module tree. tests/test_sd2_manifest.py asserts
the converter maps every key with nothing skipped and that the converted
tree coincides leaf-for-leaf (paths AND shapes) with the live flax models.
"""
from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]


def _resnet(prefix: str, in_c: int, out_c: int, temb: int,
            out: Dict[str, Shape]):
    out[f"{prefix}.norm1.weight"] = (in_c,)
    out[f"{prefix}.norm1.bias"] = (in_c,)
    out[f"{prefix}.conv1.weight"] = (out_c, in_c, 3, 3)
    out[f"{prefix}.conv1.bias"] = (out_c,)
    if temb:
        out[f"{prefix}.time_emb_proj.weight"] = (out_c, temb)
        out[f"{prefix}.time_emb_proj.bias"] = (out_c,)
    out[f"{prefix}.norm2.weight"] = (out_c,)
    out[f"{prefix}.norm2.bias"] = (out_c,)
    out[f"{prefix}.conv2.weight"] = (out_c, out_c, 3, 3)
    out[f"{prefix}.conv2.bias"] = (out_c,)
    if in_c != out_c:
        out[f"{prefix}.conv_shortcut.weight"] = (out_c, in_c, 1, 1)
        out[f"{prefix}.conv_shortcut.bias"] = (out_c,)


def _attn_block(prefix: str, c: int, ctx: int, out: Dict[str, Shape],
                lora_rank: int = 0):
    """Transformer2DModel with use_linear_projection=True (SD2): proj_in/
    proj_out are Linear, one BasicTransformerBlock with self-attn (attn1),
    cross-attn to text (attn2), GEGLU FF."""
    out[f"{prefix}.norm.weight"] = (c,)
    out[f"{prefix}.norm.bias"] = (c,)
    out[f"{prefix}.proj_in.weight"] = (c, c)
    out[f"{prefix}.proj_in.bias"] = (c,)
    tb = f"{prefix}.transformer_blocks.0"
    for norm in ("norm1", "norm2", "norm3"):
        out[f"{tb}.{norm}.weight"] = (c,)
        out[f"{tb}.{norm}.bias"] = (c,)
    for attn, kv in (("attn1", c), ("attn2", ctx)):
        out[f"{tb}.{attn}.to_q.weight"] = (c, c)
        out[f"{tb}.{attn}.to_k.weight"] = (c, kv)
        out[f"{tb}.{attn}.to_v.weight"] = (c, kv)
        out[f"{tb}.{attn}.to_out.0.weight"] = (c, c)
        out[f"{tb}.{attn}.to_out.0.bias"] = (c,)
        if lora_rank:
            for proj, in_dim in (("to_q", c), ("to_k", kv), ("to_v", kv),
                                 ("to_out", c)):
                p = f"{tb}.{attn}.processor.{proj}_lora"
                out[f"{p}.down.weight"] = (lora_rank, in_dim)
                out[f"{p}.up.weight"] = (c, lora_rank)
    out[f"{tb}.ff.net.0.proj.weight"] = (8 * c, c)
    out[f"{tb}.ff.net.0.proj.bias"] = (8 * c,)
    out[f"{tb}.ff.net.2.weight"] = (c, 4 * c)
    out[f"{tb}.ff.net.2.bias"] = (c,)
    out[f"{prefix}.proj_out.weight"] = (c, c)
    out[f"{prefix}.proj_out.bias"] = (c,)


def sd2_unet_keys(lora_rank: int = 0) -> Dict[str, Shape]:
    """UNet2DConditionModel(SD2-base) state_dict manifest. With lora_rank,
    includes the diffusers LoRAAttnProcessor keys the reference training
    adds (PanoGenerator.py:132-151, rank 4)."""
    ch = (320, 640, 1280, 1280)
    temb = 1280
    ctx = 1024
    out: Dict[str, Shape] = {}
    out["conv_in.weight"] = (ch[0], 4, 3, 3)
    out["conv_in.bias"] = (ch[0],)
    out["time_embedding.linear_1.weight"] = (temb, ch[0])
    out["time_embedding.linear_1.bias"] = (temb,)
    out["time_embedding.linear_2.weight"] = (temb, temb)
    out["time_embedding.linear_2.bias"] = (temb,)

    # down path; skip-connection channel stack for the up path
    skips = [ch[0]]
    in_c = ch[0]
    for i, c in enumerate(ch):
        cross = i < 3  # CrossAttnDownBlock2D x3 + DownBlock2D
        for j in range(2):
            _resnet(f"down_blocks.{i}.resnets.{j}", in_c if j == 0 else c,
                    c, temb, out)
            if cross:
                _attn_block(f"down_blocks.{i}.attentions.{j}", c, ctx, out,
                            lora_rank)
            skips.append(c)
            in_c = c
        if i < 3:
            out[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (c, c, 3, 3)
            out[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (c,)
            skips.append(c)

    _attn_block("mid_block.attentions.0", ch[-1], ctx, out, lora_rank)
    _resnet("mid_block.resnets.0", ch[-1], ch[-1], temb, out)
    _resnet("mid_block.resnets.1", ch[-1], ch[-1], temb, out)

    prev = ch[-1]
    up_ch = list(reversed(ch))  # (1280, 1280, 640, 320)
    for i, c in enumerate(up_ch):
        cross = i > 0  # UpBlock2D + CrossAttnUpBlock2D x3
        for j in range(3):
            skip = skips.pop()
            _resnet(f"up_blocks.{i}.resnets.{j}", prev + skip, c, temb, out)
            if cross:
                _attn_block(f"up_blocks.{i}.attentions.{j}", c, ctx, out,
                            lora_rank)
            prev = c
        if i < 3:
            out[f"up_blocks.{i}.upsamplers.0.conv.weight"] = (c, c, 3, 3)
            out[f"up_blocks.{i}.upsamplers.0.conv.bias"] = (c,)

    out["conv_norm_out.weight"] = (ch[0],)
    out["conv_norm_out.bias"] = (ch[0],)
    out["conv_out.weight"] = (4, ch[0], 3, 3)
    out["conv_out.bias"] = (4,)
    return out


def _vae_attn(prefix: str, c: int, out: Dict[str, Shape]):
    """AutoencoderKL mid-block Attention (diffusers >=0.18 spelling)."""
    out[f"{prefix}.group_norm.weight"] = (c,)
    out[f"{prefix}.group_norm.bias"] = (c,)
    for proj in ("to_q", "to_k", "to_v"):
        out[f"{prefix}.{proj}.weight"] = (c, c)
        out[f"{prefix}.{proj}.bias"] = (c,)
    out[f"{prefix}.to_out.0.weight"] = (c, c)
    out[f"{prefix}.to_out.0.bias"] = (c,)


def sd2_vae_keys() -> Dict[str, Shape]:
    """AutoencoderKL (SD2, 512) state_dict manifest."""
    ch = (128, 256, 512, 512)
    lat = 4
    out: Dict[str, Shape] = {}

    out["encoder.conv_in.weight"] = (ch[0], 3, 3, 3)
    out["encoder.conv_in.bias"] = (ch[0],)
    in_c = ch[0]
    for i, c in enumerate(ch):
        for j in range(2):
            _resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else c, c, 0, out)
            in_c = c
        if i < 3:
            out[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = \
                (c, c, 3, 3)
            out[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (c,)
    _resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1], 0, out)
    _vae_attn("encoder.mid_block.attentions.0", ch[-1], out)
    _resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1], 0, out)
    out["encoder.conv_norm_out.weight"] = (ch[-1],)
    out["encoder.conv_norm_out.bias"] = (ch[-1],)
    out["encoder.conv_out.weight"] = (2 * lat, ch[-1], 3, 3)
    out["encoder.conv_out.bias"] = (2 * lat,)
    out["quant_conv.weight"] = (2 * lat, 2 * lat, 1, 1)
    out["quant_conv.bias"] = (2 * lat,)

    out["post_quant_conv.weight"] = (lat, lat, 1, 1)
    out["post_quant_conv.bias"] = (lat,)
    out["decoder.conv_in.weight"] = (ch[-1], lat, 3, 3)
    out["decoder.conv_in.bias"] = (ch[-1],)
    _resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1], 0, out)
    _vae_attn("decoder.mid_block.attentions.0", ch[-1], out)
    _resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1], 0, out)
    prev = ch[-1]
    for i, c in enumerate(reversed(ch)):  # (512, 512, 256, 128)
        for j in range(3):
            _resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                    prev if j == 0 else c, c, 0, out)
            prev = c
        if i < 3:
            out[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = \
                (c, c, 3, 3)
            out[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (c,)
    out["decoder.conv_norm_out.weight"] = (ch[0],)
    out["decoder.conv_norm_out.bias"] = (ch[0],)
    out["decoder.conv_out.weight"] = (3, ch[0], 3, 3)
    out["decoder.conv_out.bias"] = (3,)
    return out


def sd2_clip_text_keys() -> Dict[str, Shape]:
    """transformers CLIPTextModel (SD2: hidden 1024, 23 layers) manifest —
    generated from the installed transformers library itself in
    tests/test_sd2_manifest.py; this static copy documents the surface."""
    h, inter, layers, pos, vocab = 1024, 4096, 23, 77, 49408
    out: Dict[str, Shape] = {
        "text_model.embeddings.token_embedding.weight": (vocab, h),
        "text_model.embeddings.position_embedding.weight": (pos, h),
        "text_model.final_layer_norm.weight": (h,),
        "text_model.final_layer_norm.bias": (h,),
    }
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out[f"{p}.self_attn.{proj}.weight"] = (h, h)
            out[f"{p}.self_attn.{proj}.bias"] = (h,)
        for ln in ("layer_norm1", "layer_norm2"):
            out[f"{p}.{ln}.weight"] = (h,)
            out[f"{p}.{ln}.bias"] = (h,)
        out[f"{p}.mlp.fc1.weight"] = (inter, h)
        out[f"{p}.mlp.fc1.bias"] = (inter,)
        out[f"{p}.mlp.fc2.weight"] = (h, inter)
        out[f"{p}.mlp.fc2.bias"] = (h,)
    return out
