#!/usr/bin/env python
"""torch -> JAX weight conversion for panfusion-tpu.

Converts the pretrained weights the reference stack depends on into this
framework's flax param trees / npz files:

* SD2 components (stabilityai/stable-diffusion-2-base): diffusers
  UNet2DConditionModel -> nn/unet.py, AutoencoderKL -> nn/vae.py,
  transformers CLIPTextModel -> nn/clip.py;
* a PanFusion lightning checkpoint (e.g. the released 4142dlo4 last.ckpt):
  dual-UNet + LoRA adapters + WarpAttn EPP blocks, including the legacy
  LoRA key remap ``to_q.lora_layer -> processor.to_q_lora`` the reference
  applies on load (models/pano/PanoGenerator.py:101-107);
* torchvision InceptionV3 -> weights/inception_v3.npz (FID/IS),
  CLIP ViT-B/16 towers -> weights/clip_vision.npz / clip_text.npz;
* HorizonNet resnet50_rnn -> models/horizonnet.py variables.

Inputs are plain state_dict files (.pt/.pth/.ckpt via torch.load, or
.safetensors) — no diffusers dependency. Outputs are orbax/msgpack trees
via train/checkpoints.py or flat .npz.

Usage:
  python tools/convert_ckpt.py unet   sd2_unet.safetensors  out_dir/
  python tools/convert_ckpt.py vae    sd2_vae.safetensors   out_dir/
  python tools/convert_ckpt.py clip   sd2_text.safetensors  out_dir/
  python tools/convert_ckpt.py panfusion last.ckpt          out_dir/
  python tools/convert_ckpt.py inception inception_v3.pth   weights/
  python tools/convert_ckpt.py horizonnet resnet50_rnn.pth  weights/
"""
from __future__ import annotations

import os
import re
import sys
from typing import Dict

import numpy as np


# ---------------------------------------------------------------- loading
def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


# ---------------------------------------------------------------- helpers
def t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t_dense(w: np.ndarray) -> np.ndarray:
    """torch linear (O, I) -> flax (I, O)."""
    return np.transpose(w, (1, 0))


def put(tree: Dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def apply_legacy_lora_remap(key: str) -> str:
    """The reference's on-load remap of old-style diffusers LoRA keys
    (PanoGenerator.py:101-107): ``X.lora_layer.`` -> ``processor.X_lora.``
    for X in to_q/to_k/to_v/to_out.0 — normalize everything to the
    ``processor.*_lora`` spelling first, then convert."""
    m = re.search(r"\.(to_q|to_k|to_v|to_out\.0)\.lora_layer\.", key)
    if not m:
        return key
    name = m.group(1).replace("to_out.0", "to_out")
    head, tail = key.split(m.group(0), 1)
    return f"{head}.processor.{name}_lora.{tail}"


# ---------------------------------------------------------------- UNet
def convert_unet(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """diffusers UNet2DConditionModel state_dict -> nn/unet.py params."""
    params: Dict = {}
    skipped = []
    for key, w in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        key = apply_legacy_lora_remap(key)
        path = _unet_key(key)
        if path is None:
            skipped.append(key)
            continue
        value = w
        if path.endswith("kernel"):
            value = t_conv(w) if w.ndim == 4 else t_dense(w)
        put(params, path, value)
    if skipped:
        print(f"  unet: skipped {len(skipped)} keys (e.g. {skipped[:3]})")
    return params


def _unet_key(key: str):
    """One diffusers UNet state_dict key -> our param path (or None)."""
    k = key
    # LoRA processors: ...attn1.processor.to_q_lora.down.weight
    m = re.match(
        r"(.*)\.processor\.(to_q|to_k|to_v|to_out)_lora\.(down|up)\.weight$", k
    )
    if m:
        base = _unet_key(f"{m.group(1)}.{m.group(2)}.weight")
        if base is None:
            return None
        return base.replace(
            "/base/kernel", f"/lora_{m.group(3)}/kernel"
        )

    k = k.replace("transformer_blocks.0.", "blocks_0.")
    k = re.sub(r"\bff\.net\.0\.", "ff.net_0.", k)
    k = re.sub(r"\bff\.net\.2\.", "ff.net_2.", k)
    k = re.sub(r"\bto_out\.0\.", "to_out.", k)
    k = re.sub(r"(down_blocks|up_blocks)\.(\d+)\.", r"\1_\2.", k)
    k = re.sub(r"(resnets|attentions|downsamplers|upsamplers)\.(\d+)\.",
               r"\1_\2.", k)
    k = k.replace("mid_block.", "mid_block.")

    leaf_map = {"weight": None, "bias": "bias"}
    parts = k.split(".")
    leaf = parts[-1]
    stem = "/".join(parts[:-1])
    if leaf not in leaf_map:
        return None

    norm_like = re.search(
        r"(norm|conv_norm_out|group_norm)(\d)?$", parts[-2]
    ) or parts[-2] in ("norm1", "norm2", "norm3", "norm")
    lora_wrapped = (
        parts[-2] in ("to_q", "to_k", "to_v", "to_out") and "blocks_0" in stem
    )
    if leaf == "weight":
        if norm_like:
            return f"{stem}/scale"
        if lora_wrapped:
            return f"{stem}/base/kernel"  # LoRADense wrapper
        return f"{stem}/kernel"
    if lora_wrapped:
        return f"{stem}/base/bias"
    return f"{stem}/bias"


# ---------------------------------------------------------------- VAE
def convert_vae(sd: Dict[str, np.ndarray], n_down: int = 4) -> Dict:
    """diffusers AutoencoderKL -> nn/vae.py params (quant_conv lives in the
    encoder, post_quant_conv in the decoder)."""
    params: Dict = {}
    skipped = []
    for key, w in sd.items():
        path = _vae_key(key, n_down)
        if path is None:
            skipped.append(key)
            continue
        value = w
        if path.endswith("kernel"):
            value = t_conv(w) if w.ndim == 4 else t_dense(w)
        put(params, path, value)
    if skipped:
        print(f"  vae: skipped {len(skipped)} keys (e.g. {skipped[:3]})")
    return params


def _vae_key(key: str, n_down: int):
    k = key
    k = k.replace("quant_conv.", "encoder/quant_conv.") if k.startswith(
        "quant_conv."
    ) else k
    k = k.replace("post_quant_conv.", "decoder/post_quant_conv.") if k.startswith(
        "post_quant_conv."
    ) else k
    # attention key aliases across diffusers versions
    k = re.sub(r"\b(query|to_q)\.", "to_q.", k)
    k = re.sub(r"\b(key|to_k)\.", "to_k.", k)
    k = re.sub(r"\b(value|to_v)\.", "to_v.", k)
    k = re.sub(r"\b(proj_attn|to_out\.0)\.", "to_out.", k)

    m = re.match(r"(encoder|decoder)\.down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
    if m:
        k = f"{m.group(1)}/down_{m.group(2)}_res_{m.group(3)}.{m.group(4)}"
    m = re.match(r"(encoder|decoder)\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", k)
    if m:
        k = f"{m.group(1)}/down_{m.group(2)}_downsample/conv.{m.group(3)}"
    m = re.match(r"(encoder|decoder)\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", k)
    if m:
        k = f"{m.group(1)}/up_{m.group(2)}_res_{m.group(3)}.{m.group(4)}"
    m = re.match(r"(encoder|decoder)\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", k)
    if m:
        k = f"{m.group(1)}/up_{m.group(2)}_upsample/conv.{m.group(3)}"
    m = re.match(r"(encoder|decoder)\.mid_block\.resnets\.(\d+)\.(.*)", k)
    if m:
        k = f"{m.group(1)}/mid_res_{m.group(2)}.{m.group(3)}"
    m = re.match(r"(encoder|decoder)\.mid_block\.attentions\.0\.(.*)", k)
    if m:
        k = f"{m.group(1)}/mid_attn.{m.group(2)}"
    k = re.sub(r"^(encoder|decoder)\.", r"\1/", k)
    k = k.replace(".", "/")

    if k.endswith("/weight"):
        stem = k[: -len("/weight")]
        last = stem.rsplit("/", 1)[-1]
        if last.startswith("norm") or last in ("conv_norm_out", "group_norm"):
            return f"{stem}/scale"
        return f"{stem}/kernel"
    if k.endswith("/bias"):
        return k
    return None


# ---------------------------------------------------------------- CLIP
def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPTextModel -> nn/clip.py CLIPTextModel params."""
    params: Dict = {}
    proj = None
    for key, w in sd.items():
        k = key
        k = k.replace("text_model.", "")
        if k == "text_projection.weight":
            proj = t_dense(w)
            continue
        if k == "embeddings.token_embedding.weight":
            put(params, "token_embedding/embedding", w)
            continue
        if k == "embeddings.position_embedding.weight":
            put(params, "position_embedding", w)
            continue
        m = re.match(r"encoder\.layers\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.group(1), m.group(2)
            rest = rest.replace("self_attn.", "self_attn/")
            rest = rest.replace("mlp.", "")
            rest = rest.replace(".", "/")
            if rest.endswith("/weight"):
                stem = rest[: -len("/weight")]
                if "layer_norm" in stem:
                    put(params, f"layers_{i}/{stem}/scale", w)
                else:
                    put(params, f"layers_{i}/{stem}/kernel", t_dense(w))
            else:
                put(params, f"layers_{i}/{rest.replace('/bias', '')}/bias", w)
            continue
        if k.startswith("final_layer_norm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put(params, f"final_layer_norm/{leaf}", w)
    return params, proj


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict:
    """transformers CLIPVisionModelWithProjection -> nn/clip.py
    CLIPVisionModel params."""
    params: Dict = {}
    for key, w in sd.items():
        k = key.replace("vision_model.", "")
        if k == "visual_projection.weight":
            put(params, "visual_projection/kernel", t_dense(w))
        elif k == "embeddings.class_embedding":
            put(params, "class_embedding", w)
        elif k == "embeddings.position_embedding.weight":
            put(params, "position_embedding", w)
        elif k == "embeddings.patch_embedding.weight":
            put(params, "patch_embedding/kernel", t_conv(w))
        elif k.startswith("pre_layrnorm.") or k.startswith("pre_layernorm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put(params, f"pre_layernorm/{leaf}", w)
        elif k.startswith("post_layernorm."):
            leaf = "scale" if k.endswith("weight") else "bias"
            put(params, f"post_layernorm/{leaf}", w)
        else:
            m = re.match(r"encoder\.layers\.(\d+)\.(.*)", k)
            if not m:
                continue
            i, rest = m.group(1), m.group(2)
            rest = rest.replace("self_attn.", "self_attn/").replace("mlp.", "")
            rest = rest.replace(".", "/")
            if rest.endswith("/weight"):
                stem = rest[: -len("/weight")]
                if "layer_norm" in stem:
                    put(params, f"layers_{i}/{stem}/scale", w)
                else:
                    put(params, f"layers_{i}/{stem}/kernel", t_dense(w))
            else:
                put(params, f"layers_{i}/{rest.replace('/bias', '')}/bias", w)
    return params


# ---------------------------------------------------------------- inception
def convert_inception(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision inception_v3 -> flat npz mapping for
    metrics/inception.py (keys 'params/...' and 'batch_stats/...')."""
    flat: Dict[str, np.ndarray] = {}
    for key, w in sd.items():
        if key.startswith("AuxLogits"):
            continue
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            flat[f"params/{'/'.join(parts[:-1])}/kernel"] = t_conv(w)
        elif parts[-2] == "bn":
            stem = "/".join(parts[:-1])
            if parts[-1] == "weight":
                flat[f"params/{stem}/scale"] = w
            elif parts[-1] == "bias":
                flat[f"params/{stem}/bias"] = w
            elif parts[-1] == "running_mean":
                flat[f"batch_stats/{stem}/mean"] = w
            elif parts[-1] == "running_var":
                flat[f"batch_stats/{stem}/var"] = w
        elif parts[0] == "fc":
            if parts[-1] == "weight":
                flat["params/fc/kernel"] = t_dense(w)
            else:
                flat["params/fc/bias"] = w
    return flat


# ---------------------------------------------------------------- resnet/HN
def convert_resnet50(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict:
    """torchvision resnet50 (optionally under `prefix`) ->
    nn/resnet.py ResNet50Features {params, batch_stats} trees."""
    params: Dict = {}
    stats: Dict = {}

    def bn(stem_t: str, stem_f: str):
        put(params, f"{stem_f}/scale", sd[f"{stem_t}.weight"])
        put(params, f"{stem_f}/bias", sd[f"{stem_t}.bias"])
        put(stats, f"{stem_f}/mean", sd[f"{stem_t}.running_mean"])
        put(stats, f"{stem_f}/var", sd[f"{stem_t}.running_var"])

    put(params, "conv1/kernel", t_conv(sd[f"{prefix}conv1.weight"]))
    bn(f"{prefix}bn1", "bn1")
    sizes = (3, 4, 6, 3)
    for li, n in enumerate(sizes, start=1):
        for j in range(n):
            pt = f"{prefix}layer{li}.{j}"
            pf = f"layer{li}_{j}"
            put(params, f"{pf}/conv1/kernel", t_conv(sd[f"{pt}.conv1.weight"]))
            put(params, f"{pf}/conv2/conv/kernel", t_conv(sd[f"{pt}.conv2.weight"]))
            put(params, f"{pf}/conv3/kernel", t_conv(sd[f"{pt}.conv3.weight"]))
            for b in (1, 2, 3):
                bn(f"{pt}.bn{b}", f"{pf}/bn{b}")
            if f"{pt}.downsample.0.weight" in sd:
                put(params, f"{pf}/downsample_conv/kernel",
                    t_conv(sd[f"{pt}.downsample.0.weight"]))
                bn(f"{pt}.downsample.1", f"{pf}/downsample_bn")
    return {"params": params, "batch_stats": stats}


def convert_faed(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference FAED AutoEncoder (models/faed/modules.py:120-278, or a
    lightning FAED ckpt with its ``net.`` prefix, models/faed/FAED.py:21)
    -> models/faed.py FAEDAutoEncoder {params, batch_stats} variables.

    Torch module layout: `encoder.downconv1_rgb.conv2d.weight` (PanoConv),
    `encoder.downres1_rgb.conv1.conv2d.weight` + `.batchnorm1.*`
    (ResBlock), `decoder.upconv2_rgb.conv1.conv2d.*` (ConvBlock),
    `encoder.fuse.conv2d.*`, `decoder.outconv_rgb.conv2d.*`. Flax drops
    the `_rgb` suffix and nests the conv as `<name>/conv` (PanoConv) or
    `<name>/conv{1,2}/conv`."""
    if any(k.startswith("net.") for k in sd):
        sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}

    params: Dict = {}
    stats: Dict = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        parts = [p[: -len("_rgb")] if p.endswith("_rgb") else p for p in parts]
        leaf = parts[-1]
        if parts[-2] == "conv2d":
            path = "/".join(parts[:-2]) + "/conv"
            if leaf == "weight":
                put(params, f"{path}/kernel", t_conv(val))
            else:
                put(params, f"{path}/bias", val)
        elif parts[-2].startswith("batchnorm"):
            path = "/".join(parts[:-1])
            if leaf == "weight":
                put(params, f"{path}/scale", val)
            elif leaf == "bias":
                put(params, f"{path}/bias", val)
            elif leaf == "running_mean":
                put(stats, f"{path}/mean", val)
            elif leaf == "running_var":
                put(stats, f"{path}/var", val)
        else:
            raise KeyError(f"unrecognized FAED key: {key}")
    return {"params": params, "batch_stats": stats}


def convert_horizonnet(sd: Dict[str, np.ndarray]) -> Dict:
    """HorizonNet torch ckpt (resnet50 + GlobalHeightStage + biLSTM +
    linear) -> models/horizonnet.py HorizonNetCore variables.

    Note: the torch convs here are wrapped by the LR-pad rewrite
    (model.py:34-47), which replaces EVERY Conv2d module `m` with
    Sequential(pad, m): any conv key `<p>.weight` becomes `<p>.1.weight`,
    including indexed ones like `...layers.0.1.weight` (GlobalHeightStage)
    and `downsample.0.1.weight`. A wrapped conv is identified by its 4-D
    `.1.weight` tensor (a BatchNorm at a genuine Sequential index 1 has
    1-D weight), so all spellings normalize back.
    """
    wrapped = {
        k[: -len(".1.weight")]
        for k, v in sd.items()
        if k.endswith(".1.weight") and getattr(v, "ndim", 0) == 4
    }

    def unwrap(k: str) -> str:
        for suffix in (".1.weight", ".1.bias"):
            if k.endswith(suffix) and k[: -len(suffix)] in wrapped:
                return k[: -len(suffix)] + suffix[2:]
        return k

    sd = {unwrap(k): v for k, v in sd.items()}

    res = convert_resnet50(sd, prefix="feature_extractor.encoder.")
    params = {"feature_extractor": res["params"]}
    stats = {"feature_extractor": res["batch_stats"]}

    for i in range(4):
        for j in range(4):
            pt = f"reduce_height_module.ghc_lst.{i}.layer.{j}.layers"
            pf = f"ghc_{i}/c{j}"
            put(params, f"{pf}/conv/kernel", t_conv(sd[f"{pt}.0.weight"]))
            if f"{pt}.0.bias" in sd:
                put(params, f"{pf}/conv/bias", sd[f"{pt}.0.bias"])
            put(params, f"{pf}/bn/scale", sd[f"{pt}.1.weight"])
            put(params, f"{pf}/bn/bias", sd[f"{pt}.1.bias"])
            put(stats, f"{pf}/bn/mean", sd[f"{pt}.1.running_mean"])
            put(stats, f"{pf}/bn/var", sd[f"{pt}.1.running_var"])

    # biLSTM: torch gate order (i, f, g, o); flax OptimizedLSTMCell keeps
    # per-gate Dense params {i,f,g,o} x {i,h}
    for layer in (0, 1):
        for direction, name in (("", "fwd_cell"), ("_reverse", "bwd_cell")):
            w_ih = sd[f"bi_rnn.weight_ih_l{layer}{direction}"]
            w_hh = sd[f"bi_rnn.weight_hh_l{layer}{direction}"]
            b_ih = sd[f"bi_rnn.bias_ih_l{layer}{direction}"]
            b_hh = sd[f"bi_rnn.bias_hh_l{layer}{direction}"]
            H = w_hh.shape[1]
            gates = ("i", "f", "g", "o")
            for gi, g in enumerate(gates):
                sl = slice(gi * H, (gi + 1) * H)
                base = f"rnn{layer}/{name}"
                put(params, f"{base}/i{g}/kernel", t_dense(w_ih[sl]))
                put(params, f"{base}/h{g}/kernel", t_dense(w_hh[sl]))
                # flax OptimizedLSTMCell: bias lives on the recurrent
                # denses h{gate} only (i{gate} has use_bias=False)
                put(params, f"{base}/h{g}/bias", b_ih[sl] + b_hh[sl])
    put(params, "linear/kernel", t_dense(sd["linear.weight"]))
    put(params, "linear/bias", sd["linear.bias"])
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------- panfusion
def convert_panfusion_ckpt(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference lightning last.ckpt -> {dual: {params: ...}} tree:
    unet/pano_unet (+LoRA) and the 7 WarpAttn cp_blocks.

    eval_metrics.* keys are dropped (the reference strips them on save,
    PanoGenerator.py:96-99)."""
    unet_sd, pano_sd, warp_sd = {}, {}, {}
    for key, w in sd.items():
        if key.startswith("eval_metrics."):
            continue
        if key.startswith("mv_base_model.unet."):
            unet_sd[key[len("mv_base_model.unet."):]] = w
        elif key.startswith("mv_base_model.pano_unet."):
            pano_sd[key[len("mv_base_model.pano_unet."):]] = w
        elif key.startswith("mv_base_model.cp_blocks_"):
            warp_sd[key[len("mv_base_model."):]] = w

    params: Dict = {}
    if unet_sd:
        params["unet"] = convert_unet(unet_sd)
    if pano_sd:
        params["pano_unet"] = convert_unet(pano_sd)
    for key, w in warp_sd.items():
        path = _warp_key(key)
        if path is None:
            continue
        value = w
        if path.endswith("kernel"):
            value = t_dense(w) if w.ndim == 2 else t_conv(w)
        put(params, path, value)
    # wrap like the live model tree: PanFusion params are
    # {"dual": {"params": ...}, "vae": ..., "text": ...} and
    # warm_start_params merges by exact path
    return {"dual": {"params": params}}


def _warp_key(key: str):
    """cp_blocks_encoder.0.transformer.attn1.to_q.weight ->
    cp_blocks_encoder_0/transformer/attn1/to_q/base/kernel etc.

    The q/k/v projections of the EPP CrossAttention are LoRADense modules
    (kernel nested under ``base/``, nn/layers.py:79-96) even though the
    reference never adds LoRA to WarpAttn — to_out is the plain zero-init
    Dense. pe.freq_bands is a recomputed buffer, not a weight (checked
    bitwise against torch in tests/test_reference_parity.py)."""
    if key.endswith("pe.freq_bands"):
        return None
    k = re.sub(r"(cp_blocks_encoder|cp_blocks_decoder)\.(\d+)\.", r"\1_\2.", key)
    k = re.sub(r"\bto_out\.0\.", "to_out.", k)
    k = re.sub(r"\b(to_q|to_k|to_v)\.", r"\1.base.", k)
    k = re.sub(r"\bff\.net\.0\.", "ff.net_0.", k)
    k = re.sub(r"\bff\.net\.2\.", "ff.net_2.", k)
    k = k.replace(".", "/")
    if k.endswith("/weight"):
        stem = k[: -len("/weight")]
        if stem.rsplit("/", 1)[-1].startswith("norm"):
            return f"{stem}/scale"
        return f"{stem}/kernel"
    if k.endswith("/bias"):
        return k
    return None


# ---------------------------------------------------------------- main
def flatten(tree: Dict, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    sd = load_state_dict(src)
    print(f"loaded {len(sd)} tensors from {src}")
    os.makedirs(dst, exist_ok=True)

    if kind == "inception":
        np.savez(os.path.join(dst, "inception_v3.npz"), **convert_inception(sd))
    elif kind == "clip":
        params, proj = convert_clip_text(sd)
        flat = flatten({"params": params})
        if proj is not None:
            flat["text_projection"] = proj
        np.savez(os.path.join(dst, "clip_text.npz"), **flat)
    elif kind == "clip_vision":
        np.savez(
            os.path.join(dst, "clip_vision.npz"),
            **flatten({"params": convert_clip_vision(sd)}),
        )
    else:
        converters = {
            "unet": lambda: {"params": convert_unet(sd)},
            "vae": lambda: {"params": convert_vae(sd)},
            "panfusion": lambda: convert_panfusion_ckpt(sd),
            "horizonnet": lambda: convert_horizonnet(sd),
            "faed": lambda: convert_faed(sd),
            "resnet50": lambda: convert_resnet50(sd),
        }
        tree = converters[kind]()
        from panfusion_tpu.train.checkpoints import CheckpointManager

        CheckpointManager(dst).save(tree, name=kind)
        print(f"saved {kind} tree -> {dst}")


if __name__ == "__main__":
    main()
