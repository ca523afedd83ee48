"""Parameter partitioning: trainable vs frozen subtrees.

The reference trains only LoRA adapters + the 7 WarpAttn blocks on top of
frozen SD2 (models/pano/MVGenModel.py:34-36, PanoGenerator.py:132-151), with
ControlNet params at 0.1x lr when layout-conditioned (PanoGenerator.py:
153-157). Here that's a path-predicate partition over the flax param tree,
which optax masks and jax.grad respect exactly.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
from flax import traverse_util

# path substrings that mark trainable params in the PanFusion setup
LORA_PATTERN = "lora_"
WARP_PATTERN = "cp_blocks_"
CONTROLNET_PATTERN = "controlnet"


def default_trainable(path: Tuple[str, ...]) -> bool:
    joined = "/".join(path)
    return LORA_PATTERN in joined or WARP_PATTERN in joined


def full_dual_trainable(path: Tuple[str, ...]) -> bool:
    """From-scratch training: both UNets + WarpAttn blocks (everything
    under the dual model), with VAE/text towers frozen — the synthetic
    from-scratch demo's predicate (--trainer.trainable=full). The
    reference never trains this way (it adapts frozen SD2), but a
    from-random LoRA-only run cannot learn anything demonstrable."""
    return path[0] == "dual"


def full_text_trainable(path: Tuple[str, ...]) -> bool:
    """From-scratch training including the text tower
    (--trainer.trainable=full_text): both UNets + WarpAttn + the CLIP-style
    text encoder; only the VAE stays frozen (it is pretrained by the
    vae_recon stage). The reference conditions on *pretrained* frozen CLIP
    (PanoGenerator.py:116-121); a from-scratch run has no pretrained text
    tower, and conditioning through a frozen RANDOM encoder starves the
    prompt signal — round 2's noise-sample postmortem."""
    return path[0] in ("dual", "text")


def vae_trainable(path: Tuple[str, ...]) -> bool:
    """First-stage recon pretrain (--trainer.objective=vae_recon): only the
    AutoencoderKL trains; everything else is frozen ballast. The latent_norm
    calibration variables are data statistics, not weights — leaving them
    in the AdamW group would weight-decay them toward zero on every step
    despite their zero gradient (the recon loss bypasses normalization)."""
    return path[0] == "vae" and "latent_norm" not in path


def controlnet_trainable(path: Tuple[str, ...]) -> bool:
    """Layout-conditioned stage: LoRA (x1.0) + ControlNet (x0.1 via
    lr_scale_mask); WarpAttn stays frozen (the reference skips
    mv_base_model.trainable_parameters when layout_cond,
    PanFusion.py:27-28)."""
    joined = "/".join(path)
    return CONTROLNET_PATTERN in joined or "pano_cn" in joined or (
        "pers_cn" in joined
    ) or LORA_PATTERN in joined


def partition_params(params: Dict, predicate: Callable) -> Tuple[Dict, Dict]:
    """Split a nested param dict into (trainable, frozen) by path."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if predicate(k)}
    frozen = {k: v for k, v in flat.items() if not predicate(k)}
    return (
        traverse_util.unflatten_dict(train),
        traverse_util.unflatten_dict(frozen),
    )


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def lr_scale_mask(params: Dict, predicate: Callable, scale: float):
    """Per-path lr multipliers (the reference's optimizer param groups,
    PanoGenerator.py:280-293): `scale` where predicate hits, 1.0 elsewhere."""
    flat = traverse_util.flatten_dict(params)
    out = {k: (scale if predicate(k) else 1.0) for k in flat}
    return traverse_util.unflatten_dict(out)


def count_params(tree) -> int:
    import numpy as np

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
