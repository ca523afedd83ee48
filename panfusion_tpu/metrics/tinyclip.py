"""TinyCLIP: a trained-from-scratch stand-in for the CLIP-Score slot.

The reference's CLIP-Score runs openai/clip-vit-base-patch16 through
torchmetrics CLIPScore (reference models/pano/EvalPanoGen.py:33,85-169).
With no network egress those weights cannot exist here, so the committed
sweeps scored CS = 0.0 off random towers. Same remedy as RoomNet/FAED/
TinyCaptioner: a small dual-encoder trained offline with InfoNCE on
(pano, caption) pairs from the synthetic-rooms generator, loaded into the
CLIP image/text slots by metrics/image_metrics.py when
``weights/tinyclip.npz`` exists (real CLIP weights still take priority).

The text tower hashes whitespace words into a small embedding table — the
generator's caption grammar ("a synthetic room with <wall> walls, one
<accent> wall and a checkered <floor> floor") is closed-vocabulary, so a
49k-token BPE would be dead weight; hashing keeps the tower CPU-trainable
while remaining honest about what it is (a stand-in, reported as
``cs_feature_slot: tinyclip`` in the sweep summary).
"""
from __future__ import annotations

import os
from typing import List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WEIGHTS_PATH = os.path.join("weights", "tinyclip.npz")

EMBED_DIM = 128
VOCAB_HASH = 1024
MAX_WORDS = 24
INPUT_EDGE = 128


class TinyCLIPImage(nn.Module):
    width: int = 24

    @nn.compact
    def __call__(self, x):  # (b, 128, 128, 3) in [-1, 1]
        for i in range(4):
            ch = self.width * (2 ** i)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"down{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, ch), name=f"gn{i}")(x)
            x = nn.silu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(EMBED_DIM, name="proj")(x)


class TinyCLIPText(nn.Module):
    @nn.compact
    def __call__(self, ids):  # (b, MAX_WORDS) int32, 0 = pad
        emb = nn.Embed(VOCAB_HASH, EMBED_DIM, name="embed")(ids)
        mask = (ids > 0)[..., None].astype(emb.dtype)
        pooled = (emb * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
        h = nn.silu(nn.Dense(EMBED_DIM * 2, name="mlp1")(pooled))
        return nn.Dense(EMBED_DIM, name="proj")(h)


def hash_words(texts: List[str]) -> np.ndarray:
    """Deterministic word-hash tokenizer (FNV-1a mod VOCAB_HASH-1, +1 so
    0 stays the pad id)."""
    out = np.zeros((len(texts), MAX_WORDS), np.int32)
    for i, t in enumerate(texts):
        for j, word in enumerate(t.lower().split()[:MAX_WORDS]):
            h = 2166136261
            for ch in word.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            out[i, j] = h % (VOCAB_HASH - 1) + 1
    return out


def tinyclip_image_preprocess(images_uint8: np.ndarray) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(images_uint8), INPUT_EDGE, INPUT_EDGE, 3),
                   np.float32)
    for i, im in enumerate(images_uint8):
        out[i] = np.asarray(
            Image.fromarray(np.asarray(im, np.uint8)).resize(
                (INPUT_EDGE, INPUT_EDGE), Image.BILINEAR),
            np.float32,
        )
    return out / 127.5 - 1.0


def save_tinyclip(image_vars, text_vars, logit_scale,
                  path: str = WEIGHTS_PATH) -> None:
    from flax import traverse_util

    flat = {}
    for prefix, tree in (("image", image_vars), ("text", text_vars)):
        for k, v in traverse_util.flatten_dict(tree).items():
            flat[prefix + "/" + "/".join(k)] = np.asarray(v)
    flat["logit_scale"] = np.asarray(logit_scale)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)


def load_tinyclip(path: str = WEIGHTS_PATH):
    from flax import traverse_util

    img, txt, scale = {}, {}, np.float32(1.0)
    for k, v in np.load(path).items():
        if k == "logit_scale":
            scale = jnp.asarray(v)
            continue
        head, rest = k.split("/", 1)
        (img if head == "image" else txt)[tuple(rest.split("/"))] = \
            jnp.asarray(v)
    return (traverse_util.unflatten_dict(img),
            traverse_util.unflatten_dict(txt), scale)
