"""RoomNet: a trained-from-scratch stand-in for the Inception FID/IS slot.

The reference's headline FID / Inception-Score / CLIP-Score run through
torchmetrics' pretrained NoTrainInceptionV3 (reference
models/pano/EvalPanoGen.py:30-49). This environment has no network egress,
so pretrained Inception weights cannot exist here; with random weights the
FID family is informationless (round-4 sweep: FID 3e-6, IS 1.0). RoomNet
closes that gap the same way the trained TinyCaptioner and trained FAED do:
a small convnet *trained offline* on the synthetic-rooms distribution
(tools/gen_synthetic_rooms.py) whose features make the Fréchet/IS
machinery discriminative — separating clean rooms from blurred / noisy /
seam-broken / mushy ones and scoring semantic diversity.

Supervision (tools/train_roomnet.py) is multi-task over labels the room
generator defines:
  - wall color (9-way)  — the IS class head, semantic diversity axis
  - floor color (4-way)
  - room shape (cuboid vs L)
  - corruption type (clean / blur / noise / seam) — shapes the feature
    space so texture-destroying failure modes (the diffusion "mush" of
    round 3) land far from the clean manifold; FID uses the features,
    never this head's output.

The 256-d penultimate features feed StreamingFrechet (metrics/frechet.py);
the wall-head probabilities feed InceptionScore. metrics/image_metrics.py
auto-switches to this net when ``weights/roomnet.npz`` exists and real
Inception weights do not.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WEIGHTS_PATH = os.path.join("weights", "roomnet.npz")

# label vocabularies — the metric contract, frozen to the generator's
# palette (tools/gen_synthetic_rooms.py WALLS/FLOORS)
WALL_CLASSES = ("red", "green", "blue", "yellow", "purple", "orange",
                "pink", "white", "gray")
FLOOR_CLASSES = ("brown", "gray", "white", "teal")
SHAPE_CLASSES = ("cuboid", "l-shape")
CORRUPT_CLASSES = ("clean", "blur", "noise", "seam")

# eval-time input edge: RoomNet is global-pooled so it is size-agnostic;
# 160 keeps CPU training cheap while the checker/stripe textures that
# carry the corruption signal stay above Nyquist at the generator's 256px
INPUT_EDGE = 160
FEAT_DIM = 256


class RoomNet(nn.Module):
    """4-stage strided convnet -> global pool -> 256-d feature -> heads."""

    width: int = 32
    feat_dim: int = FEAT_DIM

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (b, h, w, 3) float32 in [-1, 1]. Returns
        (features (b, feat_dim), head logits concat (b, 9+4+2+4))."""
        for i in range(4):
            ch = self.width * (2 ** i)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"down{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, ch), name=f"gn{i}a")(x)
            x = nn.silu(x)
            x = nn.Conv(ch, (3, 3), name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=min(8, ch), name=f"gn{i}b")(x)
            x = nn.silu(x)
        x = x.mean(axis=(1, 2))
        feats = nn.Dense(self.feat_dim, name="feat")(x)
        h = nn.silu(feats)
        logits = nn.Dense(
            len(WALL_CLASSES) + len(FLOOR_CLASSES) + len(SHAPE_CLASSES)
            + len(CORRUPT_CLASSES),
            name="heads",
        )(h)
        return feats, logits


def split_logits(logits):
    """Concatenated head logits -> (wall, floor, shape, corrupt)."""
    n1 = len(WALL_CLASSES)
    n2 = n1 + len(FLOOR_CLASSES)
    n3 = n2 + len(SHAPE_CLASSES)
    return logits[..., :n1], logits[..., n1:n2], logits[..., n2:n3], \
        logits[..., n3:]


def roomnet_preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 (b, h, w, 3) -> float32 (b, 160, 160, 3) in [-1, 1].

    Same role as inception_preprocess (metrics/inception.py) for the 299
    contract: every FID/IS image variant (pano, crops, rotations) passes
    through here before the extractor."""
    from PIL import Image

    out = np.empty(
        (len(images_uint8), INPUT_EDGE, INPUT_EDGE, 3), np.float32
    )
    for i, im in enumerate(images_uint8):
        resized = Image.fromarray(np.asarray(im, np.uint8)).resize(
            (INPUT_EDGE, INPUT_EDGE), Image.BILINEAR
        )
        out[i] = np.asarray(resized, np.float32)
    return out / 127.5 - 1.0


def save_roomnet(params, path: str = WEIGHTS_PATH) -> None:
    from flax import traverse_util

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in traverse_util.flatten_dict(params).items()
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)


def load_roomnet(path: str = WEIGHTS_PATH):
    """Returns the variables dict {'params': ...} saved by save_roomnet."""
    from flax import traverse_util

    flat = {
        tuple(k.split("/")): jnp.asarray(v)
        for k, v in np.load(path).items()
    }
    return traverse_util.unflatten_dict(flat)
