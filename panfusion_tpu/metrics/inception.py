"""InceptionV3 feature extractor for FID / Inception Score (flax, NHWC).

The reference computes FID/IS through torchmetrics' NoTrainInceptionV3
(models/pano/EvalPanoGen.py:30-49), a CUDA torchvision net. This is a
TPU-native reimplementation of the same InceptionV3 graph: 2048-d pool3
features (FID) and 1000-way logits (IS), jitted and batched on device.

Weights: the environment has no network egress, so pretrained weights load
from ``weights/inception_v3.npz`` when present (produced by
tools/convert_ckpt.py from a torchvision/pytorch-fid checkpoint). Without
the file, the net runs with seeded random weights — the metric pipeline is
exercised end to end, but absolute FID/IS values are then not comparable to
published numbers (a loud warning is printed once).
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

WEIGHTS_PATH = os.path.join("weights", "inception_v3.npz")


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps 1e-3) + relu — torchvision BasicConv2d."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=self.dtype, name="bn"
        )(x)
        return nn.relu(x)


def _avg_pool3(x, count_include_pad: bool = True):
    # torchvision inception_v3 uses count_include_pad=True; pytorch-fid's
    # TF-ported compat net (the graph torchmetrics' NoTrainInceptionV3 and
    # therefore the reference's FID/IS actually run) patches it to False
    # in its FIDInceptionA/C/E blocks.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype,
                         name="branch_pool")(
            _avg_pool3(x, count_include_pad=not self.fid_variant))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(
            _avg_pool3(x, count_include_pad=not self.fid_variant))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                         name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    # pool: 'avg' (torchvision), 'avg_nopad' (FIDInceptionE_1, Mixed_7b),
    # 'max' (FIDInceptionE_2, Mixed_7c — pytorch-fid reproduces a TF bug)
    pool: str = "avg"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avg_pool3(x, count_include_pad=self.pool == "avg")
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype,
                         name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (features (b, 2048), logits (b, num_classes)).

    fid_variant=True (default) is the pytorch-fid-compatible graph — the
    net torchmetrics' NoTrainInceptionV3 runs, hence what the reference's
    FID/IS numbers are defined on: avg pools exclude padding in the A/C/E1
    blocks, Mixed_7c pools with MAX, and the TF-ported fc has 1008
    classes. fid_variant=False + num_classes=1000 is plain torchvision
    inception_v3 (its weights convert via tools/convert_ckpt.py too)."""

    num_classes: int = 1008
    fid_variant: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # stem: x is (b, 299, 299, 3) in [-1, 1] (torchvision transform_input
        # equivalent is applied by the caller's preprocess)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        fid = self.fid_variant
        x = InceptionA(32, fid, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, fid, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, fid, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, fid, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, fid, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, fid, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, fid, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg_nopad" if fid else "avg", dtype=self.dtype,
                       name="Mixed_7b")(x)
        x = InceptionE("max" if fid else "avg", dtype=self.dtype,
                       name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (b, 2048)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(feats)
        return feats, logits


_warned = False


def make_inception() -> InceptionV3:
    """InceptionV3 matching weights/inception_v3.npz when present: a
    1008-class fc means the pytorch-fid TF-ported checkpoint (compat
    graph), 1000 means plain torchvision. Without weights, default to the
    fid-compat graph — the semantics the reference's torchmetrics FID/IS
    are defined on."""
    if os.path.exists(WEIGHTS_PATH):
        with np.load(WEIGHTS_PATH) as flat:
            n = flat["params/fc/kernel"].shape[-1]
        return InceptionV3(num_classes=n, fid_variant=n == 1008)
    return InceptionV3()


def load_inception_variables(net: InceptionV3, seed: int = 0):
    """Pretrained npz if available, else seeded random init (warn once)."""
    global _warned
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(seed), dummy)
    if os.path.exists(WEIGHTS_PATH):
        flat = dict(np.load(WEIGHTS_PATH))
        variables = _unflatten_into(variables, flat)
    elif not _warned:
        _warned = True
        print(
            "WARNING: weights/inception_v3.npz not found — FID/IS run with "
            "random Inception weights (pipeline-valid, values not comparable "
            "to published numbers). Convert with tools/convert_ckpt.py."
        )
    return variables


def _unflatten_into(variables, flat: dict):
    """Overlay a {'params/Mixed_5b/.../kernel': array} dict onto variables."""
    import flax

    var = flax.core.unfreeze(variables)
    for key, value in flat.items():
        parts = key.split("/")
        node = var
        for p in parts[:-1]:
            node = node[p]
        assert node[parts[-1]].shape == value.shape, (
            key, node[parts[-1]].shape, value.shape
        )
        node[parts[-1]] = jnp.asarray(value)
    return flax.core.freeze(var)


def inception_preprocess(images_uint8: np.ndarray) -> np.ndarray:
    """uint8 NHWC any-size -> (b, 299, 299, 3) float32 in [-1, 1]
    (torchmetrics feeds uint8 resized bilinear to 299 then scales)."""
    import cv2

    out = np.stack([
        cv2.resize(im, (299, 299), interpolation=cv2.INTER_LINEAR)
        for im in images_uint8
    ]).astype(np.float32)
    return out / 127.5 - 1.0
