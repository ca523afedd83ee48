"""ResNet backbone (flax, NHWC) with width-circular padding.

Feature extractor of the HorizonNet layout estimator: the reference wraps
every torchvision-resnet50 conv that pads in width with an LR circular pad
(external/HorizonNet/model.py:34-47 ``wrap_lr_pad``) so features are
continuous across the panorama seam. Here that is a first-class conv
wrapper: height is zero-padded, width is wrap-padded, shapes stay static
for XLA.

Returns the 4 stage features (1/4, 1/8, 1/16, 1/32) like the reference
Resnet forward (model.py:59-70).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def pad_hw(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Zero-pad height, circular-pad width of an NHWC tensor."""
    if ph > 0:
        x = jnp.pad(x, ((0, 0), (ph, ph), (0, 0), (0, 0)))
    if pw > 0:
        x = jnp.concatenate([x[:, :, -pw:], x, x[:, :, :pw]], axis=2)
    return x


class CircularConv(nn.Module):
    """conv with zero-pad height / wrap-pad width."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.kernel[0] // 2, self.kernel[1] // 2
        x = pad_hw(x, ph, pw)
        return nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype, name="conv",
        )(x)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 with expansion 4 (torchvision Bottleneck layout so
    converted weights drop in)."""

    features: int  # bottleneck width
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = CircularConv(self.features, (3, 3), self.strides,
                           dtype=self.dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.features * 4, (1, 1), strides=self.strides,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50Features(nn.Module):
    """Stage features of a panorama-circular ResNet50."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = pad_hw(x, 3, 3)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(pad_hw(x, 1, 1), (3, 3), strides=(2, 2))

        features = []
        widths = (64, 128, 256, 512)
        for i, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = Bottleneck(
                    w, strides, downsample=(j == 0), dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train)
            features.append(x)
        return features
