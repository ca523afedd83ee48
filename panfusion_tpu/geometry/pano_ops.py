"""Width-circular padding for panoramas (pure JAX).

The panorama's width axis is periodic (longitude); the reference wraps it
with ``F.pad(mode='circular')`` around every pano conv, the VAE
encode/decode, FAED convs, and HorizonNet's feature extractor
(reference: utils/pano.py:74-105). Here it is a first-class op reused by all
of those consumers. Works on any array whose last axis is width.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_pano(pano: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Circularly pad the width (last) axis by ``padding`` on both sides."""
    if padding <= 0:
        return pano
    return jnp.concatenate(
        [pano[..., -padding:], pano, pano[..., :padding]], axis=-1
    )


def unpad_pano(pano_pad: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Slice off a circular width pad."""
    if padding <= 0:
        return pano_pad
    return pano_pad[..., padding:-padding]


def roll_pano(pano: jnp.ndarray, degree: float) -> jnp.ndarray:
    """Rotate a pano about the vertical axis = roll along width.

    Parity with reference rotate_latent (models/pano/PanoGenerator.py:264-269)
    and Equirectangular.rotate (utils/pano.py:164-168).
    """
    width = pano.shape[-1]
    shift = int(degree / 360.0 * width)
    if shift % width == 0:
        return pano
    return jnp.roll(pano, shift, axis=-1)
