"""Panorama stretch augmentation (host-side numpy).

Capability parity with the vendored HorizonNet training augmentation
(reference external/HorizonNet/misc/panostretch.py:84-114 ``pano_stretch``
and external/HorizonNet/dataset.py:69-82 / :188-204 ``cor2xybound`` stretch-
factor clipping). The reference stretches the room along the front-back (kx)
and left-right (ky) axes in world space and remaps the equirectangular image
accordingly; corner annotations move through the inverse mapping so the
(image, corners) pair stays consistent.

This is an input-pipeline augmentation, so it stays on the host (numpy +
the native C++ resampler when built, scipy otherwise) — same placement as
the reference's scipy ``map_coordinates`` path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


# ----------------------------------------------------------------- uv math
# pixel-center <-> spherical conventions of the reference
# (external/HorizonNet/misc/panostretch.py:28-41)

def coorx2u(x, w: int = 1024):
    return ((x + 0.5) / w - 0.5) * 2 * np.pi


def coory2v(y, h: int = 512):
    return ((y + 0.5) / h - 0.5) * np.pi


def u2coorx(u, w: int = 1024):
    return (u / (2 * np.pi) + 0.5) * w - 0.5


def v2coory(v, h: int = 512):
    return (v / np.pi + 0.5) * h - 0.5


def uv2xy(u, v, z=-50):
    """Project (u, v) rays onto the horizontal plane at height z
    (reference panostretch.py:44-48)."""
    c = z / np.tan(v)
    return c * np.cos(u), c * np.sin(u)


@functools.lru_cache()
def _uv_tri(w: int, h: int):
    u = coorx2u(np.arange(w, dtype=np.float64), w)
    v = coory2v(np.arange(h, dtype=np.float64), h)
    sin_u = np.broadcast_to(np.sin(u), (h, w))
    cos_u = np.broadcast_to(np.cos(u), (h, w))
    tan_v = np.broadcast_to(np.tan(v)[:, None], (h, w))
    return sin_u, cos_u, tan_v


# ----------------------------------------------------------------- stretch
def pano_stretch_grid(h: int, w: int, kx: float, ky: float
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Source pixel coordinates (refx, refy), each (h, w), implementing the
    reference forward mapping (panostretch.py:92-99): for every output
    pixel, the input direction whose stretched-world image lands there."""
    sin_u, cos_u, tan_v = _uv_tri(w, h)
    u0 = np.arctan2(sin_u * kx / ky, cos_u)
    # sin(u0)/sin(u) is finite and smooth; guard the u=0/pi columns where
    # both vanish (limit is kx/ky by l'Hopital on the arctan2 arguments)
    ratio = np.divide(np.sin(u0), sin_u,
                      out=np.full_like(sin_u, kx / ky), where=sin_u != 0)
    v0 = np.arctan(tan_v * ratio * ky)
    refx = (u0 / (2 * np.pi) + 0.5) * w - 0.5
    refy = (v0 / np.pi + 0.5) * h - 0.5
    return refx.astype(np.float32), refy.astype(np.float32)


def stretch_corners(corners: np.ndarray, h: int, w: int,
                    kx: float, ky: float) -> np.ndarray:
    """Move (x, y) pixel annotations through the inverse mapping
    (reference panostretch.py:102-109)."""
    u0 = coorx2u(corners[:, 0], w)
    v0 = coory2v(corners[:, 1], h)
    u = np.arctan2(np.sin(u0) * ky / kx, np.cos(u0))
    ratio = np.divide(np.sin(u), np.sin(u0),
                      out=np.full_like(u0, ky / kx), where=np.sin(u0) != 0)
    v = np.arctan(np.tan(v0) * ratio / ky)
    return np.stack([u2coorx(u, w), v2coory(v, h)], axis=-1)


def pano_stretch(img: np.ndarray, corners: np.ndarray, kx: float, ky: float,
                 order: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Stretch an equirectangular image and its corner annotations.

    img: (H, W, C) or (H, W); corners: (N, 2) pixel (x, y).
    Returns (stretched_img, stretched_corners). Same contract as the
    reference ``pano_stretch`` (panostretch.py:84-114).
    """
    h, w = img.shape[:2]
    refx, refy = pano_stretch_grid(h, w, kx, ky)

    from ..ops import host

    out = host.remap(img, refx, refy,
                     mode="bilinear" if order == 1 else "nearest",
                     border="wrap") if order in (0, 1) else None
    if out is None:
        from scipy.ndimage import map_coordinates

        if img.ndim == 2:
            out = map_coordinates(img, [refy, refx], order=order, mode="wrap")
        else:
            out = np.stack(
                [map_coordinates(img[..., c], [refy, refx], order=order,
                                 mode="wrap")
                 for c in range(img.shape[-1])], axis=-1)
    return out, stretch_corners(np.asarray(corners, np.float64), h, w, kx, ky)


def cor2xybound(cor: np.ndarray) -> Tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) wall-distance bounds of the room footprint
    spanned by corner annotations, normalized so a 3-unit room height maps
    the camera-to-wall distances into the [0.5, 10] clipping envelope —
    the exact reference formula (dataset.py:188-207)."""
    corU = cor[0::2]
    corB = cor[1::2]
    zU = -50.0
    u = coorx2u(corU[:, 0])
    vU = coory2v(corU[:, 1])
    vB = coory2v(corB[:, 1])
    x, y = uv2xy(u, vU, z=zU)
    c = np.sqrt(x ** 2 + y ** 2)
    zB = c * np.tan(vB)
    S = 3.0 / abs(zB.mean() - zU)
    dx = (abs(x.min() * S), abs(x.max() * S))
    dy = (abs(y.min() * S), abs(y.max() * S))
    return min(dx), min(dy), max(dx), max(dy)


def sample_stretch_factors(rng: np.random.Generator, cor: np.ndarray,
                           max_stretch: float = 2.0) -> Tuple[float, float]:
    """Draw (kx, ky) like the reference training loop (dataset.py:70-81):
    uniform in [1, max_stretch], randomly inverted, clipped by the room
    extent so no wall leaves [0.5, 10] world units."""
    xmin, ymin, xmax, ymax = cor2xybound(cor)
    kx = rng.uniform(1.0, max_stretch)
    ky = rng.uniform(1.0, max_stretch)
    if rng.integers(2) == 0:
        kx = max(1.0 / kx, min(0.5 / max(xmin, 1e-6), 1.0))
    else:
        kx = min(kx, max(10.0 / max(xmax, 1e-6), 1.0))
    if rng.integers(2) == 0:
        ky = max(1.0 / ky, min(0.5 / max(ymin, 1e-6), 1.0))
    else:
        ky = min(ky, max(10.0 / max(ymax, 1e-6), 1.0))
    return float(kx), float(ky)
