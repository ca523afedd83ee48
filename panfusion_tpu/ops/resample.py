"""Grid resampling (remap) in pure JAX.

The reference resamples through two native backends — kornia ``remap``
(align_corners=True, zero padding; reference:
external/Perspective_and_Equirectangular/e2p.py:76, p2e.py:70) and
``cv2.remap`` with BORDER_WRAP (e2p.py:80). Both reduce to a gather of the 4
(bilinear) or 1 (nearest) neighbors at per-pixel float coordinates. On TPU a
static-shape gather is XLA-friendly; the map is fixed per camera set, so the
hot path precomputes maps once and this op stays out of the denoise loop.

Border modes:
  * ``border='zeros'``  — out-of-range neighbors contribute 0
    (kornia/grid_sample parity, used for EPP masks and device warps).
  * ``border='wrap'``   — coordinates wrap modulo the image size
    (cv2 BORDER_WRAP parity, used by host-side pano crops).
  * ``border='clamp'``  — clamp to edge.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img (..., H, W), yi/xi int (h, w) -> (..., h, w)."""
    H, W = img.shape[-2], img.shape[-1]
    flat = img.reshape(*img.shape[:-2], H * W)
    idx = yi * W + xi
    return jnp.take(flat, idx.reshape(-1), axis=-1).reshape(
        *img.shape[:-2], *yi.shape
    )


def remap(
    img: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    mode: str = "bilinear",
    border: str = "zeros",
) -> jnp.ndarray:
    """Sample ``img`` (..., H, W) at float pixel coords ``x``/``y`` (h, w).

    Coordinates are in pixel units (align_corners=True convention: integer
    coordinates hit pixel centers exactly). border='wrap' wraps the WIDTH
    axis only and clamps the height axis — the equirect convention (a
    vertical overshoot must stick to the pole, not jump to the opposite
    one); identical semantics to the native C kernel. border='wrap_hw'
    wraps BOTH axes — exact cv2 BORDER_WRAP parity, which the reference's
    numpy p2e path relies on at frustum-edge pixels (p2e.py:75; pinned in
    tests/test_reference_parity.py). Integer images interpolate in float32
    and round back to the input dtype.
    """
    H, W = img.shape[-2], img.shape[-1]
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    is_float = jnp.issubdtype(img.dtype, jnp.floating)
    wdtype = img.dtype if is_float else jnp.float32

    def border_x(idx):
        if border in ("wrap", "wrap_hw"):
            return jnp.mod(idx, W)
        return jnp.clip(idx, 0, W - 1)

    def border_y(idx):
        if border == "wrap_hw":
            return jnp.mod(idx, H)
        return jnp.clip(idx, 0, H - 1)

    if mode == "nearest":
        # kornia/grid_sample 'nearest' on align_corners=True grids rounds to
        # the closest pixel center.
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        if border == "zeros":
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            out = _gather_hw(img, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
            return out * valid.astype(img.dtype)
        return _gather_hw(img, border_y(yi), border_x(xi))

    if mode != "bilinear":
        raise ValueError(f"unknown mode {mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(wdtype)
    fy = (y - y0).astype(wdtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            xi, yi = x0i + dx, y0i + dy
            w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            if border == "zeros":
                valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
                w = w * valid.astype(wdtype)
                xi = jnp.clip(xi, 0, W - 1)
                yi = jnp.clip(yi, 0, H - 1)
            else:
                xi = border_x(xi)
                yi = border_y(yi)
            term = _gather_hw(img, yi, xi).astype(wdtype) * w
            out = term if out is None else out + term
    if not is_float:
        out = jnp.round(out).astype(img.dtype)
    return out


@functools.partial(jax.jit, static_argnames=("mode", "border"))
def remap_batched(img, x, y, mode="bilinear", border="zeros"):
    """vmapped remap: img (m, C, H, W), x/y (m, h, w) -> (m, C, h, w)."""
    return jax.vmap(lambda i, xx, yy: remap(i, xx, yy, mode=mode, border=border))(
        img, x, y
    )
