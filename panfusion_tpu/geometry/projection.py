"""Equirectangular <-> perspective projection maps and warps (pure JAX).

Closed-form re-derivation of the reference's projection layer
(reference: external/Perspective_and_Equirectangular/{e2p,p2e,mp2e}.py).
Unlike the reference — which builds each view's sampling grid with numpy/cv2
on the host inside the forward pass (e2p.py:66-75) — every map here is a
jit-able jnp function batched over views with vmap, so correspondence maps
can be built on device (training: per batch) or precomputed once and cached
(inference: fixed icosahedron cameras + the known 90-degree rotation
schedule; see panfusion_tpu/models/epp.py).

Conventions (identical to the reference):
  * world frame: x forward, y right, z up;
  * theta: yaw degrees, phi: pitch degrees;
  * lon in [-pi, pi] increases with image x; lat in [-pi/2, pi/2] increases
    *downward* in image y (the reference negates lat at the end of
    map_pers_coords_to_equi, e2p.py:36).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision="highest")

from ..ops.resample import remap
from .rotations import camera_rotations


def pers_ray_grid(fov_deg, h: int, w: int) -> jnp.ndarray:
    """Unit rays of an (h, w) perspective image with horizontal FoV.

    Vertical FoV follows the reference's tan-space aspect scaling
    hfov = h / w * wfov (e2p.py:10-13). Returns (h, w, 3) unit xyz.
    """
    fov = jnp.asarray(fov_deg, dtype=jnp.float32)
    hfov = (h / w) * fov
    w_len = jnp.tan(jnp.deg2rad(fov / 2.0))
    h_len = jnp.tan(jnp.deg2rad(hfov / 2.0))
    x = jnp.ones((h, w), jnp.float32)
    y = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, w), (h, w)) * w_len
    z = -jnp.broadcast_to(jnp.linspace(-1.0, 1.0, h)[:, None], (h, w)) * h_len
    xyz = jnp.stack([x, y, z], axis=-1)
    return xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)


def map_pers_coords_to_equi(
    fov_deg, theta_deg, phi_deg, h: int, w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lon, lat) in radians of each pixel of a perspective view.

    Parity with reference e2p.py:9-36 (including the final lat sign flip).
    Scalar camera parameters; vmap for batches of views.
    """
    xyz = pers_ray_grid(fov_deg, h, w)
    R1, R2 = camera_rotations(theta_deg, phi_deg)
    xyz = _mm(_mm(xyz, R1.T), R2.T)
    lat = jnp.arcsin(jnp.clip(xyz[..., 2], -1.0, 1.0))
    lon = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    return lon, -lat


def map_pers_pix_to_equi(
    eh: int, ew: int, fov_deg, theta_deg, phi_deg, h: int, w: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equirect pixel coords sampled by each perspective pixel (e2p grid).

    Parity with reference e2p.py:39-52: lon/lat mapped onto the
    align_corners=True pixel grid of an (eh, ew) equirect image.
    """
    lon, lat = map_pers_coords_to_equi(fov_deg, theta_deg, phi_deg, h, w)
    cx = (ew - 1) / 2.0
    cy = (eh - 1) / 2.0
    x = lon / jnp.pi * cx + cx
    y = lat / (jnp.pi / 2.0) * cy + cy
    return x, y


def map_equi_pix_to_pers(
    ph: int, pw: int, fov_deg, theta_deg, phi_deg, h: int, w: int
):
    """Perspective pixel coords sampled by each equirect pixel (p2e grid).

    Parity with reference p2e.py:9-49. Returns (x, y, mask) each (h, w);
    mask is True where the equirect pixel falls inside the view frustum.
    Note the reference's coordinate range is [0, pw] (not pw-1) — kept.
    """
    fov = jnp.asarray(fov_deg, dtype=jnp.float32)
    hfov = (ph / pw) * fov
    w_len = jnp.tan(jnp.deg2rad(fov / 2.0))
    h_len = jnp.tan(jnp.deg2rad(hfov / 2.0))

    lon = jnp.deg2rad(jnp.linspace(-180.0, 180.0, w))
    lat = jnp.deg2rad(jnp.linspace(90.0, -90.0, h))
    lon, lat = jnp.meshgrid(lon, lat)
    xyz = jnp.stack(
        [
            jnp.cos(lon) * jnp.cos(lat),
            jnp.sin(lon) * jnp.cos(lat),
            jnp.sin(lat),
        ],
        axis=-1,
    )
    R1, R2 = camera_rotations(theta_deg, phi_deg)
    # reference applies inv(R2) then inv(R1) (p2e.py:33-38)
    xyz = _mm(_mm(xyz, R2), R1)  # == (R1^-1 @ R2^-1 @ xyz^T)^T for rotation matrices
    front = xyz[..., 0] > 0
    denom = jnp.where(xyz[..., 0] == 0, 1e-9, xyz[..., 0])
    yy = xyz[..., 1] / denom
    zz = xyz[..., 2] / denom
    inside = (
        (-w_len < yy) & (yy < w_len) & (-h_len < zz) & (zz < h_len)
    )
    x = jnp.where(inside, (yy + w_len) / (2 * w_len) * pw, 0.0)
    y = jnp.where(inside, (-zz + h_len) / (2 * h_len) * ph, 0.0)
    return x, y, inside & front


@functools.partial(jax.jit, static_argnames=("out_hw", "mode", "border"))
def e2p(
    e_img: jnp.ndarray,
    fov_deg: jnp.ndarray,
    theta_deg: jnp.ndarray,
    phi_deg: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
    border: str = "zeros",
) -> jnp.ndarray:
    """Equirect -> perspective warp, batched over views.

    e_img: (C, H, W) or (m, C, H, W) — a single pano broadcast to all views
    or one pano per view. Camera params: scalars or (m,). Returns
    (m, C, *out_hw). Default border='zeros' matches the reference's torch
    path (kornia remap); use 'wrap' for the cv2 path.
    """
    fov = jnp.atleast_1d(jnp.asarray(fov_deg, jnp.float32))
    theta = jnp.atleast_1d(jnp.asarray(theta_deg, jnp.float32))
    phi = jnp.atleast_1d(jnp.asarray(phi_deg, jnp.float32))
    m = max(fov.shape[0], theta.shape[0], phi.shape[0])
    fov, theta, phi = (jnp.broadcast_to(a, (m,)) for a in (fov, theta, phi))

    eh, ew = e_img.shape[-2], e_img.shape[-1]
    x, y = jax.vmap(
        lambda f, t, p: map_pers_pix_to_equi(eh, ew, f, t, p, *out_hw)
    )(fov, theta, phi)

    if e_img.ndim == 3:
        return jax.vmap(lambda xx, yy: remap(e_img, xx, yy, mode, border))(x, y)
    e_img = jnp.broadcast_to(e_img, (m, *e_img.shape[1:]))
    return jax.vmap(lambda img, xx, yy: remap(img, xx, yy, mode, border))(
        e_img, x, y
    )


@functools.partial(jax.jit, static_argnames=("out_hw", "mode", "border"))
def p2e(
    p_img: jnp.ndarray,
    fov_deg: jnp.ndarray,
    theta_deg: jnp.ndarray,
    phi_deg: jnp.ndarray,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
    border: str = "zeros",
):
    """Perspective -> equirect inverse warp with validity mask.

    p_img: (m, C, h, w). Returns ((m, C, *out_hw), (m, *out_hw) bool mask).
    border='zeros' is parity with the reference torch path (p2e.py:52-75,
    kornia remap zero padding + mask multiply). border='wrap' is parity
    with its numpy path (p2e.py:75 cv2 BORDER_WRAP): equi pixels whose ray
    is inside the frustum but whose pixel coordinate rounds past the view
    edge read the OPPOSITE edge of the same view — geometrically odd, but
    it is what the reference's dataset/stitch code does.
    """
    m = p_img.shape[0]
    fov = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(fov_deg, jnp.float32)), (m,))
    theta = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(theta_deg, jnp.float32)), (m,)
    )
    phi = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(phi_deg, jnp.float32)), (m,))
    ph, pw = p_img.shape[-2], p_img.shape[-1]

    def one(img, f, t, p):
        x, y, mask = map_equi_pix_to_pers(ph, pw, f, t, p, *out_hw)
        out = remap(img, x, y, mode, border)
        return out * mask.astype(img.dtype), mask

    return jax.vmap(one)(p_img, fov, theta, phi)


def mp2e(
    p_imgs: jnp.ndarray,
    fov_deg,
    theta_deg,
    phi_deg,
    out_hw: Tuple[int, int],
    mode: str = "bilinear",
    border: str = "zeros",
) -> jnp.ndarray:
    """Blend m perspective views into one equirect pano.

    Reference mp2e.py:6-28: each view is weighted by a horizontal linear
    ramp (0->1 over the left half, 1->0 over the right half), warped to
    equirect through p2e (so it is zero outside the view), then
    weight-averaged; pixels no view covers become white (255). The
    reference also computes a blurred/eroded mask down-weighted x0.05, but
    never uses it (dead store, mp2e.py:20-22) — deliberately not
    reproduced. NOTE the reference's numpy path effectively ran with
    nearest resampling regardless of the requested mode (the choose_mode
    missing-return quirk, utils.py:5-16 — pinned in
    tests/test_reference_parity.py); mode='nearest' reproduces that.
    """
    m, c, ph, pw = p_imgs.shape
    ramp = jnp.concatenate(
        [jnp.linspace(0.0, 1.0, pw // 2), jnp.linspace(1.0, 0.0, pw - pw // 2)]
    )
    weight_img = jnp.broadcast_to(ramp, (m, 1, ph, pw))

    equis, _ = p2e(p_imgs.astype(jnp.float32), fov_deg, theta_deg, phi_deg,
                   out_hw, mode=mode, border=border)
    weights, _ = p2e(weight_img, fov_deg, theta_deg, phi_deg, out_hw,
                     mode=mode, border=border)
    weights = weights[:, 0]

    total = jnp.sum(weights, axis=0)
    covered = total > 0
    blended = jnp.sum(equis * weights[:, None], axis=0) / jnp.where(
        covered, total, 1.0
    )[None]
    return jnp.where(covered[None], blended, 255.0)
