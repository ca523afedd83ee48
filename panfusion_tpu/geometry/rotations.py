"""Rotation math for panorama cameras (pure JAX, closed form).

The reference builds camera rotations with ``cv2.Rodrigues`` on the host per
view (reference: external/Perspective_and_Equirectangular/e2p.py:31-33,
p2e.py:26-31). Here the Rodrigues formula is 10 lines of jnp so the whole map
construction is jit-able and batched over views with vmap.

Coordinate convention (identical to the reference):
    x: forward, y: right (image-width direction), z: up.
    theta: yaw in degrees (rotation about +z), phi: pitch in degrees.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# tiny 3x3 rotation math must not run at bf16 MXU precision on TPU
_mm = functools.partial(jnp.matmul, precision="highest")

# host numpy, NOT jnp: module-level jnp.array would initialize the JAX
# backend at import time — on a tunnel-less host every import of the
# geometry stack would block on the dead axon socket (round-5 find)
Y_AXIS = np.array([0.0, 1.0, 0.0], dtype=np.float32)
Z_AXIS = np.array([0.0, 0.0, 1.0], dtype=np.float32)


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (..., 3) -> rotation matrix (..., 3, 3).

    R = I + sin(a) K + (1 - cos(a)) K^2 where a = |rvec|, K = skew(rvec/a).
    Safe at a == 0 (returns identity).
    """
    angle = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    safe = jnp.where(angle > 0, angle, 1.0)
    axis = rvec / safe
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    a = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * _mm(K, K)
    return jnp.where(a > 0, R, eye)


def camera_rotations(theta_deg: jnp.ndarray, phi_deg: jnp.ndarray):
    """Per-view (R1, R2) rotation pair of the reference convention.

    R1 = Rodrigues(z * radians(theta)); R2 = Rodrigues((R1 @ y) * radians(-phi))
    (reference: external/Perspective_and_Equirectangular/e2p.py:31-33).
    Accepts scalars or 1-D arrays; returns (..., 3, 3) matrices.
    """
    theta = jnp.deg2rad(jnp.asarray(theta_deg, dtype=jnp.float32))
    phi = jnp.deg2rad(jnp.asarray(phi_deg, dtype=jnp.float32))
    R1 = rodrigues(theta[..., None] * Z_AXIS)
    y_rot = _mm(R1, Y_AXIS)
    R2 = rodrigues(y_rot * (-phi)[..., None])
    return R1, R2


X_AXIS = np.array([1.0, 0.0, 0.0], dtype=np.float32)


def get_K_R(fov_deg, theta_deg, phi_deg, height, width):
    """Pinhole intrinsics K and camera rotation R for a view.

    Mirrors the batch contract of the reference data pipeline
    (reference: dataset/PanoDataset.py:16-31). Note this uses the *camera
    frame* convention of that function (yaw about +y, pitch about the rotated
    +x), which differs from the equirect-map convention in
    :func:`camera_rotations`; both exist in the reference and are used by
    different consumers (this one feeds the MVDiffusion-style homographies).
    """
    fov = jnp.asarray(fov_deg, dtype=jnp.float32)
    theta = jnp.deg2rad(jnp.asarray(theta_deg, dtype=jnp.float32))
    phi = jnp.deg2rad(jnp.asarray(phi_deg, dtype=jnp.float32))
    f = 0.5 * width / jnp.tan(0.5 * jnp.deg2rad(fov))
    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0
    K = jnp.array(
        [[0.0, 0.0, cx], [0.0, 0.0, cy], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )
    K = K.at[0, 0].set(f).at[1, 1].set(f)
    R1 = rodrigues(theta[..., None] * Y_AXIS)
    R2 = rodrigues(_mm(R1, X_AXIS) * phi[..., None])
    return K, _mm(R2, R1)
