"""Numpy twins of the jnp grid builders, for the host data pipeline.

The training input pipeline runs on host CPU while the TPU computes; going
through jax for per-item crops would serialize on device dispatch (and, on
this rig, the remote-compile tunnel). These mirror
panfusion_tpu.geometry.projection exactly (same formulas, numpy), feeding
the native C++ sampler (ops/host.py). Golden tests pin them against the
jnp versions.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def rodrigues_np(rvec: np.ndarray) -> np.ndarray:
    """(3,) rotation vector -> (3, 3) matrix (cv2.Rodrigues parity)."""
    angle = np.linalg.norm(rvec)
    if angle < 1e-12:
        return np.eye(3, dtype=np.float32)
    axis = rvec / angle
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float32)
    return (
        np.eye(3, dtype=np.float32)
        + np.sin(angle) * K
        + (1.0 - np.cos(angle)) * (K @ K)
    ).astype(np.float32)


def get_K_R_np(fov_deg: float, theta_deg: float, phi_deg: float,
               height: int, width: int):
    """Numpy twin of geometry.rotations.get_K_R (same camera-frame
    convention: yaw about +y, pitch about the rotated +x). The dataset's
    per-item per-view K/R build runs in DataLoader worker threads — going
    through jax there costs ~2m device dispatches per sample and contends
    with TPU compute."""
    theta = np.deg2rad(np.float32(theta_deg))
    phi = np.deg2rad(np.float32(phi_deg))
    f = 0.5 * width / np.tan(0.5 * np.deg2rad(np.float32(fov_deg)))
    K = np.array(
        [[f, 0.0, (width - 1) / 2.0],
         [0.0, f, (height - 1) / 2.0],
         [0.0, 0.0, 1.0]], np.float32,
    )
    R1 = rodrigues_np(np.array([0, 1, 0], np.float32) * theta)
    R2 = rodrigues_np((R1 @ np.array([1, 0, 0], np.float32)) * phi)
    return K, (R2 @ R1).astype(np.float32)


def camera_rotations_np(theta_deg: float, phi_deg: float):
    theta = np.deg2rad(np.float32(theta_deg))
    phi = np.deg2rad(np.float32(phi_deg))
    R1 = rodrigues_np(np.array([0, 0, 1], np.float32) * theta)
    y_rot = R1 @ np.array([0, 1, 0], np.float32)
    R2 = rodrigues_np(y_rot * (-phi))
    return R1, R2


def map_pers_pix_to_equi_np(
    eh: int, ew: int, fov_deg: float, theta_deg: float, phi_deg: float,
    h: int, w: int, v_fov_deg: float = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy twin of projection.map_pers_pix_to_equi (same formulas).
    v_fov_deg overrides the aspect-derived vertical FoV (py360convert e2p
    accepts an (h_fov, v_fov) pair)."""
    fov = np.float32(fov_deg)
    hfov = (h / w) * fov if v_fov_deg is None else np.float32(v_fov_deg)
    w_len = np.tan(np.deg2rad(fov / 2.0))
    h_len = np.tan(np.deg2rad(hfov / 2.0))
    x = np.ones((h, w), np.float32)
    y = np.broadcast_to(np.linspace(-1.0, 1.0, w, dtype=np.float32), (h, w)) * w_len
    z = -np.broadcast_to(
        np.linspace(-1.0, 1.0, h, dtype=np.float32)[:, None], (h, w)
    ) * h_len
    xyz = np.stack([x, y, z], axis=-1)
    xyz = xyz / np.linalg.norm(xyz, axis=-1, keepdims=True)

    R1, R2 = camera_rotations_np(theta_deg, phi_deg)
    xyz = xyz @ R1.T @ R2.T  # mirror _mm(_mm(xyz, R1.T), R2.T)
    lat = np.arcsin(np.clip(xyz[..., 2], -1.0, 1.0))
    lon = np.arctan2(xyz[..., 1], xyz[..., 0])
    lat = -lat

    cx = (ew - 1) / 2.0
    cy = (eh - 1) / 2.0
    return (
        (lon / np.pi * cx + cx).astype(np.float32),
        (lat / (np.pi / 2.0) * cy + cy).astype(np.float32),
    )
