"""Camera pose samplers on the sphere (host-side numpy).

Parity with reference utils/pano.py:15-71. These run in the data pipeline on
the host; returned angles are radians (callers convert to degrees like the
reference dataset does).
"""
from __future__ import annotations

import numpy as np


def normalize(vec: np.ndarray) -> np.ndarray:
    return vec / (np.linalg.norm(vec, axis=-1, keepdims=True) + 1e-9)


def random_sample_camera(n: int, rng: np.random.Generator | None = None):
    """n cameras uniform on the sphere via normalized gaussians."""
    rng = rng or np.random.default_rng()
    xyz = normalize(rng.normal(size=(n, 3)))
    phi = np.arcsin(np.clip(xyz[:, 2], -1, 1))
    theta = np.arctan2(xyz[:, 0], xyz[:, 1])
    return theta, phi


def horizon_sample_camera(n: int):
    """n equally spaced yaws at zero pitch."""
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return theta, np.zeros_like(theta)


def icosahedron_sample_camera():
    """The fixed 20 (theta, phi) at icosahedron face centers.

    Same construction as the reference (utils/pano.py:34-71): 5 up, 5
    middle-up, 5 middle-down, 5 down triangle centers.
    """
    radius_circumscribed = np.sin(2 * np.pi / 5.0)
    radius_inscribed = np.sqrt(3) / 12.0 * (3 + np.sqrt(5))
    radius_midradius = np.cos(np.pi / 5.0)
    theta_step = 2.0 * np.pi / 5.0
    alpha_up = np.arccos(radius_inscribed / radius_circumscribed)
    alpha_mid = np.arccos(radius_inscribed / radius_midradius)

    thetas, phis = [], []
    for i in range(5):
        thetas.append(-np.pi + theta_step / 2.0 + i * theta_step)
        phis.append(np.pi / 2 - alpha_up)
    for i in range(5):
        thetas.append(-np.pi + theta_step / 2.0 + i * theta_step)
        phis.append(np.pi / 2.0 - alpha_up - 2 * alpha_mid)
    for i in range(5):
        thetas.append(-np.pi + i * theta_step)
        phis.append(-(np.pi / 2.0 - alpha_up - 2 * alpha_mid))
    for i in range(5):
        thetas.append(-np.pi + i * theta_step)
        phis.append(-(np.pi / 2 - alpha_up))
    return np.array(thetas), np.array(phis)
