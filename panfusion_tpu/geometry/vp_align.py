"""Vanishing-point detection and panorama alignment (host-side).

Capability parity with the vendored offline preprocessing path (reference
external/HorizonNet/misc/pano_lsd_align.py:809-920 ``panoEdgeDetection`` +
``rotatePanorama``, driven by external/HorizonNet/preprocess.py): detect
line segments on an equirectangular panorama, vote the three orthogonal
Manhattan vanishing directions, and rotate the panorama so they align with
the world axes.

The design is NOT a translation of the reference's Matlab-derived pipeline;
it reuses this framework's geometry core:

* line segments are detected per perspective view (straight world lines are
  straight in a pinhole view) with OpenCV's LSD, on views extracted by
  ``Equirectangular.to_perspective`` (native C++ sampler);
* each segment becomes a great-circle normal ``cross(ray0, ray1)`` with its
  arc length as vote weight;
* the three main directions are found by Hough voting over a subdivided
  icosahedron candidate set (a direction d gets the weight of every segment
  whose plane contains it, |n.d| < tol) followed by an EM refinement:
  assign segments to directions, re-fit each direction as the smallest
  singular vector of its assigned normals, and project the triple onto the
  nearest rotation (procrustes) — the reference's sphereHoughVote +
  findMainDirectionEMA play the same role;
* alignment resamples the pano through the recovered rotation with the
  native host remap.

This is offline preprocessing (dataset alignment), so it stays on the host
like the reference's scipy/cv2 path — no TPU involvement.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from .host_grids import camera_rotations_np
from .sampling import icosahedron_sample_camera


# ----------------------------------------------------------------- rays
def view_rays(fov_deg: float, theta_deg: float, phi_deg: float,
              h: int, w: int) -> np.ndarray:
    """(h, w, 3) world-frame unit rays of a perspective view — the same
    camera model as host_grids.map_pers_pix_to_equi_np (one source of
    truth: _pixel_to_ray evaluated over the pixel grid)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    px = np.stack([xx.ravel(), yy.ravel()], axis=1)
    return _pixel_to_ray(px, fov_deg, theta_deg, phi_deg, h, w).reshape(
        h, w, 3)


def _pixel_to_ray(px: np.ndarray, fov_deg: float, theta_deg: float,
                  phi_deg: float, h: int, w: int) -> np.ndarray:
    """(N, 2) pixel (x, y) -> (N, 3) world rays (continuous coords)."""
    hfov = (h / w) * fov_deg
    w_len = np.tan(np.deg2rad(fov_deg / 2.0))
    h_len = np.tan(np.deg2rad(hfov / 2.0))
    y = (px[:, 0] / (w - 1) * 2.0 - 1.0) * w_len
    z = -(px[:, 1] / (h - 1) * 2.0 - 1.0) * h_len
    xyz = np.stack([np.ones_like(y), y, z], axis=-1)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    R1, R2 = camera_rotations_np(theta_deg, phi_deg)
    return (xyz @ R1.T @ R2.T).astype(np.float64)


def lonlat_to_pixel(d: np.ndarray, h: int, w: int) -> np.ndarray:
    """(..., 3) world dirs -> (..., 2) equirect pixel (x, y); the inverse
    of the host grid convention (host_grids.map_pers_pix_to_equi_np)."""
    lon = np.arctan2(d[..., 1], d[..., 0])
    lat = -np.arcsin(np.clip(d[..., 2], -1.0, 1.0))
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    return np.stack([lon / np.pi * cx + cx, lat / (np.pi / 2) * cy + cy],
                    axis=-1)


def pixel_to_dir(x: np.ndarray, y: np.ndarray, h: int, w: int) -> np.ndarray:
    """Equirect pixel (x, y) -> (..., 3) world dirs."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    lon = (x - cx) / cx * np.pi
    lat = -(y - cy) / cy * (np.pi / 2)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)],
                    axis=-1)


# ----------------------------------------------------------- detection
@functools.lru_cache(maxsize=1)
def _lsd():
    """One shared LSD instance, or None when OpenCV is unavailable or the
    build lacks the detector (removed in some 4.x releases)."""
    try:
        import cv2

        return cv2.createLineSegmentDetector()
    except Exception:  # pragma: no cover - cv2 with LSD is in this image
        return None


def detect_view_lines(view: np.ndarray, fov_deg: float, theta_deg: float,
                      phi_deg: float, min_len_px: float = 12.0):
    """LSD segments of one perspective view -> (normals (N, 3),
    weights (N,), end rays (N, 2, 3)). Returns empty arrays when OpenCV (or
    its LSD) is unavailable or nothing is detected."""
    lsd = _lsd()
    if lsd is None:
        return (np.zeros((0, 3)), np.zeros((0,)), np.zeros((0, 2, 3)))
    import cv2

    if view.ndim == 3:
        gray = cv2.cvtColor(view, cv2.COLOR_RGB2GRAY)
    else:
        gray = view
    if gray.dtype != np.uint8:
        gray = np.clip(gray * 255.0 if gray.max() <= 1.5 else gray,
                       0, 255).astype(np.uint8)
    lines = lsd.detect(gray)[0]
    if lines is None or len(lines) == 0:
        return (np.zeros((0, 3)), np.zeros((0,)), np.zeros((0, 2, 3)))
    lines = lines.reshape(-1, 4).astype(np.float64)
    length = np.hypot(lines[:, 2] - lines[:, 0], lines[:, 3] - lines[:, 1])
    lines = lines[length >= min_len_px]
    if len(lines) == 0:
        return (np.zeros((0, 3)), np.zeros((0,)), np.zeros((0, 2, 3)))

    h, w = gray.shape
    r0 = _pixel_to_ray(lines[:, 0:2], fov_deg, theta_deg, phi_deg, h, w)
    r1 = _pixel_to_ray(lines[:, 2:4], fov_deg, theta_deg, phi_deg, h, w)
    n = np.cross(r0, r1)
    norm = np.linalg.norm(n, axis=1)
    keep = norm > 1e-9
    n = n[keep] / norm[keep][:, None]
    arc = np.arccos(np.clip((r0[keep] * r1[keep]).sum(1), -1.0, 1.0))
    return n, arc, np.stack([r0[keep], r1[keep]], axis=1)


def detect_pano_lines(pano: np.ndarray, view_size: int = 320,
                      fov_deg: float = 90.0):
    """Line segments of a whole panorama via the icosahedron-20 view set
    (normals (N, 3), weights (N,), end rays (N, 2, 3))."""
    from .cubemap import Equirectangular

    eq = Equirectangular(np.asarray(pano))
    theta, phi = icosahedron_sample_camera()
    theta, phi = np.rad2deg(theta), np.rad2deg(phi)
    normals, weights, rays = [], [], []
    for t, p in zip(theta, phi):
        view = eq.to_perspective(fov_deg, t, p, (view_size, view_size))
        n, a, r = detect_view_lines(np.asarray(view), fov_deg, t, p)
        normals.append(n)
        weights.append(a)
        rays.append(r)
    return (np.concatenate(normals), np.concatenate(weights),
            np.concatenate(rays))


# --------------------------------------------------------------- voting
@functools.lru_cache()
def _candidate_directions(level: int = 3) -> np.ndarray:
    """(M, 3) unit directions: icosahedron vertices subdivided `level`
    times, upper hemisphere only (directions are sign-symmetric)."""
    t = (1 + np.sqrt(5)) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], np.float64)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    verts = list(verts)
    for _ in range(level):
        new_faces = []
        cache = {}

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                verts.append(m / np.linalg.norm(m))
                cache[key] = len(verts) - 1
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (ab, b, bc), (ca, bc, c),
                          (ab, bc, ca)]
        faces = new_faces
    v = np.unique(np.round(np.array(verts), 12), axis=0)
    # hemisphere: keep z > 0, break ties on the equator by y then x
    key = np.where(np.abs(v[:, 2]) > 1e-9, np.sign(v[:, 2]),
                   np.where(np.abs(v[:, 1]) > 1e-9, np.sign(v[:, 1]),
                            np.sign(v[:, 0])))
    v = v * key[:, None]
    return np.unique(np.round(v, 12), axis=0)


def _nearest_rotation(M: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(M)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
    return R


def find_main_directions(normals: np.ndarray, weights: np.ndarray,
                         tol_deg: float = 2.5, refine_iter: int = 3,
                         level: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """The three orthogonal Manhattan directions from great-circle normals.

    Returns (vp (3, 3) rows = directions with vp[2] the most vertical, and
    per-segment assignment in {-1, 0, 1, 2}). Hough vote over subdivided-
    icosahedron candidates + procrustes-EM refinement (the role of the
    reference's sphereHoughVote/findMainDirectionEMA,
    pano_lsd_align.py:526-711)."""
    if len(normals) < 6:
        raise ValueError(f"too few line segments ({len(normals)}) for VP "
                         "estimation")
    cand = _candidate_directions(level)  # (M, 3)
    tol = np.sin(np.deg2rad(tol_deg))
    # vote matrix: candidate x segment incidence |n.d| < tol
    dots = np.abs(cand @ normals.T)  # (M, N)
    votes = (dots < tol) @ weights

    # best first direction
    d1 = cand[votes.argmax()]
    # second: best candidate ~orthogonal to d1
    ortho = np.abs(cand @ d1) < np.sin(np.deg2rad(5.0))
    if not ortho.any():
        raise ValueError("no orthogonal candidate for the second direction")
    idx2 = np.where(ortho)[0][votes[ortho].argmax()]
    d2 = cand[idx2]
    d3 = np.cross(d1, d2)
    R = _nearest_rotation(np.stack([d1, d2, d3]))

    assign = np.full(len(normals), -1, np.int64)
    for _ in range(refine_iter):
        # E: assign each segment to the direction its plane contains
        inc = np.abs(normals @ R.T)  # (N, 3): |n.d_k|
        best = inc.argmin(axis=1)
        ok = inc[np.arange(len(normals)), best] < tol
        assign = np.where(ok, best, -1)
        # M: refit each direction = smallest right-singular vector of the
        # weighted normals assigned to it
        dirs = []
        for k in range(3):
            sel = assign == k
            if sel.sum() >= 2:
                A = normals[sel] * weights[sel][:, None]
                _, _, Vt = np.linalg.svd(A, full_matrices=True)
                d = Vt[-1]
                if d @ R[k] < 0:
                    d = -d
            else:
                d = R[k]
            dirs.append(d)
        R = _nearest_rotation(np.stack(dirs))

    # final E-step against the refit R: the loop's last assignment was
    # computed BEFORE the last M-step, so boundary segments could come
    # back assigned inconsistently with the returned rotation (affects
    # paint_line_map channel coloring)
    inc = np.abs(normals @ R.T)
    best = inc.argmin(axis=1)
    assign = np.where(inc[np.arange(len(normals)), best] < tol, best, -1)

    # order: put the most-vertical direction last and keep a proper
    # rotation: the row permutation can be odd and the per-row signs are
    # arbitrary, so fix vertical-up first, then restore det=+1 by flipping
    # one horizontal direction (horizontal sign is a free choice)
    vert = np.abs(R[:, 2]).argmax()
    order = [k for k in range(3) if k != vert] + [int(vert)]
    R = R[order]
    if R[2, 2] < 0:
        R[2] = -R[2]
    if np.linalg.det(R) < 0:
        R[1] = -R[1]
    remap = {old: new for new, old in enumerate(order)}
    assign = np.array([remap.get(a, -1) for a in assign], np.int64)
    return R, assign


# ------------------------------------------------------------- rotation
def rotation_grid(h: int, w: int, R: np.ndarray) -> np.ndarray:
    """(h, w, 2) source pixel coords implementing output(p) = input(R.T p)
    on an equirect grid; build once and reuse across images/channels."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    d_out = pixel_to_dir(xx, yy, h, w)  # (h, w, 3)
    d_in = d_out @ R  # rows of R are the recovered axes: p_in = R^T p_out
    return lonlat_to_pixel(d_in, h, w)


def rotate_panorama(pano: np.ndarray, R: np.ndarray,
                    src: Optional[np.ndarray] = None) -> np.ndarray:
    """Resample an equirect image so that world direction ``R[k]`` maps to
    canonical axis k (the role of the reference's rotatePanorama,
    pano_lsd_align.py:124-170). Pass a precomputed ``rotation_grid`` as
    `src` to amortize the trig across multiple images."""
    h, w = pano.shape[:2]
    if src is None:
        src = rotation_grid(h, w, R)

    from ..ops import host

    out = host.remap(np.asarray(pano), src[..., 0].astype(np.float32),
                     src[..., 1].astype(np.float32),
                     mode="bilinear", border="wrap")
    if out is None:
        from scipy.ndimage import map_coordinates

        img = np.asarray(pano, np.float32)
        if img.ndim == 2:
            img = img[..., None]
        out = np.stack([
            map_coordinates(img[..., c], [src[..., 1], src[..., 0]],
                            order=1, mode="wrap")
            for c in range(img.shape[-1])], axis=-1)
        if pano.ndim == 2:
            out = out[..., 0]
        if np.issubdtype(np.asarray(pano).dtype, np.integer):
            out = np.clip(out, 0, 255).astype(pano.dtype)
    return out


def paint_line_map(rays: np.ndarray, assign: np.ndarray, h: int, w: int,
                   samples: Optional[int] = None) -> np.ndarray:
    """(h, w, 3) map with each detected segment painted as a great-circle
    arc, one channel per vanishing direction (the aligned-line image of
    the reference preprocess contract); unassigned segments are dropped.
    Sampling density scales with each arc's pixel extent (2 samples per
    covered column) so lines render continuous at any width."""
    out = np.zeros((h, w, 3), np.float32)
    for (r0, r1), k in zip(rays, assign):
        if k < 0:
            continue
        arc = np.arccos(np.clip(float(r0 @ r1), -1.0, 1.0))
        n = samples or max(8, int(np.ceil(arc / (2 * np.pi) * w * 2)) + 1)
        t = np.linspace(0.0, 1.0, n)
        d = r0[None, :] * (1 - t)[:, None] + r1[None, :] * t[:, None]
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        px = lonlat_to_pixel(d, h, w)
        xs = np.clip(np.round(px[:, 0]).astype(int), 0, w - 1)
        ys = np.clip(np.round(px[:, 1]).astype(int), 0, h - 1)
        out[ys, xs, k] = 1.0
    return out


def pano_vp_align(pano: np.ndarray, view_size: int = 320,
                  fov_deg: float = 90.0, tol_deg: float = 2.5,
                  refine_iter: int = 3,
                  rotate_lines: bool = True) -> dict:
    """Full preprocessing step (reference preprocess.py:52-80): detect
    VPs, align the pano, and build the aligned line map. Returns
    {vp, R, aligned_rgb, aligned_line, n_lines}."""
    normals, weights, rays = detect_pano_lines(pano, view_size, fov_deg)
    R, assign = find_main_directions(normals, weights, tol_deg=tol_deg,
                                     refine_iter=refine_iter)
    h, w = pano.shape[:2]
    src = rotation_grid(h, w, R)
    aligned = rotate_panorama(pano, R, src=src)
    line_map = paint_line_map(rays, assign, h, w)
    if rotate_lines:
        line_map = rotate_panorama(line_map, R, src=src)
    return {
        "vp": R,
        "R": R,
        "aligned_rgb": aligned,
        "aligned_line": line_map,
        "n_lines": int((assign >= 0).sum()),
    }
