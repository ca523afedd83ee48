"""Vanishing-point detection + panorama alignment (reference
external/HorizonNet/misc/pano_lsd_align.py / preprocess.py)."""
import numpy as np
import pytest

from panfusion_tpu.geometry.cubemap import c2e
from panfusion_tpu.geometry.vp_align import (
    _candidate_directions,
    detect_pano_lines,
    find_main_directions,
    lonlat_to_pixel,
    paint_line_map,
    pano_vp_align,
    pixel_to_dir,
    rotate_panorama,
    view_rays,
)

cv2 = pytest.importorskip("cv2")


def _manhattan_pano(h=256, w=512, face_w=128, step=16):
    """Equirect render of a cube room whose faces carry an axis-aligned
    grid — every painted line is parallel to a world axis."""
    face = np.full((face_w, face_w), 235, np.uint8)
    face[::step, :] = 20
    face[:, ::step] = 20
    faces = np.concatenate([face] * 6, axis=1)  # horizon format
    pano = c2e(faces[..., None].repeat(3, -1), h, w)
    return np.asarray(pano).astype(np.uint8)


def _rot_z(deg):
    a = np.deg2rad(deg)
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1.0]])


def _rot_y(deg):
    a = np.deg2rad(deg)
    return np.array([[np.cos(a), 0, np.sin(a)],
                     [0, 1.0, 0],
                     [-np.sin(a), 0, np.cos(a)]])


def _axis_match_error_deg(vp, R_true):
    """Max angle (deg) between each recovered direction and its closest
    true axis column (sign-agnostic)."""
    cols = R_true  # rows of R_true.T = columns of R_true... directions
    errs = []
    for d in vp:
        c = np.abs(cols @ d).max()
        errs.append(np.rad2deg(np.arccos(np.clip(c, -1, 1))))
    return max(errs)


class TestPrimitives:
    def test_pixel_dir_roundtrip(self):
        h, w = 128, 256
        yy, xx = np.mgrid[10 : h - 10 : 7, 0:w:11].astype(np.float64)
        d = pixel_to_dir(xx, yy, h, w)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-9)
        px = lonlat_to_pixel(d, h, w)
        np.testing.assert_allclose(px[..., 0], xx, atol=1e-6)
        np.testing.assert_allclose(px[..., 1], yy, atol=1e-6)

    def test_view_rays_center_points_at_camera(self):
        rays = view_rays(90.0, 40.0, 15.0, 33, 33)
        center = rays[16, 16]
        lon = np.arctan2(center[1], center[0])
        lat = np.arcsin(center[2])
        assert abs(np.rad2deg(lon) - 40.0) < 0.5
        assert abs(np.rad2deg(lat) - 15.0) < 0.5

    def test_candidates_cover_sphere(self):
        cand = _candidate_directions(3)  # the default voting level
        assert len(cand) > 300
        np.testing.assert_allclose(np.linalg.norm(cand, axis=1), 1.0,
                                   atol=1e-9)
        # nearest-candidate angle to random directions is small
        rng = np.random.default_rng(0)
        d = rng.normal(size=(256, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ang = np.rad2deg(np.arccos(np.clip(np.abs(d @ cand.T), -1, 1)))
        assert ang.min(axis=1).max() < 6.0


class TestSyntheticDirections:
    def test_recovers_axes_from_clean_normals(self):
        """Segments lying on planes through each canonical axis."""
        rng = np.random.default_rng(1)
        normals, weights = [], []
        for axis in np.eye(3):
            for _ in range(40):
                v = rng.normal(size=3)
                n = np.cross(axis, v)
                n /= np.linalg.norm(n)
                normals.append(n)
                weights.append(rng.uniform(0.05, 0.3))
        vp, assign = find_main_directions(np.array(normals),
                                          np.array(weights))
        assert _axis_match_error_deg(vp, np.eye(3)) < 1.0
        assert np.abs(vp[2, 2]) > 0.99  # vertical last
        assert np.linalg.det(vp) > 0.5  # proper rotation, not a reflection
        assert (assign >= 0).mean() > 0.9

    def test_never_returns_reflection(self):
        """When the second-voted direction is the vertical one, the row
        reorder is an odd permutation — the result must still have
        det=+1 or rotate_panorama would mirror the output."""
        rng = np.random.default_rng(7)
        normals, weights = [], []
        # x strongest, z second, y weakest
        for axis, n_seg in zip(np.eye(3), (80, 20, 50)):
            for _ in range(n_seg):
                v = rng.normal(size=3)
                n = np.cross(axis, v)
                n /= np.linalg.norm(n)
                normals.append(n)
                weights.append(1.0)
        vp, _ = find_main_directions(np.array(normals), np.array(weights))
        assert np.linalg.det(vp) > 0.5
        assert vp[2, 2] > 0.99

    def test_recovers_rotated_axes(self):
        R0 = _rot_z(25.0) @ _rot_y(12.0)
        rng = np.random.default_rng(2)
        normals, weights = [], []
        for axis in R0.T:  # world images of the canonical axes
            for _ in range(50):
                v = rng.normal(size=3)
                n = np.cross(axis, v)
                n /= np.linalg.norm(n)
                # mild noise
                n += rng.normal(scale=0.004, size=3)
                n /= np.linalg.norm(n)
                normals.append(n)
                weights.append(1.0)
        vp, _ = find_main_directions(np.array(normals), np.array(weights))
        assert _axis_match_error_deg(vp, R0.T) < 1.5

    def test_too_few_segments_raise(self):
        with pytest.raises(ValueError):
            find_main_directions(np.eye(3), np.ones(3))


class TestPanoramaPipeline:
    def test_detects_lines_on_manhattan_pano(self):
        pano = _manhattan_pano()
        normals, weights, rays = detect_pano_lines(pano, view_size=160)
        assert len(normals) > 60
        np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0,
                                   atol=1e-6)

    def test_alignment_recovers_known_rotation(self):
        pano = _manhattan_pano()
        R0 = _rot_z(18.0) @ _rot_y(9.0)
        # rotate_panorama(pano, R) maps direction R[k] -> axis k, so
        # synthesizing with R0 moves the VPs to the columns of R0
        rotated = rotate_panorama(pano, R0)
        res = pano_vp_align(rotated, view_size=160)
        assert res["n_lines"] > 60
        assert np.linalg.det(res["vp"]) > 0.5
        assert _axis_match_error_deg(res["vp"], R0.T) < 2.0
        # vertical axis recovered upright (true vertical VP = R0 e_z)
        assert res["vp"][2] @ R0[:, 2] > np.cos(np.deg2rad(2.0))

    def test_aligned_pano_matches_original(self):
        pano = _manhattan_pano()
        R0 = _rot_z(18.0)  # pure yaw: alignment is exact up to yaw choice
        rotated = rotate_panorama(pano, R0)
        res = pano_vp_align(rotated, view_size=160)
        aligned = res["aligned_rgb"]
        # compare away from the poles; the recovered yaw is ambiguous mod
        # 90deg, so compare against the best 90deg-roll of the original
        h, w = pano.shape[:2]
        band = slice(h // 4, 3 * h // 4)
        diffs = []
        for roll in range(4):
            ref = np.roll(pano, roll * w // 4, axis=1)
            diffs.append(np.abs(aligned[band].astype(float)
                                - ref[band].astype(float)).mean())
        assert min(diffs) < 12.0

    def test_line_map_paints_assigned_segments(self):
        pano = _manhattan_pano()
        normals, weights, rays = detect_pano_lines(pano, view_size=160)
        vp, assign = find_main_directions(normals, weights)
        lm = paint_line_map(rays, assign, *pano.shape[:2])
        assert lm.shape == (*pano.shape[:2], 3)
        assert (lm > 0).any()
