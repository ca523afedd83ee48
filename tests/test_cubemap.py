"""Cubemap <-> equirect conversion tests (host preprocessing path)."""
import numpy as np

from panfusion_tpu.geometry import Cubemap, Equirectangular, c2e, e2c


def _smooth_pano(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, size=(h // 8, w // 8, c))
    # upsample by repetition + box blur for smoothness
    img = np.repeat(np.repeat(small, 8, 0), 8, 1)
    for _ in range(3):
        img = (
            img
            + np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 5.0
    return img


def test_e2c_shapes_and_formats():
    pano = _smooth_pano(64, 128)
    cube_h = e2c(pano, face_w=32, cube_format="horizon")
    assert cube_h.shape == (32, 32 * 6, 3)
    cube_dict = e2c(pano, face_w=32, cube_format="dict")
    assert set(cube_dict.keys()) == {"F", "R", "B", "L", "U", "D"}
    cube_dice = e2c(pano, face_w=32, cube_format="dice")
    assert cube_dice.shape == (96, 128, 3)


def test_dice_roundtrip():
    pano = _smooth_pano(64, 128)
    cube_h = e2c(pano, face_w=32, cube_format="horizon")
    from panfusion_tpu.geometry.cubemap import _dice2h, _h2dice

    np.testing.assert_allclose(_dice2h(_h2dice(cube_h)), cube_h)


def test_c2e_e2c_roundtrip():
    """pano -> cube -> pano should be close away from the poles."""
    pano = _smooth_pano(64, 128)
    cube = e2c(pano, face_w=64, cube_format="horizon")
    back = c2e(cube, 64, 128, cube_format="horizon")
    # compare the central latitude band (poles distort under equirect)
    a, b = pano[16:48], back[16:48]
    err = np.abs(a - b).mean()
    assert err < 8.0, err  # on a 0..255 scale (vendored py360convert scores 5.76 here)


def test_c2e_continuity_at_seams():
    """No large jumps at cube-face seam columns after stitching."""
    pano = _smooth_pano(64, 128)
    cube = e2c(pano, face_w=64, cube_format="horizon")
    back = c2e(cube, 64, 128, cube_format="horizon")
    d = np.abs(np.diff(back[16:48], axis=1)).max()
    d_orig = np.abs(np.diff(pano[16:48], axis=1)).max()
    assert d < d_orig * 3 + 10


def test_equirectangular_wrapper_roundtrip(tmp_path):
    pano = _smooth_pano(64, 128).astype(np.uint8)
    eq = Equirectangular(pano)
    cube = eq.to_cubemap(face_w=32)
    assert isinstance(cube, Cubemap)
    eq2 = cube.to_equirectangular(64, 128)
    assert eq2.equirectangular.shape == (64, 128, 3)
    p = tmp_path / "x" / "pano.png"
    eq2.save(str(p))
    assert p.exists()


def test_equirectangular_to_perspective():
    pano = _smooth_pano(64, 128)
    pers = Equirectangular(pano).to_perspective(90.0, 0.0, 0.0, (32, 32))
    assert pers.shape == (32, 32, 3)
    # center pixel of a (0,0) view ~ pano center
    assert abs(pers[16, 16, 0] - pano[32, 64, 0]) < 30
