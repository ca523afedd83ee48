"""Panorama stretch augmentation (reference
external/HorizonNet/misc/panostretch.py, dataset.py:69-82)."""
import numpy as np
import pytest

from panfusion_tpu.geometry.stretch import (
    cor2xybound,
    coorx2u,
    coory2v,
    pano_stretch,
    pano_stretch_grid,
    sample_stretch_factors,
    stretch_corners,
    u2coorx,
    uv2xy,
    v2coory,
)


def _square_room_corners(w=1024, h=512, n_walls=4):
    """Corner annotations of a square room: (ceil, floor) pairs per wall."""
    xs = np.array([w * (i + 0.5) / n_walls for i in range(n_walls)])
    cor = []
    for x in xs:
        cor.append([x, h * 0.3])  # ceiling
        cor.append([x, h * 0.7])  # floor
    return np.array(cor, np.float64)


class TestStretchMath:
    def test_identity_factors(self):
        img = np.random.default_rng(0).random((64, 128, 3)).astype(np.float32)
        cor = _square_room_corners(128, 64)
        out, cor2 = pano_stretch(img, cor, 1.0, 1.0)
        np.testing.assert_allclose(out, img, atol=1e-5)
        np.testing.assert_allclose(cor2, cor, atol=1e-6)

    def test_grid_matches_reference_formula(self):
        """Golden check of the forward grid against the reference formula
        evaluated directly (panostretch.py:92-99)."""
        h, w, kx, ky = 32, 64, 1.7, 0.8
        refx, refy = pano_stretch_grid(h, w, kx, ky)
        uv_x = ((np.arange(w) + 0.5) / w - 0.5) * 2 * np.pi
        uv_y = ((np.arange(h) + 0.5) / h - 0.5) * np.pi
        sin_u = np.sin(uv_x)[None, :].repeat(h, 0)
        cos_u = np.cos(uv_x)[None, :].repeat(h, 0)
        tan_v = np.tan(uv_y)[:, None].repeat(w, 1)
        u0 = np.arctan2(sin_u * kx / ky, cos_u)
        with np.errstate(invalid="ignore", divide="ignore"):
            v0 = np.arctan(tan_v * np.sin(u0) / sin_u * ky)
        ok = sin_u != 0
        np.testing.assert_allclose(
            refx[ok], ((u0 / (2 * np.pi) + 0.5) * w - 0.5)[ok], atol=1e-4)
        np.testing.assert_allclose(
            refy[ok], ((v0 / np.pi + 0.5) * h - 0.5)[ok], atol=1e-4)

    def test_corner_transform_inverts_grid(self):
        """A corner moved by stretch_corners lands where the stretched
        image sampled it from: grid(corner_out) == corner_in."""
        h, w, kx, ky = 256, 512, 1.5, 1.2
        cor = _square_room_corners(w, h)
        cor2 = stretch_corners(cor, h, w, kx, ky)
        # forward-map the stretched positions back through the image grid
        u0 = coorx2u(cor2[:, 0], w)
        v0 = coory2v(cor2[:, 1], h)
        u_back = np.arctan2(np.sin(u0) * kx / ky, np.cos(u0))
        v_back = np.arctan(np.tan(v0) * np.sin(u_back) / np.sin(u0) * ky)
        np.testing.assert_allclose(u2coorx(u_back, w) % w, cor[:, 0] % w,
                                   atol=1e-6)
        np.testing.assert_allclose(v2coory(v_back, h), cor[:, 1], atol=1e-6)

    def test_vertical_structure_preserved(self):
        """Ceiling corners stay above floor corners under any stretch."""
        cor = _square_room_corners()
        for kx, ky in [(2.0, 1.0), (0.5, 1.5), (1.3, 0.6)]:
            cor2 = stretch_corners(cor, 512, 1024, kx, ky)
            assert np.all(cor2[0::2, 1] < cor2[1::2, 1])


class TestFactorSampling:
    def test_cor2xybound_square_room(self):
        cor = _square_room_corners()
        xmin, ymin, xmax, ymax = cor2xybound(cor)
        assert 0 < xmin <= xmax
        assert 0 < ymin <= ymax

    def test_cor2xybound_matches_reference_formula(self):
        """Golden check against the reference formula transcribed inline
        (external/HorizonNet/dataset.py:188-207)."""
        rng = np.random.default_rng(3)
        cor = _square_room_corners()
        cor[:, 1] += rng.normal(scale=5.0, size=len(cor))
        corU, corB = cor[0::2], cor[1::2]
        zU = -50
        u = coorx2u(corU[:, 0])
        vU = coory2v(corU[:, 1])
        vB = coory2v(corB[:, 1])
        x, y = uv2xy(u, vU, z=zU)
        c = np.sqrt(x**2 + y**2)
        zB = c * np.tan(vB)
        S = 3 / abs(zB.mean() - zU)
        dx = [abs(x.min() * S), abs(x.max() * S)]
        dy = [abs(y.min() * S), abs(y.max() * S)]
        expected = (min(dx), min(dy), max(dx), max(dy))
        np.testing.assert_allclose(cor2xybound(cor), expected, rtol=1e-9)

    def test_sampled_factors_bounded(self):
        cor = _square_room_corners()
        rng = np.random.default_rng(0)
        for _ in range(50):
            kx, ky = sample_stretch_factors(rng, cor, max_stretch=2.0)
            assert 0.4 <= kx <= 2.5
            assert 0.4 <= ky <= 2.5

    def test_uv2xy_roundtrip(self):
        u = np.array([0.3, -1.2, 2.0])
        v = np.array([-0.4, -0.7, -0.5])
        x, y = uv2xy(u, v, z=-50)
        np.testing.assert_allclose(np.arctan2(y, x), u, atol=1e-9)


class TestImageConsistency:
    @pytest.mark.parametrize("order", [0, 1])
    def test_stretch_moves_content_with_corners(self, order):
        """Paint a bright dot at a corner; after stretching, the dot must
        lie at the transformed corner position."""
        h, w = 256, 512
        img = np.zeros((h, w, 3), np.float32)
        cor = np.array([[150.0, 100.0], [150.0, 180.0]])
        y0, x0 = int(cor[0][1]), int(cor[0][0])
        img[y0 - 3 : y0 + 4, x0 - 3 : x0 + 4] = 1.0
        kx, ky = 1.4, 0.9
        out, cor2 = pano_stretch(img, cor, kx, ky, order=order)
        yy, xx = np.nonzero(out[..., 0] > 0.5)
        assert len(xx) > 0
        cx, cy = xx.mean(), yy.mean()
        assert abs(cx - cor2[0, 0]) < 4.0
        assert abs(cy - cor2[0, 1]) < 4.0
