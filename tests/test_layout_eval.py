"""Standalone layout evaluation (reference external/HorizonNet
eval_general.py / eval_cuboid.py)."""
import numpy as np
import pytest

from panfusion_tpu.metrics.layout_eval import (
    GeneralLayoutEval,
    eval_cuboid_layout,
    eval_general_layout,
    layout_to_depth,
)

W, H = 1024, 512


def _cuboid_corners(ceil_y=150.0, floor_y=360.0, n_walls=4):
    xs = [W * (i + 0.5) / n_walls for i in range(n_walls)]
    cor = []
    for x in xs:
        cor.append([x, ceil_y])
        cor.append([x, floor_y])
    return np.array(cor, np.float64)


class TestLayoutToDepth:
    def test_nadir_is_camera_height(self):
        depth = layout_to_depth(_cuboid_corners(), H, W, camera_height=1.6)
        assert depth.shape == (H, W)
        np.testing.assert_allclose(depth[-1], 1.6, rtol=0.01)

    def test_depth_positive_everywhere(self):
        depth = layout_to_depth(_cuboid_corners(), H, W)
        assert (depth > 0).all() and np.isfinite(depth).all()

    def test_masks_partition(self):
        d, fm, cm, wm = layout_to_depth(_cuboid_corners(), H, W,
                                        return_mask=True)
        total = fm.astype(int) + cm.astype(int) + wm.astype(int)
        assert (total == 1).all()

    def test_taller_ceiling_increases_zenith_depth(self):
        near = layout_to_depth(_cuboid_corners(ceil_y=200.0), H, W)
        far = layout_to_depth(_cuboid_corners(ceil_y=100.0), H, W)
        assert far[0].mean() > near[0].mean()


class TestGeneralEval:
    def test_perfect_prediction(self):
        cor = _cuboid_corners()
        res = eval_general_layout(cor, cor, W, H)
        assert res["2DIoU"] > 0.99
        assert res["3DIoU"] > 0.99
        assert res["rmse"] < 1e-3
        assert res["delta_1"] == 1.0

    def test_shifted_prediction_degrades(self):
        gt = _cuboid_corners()
        res_good = eval_general_layout(gt, gt, W, H)
        dt = gt.copy()
        dt[:, 1] += np.where(np.arange(8) % 2 == 0, -30.0, 30.0)
        res_bad = eval_general_layout(dt, gt, W, H)
        assert res_bad["2DIoU"] <= res_good["2DIoU"]
        assert res_bad["3DIoU"] < res_good["3DIoU"]
        assert res_bad["rmse"] > res_good["rmse"]
        assert res_bad["delta_1"] < res_good["delta_1"]

    def test_aggregator_buckets(self):
        agg = GeneralLayoutEval(W, H)
        cor4 = _cuboid_corners()
        cor6 = _cuboid_corners(n_walls=6)
        agg.update(cor4, cor4)
        agg.update(cor6, cor6)
        out = agg.compute()
        assert set(out) == {"4", "6", "overall"}
        assert len(out["overall"]) == 4
        assert out["overall"]["delta_1"] == 1.0


class TestCuboidEval:
    def test_perfect_prediction(self):
        cor = _cuboid_corners()
        res = eval_cuboid_layout(cor, cor, W, H)
        assert res["CE"] == 0.0
        assert res["PE"] < 1.0  # discretization of the inferred floor curve
        assert res["3DIoU"] > 0.99

    def test_corner_error_scales(self):
        gt = _cuboid_corners()
        dt = gt + 10.0
        res = eval_cuboid_layout(dt, gt, W, H)
        expected_ce = 100 * np.sqrt(200.0) / np.sqrt(W**2 + H**2)
        np.testing.assert_allclose(res["CE"], expected_ce, rtol=1e-6)

    def test_requires_four_walls(self):
        with pytest.raises(AssertionError):
            eval_cuboid_layout(_cuboid_corners(n_walls=6),
                               _cuboid_corners(n_walls=6), W, H)


class TestExactPolygonIntersection:
    """polygon_intersection_area is the GEOS replacement (exact, float
    precision); the rasterized polygon_iou_2d is the independent
    O(1/grid) cross-check."""

    def test_rect_rect_known_value(self):
        from panfusion_tpu.metrics.manhattan import polygon_intersection_area
        a = np.array([[0, 0], [4, 0], [4, 3], [0, 3]], np.float64)
        b = np.array([[2, 1], [6, 1], [6, 5], [2, 5]], np.float64)
        assert polygon_intersection_area(a, b) == pytest.approx(4.0, abs=1e-12)

    def test_disjoint_is_zero(self):
        from panfusion_tpu.metrics.manhattan import polygon_intersection_area
        a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
        b = a + 5.0
        assert polygon_intersection_area(a, b) == pytest.approx(0.0, abs=1e-12)

    def test_contained_is_inner_area(self):
        from panfusion_tpu.metrics.manhattan import polygon_intersection_area
        outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
        inner = np.array([[2, 2], [5, 2], [5, 6], [2, 6]], np.float64)
        assert polygon_intersection_area(outer, inner) == pytest.approx(
            12.0, abs=1e-12)
        assert polygon_intersection_area(inner, outer) == pytest.approx(
            12.0, abs=1e-12)

    def test_nonconvex_L_shapes(self):
        # L-shape (non-convex, the typical >4-wall Manhattan room) vs a
        # square covering the notch: exact value by hand.
        from panfusion_tpu.metrics.manhattan import polygon_intersection_area
        L = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]],
                     np.float64)  # area 12
        sq = np.array([[1, 1], [3, 1], [3, 3], [1, 3]], np.float64)  # area 4
        # overlap: [1,3]x[1,2] (2) + [1,2]x[2,3] (1) = 3
        assert polygon_intersection_area(L, sq) == pytest.approx(3.0,
                                                                 abs=1e-12)

    def test_orientation_invariance(self):
        from panfusion_tpu.metrics.manhattan import polygon_intersection_area
        a = np.array([[0, 0], [4, 0], [4, 3], [0, 3]], np.float64)
        b = np.array([[2, 1], [6, 1], [6, 5], [2, 5]], np.float64)
        ref = polygon_intersection_area(a, b)
        assert polygon_intersection_area(a[::-1], b) == pytest.approx(ref)
        assert polygon_intersection_area(a, b[::-1]) == pytest.approx(ref)
        assert polygon_intersection_area(a[::-1], b[::-1]) == pytest.approx(
            ref)

    def test_matches_rasterized_crosscheck_random(self):
        from panfusion_tpu.metrics.manhattan import (
            polygon_intersection_area, polygon_iou_2d, polygon_area)
        rng = np.random.default_rng(0)
        for _ in range(8):
            # random simple star-shaped polygons around distinct centers
            def star(cx, cy):
                n = int(rng.integers(4, 9))
                ang = np.sort(rng.uniform(0, 2 * np.pi, n))
                rad = rng.uniform(0.5, 2.0, n)
                return np.stack([cx + rad * np.cos(ang),
                                 cy + rad * np.sin(ang)], axis=1)
            a = star(0.0, 0.0)
            b = star(rng.uniform(-1, 1), rng.uniform(-1, 1))
            exact = polygon_intersection_area(a, b)
            raster, _ = polygon_iou_2d(a, b, grid=1024)
            scale = max(polygon_area(a), polygon_area(b))
            assert abs(exact - raster) / scale < 5e-2
