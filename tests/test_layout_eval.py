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
