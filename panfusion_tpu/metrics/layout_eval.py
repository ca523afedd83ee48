"""Standalone layout evaluation metrics (host-side numpy).

Capability parity with the vendored HorizonNet evaluation CLIs:

* general layouts (reference external/HorizonNet/eval_general.py:14-124):
  2D/3D floor-polygon IoU, layout-depth RMSE and delta_1 — with the
  per-corner-count result breakdown;
* cuboid layouts (reference external/HorizonNet/eval_cuboid.py:100-146):
  corner error (CE, % of image diagonal), pixel surface error (PE, % of
  pixels with the wrong ceiling/wall/floor label), 3D IoU.

These consume ceil/floor-interleaved corner-pixel layouts — the output of
``metrics.manhattan.horizon_to_manhattan_layout`` / the `uv` field written
by tools/horizon_infer.py — and stay on the host: the math is tiny,
irregular, and eval-only (SURVEY.md §7.4 item 7).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from ..data.layout import _corners_to_boundaries
from .manhattan import coorx2u, eval_layout_iou, get_z1, infer_coory


def layout_to_depth(cor_id: np.ndarray, h: int, w: int,
                    camera_height: float = 1.6,
                    return_mask: bool = False):
    """Per-pixel layout depth map from corner annotations (reference
    eval_general.py:14-54 ``layout_2_depth``): the room is the union of a
    floor plane, a ceiling plane and vertical walls through the floor
    boundary; every equirect pixel gets the distance to the surface its
    ray hits."""
    bon = _corners_to_boundaries(np.asarray(cor_id, np.float64), h, w)
    vc, vf = bon[0:1], bon[1:2]  # (1, w): ceiling (<0) / floor (>0) angles
    if (vc > 0).any() or (vf < 0).any():
        raise ValueError("ceiling boundary must be above the horizon and "
                         "floor boundary below")

    vs = ((np.arange(h) + 0.5) / h - 0.5) * np.pi
    vs = np.repeat(vs[:, None], w, axis=1)

    floor_d = np.abs(camera_height / np.sin(vs))
    cs = camera_height / np.tan(vf)          # wall distance per column
    ceil_h = np.abs(cs * np.tan(vc))         # ceiling height per column
    ceil_d = np.abs(ceil_h / np.sin(vs))
    wall_d = np.abs(cs / np.cos(vs))

    floor_mask = vs > vf
    ceil_mask = vs < vc
    wall_mask = ~floor_mask & ~ceil_mask
    depth = np.where(floor_mask, floor_d,
                     np.where(ceil_mask, ceil_d, wall_d)).astype(np.float32)
    assert (depth > 0).all()
    if return_mask:
        return depth, floor_mask, ceil_mask, wall_mask
    return depth


def eval_general_layout(dt_cor_id: np.ndarray, gt_cor_id: np.ndarray,
                        w: int = 1024, h: int = 512) -> Dict[str, float]:
    """{2DIoU, 3DIoU, rmse, delta_1} for one prediction/GT pair (reference
    eval_general.py:56-124 ``test_general``)."""
    dt_cor_id = np.asarray(dt_cor_id, np.float64)
    gt_cor_id = np.asarray(gt_cor_id, np.float64)
    iou3d, iou2d = eval_layout_iou(dt_cor_id, gt_cor_id)

    gt_depth = layout_to_depth(gt_cor_id, h, w)
    try:
        dt_depth = layout_to_depth(dt_cor_id, h, w)
    except Exception:
        dt_depth = np.zeros_like(gt_depth)
    rmse = float(np.sqrt(((gt_depth - dt_depth) ** 2).mean()))
    with np.errstate(divide="ignore", invalid="ignore"):
        thres = np.maximum(gt_depth / dt_depth, dt_depth / gt_depth)
    delta_1 = float((thres < 1.25).mean())
    return {"2DIoU": iou2d, "3DIoU": iou3d, "rmse": rmse, "delta_1": delta_1}


def _boundary_regression(xys: np.ndarray, w: int) -> np.ndarray:
    """Sorted per-column y from sampled boundary points (reference
    eval_cuboid.py gen_reg_from_xy contract)."""
    xs = np.round(xys[:, 0]).astype(int) % w
    reg = np.full(w, np.nan)
    reg[xs] = xys[:, 1]
    # fill any unpainted column by circular interpolation
    if np.isnan(reg).any():
        idx = np.nonzero(~np.isnan(reg))[0]
        reg = np.interp(np.arange(w), idx, reg[idx], period=w)
    return reg


def eval_cuboid_layout(dt_cor_id: np.ndarray, gt_cor_id: np.ndarray,
                       w: int = 1024, h: int = 512,
                       z0: float = 50.0,
                       z1: Optional[float] = None) -> Dict[str, float]:
    """{CE, PE, 3DIoU} for a 4-wall layout pair (reference
    eval_cuboid.py:100-146 ``test``). z0 is the ceiling plane height in the
    solver convention (+50, metrics.manhattan.horizon_to_manhattan_layout);
    z1 the (negative) floor height, voted from the prediction when absent."""
    from ..data.layout import _connect_points

    dt = np.asarray(dt_cor_id, np.float64)
    gt = np.asarray(gt_cor_id, np.float64)
    assert len(dt) == 8 and len(gt) == 8, "cuboid eval expects 4 walls"

    # corner error, % of image diagonal
    ce = float(100 * np.sqrt(((gt - dt) ** 2).sum(1)).mean()
               / np.sqrt(w ** 2 + h ** 2))

    if z1 is None:
        z1 = float(np.mean(get_z1(dt[0::2, 1], dt[1::2, 1], z0, h)))

    # surface label maps: ceiling boundary from predicted/GT ceiling
    # corners, floor boundary inferred from the plane heights
    def boundary(cor_pairs, z):
        pts = [
            _connect_points(cor_pairs[j], cor_pairs[(j + 1) % 4], z, w, h)
            for j in range(4)
        ]
        return _boundary_regression(np.concatenate(pts, 0), w)

    # _connect_points uses the image-down v convention: ceiling plane -z0
    y0_dt = boundary(dt[0::2], -z0)
    y1_dt = infer_coory(y0_dt, z1 - z0, z0, h)
    y0_gt = boundary(gt[0::2], -z0)
    y1_gt = boundary(gt[1::2], z0)

    def surface(y0, y1):
        s = np.zeros((h, w), np.int32)
        s[np.clip(np.round(y0).astype(int), 0, h - 1), np.arange(w)] = 1
        s[np.clip(np.round(y1).astype(int), 0, h - 1), np.arange(w)] = 1
        return np.cumsum(s, axis=0)

    pe = float(100 * (surface(y0_dt, y1_dt) != surface(y0_gt, y1_gt)).sum()
               / (h * w))
    iou3d, _ = eval_layout_iou(dt, gt)
    return {"CE": ce, "PE": pe, "3DIoU": iou3d}


class GeneralLayoutEval:
    """Streaming aggregator with the reference's per-corner-count breakdown
    (eval_general.py:108-123): buckets '4'..'9', '10+', 'odd', 'overall'."""

    def __init__(self, w: int = 1024, h: int = 512):
        self.w, self.h = w, h
        self.losses: Dict[str, Dict[str, list]] = defaultdict(
            lambda: defaultdict(list))

    def update(self, dt_cor_id: np.ndarray, gt_cor_id: np.ndarray):
        res = eval_general_layout(dt_cor_id, gt_cor_id, self.w, self.h)
        n = len(gt_cor_id) // 2
        bucket = "odd" if n % 2 == 1 else (str(n) if n < 10 else "10+")
        for k, v in res.items():
            self.losses[bucket][k].append(v)
            self.losses["overall"][k].append(v)
        return res

    def compute(self) -> Dict[str, Dict[str, float]]:
        return {
            bucket: {k: float(np.mean(v)) for k, v in metrics.items()}
            for bucket, metrics in self.losses.items()
        }
