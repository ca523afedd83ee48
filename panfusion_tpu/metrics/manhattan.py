"""Manhattan-world layout post-processing + layout IoU (host-side numpy).

Behavioral parity with the reference's HorizonNet post-processing chain
(external/HorizonNet/misc/post_proc.py, external/HorizonNet/inference.py
find_N_peaks, models/horizonnet/HorizonNet.py:18-67): the per-column
boundary/corner signals of the layout net are turned into a Manhattan
corner list by (1) fixing the ceiling plane at z0=50 and voting a floor
height, (2) peak-picking wall-wall boundaries, (3) fitting axis-aligned
walls to the ceiling-plane footprint by an inlier-run vote, with a
cuboid fallback, and (4) reprojecting corners to equirect pixels.

This stays host-side by design (SURVEY.md §7.4 item 7): it is data-dependent
control flow over tiny 1-D arrays, the wrong shape for XLA.

Polygon IoU (reference: shapely/GEOS, models/horizonnet/HorizonNet.py:219-242;
GEOS is not in this environment) is computed EXACTLY via signed fan
triangulation + convex clipping (polygon_intersection_area) — same value as
GEOS to float precision. A rasterized estimator is kept as an independent
cross-check (polygon_iou_2d).
"""
from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional, Tuple

import numpy as np

PI = float(np.pi)


# ---------------------------------------------------------------- coords
def coorx2u(x, w: int = 1024):
    return ((x + 0.5) / w - 0.5) * 2 * PI


def coory2v(y, h: int = 512):
    return -((y + 0.5) / h - 0.5) * PI


def coor2xy(coor, z=50, w: int = 1024, h: int = 512, floor_w=1024, floor_h=512):
    """(N, 2) pixel (col,row) -> floor-plane xy at plane height z."""
    coor = np.asarray(coor)
    u = coorx2u(coor[:, 0], w)
    v = coory2v(coor[:, 1], h)
    c = z / np.tan(v)
    x = c * np.sin(u) + floor_w / 2 - 0.5
    y = -c * np.cos(u) + floor_h / 2 - 0.5
    return np.stack([x, y], axis=1)


def xy2coor(xy, z=50, w: int = 1024, h: int = 512, floor_w=1024, floor_h=512):
    x = xy[:, 0] - floor_w / 2 + 0.5
    y = xy[:, 1] - floor_h / 2 + 0.5
    u = np.arctan2(x, -y)
    v = np.arctan(z / np.sqrt(x ** 2 + y ** 2))
    coorx = (u / (2 * PI) + 0.5) * w - 0.5
    coory = (-v / PI + 0.5) * h - 0.5
    return np.stack([coorx, coory], axis=1)


def x_u_solve_y(x, u, floor_w=1024, floor_h=512):
    c = (x - floor_w / 2 + 0.5) / np.sin(u)
    return -c * np.cos(u) + floor_h / 2 - 0.5


def y_u_solve_x(y, u, floor_w=1024, floor_h=512):
    c = -(y - floor_h / 2 + 0.5) / np.cos(u)
    return c * np.sin(u) + floor_w / 2 - 0.5


def get_z1(coory0, coory1, z0=50, h: int = 512):
    """Height of the plane through coory1 given coory0 lies on plane z0."""
    c0 = z0 / np.tan(coory2v(np.asarray(coory0), h))
    return c0 * np.tan(coory2v(np.asarray(coory1), h))


def infer_coory(coory0, dz, z0=50, h: int = 512):
    c0 = z0 / np.tan(coory2v(np.asarray(coory0), h))
    v1 = np.arctan2(z0 + dz, c0)
    return (-v1 / PI + 0.5) * h - 0.5


def mean_percentile(vec, p1=25, p2=75):
    lo, hi = np.percentile(vec, p1), np.percentile(vec, p2)
    return vec[(lo <= vec) & (vec <= hi)].mean()


def refine_by_fix_z(coory0, coory1, z0=50, h: int = 512):
    """Vote a single plane height for coory1 assuming coory0 on plane z0;
    returns (refined coory1 curve, voted z1)."""
    c0 = z0 / np.tan(coory2v(coory0, h))
    z1 = c0 * np.tan(coory2v(coory1, h))
    z1_mean = mean_percentile(z1)
    coory1_ref = (-np.arctan2(z1_mean, c0) / PI + 0.5) * h - 0.5
    return coory1_ref, z1_mean


# ---------------------------------------------------------------- peaks
def find_peaks(signal: np.ndarray, r: int = 29, min_v: float = 0.05,
               n: Optional[int] = None):
    """Local maxima of a circular 1-D signal (max-filter window r), above
    min_v; keep the strongest n (reference find_N_peaks contract)."""
    from scipy.ndimage import maximum_filter

    max_v = maximum_filter(signal, size=r, mode="wrap")
    loc = np.where(max_v == signal)[0]
    loc = loc[signal[loc] > min_v]
    if n is not None:
        strongest = np.argsort(-signal[loc])[:n]
        loc = np.sort(loc[strongest])
    return loc, signal[loc]


# ---------------------------------------------------------------- voting
def vote_value(vec: np.ndarray, tol: float):
    """Largest run of sorted values with pairwise spread <= tol covering
    >= 40% of samples; returns (value, coverage score, L1 residual)."""
    vec = np.sort(np.asarray(vec))
    n_arr = np.arange(len(vec))[::-1]
    run_len = n_arr[:, None] - n_arr[None, :] + 1.0
    spread = np.abs(vec[:, None] - vec[None, :]) + 1e-9

    invalid = (run_len < len(vec) * 0.4) | (spread > tol)
    if (~invalid).sum() == 0 or len(vec) < tol:
        best, score = np.median(vec), 0.0
    else:
        run_len = np.where(invalid, -1.0, run_len)
        idx = run_len.argmax()
        row, col = idx // len(vec), idx % len(vec)
        best = vec[row:col + 1].mean()
        score = (col - row + 1) / len(vec)
    return best, score, float(np.abs(vec - best).mean())


def _segment_ids(peak_x: np.ndarray, w: int) -> np.ndarray:
    """Column -> wall-segment id; the segment before the first peak wraps
    around to join the last (id 0)."""
    ids = np.zeros(w)
    ids[np.round(peak_x).astype(int)] = 1
    ids = np.cumsum(ids).astype(int)
    ids[ids == ids[-1]] = 0
    return ids


@dataclasses.dataclass
class Wall:
    axis: int  # 0: constant-x wall, 1: constant-y wall
    val: float
    score: float = 0.0
    seg: int = -1
    u0: float = -1.0
    u1: float = -1.0
    pending: bool = True


def _fit_walls_cuboid(xy: np.ndarray, seg: np.ndarray, tol: float) -> List[Wall]:
    """4 walls, alternating axes chosen by total vote score.

    Axis values are NOT re-voted after the alternation fix — exact parity
    with the reference gen_ww_cuboid (post_proc.py:90-106), which flips
    'type' but keeps 'val'."""
    if len(np.unique(seg)) != 4:
        # empty segments would vote NaN walls; raise like the reference's
        # assert so callers fall back to the cuboid grid
        raise ValueError("cuboid fit needs 4 non-empty wall segments")
    walls = []
    for j in range(4):
        pts = xy[seg == j]
        vx = vote_value(pts[:, 0], tol)
        vy = vote_value(pts[:, 1], tol)
        if (vx[1], -vx[2]) > (vy[1], -vy[2]):
            walls.append(Wall(0, vx[0], vx[1]))
        else:
            walls.append(Wall(1, vy[0], vy[1]))
    # force alternation, keeping the higher-scoring parity assignment
    parity_score = [0.0, 0.0]
    for j, wall in enumerate(walls):
        parity_score[j % 2] += wall.score if wall.axis == 0 else -wall.score
    first_axis = 0 if parity_score[0] > parity_score[1] else 1
    for j, wall in enumerate(walls):
        wall.axis = (first_axis + j) % 2
    return walls


def _fit_walls_general(peak_x: np.ndarray, xy: np.ndarray, seg: np.ndarray,
                       tol: float) -> List[Wall]:
    """Greedy highest-score-first wall construction with forced inserts /
    flips to keep axes alternating (reference gen_ww_general semantics)."""
    walls: List[Wall] = []
    n = len(peak_x)
    for j in range(n):
        pts = xy[seg == j]
        vx = vote_value(pts[:, 0], tol)
        vy = vote_value(pts[:, 1], tol)
        u0 = coorx2u(peak_x[(j - 1) % n])
        u1 = coorx2u(peak_x[j])
        if (vx[1], -vx[2]) > (vy[1], -vy[2]):
            walls.append(Wall(0, vx[0], vx[1], j, u0, u1))
        else:
            walls.append(Wall(1, vy[0], vy[1], j, u0, u1))

    while True:
        order = [i for i, wall in enumerate(walls) if wall.pending]
        if not order:
            break
        cur = max(order, key=lambda i: walls[i].score)
        walls[cur].pending = False
        prev_i = (cur - 1) % len(walls)
        next_i = (cur + 1) % len(walls)
        prev_w, next_w = walls[prev_i], walls[next_i]
        n_pending = prev_w.pending + next_w.pending

        if n_pending == 2:
            continue

        if n_pending == 1:
            fixed, fixed_is_prev = (
                (prev_w, True) if not prev_w.pending else (next_w, False)
            )
            if fixed.axis == walls[cur].axis:
                if walls[cur].score >= -1:
                    # defer: retry this wall after neighbors settle
                    walls[cur].pending = True
                    walls[cur].score -= 100
                else:
                    # forced corner insert to break the tie
                    if fixed_is_prev:
                        at, u = cur, prev_w.u1
                    else:
                        at, u = next_i, next_w.u0
                    if fixed.axis == 0:
                        new = Wall(1, x_u_solve_y(fixed.val, u), 0, pending=False)
                    else:
                        new = Wall(0, y_u_solve_x(fixed.val, u), 0, pending=False)
                    walls.insert(at, new)
            continue

        # both neighbors determined
        if prev_w.axis == next_w.axis:
            if walls[cur].axis == prev_w.axis:
                # three same-axis walls in a row: flip the middle one
                walls[cur].axis ^= 1
                walls[cur].val = xy[seg == walls[cur].seg, walls[cur].axis].mean()
        else:
            # neighbors differ: replace current with two inferred corners
            if prev_w.axis == 0:
                val0 = x_u_solve_y(prev_w.val, prev_w.u1)
                val1 = y_u_solve_x(next_w.val, next_w.u0)
            else:
                val0 = y_u_solve_x(prev_w.val, prev_w.u1)
                val1 = x_u_solve_y(next_w.val, next_w.u0)
            walls[cur:cur + 1] = [
                Wall(next_w.axis, val0, 0, pending=False),
                Wall(prev_w.axis, val1, 0, pending=False),
            ]
    return walls


def gen_walls(peak_x: np.ndarray, coory: np.ndarray, z=50, w: int = 1024,
              h: int = 512, tol: float = 3, force_cuboid: bool = True):
    """Wall fitting on the ceiling plane; returns (corner pixels (n,2),
    walls). Reference gen_ww (post_proc.py:298-320)."""
    seg = _segment_ids(peak_x, w)
    coor = np.stack([np.arange(w), coory], axis=1)
    xy = coor2xy(coor, z, w, h)

    if force_cuboid:
        walls = _fit_walls_cuboid(xy, seg, tol)
    else:
        walls = _fit_walls_general(peak_x, xy, seg, tol)
    if len(walls) < 2:
        # degenerate corner heatmap (e.g. untrained net): no solvable
        # footprint — callers fall back to the cuboid grid (reference
        # models/horizonnet/HorizonNet.py:140-148)
        raise ValueError(f"cannot fit a wall footprint: {len(walls)} walls")

    corners = []
    for j, wall in enumerate(walls):
        nxt = walls[(j + 1) % len(walls)]
        if wall.axis == 1:
            corners.append((nxt.val, wall.val))
        else:
            corners.append((wall.val, nxt.val))
    cor = xy2coor(np.asarray(corners), z, w, h)
    return np.roll(cor, -2 * cor[::2, 0].argmin(), axis=0), walls


def _polygon_is_simple(poly: np.ndarray) -> bool:
    """Reject self-intersecting wall footprints (shapely is_valid stand-in):
    O(n^2) proper-segment-intersection test."""
    n = len(poly)
    segs = [(poly[i], poly[(i + 1) % n]) for i in range(n)]

    def ccw(a, b, c):
        return (c[1] - a[1]) * (b[0] - a[0]) - (b[1] - a[1]) * (c[0] - a[0])

    for i in range(n):
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            a, b = segs[i]
            c, d = segs[j]
            if ccw(a, c, d) * ccw(b, c, d) < 0 and ccw(a, b, c) * ccw(a, b, d) < 0:
                return False
    return True


def horizon_to_manhattan_layout(horizon_layout: dict, H: int, W: int,
                                force_cuboid: bool = True,
                                min_v: Optional[float] = None, r: float = 0.05,
                                normalize: bool = False):
    """{bon (2, W), cor (1, W)} net outputs -> (corner pixels (2n, 2)
    ceil/floor interleaved, z0, z1). Reference
    models/horizonnet/HorizonNet.py:18-67."""
    y_bon = np.asarray(horizon_layout["bon"], np.float64).copy()
    y_cor = np.asarray(horizon_layout["cor"], np.float64)[0]

    y_bon = (y_bon / PI + 0.5) * H - 0.5
    y_bon[0] = np.clip(y_bon[0], 1, H / 2 - 1)
    y_bon[1] = np.clip(y_bon[1], H / 2 + 1, H - 2)

    z0 = 50
    _, z1 = refine_by_fix_z(y_bon[0], y_bon[1], z0)

    if min_v is None:
        min_v = 0 if force_cuboid else 0.05
    r_pix = int(round(W * r / 2))
    peak_x, _ = find_peaks(y_cor, r=r_pix, min_v=min_v,
                           n=4 if force_cuboid else None)

    tol = abs(0.16 * z1 / 1.6)
    cor, walls = gen_walls(peak_x, y_bon[0], z0, W, H, tol=tol,
                           force_cuboid=force_cuboid)
    if not force_cuboid:
        xy2d = np.zeros((len(walls), 2), np.float32)
        for i, wall in enumerate(walls):
            xy2d[i, wall.axis] = wall.val
            xy2d[i, walls[i - 1].axis] = walls[i - 1].val
        if not _polygon_is_simple(xy2d):
            print("Fail to generate valid general layout!! "
                  "Generate cuboid as fallback.", file=sys.stderr)
            peak_x, _ = find_peaks(y_cor, r=r_pix, min_v=0, n=4)
            cor, walls = gen_walls(peak_x, y_bon[0], z0, W, H, tol=tol,
                                   force_cuboid=True)

    cor = np.hstack([cor, infer_coory(cor[:, 1], z1 - z0, z0)[:, None]])
    cor_id = np.zeros((len(cor) * 2, 2), np.float32)
    cor_id[0::2] = cor[:, [0, 1]]
    cor_id[1::2] = cor[:, [0, 2]]
    if normalize:
        cor_id[:, 0] /= W
        cor_id[:, 1] /= H
    return cor_id, z0, z1


# ---------------------------------------------------------------- IoU
def polygon_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _clip_by_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` (any polygon) by CCW-convex
    `clip`. Returns the clipped vertex loop ((k,2), possibly empty)."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        if not out:
            break
        a, b = clip[i], clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        pts, out = out, []
        prev = pts[-1]
        prev_in = ex * (prev[1] - a[1]) - ey * (prev[0] - a[0]) >= 0
        for cur in pts:
            cur_in = ex * (cur[1] - a[1]) - ey * (cur[0] - a[0]) >= 0
            if cur_in != prev_in:
                dx, dy = cur[0] - prev[0], cur[1] - prev[1]
                denom = ex * dy - ey * dx
                if denom != 0:
                    t = (ex * (a[1] - prev[1]) - ey * (a[0] - prev[0])) / denom
                    out.append((prev[0] + t * dx, prev[1] + t * dy))
            if cur_in:
                out.append(tuple(cur))
            prev, prev_in = cur, cur_in
    return np.asarray(out, np.float64).reshape(-1, 2)


def _signed_fan(poly: np.ndarray):
    """Signed fan triangulation from vertex 0: yields (sign, ccw_triangle)
    with 1_poly == sum(sign * 1_triangle) a.e. for any simple polygon."""
    p0 = poly[0]
    for i in range(1, len(poly) - 1):
        t = np.asarray([p0, poly[i], poly[i + 1]], np.float64)
        two_a = ((t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                 - (t[1, 1] - t[0, 1]) * (t[2, 0] - t[0, 0]))
        if two_a == 0.0:
            continue
        yield (1.0 if two_a > 0 else -1.0), (t if two_a > 0 else t[::-1])


def polygon_intersection_area(poly_a: np.ndarray,
                              poly_b: np.ndarray) -> float:
    """Exact area(A ∩ B) for simple polygons (GEOS-equivalent; replaces
    the round-1 rasterized estimate): decompose both into signed fan
    triangles, then area(A∩B) = Σ_ij s_i s_j area(T_i ∩ T_j), each
    triangle pair clipped exactly (triangles are convex)."""
    area = 0.0
    fan_b = list(_signed_fan(np.asarray(poly_b, np.float64)))
    for sa, ta in _signed_fan(np.asarray(poly_a, np.float64)):
        for sb, tb in fan_b:
            inter = _clip_by_convex(ta, tb)
            if len(inter) >= 3:
                area += sa * sb * polygon_area_signed(inter)
    return abs(area)


def polygon_area_signed(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _rasterize(poly: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over a grid."""
    gx, gy = np.meshgrid(xs, ys)
    inside = np.zeros(gx.shape, bool)
    n = len(poly)
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        crosses = (y0 > gy) != (y1 > gy)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = x0 + (gy - y0) * (x1 - x0) / (y1 - y0)
        inside ^= crosses & (gx < x_at)
    return inside


def polygon_iou_2d(poly_a: np.ndarray, poly_b: np.ndarray,
                   grid: int = 2048) -> Tuple[float, float]:
    """(intersection area, IoU) by rasterization over the joint bbox.
    Kept as an independent O(1/grid) cross-check of the exact
    polygon_intersection_area path (tests/test_layout_eval.py)."""
    both = np.concatenate([poly_a, poly_b], axis=0)
    lo, hi = both.min(axis=0) - 1e-6, both.max(axis=0) + 1e-6
    xs = np.linspace(lo[0], hi[0], grid)
    ys = np.linspace(lo[1], hi[1], grid)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    in_a = _rasterize(poly_a, xs, ys)
    in_b = _rasterize(poly_b, xs, ys)
    inter = float(np.count_nonzero(in_a & in_b)) * cell
    union = float(np.count_nonzero(in_a | in_b)) * cell
    return inter, (inter / union if union > 0 else 0.0)


def eval_layout_iou(dt_cor_id: np.ndarray, gt_cor_id: np.ndarray):
    """(3D IoU, 2D IoU) of two ceil/floor-interleaved corner-pixel layouts
    at camera height 1.6 m (reference LayoutIoU.eval_iou,
    models/horizonnet/HorizonNet.py:209-246)."""
    dt_floor, dt_ceil = dt_cor_id[1::2], dt_cor_id[0::2]
    gt_floor, gt_ceil = gt_cor_id[1::2], gt_cor_id[0::2]
    assert (dt_floor[:, 0] != dt_ceil[:, 0]).sum() == 0
    assert (gt_floor[:, 0] != gt_ceil[:, 0]).sum() == 0

    ch = -1.6
    dt_xy = coor2xy(dt_floor, ch, 1024, 512, floor_w=1, floor_h=1)
    gt_xy = coor2xy(gt_floor, ch, 1024, 512, floor_w=1, floor_h=1)

    try:
        area_dt = polygon_area(dt_xy)
        area_gt = polygon_area(gt_xy)
        area_inter = polygon_intersection_area(dt_xy, gt_xy)
        iou2d = area_inter / (area_gt + area_dt - area_inter)
    except Exception:
        return 0.0, 0.0

    try:
        h_dt = abs(get_z1(dt_floor[:, 1], dt_ceil[:, 1], ch, 512).mean() - ch)
        h_gt = abs(get_z1(gt_floor[:, 1], gt_ceil[:, 1], ch, 512).mean() - ch)
        inter3d = area_inter * min(h_dt, h_gt)
        iou3d = inter3d / (area_dt * h_dt + area_gt * h_gt - inter3d)
    except Exception:
        iou3d = 0.0
    return float(iou3d), float(iou2d)
