"""Room-layout representation, annotation I/O, and conditioning renderers.

Capability parity with the reference layout subsystem (utils/layout.py +
the vendored PanoAnnotator scene graph it drives, external/PanoAnnotator/):
a Manhattan room is camera height + layout height + an ordered loop of wall
corner positions on the floor plane. From that this module provides

* annotation JSON I/O (``from_json`` — the PanoAnnotator label format of
  Matterport3DLayoutAnnotation),
* corner-format conversions (``to_layout_coords`` / ``to_layout_pos`` /
  ``from_layout_pos`` — reference utils/layout.py:54-117),
* HorizonNet training targets (``to_horizonnet``: occlusion-aware boundary
  curves + exp-decay corner heatmap — reference utils/layout.py:119-137),
* the 6 conditioning renderers (wireframe / edge / orientation / normal /
  distance / object2d maps — reference utils/layout.py:139-204).

TPU-first design difference: the reference renders depth by scan-line
polygon fill with a per-pixel Python loop (PanoAnnotator
ImageTool.imageDrawWallDepth); here all maps come from ONE vectorized
numpy raycast of every pixel into the room geometry (nearest-hit, which is
exactly the min-depth rule the reference's draw order implements).

Coordinates follow PanoAnnotator: camera at origin, y up, and
uv -> xyz = (cos v sin u, sin v, -cos v cos u) (PanoTool.uv2xyz z-flip);
u from image x: u = (x/W - 0.5) * 2pi; v positive up.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_SIZE = (512, 1024)


def _uv_grid(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    u = ((np.arange(w) + 0.5) / w - 0.5) * 2 * np.pi
    v = -((np.arange(h) + 0.5) / h - 0.5) * np.pi
    return np.meshgrid(u, v)


def _uv2xyz(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    return np.stack(
        [np.cos(v) * np.sin(u), np.sin(v), -np.cos(v) * np.cos(u)], axis=-1
    )


class Layout:
    """camera_height (m), layout_height (m), corners_xz (N, 2): the wall
    corner loop on the floor plane (x right, z the flipped-forward axis)."""

    default_size = DEFAULT_SIZE

    def __init__(self, camera_height: float, layout_height: float,
                 corners_xz: np.ndarray,
                 object2ds: Optional[List[Dict]] = None):
        self.camera_height = float(camera_height)
        self.layout_height = float(layout_height)
        self.corners_xz = np.asarray(corners_xz, np.float64).reshape(-1, 2)
        self.object2ds = object2ds or []
        self._cache: Dict = {}

    # ------------------------------------------------------------- io
    @classmethod
    def from_json(cls, json_path: str) -> "Layout":
        """PanoAnnotator label JSON (cameraHeight, layoutHeight,
        layoutPoints[].xyz, optional layoutObj2ds) — reference
        IOTool.loadLabelByJson contract."""
        with open(json_path) as f:
            jdata = json.load(f)
        pts = np.array(
            [p["xyz"] for p in jdata["layoutPoints"]["points"]], np.float64
        )
        layout = cls(
            jdata["cameraHeight"], jdata["layoutHeight"], pts[:, [0, 2]],
            object2ds=jdata.get("layoutObj2ds", {}).get("obj2ds", []),
        )
        layout._jdata = jdata
        return layout

    @classmethod
    def from_layout_coords(cls, layout_coords: np.ndarray,
                           camera_height: float) -> "Layout":
        """(N, 2, 2) normalized (x, y) corner pairs (ceil, floor) ->
        geometry (reference utils/layout.py:54-80)."""
        layout_coords = np.asarray(layout_coords, np.float64)
        v = -(layout_coords[..., 1] - 0.5) * np.pi
        dist = camera_height / np.tan(-v[..., 1])
        height = (dist * np.tan(v[..., 0]) + camera_height).mean()

        u = (layout_coords[:, 0, 0] - 0.5) * 2 * np.pi
        corners = np.stack(
            [np.sin(u) * dist, -np.cos(u) * dist], axis=1
        )
        layout = cls(camera_height, height, corners)
        layout._cache["coords"] = layout_coords
        return layout

    @classmethod
    def from_layout_pos(cls, layout_pos: np.ndarray, camera_height: float,
                        image_size) -> "Layout":
        """(N, 2, 2) pixel corner pairs; image_size = (W, H) (the reference
        passes pano.shape[:-3:-1])."""
        layout_pos = np.asarray(layout_pos, np.float64)
        layout = cls.from_layout_coords(
            layout_pos / np.asarray(image_size, np.float64), camera_height
        )
        layout._cache["pos"] = (layout_pos, tuple(image_size))
        return layout

    # ------------------------------------------------------------ convert
    def to_layout_coords(self) -> np.ndarray:
        if "coords" in self._cache:
            return self._cache["coords"]
        xz = self.corners_xz
        us = (np.arctan2(xz[:, 0], -xz[:, 1]) / (2 * np.pi) + 0.5)
        cs = np.sqrt((xz ** 2).sum(1))
        vf = np.arctan2(-self.camera_height, cs)
        vc = np.arctan2(-self.camera_height + self.layout_height, cs)
        cor_x = np.repeat(us, 2)
        cor_y = np.stack([-vc / np.pi + 0.5, -vf / np.pi + 0.5], -1).reshape(-1)
        return np.stack([cor_x, cor_y], -1).reshape(-1, 2, 2)

    def to_layout_pos(self, image_size) -> np.ndarray:
        if "pos" in self._cache:
            cached_pos, cached_size = self._cache["pos"]
            if tuple(cached_size) == tuple(image_size):
                return cached_pos
            # built at another resolution: rescale instead of returning
            # wrong-scale pixels
            return cached_pos * (
                np.asarray(image_size, np.float64)
                / np.asarray(cached_size, np.float64)
            )
        return self.to_layout_coords() * np.asarray(image_size, np.float64)

    # ------------------------------------------------------------ targets
    def to_horizonnet(self, image_size) -> Dict[str, np.ndarray]:
        """{bon (2, W) radians, cor (1, W)} training targets (reference
        utils/layout.py:119-137: great-circle boundary interpolation,
        occlusion-pruned corners, 0.96^dist heatmap)."""
        W, H = int(image_size[0]), int(image_size[1])
        cor = self.to_layout_pos(image_size).reshape(-1, 2)

        occlusion = _find_occlusion(cor[::2].copy(), W, H).repeat(2)
        bon = _corners_to_boundaries(cor, H, W)

        corx = cor[~occlusion, 0]
        cols = np.arange(W)
        d = np.abs(corx[:, None] - cols[None, :])
        d = np.minimum(d, W - d)  # circular distance
        y_cor = (0.96 ** d.min(axis=0)).reshape(1, -1)
        return {"bon": bon.astype(np.float32), "cor": y_cor.astype(np.float32)}

    # ------------------------------------------------------------ raycast
    def _walls(self):
        """Per wall: (p0_xz, p1_xz, normal_xz) with the loop closed."""
        pts = self.corners_xz
        nxt = np.roll(pts, -1, axis=0)
        d = nxt - pts
        normals = np.stack([d[:, 1], -d[:, 0]], axis=1)
        norm = np.linalg.norm(normals, axis=1, keepdims=True)
        normals = normals / np.maximum(norm, 1e-9)
        return pts, nxt, normals

    def raycast(self, size=DEFAULT_SIZE):
        """(depth (H, W), plane id (H, W)) — ids 0..n-1 walls, n ceiling,
        n+1 floor (the reference planeMap convention,
        PanoAnnotator LayoutTool.genLayoutDepthMap)."""
        key = ("raycast", tuple(size))
        if key in self._cache:
            return self._cache[key]
        h, w = size
        uu, vv = _uv_grid(h, w)
        dirs = _uv2xyz(uu, vv)  # (H, W, 3)
        ch, lh = self.camera_height, self.layout_height

        p0, p1, normals = self._walls()
        n_walls = len(p0)

        # horizontal plane hits (ceiling y=lh-ch, floor y=-ch)
        dy = dirs[..., 1]
        with np.errstate(divide="ignore", invalid="ignore"):
            t_ceil = np.where(dy > 1e-9, (lh - ch) / dy, np.inf)
            t_floor = np.where(dy < -1e-9, -ch / dy, np.inf)

        best_t = np.where(vv >= 0, t_ceil, t_floor)
        plane_id = np.where(vv >= 0, n_walls, n_walls + 1).astype(np.int32)

        dx, dz = dirs[..., 0], dirs[..., 2]
        for i in range(n_walls):
            nx, nz = normals[i]
            denom = dx * nx + dz * nz
            offset = p0[i, 0] * nx + p0[i, 1] * nz
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(np.abs(denom) > 1e-9, offset / denom, np.inf)
            t = np.where(t > 1e-9, t, np.inf)
            # hit point within the segment extent and the wall's y-range
            tf = np.where(np.isfinite(t), t, 0.0)
            hx, hz, hy = dx * tf, dz * tf, dy * tf
            seg = p1[i] - p0[i]
            seg_len2 = max(float(seg @ seg), 1e-12)
            frac = ((hx - p0[i, 0]) * seg[0] + (hz - p0[i, 1]) * seg[1]) / seg_len2
            valid = (
                np.isfinite(t)
                & (frac >= -1e-6) & (frac <= 1 + 1e-6)
                & (hy >= -ch - 1e-6) & (hy <= lh - ch + 1e-6)
                & (t < best_t)
            )
            best_t = np.where(valid, t, best_t)
            plane_id = np.where(valid, i, plane_id)

        depth = np.where(np.isfinite(best_t), best_t, 0.0)
        self._cache[key] = (depth, plane_id)
        return depth, plane_id

    # ------------------------------------------------------------ renderers
    def render_distance_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        """(H, W) euclidean distance in meters (the ControlNet conditioning;
        saved x1e3 as uint16 by tools/render_layout.py)."""
        return self.raycast(size)[0]

    def render_plane_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        return self.raycast(size)[1]

    def render_normal_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        """(H, W, 3) in [0,1]: color = -n/2 + 0.5 (PanoAnnotator
        normal2color)."""
        _, plane = self.raycast(size)
        _, _, normals = self._walls()
        n_walls = len(normals)
        colors = np.empty((n_walls + 2, 3))
        for i, (nx, nz) in enumerate(normals):
            colors[i] = -np.array([nx, 0.0, nz]) / 2 + 0.5
        colors[n_walls] = -np.array([0.0, -1.0, 0.0]) / 2 + 0.5   # ceiling
        colors[n_walls + 1] = -np.array([0.0, 1.0, 0.0]) / 2 + 0.5  # floor
        return colors[plane]

    def render_orientation_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        """(H, W, 3): walls colored by dominant normal axis (Manhattan
        color: x->blue, y->red, z->green), background red (PanoAnnotator
        genLayoutOMap)."""
        _, plane = self.raycast(size)
        _, _, normals = self._walls()
        n_walls = len(normals)
        colors = np.zeros((n_walls + 2, 3))
        colors[n_walls:] = (1, 0, 0)  # ceiling/floor keep background red
        for i, (nx, nz) in enumerate(normals):
            colors[i] = (0, 0, 1) if abs(nx) >= abs(nz) else (0, 1, 0)
        return colors[plane]

    def render_edge_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        """(H, W, 3): wall edges colored by edge direction (Manhattan
        color), dilated + blurred (PanoAnnotator genLayoutEdgeMap)."""
        from scipy.ndimage import binary_dilation, gaussian_filter

        _, plane = self.raycast(size)
        edge = np.zeros((*size, 3))
        # vertical wall-wall edges: plane id changes along width
        wchange = plane != np.roll(plane, 1, axis=1)
        n_walls = len(self._walls()[0])
        wall_px = plane < n_walls  # ids >= n_walls are ceiling/floor
        vert = wchange & (wall_px | np.roll(wall_px, 1, axis=1))
        # horizontal wall-ceiling / wall-floor edges: change along height
        hchange = plane != np.roll(plane, 1, axis=0)
        hchange[0] = False
        horiz = hchange & (wall_px | np.roll(wall_px, 1, axis=0))
        edge[binary_dilation(vert, iterations=1)] = (1, 0, 0)   # y-dir edge
        h_mask = binary_dilation(horiz, iterations=1) & ~binary_dilation(vert, iterations=1)
        edge[h_mask] = (0, 1, 1)
        return np.clip(gaussian_filter(edge, (2, 2, 0)) * 3, 0, 1)

    def render_wireframe(self, background: Optional[np.ndarray] = None,
                         size=DEFAULT_SIZE, color=None) -> np.ndarray:
        """Edge wireframe, optionally drawn over a background image
        (reference utils/layout.py:148-177)."""
        if background is None:
            canvas = np.zeros(size, np.uint8)
            color = color if color is not None else 255
        else:
            size = background.shape[:2]
            canvas = background.copy()
            color = color if color is not None else (0,) * background.shape[2]
        _, plane = self.raycast(size)
        wchange = plane != np.roll(plane, 1, axis=1)
        hchange = plane != np.roll(plane, 1, axis=0)
        hchange[0] = False
        canvas[wchange | hchange] = color
        return canvas

    def render_object2d_map(self, size=DEFAULT_SIZE) -> np.ndarray:
        """(H, W, 3): white rectangles of the wall-attached 2-D objects
        (PanoAnnotator genLayoutObj2dMap); zeros when unannotated."""
        canvas = np.zeros((*size, 3))
        if not self.object2ds:
            return canvas
        h, w = size
        uu, vv = _uv_grid(h, w)
        dirs = _uv2xyz(uu, vv)
        for obj in self.object2ds:
            p0 = np.asarray(obj["points"][0], np.float64)
            p1 = np.asarray(obj["points"][1], np.float64)
            d = p1[[0, 2]] - p0[[0, 2]]
            n = np.array([d[1], -d[0]])
            n /= max(np.linalg.norm(n), 1e-9)
            denom = dirs[..., 0] * n[0] + dirs[..., 2] * n[1]
            offset = p0[0] * n[0] + p0[2] * n[1]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.where(np.abs(denom) > 1e-9, offset / denom, np.inf)
            t = np.where(t > 1e-9, t, np.inf)
            hx = dirs[..., 0] * t
            hy = dirs[..., 1] * t
            hz = dirs[..., 2] * t
            seg2 = max(float(d @ d), 1e-12)
            frac = ((hx - p0[0]) * d[0] + (hz - p0[2]) * d[1]) / seg2
            ylo, yhi = sorted((p0[1], p1[1]))
            hit = (
                np.isfinite(t) & (frac >= 0) & (frac <= 1)
                & (hy >= ylo) & (hy <= yhi)
            )
            canvas[hit] = (1, 1, 1)
        return canvas

    def render_layout(self, layout_types=None, size=DEFAULT_SIZE):
        if layout_types is None:
            layout_types = ["wireframe", "edge_map", "orientation_map",
                            "normal_map", "distance_map", "object2d_map"]
        return {
            t: getattr(self, f"render_{t}")(size=size) for t in layout_types
        }


# ---------------------------------------------------------------- helpers
def _connect_points(p1, p2, z, w: int, h: int) -> np.ndarray:
    """Pixels of the wall-top/bottom boundary between two corners on the
    plane at height z (reference panostretch.pano_connect_points)."""
    if p1[0] == p2[0]:
        return np.array([p1, p2], np.float32)
    u1 = ((p1[0] + 0.5) / w - 0.5) * 2 * np.pi
    v1 = ((p1[1] + 0.5) / h - 0.5) * np.pi
    u2 = ((p2[0] + 0.5) / w - 0.5) * 2 * np.pi
    v2 = ((p2[1] + 0.5) / h - 0.5) * np.pi
    x1, y1 = z / np.tan(v1) * np.cos(u1), z / np.tan(v1) * np.sin(u1)
    x2, y2 = z / np.tan(v2) * np.cos(u2), z / np.tan(v2) * np.sin(u2)

    if abs(p1[0] - p2[0]) < w / 2:
        pstart, pend = np.ceil(min(p1[0], p2[0])), np.floor(max(p1[0], p2[0]))
    else:
        pstart, pend = np.ceil(max(p1[0], p2[0])), np.floor(min(p1[0], p2[0]) + w)
    xs = (np.arange(pstart, pend + 1) % w).astype(np.float64)
    us = ((xs + 0.5) / w - 0.5) * 2 * np.pi
    vx, vy = x2 - x1, y2 - y1
    ps = (np.tan(us) * x1 - y1) / (vy - np.tan(us) * vx)
    cs = np.sqrt((x1 + ps * vx) ** 2 + (y1 + ps * vy) ** 2)
    ys = (np.arctan2(z, cs) / np.pi + 0.5) * h - 0.5
    return np.stack([xs, ys], axis=-1)


def _sort_filter_unique(xs, ys, y_small_first: bool):
    xs, ys = np.asarray(xs), np.asarray(ys)
    order = np.argsort(xs + ys / ys.max() * (int(y_small_first) * 2 - 1))
    xs, ys = xs[order], ys[order]
    _, uniq = np.unique(xs, return_index=True)
    return xs[uniq], ys[uniq]


def _corners_to_boundaries(cor: np.ndarray, H: int, W: int) -> np.ndarray:
    """(2n, 2) ceil/floor-interleaved corner pixels -> (2, W) per-column
    boundary angles (reference HorizonNet dataset cor_2_1d)."""
    n_cor = len(cor)
    bon = np.zeros((2, W))
    for row, (off, z, small_first) in enumerate(
        (((0), -50, True), ((1), 50, False))
    ):
        bx, by = [], []
        for i in range(n_cor // 2):
            xys = _connect_points(
                cor[i * 2 + off], cor[(i * 2 + 2 + off) % n_cor], z, W, H
            )
            bx.extend(xys[:, 0])
            by.extend(xys[:, 1])
        bx, by = _sort_filter_unique(bx, by, small_first)
        bon[row] = np.interp(np.arange(W), bx, by, period=W)
    return ((bon + 0.5) / H - 0.5) * np.pi


def _segments_intersect(a0, a1, b0, b1) -> bool:
    def ccw(p, q, r):
        return (r[1] - p[1]) * (q[0] - p[0]) - (q[1] - p[1]) * (r[0] - p[0])

    d1, d2 = ccw(b0, b1, a0), ccw(b0, b1, a1)
    d3, d4 = ccw(a0, a1, b0), ccw(a0, a1, b1)
    return ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0))


def _find_occlusion(coor: np.ndarray, w: int = 1024,
                    h: int = 512) -> np.ndarray:
    """Corner visibility: does the camera->corner ray cross the polyline of
    the other corners (reference HorizonNet dataset find_occlusion, shapely
    raycast re-done with a plain segment-intersection sweep). coor is in
    (w, h)-scale pixels."""
    u = ((coor[:, 0] + 0.5) / w - 0.5) * 2 * np.pi
    v = ((coor[:, 1] + 0.5) / h - 0.5) * np.pi
    c = -50 / np.tan(v)
    x, y = c * np.cos(u), c * np.sin(u)
    n = len(x)
    occ = []
    for i in range(n):
        ray = ((0.0, 0.0), (x[i], y[i]))
        pts = [(x[j], y[j]) for j in list(range(i + 1, n)) + list(range(i))]
        hit = any(
            _segments_intersect(ray[0], ray[1], pts[k], pts[k + 1])
            for k in range(len(pts) - 1)
        )
        occ.append(hit)
    return np.array(occ)
