"""Cubemap <-> equirectangular conversion (host-side numpy preprocessing).

Behavioral equivalent of the vendored py360convert subset the reference uses
(reference: external/py360convert/{c2e,e2c,e2p}.py, utils.py) plus the
``Cubemap``/``Equirectangular`` wrappers with the Matterport3D skybox
orientation fix-ups (reference: utils/pano.py:108-171). Used by the offline
stitching tool and geometry tests; the on-device path lives in
``panfusion_tpu.geometry.projection``.

Face order is the 'horizon' format [F R B L U D]; face (y, x) directions
follow the py360convert convention (x right, y up, z forward):
    F: ( g[x], -g[y],  0.5)    R: ( 0.5, -g[y],  g[x])
    B: ( g[x], -g[y], -0.5)    L: (-0.5, -g[y],  g[x])
    U: ( g[x],  0.5, -g[y])    D: ( g[x], -0.5, -g[y])
with g = linspace(-0.5, 0.5, face_w).

Instead of the reference's hand-built seam padding table
(py360convert/utils.py:135-173) the seam texels here are *computed*: each
face is extended by one texel ring whose ray directions are projected back
onto the cube and sampled from the neighbouring faces — same result, no
orientation table to maintain.
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
from scipy.ndimage import map_coordinates

FACE_KEYS = ["F", "R", "B", "L", "U", "D"]


def _face_grid(face_w: int) -> np.ndarray:
    return np.linspace(-0.5, 0.5, num=face_w, dtype=np.float32)


def face_directions(face_w: int) -> np.ndarray:
    """(6, face_w, face_w, 3) ray directions of every cube texel."""
    g = _face_grid(face_w)
    gx, gy = np.meshgrid(g, g)  # gx varies with x-pixel, gy with y-pixel
    one = np.full_like(gx, 0.5)
    faces = np.stack(
        [
            np.stack([gx, -gy, one], -1),  # F
            np.stack([one, -gy, gx], -1),  # R
            np.stack([gx, -gy, -one], -1),  # B
            np.stack([-one, -gy, gx], -1),  # L
            np.stack([gx, one, -gy], -1),  # U
            np.stack([gx, -one, -gy], -1),  # D
        ],
        axis=0,
    )
    return faces


def xyz2uv(xyz: np.ndarray) -> np.ndarray:
    """(..., 3) -> (..., 2): u = atan2(x, z), v = atan2(y, hypot(x, z))."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    u = np.arctan2(x, z)
    v = np.arctan2(y, np.sqrt(x**2 + z**2))
    return np.stack([u, v], axis=-1)


def uv2coor(uv: np.ndarray, h: int, w: int) -> np.ndarray:
    u, v = uv[..., 0], uv[..., 1]
    coor_x = (u / (2 * np.pi) + 0.5) * w - 0.5
    coor_y = (-v / np.pi + 0.5) * h - 0.5
    return np.stack([coor_x, coor_y], axis=-1)


def sample_equirec(e_img: np.ndarray, coor_xy: np.ndarray, order: int) -> np.ndarray:
    """Sample a single-channel equirect image at float coords.

    Pole handling parity with py360convert (utils.py:125-132): append the
    half-width-rolled bottom/top rows before wrap-mode interpolation.
    """
    w = e_img.shape[1]
    pad_u = np.roll(e_img[[0]], w // 2, 1)
    pad_d = np.roll(e_img[[-1]], w // 2, 1)
    ext = np.concatenate([e_img, pad_d, pad_u], 0)
    return map_coordinates(
        ext, [coor_xy[..., 1], coor_xy[..., 0]], order=order, mode="wrap"
    )


def _sampling_dirs(ge: np.ndarray) -> np.ndarray:
    """Texel ray directions in the *sampling* convention used by c2e.

    c2e flips the stored horizon faces R/B horizontally and U vertically
    before sampling, so the sampled faces obey:
        F: ( g[x], -g[y],  0.5)    R: ( 0.5, -g[y], -g[x])
        B: (-g[x], -g[y], -0.5)    L: (-0.5, -g[y],  g[x])
        U: ( g[x],  0.5,  g[y])    D: ( g[x], -0.5, -g[y])
    """
    gx, gy = np.meshgrid(ge, ge)
    one = np.full_like(gx, 0.5)
    return np.stack(
        [
            np.stack([gx, -gy, one], -1),
            np.stack([one, -gy, -gx], -1),
            np.stack([-gx, -gy, -one], -1),
            np.stack([-one, -gy, gx], -1),
            np.stack([gx, one, gy], -1),
            np.stack([gx, -one, -gy], -1),
        ],
        axis=0,
    )


def _xyz_to_face_coords(xyz: np.ndarray):
    """Project ray directions onto the cube: face id + in-face coords.

    Inverts ``_sampling_dirs``. Returns (tp, fx, fy) with fx/fy in
    [-0.5, 0.5] face units.
    """
    ax = np.abs(xyz)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    tp = np.zeros(xyz.shape[:-1], np.int32)
    is_x = (ax[..., 0] >= ax[..., 1]) & (ax[..., 0] >= ax[..., 2])
    is_y = ~is_x & (ax[..., 1] >= ax[..., 2])
    is_z = ~is_x & ~is_y
    tp[is_z & (z > 0)] = 0  # F
    tp[is_x & (x > 0)] = 1  # R
    tp[is_z & (z <= 0)] = 2  # B
    tp[is_x & (x <= 0)] = 3  # L
    tp[is_y & (y > 0)] = 4  # U
    tp[is_y & (y <= 0)] = 5  # D

    major = np.select(
        [tp == 0, tp == 1, tp == 2, tp == 3, tp >= 4],
        [ax[..., 2], ax[..., 0], ax[..., 2], ax[..., 0], ax[..., 1]],
    )
    scale = 0.5 / np.maximum(major, 1e-12)
    xs, ys, zs = x * scale, y * scale, z * scale
    fx = np.select(
        [tp == 0, tp == 1, tp == 2, tp == 3, tp == 4, tp == 5],
        [xs, -zs, -xs, zs, xs, xs],
    )
    fy = np.select(
        [tp == 0, tp == 1, tp == 2, tp == 3, tp == 4, tp == 5],
        [-ys, -ys, -ys, -ys, zs, -zs],
    )
    return tp, fx, fy


def _norm_axis(tp: np.ndarray) -> np.ndarray:
    # axis index whose |coord| is 0.5 for each face: F/B->z(2), R/L->x(0), U/D->y(1)
    return np.select([tp < 1, tp == 1, tp == 2, tp == 3, tp >= 4], [2, 0, 2, 0, 1])


def pad_cube_faces(faces: np.ndarray) -> np.ndarray:
    """Extend (6, fw, fw[, C]) faces by a 1-texel ring sampled from neighbours.

    Faces must be in the *sampling* convention (post-flip, see c2e). The
    ring texels' ray directions are computed by linear extrapolation of the
    face grid, projected back onto the cube, and nearest-sampled.
    """
    fw = faces.shape[1]
    g = _face_grid(fw)
    step = g[1] - g[0]
    ge = np.concatenate([[g[0] - step], g, [g[-1] + step]])
    dirs = _sampling_dirs(ge)
    tp, fx, fy = _xyz_to_face_coords(dirs.reshape(-1, 3))
    xi = np.clip(np.round((fx + 0.5) * (fw - 1)).astype(int), 0, fw - 1)
    yi = np.clip(np.round((fy + 0.5) * (fw - 1)).astype(int), 0, fw - 1)
    ring = faces[tp, yi, xi].reshape(6, fw + 2, fw + 2, *faces.shape[3:])
    ring[:, 1:-1, 1:-1] = faces
    return ring


def equirect_facetype(h: int, w: int) -> np.ndarray:
    """Face id per equirect pixel, parity with py360convert utils.py:47-63."""
    tp = np.roll(np.arange(4).repeat(w // 4)[None, :].repeat(h, 0), 3 * w // 8, 1)
    mask = np.zeros((h, w // 4), bool)
    idx = np.linspace(-np.pi, np.pi, w // 4) / 4
    idx = h // 2 - np.round(np.arctan(np.cos(idx)) * h / np.pi).astype(int)
    for i, j in enumerate(idx):
        mask[:j, i] = 1
    mask = np.roll(np.concatenate([mask] * 4, 1), 3 * w // 8, 1)
    tp[mask] = 4
    tp[np.flip(mask, 0)] = 5
    return tp.astype(np.int32)


def c2e(cubemap: np.ndarray, h: int, w: int, mode: str = "bilinear",
        cube_format: str = "horizon") -> np.ndarray:
    """Cubemap -> equirectangular. Parity with py360convert c2e.py:6-63."""
    order = {"bilinear": 1, "nearest": 0}[mode]
    cubemap = _to_horizon(cubemap, cube_format)
    assert cubemap.shape[0] * 6 == cubemap.shape[1]
    assert w % 8 == 0
    face_w = cubemap.shape[0]

    u = np.linspace(-np.pi, np.pi, num=w, dtype=np.float32)
    v = np.linspace(np.pi, -np.pi, num=h, dtype=np.float32) / 2
    u, v = np.meshgrid(u, v)

    tp = equirect_facetype(h, w)
    coor_x = np.zeros((h, w))
    coor_y = np.zeros((h, w))
    for i in range(4):
        m = tp == i
        coor_x[m] = 0.5 * np.tan(u[m] - np.pi * i / 2)
        coor_y[m] = -0.5 * np.tan(v[m]) / np.cos(u[m] - np.pi * i / 2)
    m = tp == 4
    c = 0.5 * np.tan(np.pi / 2 - v[m])
    coor_x[m] = c * np.sin(u[m])
    coor_y[m] = c * np.cos(u[m])
    m = tp == 5
    c = 0.5 * np.tan(np.pi / 2 - np.abs(v[m]))
    coor_x[m] = c * np.sin(u[m])
    coor_y[m] = -c * np.cos(u[m])

    # side faces R/B are mirrored in horizon storage relative to the tan
    # parameterization above; U needs a vertical flip (cf. the flips in
    # py360convert sample_cubefaces) — handled by flipping those faces once.
    faces = np.stack(np.split(cubemap, 6, 1), 0).astype(np.float64)
    faces[1] = np.flip(faces[1], 1)
    faces[2] = np.flip(faces[2], 1)
    faces[4] = np.flip(faces[4], 0)

    # interior face pixel i sits at padded index i+1, so shift by +1
    padded = pad_cube_faces(faces)
    px = (np.clip(coor_x, -0.5, 0.5) + 0.5) * face_w + 1.0
    py = (np.clip(coor_y, -0.5, 0.5) + 0.5) * face_w + 1.0

    chans = []
    for ci in range(cubemap.shape[2]):
        chans.append(
            map_coordinates(padded[..., ci], [tp, py, px], order=order, mode="nearest")
        )
    return np.stack(chans, axis=-1)


def e2c(e_img: np.ndarray, face_w: int = 256, mode: str = "bilinear",
        cube_format: str = "horizon"):
    """Equirectangular -> cubemap. Parity with py360convert e2c.py:6-41."""
    order = {"bilinear": 1, "nearest": 0}[mode]
    h, w = e_img.shape[:2]
    dirs = face_directions(face_w)
    horiz = np.concatenate(list(dirs), axis=1)  # (fw, 6*fw, 3)
    coor = uv2coor(xyz2uv(horiz), h, w)
    cube = np.stack(
        [sample_equirec(e_img[..., i], coor, order) for i in range(e_img.shape[2])],
        axis=-1,
    )
    return _from_horizon(cube, cube_format)


def _to_horizon(cubemap, cube_format: str) -> np.ndarray:
    if cube_format == "horizon":
        return cubemap
    if cube_format == "list":
        return np.concatenate(cubemap, axis=1)
    if cube_format == "dict":
        return np.concatenate([cubemap[k] for k in FACE_KEYS], axis=1)
    if cube_format == "dice":
        return _dice2h(cubemap)
    raise NotImplementedError(cube_format)


def _from_horizon(cube_h, cube_format: str):
    if cube_format == "horizon":
        return cube_h
    faces = np.split(cube_h, 6, axis=1)
    if cube_format == "list":
        return faces
    if cube_format == "dict":
        return dict(zip(FACE_KEYS, faces))
    if cube_format == "dice":
        return _h2dice(cube_h)
    raise NotImplementedError(cube_format)


_DICE_SXY = [(1, 1), (2, 1), (3, 1), (0, 1), (1, 0), (1, 2)]


def _h2dice(cube_h: np.ndarray) -> np.ndarray:
    w = cube_h.shape[0]
    out = np.zeros((w * 3, w * 4, cube_h.shape[2]), dtype=cube_h.dtype)
    for i, (sx, sy) in enumerate(_DICE_SXY):
        face = cube_h[:, i * w : (i + 1) * w]
        if i in (1, 2):
            face = np.flip(face, axis=1)
        if i == 4:
            face = np.flip(face, axis=0)
        out[sy * w : (sy + 1) * w, sx * w : (sx + 1) * w] = face
    return out


def _dice2h(dice: np.ndarray) -> np.ndarray:
    w = dice.shape[0] // 3
    out = np.zeros((w, w * 6, dice.shape[2]), dtype=dice.dtype)
    for i, (sx, sy) in enumerate(_DICE_SXY):
        face = dice[sy * w : (sy + 1) * w, sx * w : (sx + 1) * w]
        if i in (1, 2):
            face = np.flip(face, axis=1)
        if i == 4:
            face = np.flip(face, axis=0)
        out[:, i * w : (i + 1) * w] = face
    return out


class Cubemap:
    """OO wrapper, parity with reference utils/pano.py:108-139."""

    def __init__(self, cubemap, cube_format: str):
        self.cubemap = _to_horizon(cubemap, cube_format)
        assert self.cubemap.ndim == 3
        assert self.cubemap.shape[0] * 6 == self.cubemap.shape[1]

    def to_equirectangular(self, h: int, w: int, mode: str = "bilinear"):
        return Equirectangular(c2e(self.cubemap, h, w, mode, "horizon"))

    @classmethod
    def from_mp3d_skybox(cls, mp3d_skybox_path, scene, view):
        """Load a Matterport3D 6-face skybox with the MP3D orientation fixes
        (reference: utils/pano.py:128-139): R/B mirrored, U flipped+rotated,
        D rotated."""
        from PIL import Image

        images = {}
        for idx, key in enumerate(["U", "L", "F", "R", "B", "D"]):
            path = os.path.join(
                mp3d_skybox_path, scene, "matterport_skybox_images",
                f"{view}_skybox{idx}_sami.jpg",
            )
            images[key] = np.array(Image.open(path))
        images["R"] = np.flip(images["R"], 1)
        images["B"] = np.flip(images["B"], 1)
        images["U"] = np.rot90(np.flip(images["U"], 0), 1)
        images["D"] = np.rot90(images["D"], 1)
        return cls(images, "dict")


class Equirectangular:
    """OO wrapper, parity with reference utils/pano.py:142-171."""

    def __init__(self, equirectangular: np.ndarray):
        self.equirectangular = equirectangular

    @classmethod
    def from_file(cls, img_path: str):
        from PIL import Image

        img = Image.open(img_path)
        if img.mode == "RGBA":
            img = img.convert("RGB")
        return cls(np.array(img))

    def save(self, path: str):
        from PIL import Image

        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        Image.fromarray(self.equirectangular.astype(np.uint8)).save(path)

    def to_cubemap(self, face_w: int = 256, mode: str = "bilinear"):
        return Cubemap(e2c(self.equirectangular, face_w, mode, "horizon"), "horizon")

    def to_perspective(self, fov, yaw_deg, pitch_deg, hw, mode: str = "bilinear"):
        """90-degree-FoV crops for the data pipeline; equivalent to the
        reference's py360convert.e2p call (utils/pano.py:160-162).

        Fast path: numpy grid + the native C++ sampler (ops/host.py) — this
        runs per item in the host input pipeline while the TPU computes.
        Falls back to the jitted jnp e2p when the library isn't built.
        """
        if isinstance(fov, (tuple, list)):
            fov_h, fov_v = float(fov[0]), float(fov[1])
        else:
            fov_h, fov_v = float(fov), None

        from .host_grids import map_pers_pix_to_equi_np

        from ..ops import host

        eh, ew = self.equirectangular.shape[:2]
        x, y = map_pers_pix_to_equi_np(
            eh, ew, fov_h, yaw_deg, pitch_deg, hw[0], hw[1], v_fov_deg=fov_v
        )
        out = host.remap(self.equirectangular, x, y, mode, "wrap")
        if out is not None:
            return out

        from ..ops.resample import remap as remap_jax

        import jax.numpy as jnp

        img = jnp.asarray(
            np.moveaxis(self.equirectangular.astype(np.float32), -1, 0)
        )
        out = remap_jax(img, jnp.asarray(x), jnp.asarray(y), mode, "wrap")
        return np.moveaxis(np.asarray(out), 0, -1)

    def rotate(self, degree: float):
        if degree % 360 == 0:
            return
        self.equirectangular = np.roll(
            self.equirectangular,
            int(degree / 360 * self.equirectangular.shape[1]),
            axis=1,
        )

    def flip(self, flip: bool = True):
        if flip:
            self.equirectangular = np.flip(self.equirectangular, 1)
