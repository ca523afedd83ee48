"""Visual debug main: golden-eye check of the whole geometry layer.

Parity with the reference's baked-in debug mains (``python -m utils.pano``,
reference utils/pano.py:203-230, and utils/layout.py:215-227): stitch a
skybox to an equirect pano, render the three camera-sampler view sets,
round-trip the views back to a pano through mp2e, and render every layout
map — all written to ``debug/`` for eyeballing.

Run: ``python -m panfusion_tpu.debug_renders [--mp3d_skybox_path ...
--scene ... --view ...] [--label_json ...] [--out debug]``

Without arguments it uses a synthetic 6-color gradient skybox and a square
test room, so it needs no dataset on disk.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def synthetic_skybox(face_w: int = 256) -> np.ndarray:
    """(face_w, 6*face_w, 3) horizon-format cubemap: distinct hue + gradient
    + grid per face so seams and orientation mistakes are visible."""
    hues = np.array([
        [255, 80, 80], [80, 255, 80], [80, 80, 255],
        [255, 255, 80], [80, 255, 255], [255, 80, 255],
    ], np.float32)
    faces = []
    ramp = np.linspace(0.35, 1.0, face_w, dtype=np.float32)
    for k in range(6):
        face = hues[k][None, None] * ramp[:, None, None]
        face = np.broadcast_to(face, (face_w, face_w, 3)).copy()
        face[::32, :] = 30
        face[:, ::32] = 30
        faces.append(face)
    return np.concatenate(faces, axis=1).astype(np.uint8)


def synthetic_layout():
    from .data.layout import Layout

    # (N, 2, 2) normalized (x, y) corner pairs, (ceil, floor) per wall
    coords = np.array([
        [[0.05, 0.30], [0.05, 0.72]],
        [[0.30, 0.28], [0.30, 0.74]],
        [[0.55, 0.30], [0.55, 0.72]],
        [[0.80, 0.28], [0.80, 0.74]],
    ], np.float32)
    return Layout.from_layout_coords(coords, camera_height=1.6)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mp3d_skybox_path", default=None,
                   help="Matterport3D skybox root; synthetic cube if absent")
    p.add_argument("--scene", default=None)
    p.add_argument("--view", default=None)
    p.add_argument("--label_json", default=None,
                   help="PanoAnnotator layout json; synthetic room if absent")
    p.add_argument("--out", default="debug")
    args = p.parse_args(argv)

    from PIL import Image

    from .geometry.cubemap import Cubemap, Equirectangular
    from .geometry.projection import mp2e
    from .geometry.sampling import (
        horizon_sample_camera,
        icosahedron_sample_camera,
        random_sample_camera,
    )

    os.makedirs(args.out, exist_ok=True)

    if args.mp3d_skybox_path and args.scene and args.view:
        cubemap = Cubemap.from_mp3d_skybox(
            args.mp3d_skybox_path, args.scene, args.view)
    else:
        cubemap = Cubemap(synthetic_skybox(), "horizon")
    eq = cubemap.to_equirectangular(1024, 2048)
    pano = np.asarray(eq.equirectangular).astype(np.uint8)
    Image.fromarray(pano).save(
        os.path.join(args.out, "equirectangular.jpg"))

    sets = {
        "icosahedron": icosahedron_sample_camera(),
        "horizon": horizon_sample_camera(8),
        "random": random_sample_camera(20),
    }
    views, fovs, thetas, phis = [], [], [], []
    for name, (theta, phi) in sets.items():
        theta, phi = np.rad2deg(theta), np.rad2deg(phi)
        for i, (t, ph) in enumerate(zip(theta, phi)):
            pers = np.asarray(
                eq.to_perspective(90.0, t, ph, (512, 512))).astype(np.uint8)
            Image.fromarray(pers).save(
                os.path.join(args.out, f"{name}_{i}.jpg"))
            if name == "icosahedron":
                views.append(pers)
                fovs.append(90.0)
                thetas.append(t)
                phis.append(ph)

    # stitch the icosahedron views back: the e2p->mp2e round trip
    views_nchw = np.stack(views).transpose(0, 3, 1, 2)  # (m, c, h, w)
    stitched = np.asarray(mp2e(
        views_nchw, np.asarray(fovs, np.float32),
        np.asarray(thetas, np.float32), np.asarray(phis, np.float32),
        (1024, 2048),
    )).transpose(1, 2, 0)
    Image.fromarray(np.clip(stitched, 0, 255).astype(np.uint8)).save(
        os.path.join(args.out, "mp2e_roundtrip.jpg"))
    err = np.abs(stitched - pano.astype(np.float32)).mean()
    print(f"mp2e round-trip mean abs err: {err:.2f} (8-bit LSBs)")

    if args.label_json:
        from .data.layout import Layout

        layout = Layout.from_json(args.label_json)
    else:
        layout = synthetic_layout()
    _render_layout(layout, args.out)
    print(f"debug renders written to {args.out}/")


def _render_layout(layout, out_dir: str):
    from PIL import Image

    maps = layout.render_layout(size=(512, 1024))
    for name, img in maps.items():
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(
                arr / arr.max() * 255.0 if arr.max() > 0 else arr, 0, 255
            ).astype(np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        Image.fromarray(arr).save(
            os.path.join(out_dir, f"layout_{name}.png"))


if __name__ == "__main__":
    main()
