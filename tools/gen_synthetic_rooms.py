#!/usr/bin/env python
"""Procedural synthetic-room dataset in Matterport3D on-disk format.

Purpose: demonstrate real end-to-end *learning* (VERDICT round 1, Next #3)
without external data — the environment has no Matterport3D download. The
generator raycasts random Manhattan room layouts (data/layout.py, the same
renderer the layout subsystem uses) into textured equirect panoramas with
matching captions, HorizonNet layout annotations and ControlNet layout
condition maps, laid out exactly like the reference's preprocessed MP3D
tree (dataset/Matterport3D.py:8-131 path contract):

  <out>/<scene>/matterport_stitched_images/<view>.png   512x1024 pano
  <out>/<scene>/matterport_aligned_images/<view>.png    (same image)
  <out>/<scene>/blip3_stitched/<view>.txt               pano caption
  <out>/<scene>/blip3/<view>_<i*45>.txt                 8 view captions
  <out>/<scene>/layout/<view>/layout_distance_map.png   uint16 x1e3 depth
  <out>/train.npy, test.npy, lo_{train,val,test}.txt
  <anno>/label_data/<scene>_<view>_label.json           PanoAnnotator JSON

So `Matterport3D(data_dir=<out>, layout_anno_dir=<anno>)` — the real
datamodule — trains PanFusion / FAED / HorizonNet / ControlNet on it with
zero special-casing.

Usage:
  python tools/gen_synthetic_rooms.py --out data/SyntheticRooms \
      --n-train 200 --n-test 20 --height 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from panfusion_tpu.data.layout import Layout, _uv_grid, _uv2xyz  # noqa: E402

PALETTE = {
    "red": (200, 70, 60), "green": (80, 170, 90), "blue": (70, 100, 200),
    "yellow": (210, 190, 80), "purple": (150, 90, 180),
    "orange": (220, 130, 60), "teal": (60, 170, 170), "pink": (220, 130, 170),
    "white": (225, 225, 225), "gray": (130, 130, 135), "brown": (140, 100, 70),
}
FLOORS = ["brown", "gray", "white", "teal"]
WALLS = ["red", "green", "blue", "yellow", "purple", "orange", "pink",
         "white", "gray"]


def make_layout(rng: np.random.Generator) -> Layout:
    """Random cuboid or L-shaped Manhattan room around the camera."""
    ch = 1.6
    lh = rng.uniform(2.4, 3.4)
    w = rng.uniform(2.2, 5.0)
    d = rng.uniform(2.2, 5.0)
    # camera somewhere inside (keep margin so walls stay >0.6 m away)
    cx = rng.uniform(-0.25, 0.25) * w
    cz = rng.uniform(-0.25, 0.25) * d
    x0, x1 = -w / 2 - cx, w / 2 - cx
    z0, z1 = -d / 2 - cz, d / 2 - cz
    if rng.random() < 0.4:  # L-shape: cut one corner
        nx = rng.uniform(0.3, 0.6) * (x1 - x0)
        nz = rng.uniform(0.3, 0.6) * (z1 - z0)
        corners = [(x0, z0), (x1, z0), (x1, z1 - nz), (x1 - nx, z1 - nz),
                   (x1 - nx, z1), (x0, z1)]
    else:
        corners = [(x0, z0), (x1, z0), (x1, z1), (x0, z1)]
    return Layout(ch, lh, np.asarray(corners, np.float64))


def render_room(layout: Layout, rng: np.random.Generator, h: int, w: int):
    """Textured render of the room: per-wall colors with stripe/checker
    texture, checkered floor, distance-shaded lighting. Returns (uint8
    pano, dict of semantic color names for captioning)."""
    depth, plane = layout.raycast((h, w))
    n_walls = len(layout.corners_xz)

    wall_name = rng.choice(WALLS)
    accent_name = rng.choice([c for c in WALLS if c != wall_name])
    floor_name = rng.choice(FLOORS)
    accent_idx = int(rng.integers(0, n_walls))

    colors = np.empty((n_walls + 2, 3))
    for i in range(n_walls):
        colors[i] = PALETTE[accent_name if i == accent_idx else wall_name]
    colors[n_walls] = PALETTE["white"]          # ceiling
    colors[n_walls + 1] = PALETTE[floor_name]   # floor

    img = colors[plane].astype(np.float32)

    # world-space hit points for texturing
    uu, vv = _uv_grid(h, w)
    dirs = _uv2xyz(uu, vv)
    hit = dirs * depth[..., None]
    hy = hit[..., 1]

    on_wall = plane < n_walls
    # horizontal stripes on walls (wainscot-like bands)
    band = rng.uniform(0.35, 0.8)
    stripe = ((hy + layout.camera_height) // band).astype(np.int64) % 2
    img[on_wall & (stripe == 1)] *= 0.82
    # checkered floor
    tile = rng.uniform(0.4, 0.9)
    cx = (hit[..., 0] // tile).astype(np.int64)
    cz = (hit[..., 2] // tile).astype(np.int64)
    checker = (cx + cz) % 2
    on_floor = plane == n_walls + 1
    img[on_floor & (checker == 1)] *= 0.75

    # distance shading + a fixed-direction light gradient
    shade = 1.0 / (1.0 + 0.18 * depth)
    sun = 0.85 + 0.15 * np.cos(uu - rng.uniform(-np.pi, np.pi))
    img *= (shade * sun)[..., None]
    return np.clip(img, 0, 255).astype(np.uint8), {
        "wall": wall_name, "accent": accent_name, "floor": floor_name,
    }


def write_scene(root: str, anno: str, scene: str, view: str,
                seed: int, h: int) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    layout = make_layout(rng)
    w = h * 2
    pano, names = render_room(layout, rng, h, w)

    sdir = os.path.join(root, scene)
    for sub in ("matterport_stitched_images", "matterport_aligned_images",
                "blip3_stitched", "blip3", os.path.join("layout", view)):
        os.makedirs(os.path.join(sdir, sub), exist_ok=True)
    Image.fromarray(pano).save(
        os.path.join(sdir, "matterport_stitched_images", f"{view}.png"))
    Image.fromarray(pano).save(
        os.path.join(sdir, "matterport_aligned_images", f"{view}.png"))

    caption = (f"a synthetic room with {names['wall']} walls, one "
               f"{names['accent']} wall and a checkered {names['floor']} "
               "floor")
    with open(os.path.join(sdir, "blip3_stitched", f"{view}.txt"), "w") as f:
        f.write(caption + "\n")
    for i in range(8):
        with open(os.path.join(sdir, "blip3", f"{view}_{i * 45}.txt"),
                  "w") as f:
            f.write(f"a view of a synthetic room with {names['wall']} "
                    "walls\n")

    # ControlNet conditioning: distance map x1e3 uint16
    # (scripts/render_layout.py:33-34 contract)
    dist = layout.render_distance_map((h, w))
    Image.fromarray((dist * 1e3).astype(np.uint16)).save(
        os.path.join(sdir, "layout", view, "layout_distance_map.png"))

    # PanoAnnotator label JSON (IOTool.loadLabelByJson surface)
    os.makedirs(os.path.join(anno, "label_data"), exist_ok=True)
    pts = [{"coords": None, "xyz": [float(x), 0.0, float(z)]}
           for x, z in layout.corners_xz]
    label = {"cameraHeight": layout.camera_height,
             "layoutHeight": layout.layout_height,
             "layoutPoints": {"points": pts}}
    with open(os.path.join(anno, "label_data",
                           f"{scene}_{view}_label.json"), "w") as f:
        json.dump(label, f)
    return f"{scene}/matterport_stitched_images/{view}_x"


def generate(out: str, anno: str, n_train: int, n_test: int, height: int,
             seed: int = 0):
    os.makedirs(out, exist_ok=True)
    entries = {"train": [], "test": []}
    names = {"train": [], "val": [], "test": []}
    for i in range(n_train + n_test):
        split = "train" if i < n_train else "test"
        scene, view = f"room{i:04d}", "v0"
        entries[split].append(
            write_scene(out, anno, scene, view, seed * 100003 + i, height))
        names["train" if split == "train" else "test"].append(
            f"{scene}_{view}")
    # small val = head of test (reference uses test for val)
    names["val"] = names["test"][: max(1, n_test // 4)]
    for split in ("train", "test"):
        np.save(os.path.join(out, f"{split}.npy"),
                np.array([[e] for e in entries[split]]))
    for split, lst in names.items():
        with open(os.path.join(out, f"lo_{split}.txt"), "w") as f:
            f.write("\n".join(lst))
    print(f"wrote {n_train}+{n_test} rooms at {height}x{height*2} -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/SyntheticRooms")
    ap.add_argument("--anno", default=None,
                    help="annotation dir (default <out>/annotations)")
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-test", type=int, default=20)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    anno = args.anno or os.path.join(args.out, "annotations")
    generate(args.out, anno, args.n_train, args.n_test, args.height,
             args.seed)


if __name__ == "__main__":
    main()
