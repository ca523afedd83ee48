#!/usr/bin/env python
"""Render layout conditioning maps from Matterport3DLayoutAnnotation JSONs.

Parity with the reference CLI (scripts/render_layout.py:26-68): for each
`label_data/<scene>_<view>_label.json`, render the 6 layout map types at
1024x2048 into `<mp3d>/<scene>/layout/<view>/layout_<type>.png`; the
distance map is saved x1e3 as uint16 (the ControlNet conditioning input,
dataset/PanoDataset.py:155-166).

Per-scene failures are caught and reported, not fatal (the reference does
the same, scripts/render_layout.py:27-38).
"""
from __future__ import annotations

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_one(json_path: str, out_root: str, size):
    from PIL import Image

    from panfusion_tpu.data.layout import Layout

    name = os.path.basename(json_path)[: -len("_label.json")]
    scene_id, view_id = name.split("_", 1)
    out_dir = os.path.join(out_root, scene_id, "layout", view_id)
    os.makedirs(out_dir, exist_ok=True)

    layout = Layout.from_json(json_path)
    maps = layout.render_layout(size=size)
    for kind, img in maps.items():
        path = os.path.join(out_dir, f"layout_{kind}.png")
        if kind == "distance_map":
            Image.fromarray(
                (img * 1e3).astype(np.uint16), mode="I;16"
            ).save(path)
        elif kind == "wireframe":
            Image.fromarray(img.astype(np.uint8)).save(path)
        else:
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(path)
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--layout_anno_dir", default="data/Matterport3DLayoutAnnotation"
    )
    ap.add_argument("--mp3d_skybox_path", default="data/Matterport3D/mp3d_skybox")
    ap.add_argument("--height", type=int, default=1024)
    args = ap.parse_args()

    jsons = sorted(
        glob(os.path.join(args.layout_anno_dir, "label_data", "*_label.json"))
    )
    print(f"{len(jsons)} layout annotations")
    for i, jp in enumerate(jsons):
        try:
            out = render_one(jp, args.mp3d_skybox_path,
                             (args.height, args.height * 2))
            if (i + 1) % 20 == 0:
                print(f"[{i + 1}/{len(jsons)}] {out}")
        except Exception as exc:
            print(f"FAILED {jp}: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
