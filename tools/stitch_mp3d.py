#!/usr/bin/env python
"""Stitch Matterport3D skybox faces into equirectangular panoramas.

Parity with the reference preprocessing CLI (scripts/stitch_mp3d.py:9-56):
for every `<scene>/matterport_skybox_images/<view>_skybox[0-5]_sami.jpg`
set, apply the MP3D-specific face fixups (Cubemap.from_mp3d_skybox) and
write `<out>/<scene>/matterport_stitched_images/<view>.png` at 1024x2048.

Host-side tool; a worker pool covers the IO-bound decode/encode.
"""
from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor
from glob import glob

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stitch_one(task):
    scene_dir, view, out_dir, height = task
    from panfusion_tpu.geometry.cubemap import Cubemap

    out_path = os.path.join(out_dir, f"{view}.png")
    if os.path.exists(out_path):
        return out_path
    cube = Cubemap.from_mp3d_skybox(
        os.path.dirname(scene_dir), os.path.basename(scene_dir), view
    )
    equi = cube.to_equirectangular(height, height * 2)
    os.makedirs(out_dir, exist_ok=True)
    equi.save(out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mp3d_skybox_path", default="data/Matterport3D/mp3d_skybox")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--processes", type=int, default=16)
    args = ap.parse_args()

    tasks = []
    for scene_dir in sorted(glob(os.path.join(args.mp3d_skybox_path, "*"))):
        if not os.path.isdir(scene_dir):
            continue
        sky = os.path.join(scene_dir, "matterport_skybox_images")
        views = sorted({
            os.path.basename(p).split("_")[0]
            for p in glob(os.path.join(sky, "*_skybox0_sami.jpg"))
        })
        out_dir = os.path.join(scene_dir, "matterport_stitched_images")
        tasks.extend((scene_dir, v, out_dir, args.height) for v in views)

    print(f"{len(tasks)} panoramas to stitch")
    with ProcessPoolExecutor(max_workers=args.processes) as pool:
        for i, path in enumerate(pool.map(stitch_one, tasks)):
            if (i + 1) % 50 == 0:
                print(f"[{i + 1}/{len(tasks)}] {path}")


if __name__ == "__main__":
    main()
