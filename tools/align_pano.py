#!/usr/bin/env python
"""VP-align panoramas for layout annotation / HorizonNet preprocessing.

Capability parity with the vendored preprocessing CLI (reference
external/HorizonNet/preprocess.py): for every input equirectangular image,
detect the three Manhattan vanishing directions, rotate the panorama to
align them with the world axes, and dump

* ``<name>_VP.txt``          — the three vanishing directions (one per line)
* ``<name>_aligned_rgb.png`` — the VP-aligned panorama
* ``<name>_aligned_line.png``— detected line segments, colored per direction

With ``--rgbonly`` only ``<name>.png`` (the aligned RGB) is written.

Usage:
  python tools/align_pano.py --img_glob 'data/*.png' --output_dir out/ \
      [--rgbonly] [--tol_deg 2.5] [--refine_iter 3] [--view_size 320]
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_glob", required=True,
                   help="glob of equirect images (quote it)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--rgbonly", action="store_true",
                   help="only write the aligned RGB image")
    p.add_argument("--tol_deg", type=float, default=2.5,
                   help="great-circle incidence tolerance for voting")
    p.add_argument("--refine_iter", type=int, default=3)
    p.add_argument("--view_size", type=int, default=320)
    args = p.parse_args()

    paths = sorted(glob.glob(args.img_glob))
    if not paths:
        print("no images found", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    from PIL import Image

    from panfusion_tpu.geometry.vp_align import pano_vp_align

    for path in paths:
        print("Processing", path, flush=True)
        name = os.path.splitext(os.path.basename(path))[0]
        img = Image.open(path).convert("RGB")
        if img.size != (1024, 512):
            img = img.resize((1024, 512), Image.BICUBIC)
        pano = np.asarray(img)
        try:
            res = pano_vp_align(pano, view_size=args.view_size,
                                tol_deg=args.tol_deg,
                                refine_iter=args.refine_iter)
        except ValueError as e:
            print(f"{name}: VP detection failed ({e}); skipped",
                  file=sys.stderr)
            continue

        if args.rgbonly:
            Image.fromarray(res["aligned_rgb"]).save(
                os.path.join(args.output_dir, f"{name}.png"))
        else:
            with open(os.path.join(args.output_dir, f"{name}_VP.txt"),
                      "w") as f:
                for d in res["vp"]:
                    f.write("%.6f %.6f %.6f\n" % tuple(d))
            Image.fromarray(res["aligned_rgb"]).save(
                os.path.join(args.output_dir, f"{name}_aligned_rgb.png"))
            line = (np.clip(res["aligned_line"], 0, 1) * 255).astype(
                np.uint8)
            Image.fromarray(line).save(
                os.path.join(args.output_dir, f"{name}_aligned_line.png"))
        print(f"{name}: {res['n_lines']} assigned segments")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
