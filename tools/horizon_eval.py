#!/usr/bin/env python
"""Standalone layout-accuracy evaluation over prediction/GT file pairs.

Capability parity with the vendored evaluation CLIs (reference
external/HorizonNet/eval_general.py:127-170 and eval_cuboid.py:149-186):
pairs predictions with ground truth by basename, computes

* ``--mode general``: 2D IoU, 3D IoU, layout-depth RMSE and delta_1, with
  the per-corner-count breakdown (buckets 4..9, 10+, odd, overall);
* ``--mode cuboid``: corner error CE (% of diagonal), pixel surface error
  PE (%), 3D IoU — predictions must be 4-wall layouts.

Predictions: ``.json`` files from tools/horizon_infer.py ({z0, z1, uv}).
Ground truth: ``.txt`` corner files (one "x y" pixel pair per line,
ceil/floor interleaved, 1024x512 coordinates) or the same json format.

Usage:
  python tools/horizon_eval.py --dt_glob 'out/*.json' \
      --gt_glob 'data/label_cor/*.txt' [--mode general] [--w 1024 --h 512]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_cor_id(path: str, w: int, h: int) -> np.ndarray:
    """Corner pixels (2n, 2) from a prediction json or GT txt file."""
    if path.endswith(".json"):
        with open(path) as f:
            d = json.load(f)
        uv = np.asarray(d["uv"], np.float64)
        return uv * np.array([w, h])
    cor = []
    with open(path) as f:
        for line in f:
            if line.strip():
                x, y = line.split()[:2]
                cor.append([float(x), float(y)])
    return np.asarray(cor, np.float64)


def pair_files(gt_glob: str, dt_glob: str):
    """(gt, dt) path pairs keyed on basename (reference
    eval_cuboid.py prepare_gtdt_pairs)."""
    dt = {os.path.basename(p).split(".")[0]: p for p in glob.glob(dt_glob)}
    pairs = []
    for gt_path in sorted(glob.glob(gt_glob)):
        k = os.path.basename(gt_path).split(".")[0]
        if k in dt:
            pairs.append((gt_path, dt[k]))
        else:
            print(f"no prediction for {k}; skipped", file=sys.stderr)
    return pairs


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dt_glob", required=True, help="prediction files (quote)")
    p.add_argument("--gt_glob", required=True, help="ground-truth files (quote)")
    p.add_argument("--mode", choices=("general", "cuboid"), default="general")
    p.add_argument("--w", type=int, default=1024)
    p.add_argument("--h", type=int, default=512)
    p.add_argument("--summary_json", default=None,
                   help="also write the overall metrics to this JSON path")
    args = p.parse_args()

    from panfusion_tpu.metrics.layout_eval import (
        GeneralLayoutEval,
        eval_cuboid_layout,
    )

    pairs = pair_files(args.gt_glob, args.dt_glob)
    if not pairs:
        print("no prediction/GT pairs found", file=sys.stderr)
        return 1

    summary = None
    if args.mode == "general":
        agg = GeneralLayoutEval(args.w, args.h)
        for gt_path, dt_path in pairs:
            gt = load_cor_id(gt_path, args.w, args.h)
            dt = load_cor_id(dt_path, args.w, args.h)
            agg.update(dt, gt)
        results = agg.compute()
        for bucket in sorted(results, key=lambda b: (b == "overall", b)):
            m = results[bucket]
            print(f"[{bucket:>7}] " + "  ".join(
                f"{k}={v:.4f}" for k, v in sorted(m.items())))
        summary = dict(results.get("overall", {}))
    else:
        losses = {"CE": [], "PE": [], "3DIoU": []}
        for gt_path, dt_path in pairs:
            gt = load_cor_id(gt_path, args.w, args.h)
            dt = load_cor_id(dt_path, args.w, args.h)
            z1 = None
            if dt_path.endswith(".json"):
                with open(dt_path) as f:
                    z1 = json.load(f).get("z1")
            res = eval_cuboid_layout(dt, gt, args.w, args.h, z1=z1)
            for k, v in res.items():
                losses[k].append(v)
        print("  ".join(
            f"{k}={float(np.mean(v)):.4f}" for k, v in losses.items()))
        summary = {k: float(np.mean(v)) for k, v in losses.items()}
    print(f"n={len(pairs)}")
    if args.summary_json:
        summary = dict(summary or {})
        # Underscored aliases (2D_IoU/3D_IoU) for downstream consumers.
        for k in list(summary):
            if k.endswith("IoU") and "_" not in k:
                summary[k.replace("IoU", "_IoU")] = summary[k]
        summary["n"] = len(pairs)
        os.makedirs(os.path.dirname(args.summary_json) or ".", exist_ok=True)
        with open(args.summary_json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"summary -> {args.summary_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
