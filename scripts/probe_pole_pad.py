#!/usr/bin/env python
"""A/B probe for the pole-aware VAE pad (PanFusionConfig.pole_pad).

Round-4 finding (BASELINE.md "Sample quality"): the zenith halo in every
generated panel reproduces in plain VAE reconstructions — it is a decoder
artifact, not a denoiser one. Hypothesis: the halo is the convs' zero
padding at the height edges (the width edges are protected by the circular
pad trick, reference PanoGenerator.py:227-238; the poles are not).
This encodes+decodes GT rooms through a trained VAE checkpoint with
pole_pad off vs on and reports overall / pole-band reconstruction error.

Usage:
  python scripts/probe_pole_pad.py --ckpt logs/synpano_vae/checkpoints/last \
      --out logs/synpano_vae/pole_pad_probe.json --cpu
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/synpano_vae/checkpoints/last")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--band", type=int, default=24,
                    help="pole band height in pixels for the band metric")
    ap.add_argument("--out", default=None)
    ap.add_argument("--save_panels", default=None,
                    help="dir for side-by-side recon panels")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    panfusion_tpu.resolve_platform(args.cpu)
    import dataclasses

    import jax
    import numpy as np

    from panfusion_tpu.data import Matterport3D
    from panfusion_tpu.models import PanFusion
    from panfusion_tpu.models.panfusion import PanFusionConfig, cast_params

    cfg = PanFusionConfig(preset="demo", num_views=8, pano_height=256,
                          pers_resolution=128, pole_pad=False)
    model = PanFusion(cfg)
    params = model.load_or_init_params(args.ckpt)
    params = cast_params(params, cfg.dtype)
    model_pole = PanFusion(dataclasses.replace(cfg, pole_pad=True))

    dm = Matterport3D(data_dir="data/SyntheticRooms", pano_height=256,
                      pers_resolution=128, cam_sampler="horizon",
                      batch_size=1, num_workers=0)
    dm.setup("test")
    loader = dm.test_dataloader()

    rng = jax.random.PRNGKey(0)
    rows = []
    panels = []
    for i, batch in enumerate(loader):
        if i >= args.n:
            break
        gt = np.asarray(batch["pano"][0])  # (1, H, W, 3) in [-1, 1]
        out = {}
        for name, m in (("off", model), ("pole_pad", model_pole)):
            z = m.encode_pano(params, gt, rng)
            rec = np.asarray(m.decode_pano(params, z), np.float32)
            err = np.abs(rec - gt)
            out[name] = {
                "mae": float(err.mean()),
                "pole_mae": float(
                    np.concatenate(
                        [err[:, : args.band], err[:, -args.band:]], axis=1
                    ).mean()
                ),
            }
            if args.save_panels:
                panels.append(((np.clip(rec[0], -1, 1) + 1) * 127.5)
                              .astype(np.uint8))
        rows.append(out)
        print(i, json.dumps(out))

    summary = {
        "n": len(rows), "band_px": args.band, "ckpt": args.ckpt,
        "mae_off": float(np.mean([r["off"]["mae"] for r in rows])),
        "mae_pole_pad": float(
            np.mean([r["pole_pad"]["mae"] for r in rows])),
        "pole_mae_off": float(
            np.mean([r["off"]["pole_mae"] for r in rows])),
        "pole_mae_pole_pad": float(
            np.mean([r["pole_pad"]["pole_mae"] for r in rows])),
    }
    summary["pole_improvement"] = (
        summary["pole_mae_off"] / max(summary["pole_mae_pole_pad"], 1e-9))
    print(json.dumps(summary, indent=2))
    if args.save_panels:
        from PIL import Image

        os.makedirs(args.save_panels, exist_ok=True)
        for j in range(0, len(panels), 2):
            Image.fromarray(np.concatenate(panels[j:j + 2], axis=0)).save(
                os.path.join(args.save_panels, f"recon_{j // 2:02d}.png"))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
