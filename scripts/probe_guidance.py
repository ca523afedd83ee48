#!/usr/bin/env python
"""Probe sampling quality of a trained demo-preset checkpoint vs guidance scale.

Diagnosis tool for the synthetic-rooms training demo: eps-loss converges but
sampled panos look like noise — sweep guidance_scale (and optionally steps)
to separate "model underfit" from "CFG blowup" from "sampler bug".

Usage: python scripts/probe_guidance.py --ckpt logs/synpano_diff/checkpoints/last \
          --out /tmp/probe [--scales 1,3,9]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/synpano_diff/checkpoints/last")
    ap.add_argument("--out", default="/tmp/probe")
    ap.add_argument("--scales", default="1,3,9")
    ap.add_argument("--prompt", default=None)
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import dataclasses

    import jax
    import numpy as np
    from PIL import Image

    from panfusion_tpu.models import PanFusion
    from panfusion_tpu.models.panfusion import PanFusionConfig, cast_params

    cfg = PanFusionConfig(preset="demo", num_views=8, pano_height=256,
                          pers_resolution=128)
    prompt = args.prompt
    if prompt is None:
        # a real training caption from the synthetic-rooms generator
        import glob

        caps = sorted(glob.glob(
            "data/SyntheticRooms/*/blip3_stitched/*.txt"))
        prompt = open(caps[0]).read().strip() if caps else "a simple room"
    print(f"prompt: {prompt!r}")

    os.makedirs(args.out, exist_ok=True)
    for scale in [float(s) for s in args.scales.split(",")]:
        c = dataclasses.replace(cfg, guidance_scale=scale)
        model = PanFusion(c)
        params = model.load_or_init_params(args.ckpt)
        params = cast_params(params, c.dtype)
        batch = {"pano_prompt": [prompt], "prompt": None}
        _, pano = model.inference(params, batch, jax.random.PRNGKey(0))
        path = os.path.join(args.out, f"pano_cfg{scale:g}.png")
        Image.fromarray(np.asarray(pano[0])).save(path)
        print(f"guidance {scale:g} -> {path}")


if __name__ == "__main__":
    main()
