#!/usr/bin/env python
"""DDIM partial-reconstruction probe for a trained demo checkpoint.

Encodes a real room pano+views, adds noise at DDIM schedule position k, then
runs the *inference* sampling chunks from k to the end and decodes. Separates
"the inference forward/sampler is broken" (reconstruction fails even from
low-noise k) from "the model is underfit at high noise" (reconstruction fine
from large k, noise-like from k=0).

Usage: python scripts/probe_recon.py --ckpt logs/synpano_diff/checkpoints/last
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/synpano_diff/checkpoints/last")
    ap.add_argument("--out", default="/tmp/probe_recon")
    ap.add_argument("--ks", default="45,35,20,0")
    ap.add_argument("--guidance", type=float, default=1.0)
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from panfusion_tpu.data import Matterport3D
    from panfusion_tpu.models import PanFusion
    from panfusion_tpu.models.panfusion import (PanFusionConfig, cast_params,
                                                tensor_to_image)
    from panfusion_tpu.nn.scheduler import add_noise

    cfg = PanFusionConfig(preset="demo", num_views=8, pano_height=256,
                          pers_resolution=128,
                          guidance_scale=args.guidance)
    model = PanFusion(cfg)
    params = model.load_or_init_params(args.ckpt)
    params = cast_params(params, cfg.dtype)

    dm = Matterport3D(data_dir="data/SyntheticRooms", pano_height=256,
                      pers_resolution=128, cam_sampler="horizon",
                      batch_size=1, num_workers=0)
    dm.setup("validate")
    batch = next(iter(dm.val_dataloader()))
    prompt = batch["pano_prompt"][0]
    print(f"prompt: {prompt!r}")

    os.makedirs(args.out, exist_ok=True)
    gt = batch["pano"][0, 0]
    Image.fromarray(((np.clip(gt, -1, 1) + 1) * 127.5).astype(np.uint8)).save(
        os.path.join(args.out, "gt.png"))

    rng = jax.random.PRNGKey(0)
    pano_latent = model.encode_pano(params, jnp.asarray(batch["pano"][:, 0]), rng)
    pers_latents = model.encode_views(params, jnp.asarray(batch["images"]), rng)

    # pure VAE round trip = quality ceiling
    rec = model.decode_pano(params, pano_latent)
    Image.fromarray(np.asarray(tensor_to_image(rec))[0]).save(
        os.path.join(args.out, "vae_roundtrip.png"))

    pers_ctx, pano_ctx = model.embed_prompt(params, batch, cfg.num_views)
    null_ctx = model.encode_text(params, [""])
    b = 1
    m = cfg.num_views
    null_p = jnp.broadcast_to(null_ctx[:, None], (b, m, *null_ctx.shape[1:]))
    pers_ctx2 = jnp.concatenate([null_p, pers_ctx], axis=0).astype(cfg.dtype)
    null_e = jnp.broadcast_to(null_ctx, (b, *null_ctx.shape[1:]))
    pano_ctx2 = jnp.concatenate([null_e, pano_ctx], axis=0).astype(cfg.dtype)
    phase_sites = model.make_phase_sites(1)

    eh, ew = cfg.equi_latent_hw
    pr = cfg.pers_latent_res
    T = cfg.diff_timestep
    shift = int(cfg.rot_diff / 360.0 * ew)
    timesteps = np.asarray(model.schedule.timesteps)

    from panfusion_tpu.geometry.sampling import horizon_sample_camera

    theta, phi = horizon_sample_camera(m)
    theta = jnp.asarray(np.rad2deg(theta), jnp.float32)
    phi = jnp.asarray(np.rad2deg(phi), jnp.float32)

    for k in [int(s) for s in args.ks.split(",")]:
        t = int(timesteps[k])
        pn, vn = model.init_noise(jax.random.PRNGKey(k + 1), b, (eh, ew),
                                  (pr, pr), theta, phi)
        x_pano = add_noise(model.schedule, pano_latent.astype(jnp.float32),
                           pn, jnp.asarray([t]))
        x_pers = add_noise(model.schedule, pers_latents.astype(jnp.float32),
                           vn, jnp.asarray([[t]]))
        # the chunk at loop index i expects the latent to carry i*shift of
        # accumulated rotation from the steps before it
        x_pano = jnp.roll(x_pano, (shift * k) % ew, axis=2)
        carry = (x_pers.astype(cfg.dtype), x_pano.astype(cfg.dtype), None)
        chunk = cfg.scan_chunk if cfg.scan_chunk > 0 else T
        for i0 in range(k, T, chunk):
            n = min(chunk, T - i0)
            carry = model._sample_chunk(
                params, carry, pers_ctx2, pano_ctx2, phase_sites,
                jnp.asarray(i0, jnp.int32), n, m)
        _, pano_out, _ = carry
        pano_out = jnp.roll(pano_out, -(shift * T) % ew, axis=2)
        img = tensor_to_image(model.decode_pano(params, pano_out))
        Image.fromarray(np.asarray(img)[0]).save(
            os.path.join(args.out, f"recon_k{k}_t{t}.png"))
        print(f"k={k} (t={t}) done")


if __name__ == "__main__":
    main()
