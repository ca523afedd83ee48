#!/usr/bin/env python
"""Compare train-style vs inference-style eps predictions on identical inputs.

The training loss is low but sampling fails: this isolates whether the
inference forward (CFG tiling + rotation trick + phase-cached EPP sites)
predicts eps as well as the training forward (per-batch sites, no rotation)
on the same noised GT latents. MSE(train-forward) ≈ train loss but
MSE(inference-forward) >> means the mismatch is in the inference plumbing.

Usage: python scripts/probe_forward.py --ckpt logs/synpano_diff/checkpoints/last
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/synpano_diff/checkpoints/last")
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panfusion_tpu.data import Matterport3D
    from panfusion_tpu.models import PanFusion
    from panfusion_tpu.models.epp import build_epp_sites_batched
    from panfusion_tpu.models.panfusion import (PanFusionConfig, cast_params,
                                                _cfg_tile_site)
    from panfusion_tpu.nn.scheduler import add_noise

    cfg = PanFusionConfig(preset="demo", num_views=8, pano_height=256,
                          pers_resolution=128)
    model = PanFusion(cfg)
    params = model.load_or_init_params(args.ckpt)
    params = cast_params(params, cfg.dtype)

    dm = Matterport3D(data_dir="data/SyntheticRooms", pano_height=256,
                      pers_resolution=128, cam_sampler="horizon",
                      batch_size=1, num_workers=0)
    dm.setup("validate")
    batch = next(iter(dm.val_dataloader()))

    rng = jax.random.PRNGKey(0)
    pano_latent = model.encode_pano(
        params, jnp.asarray(batch["pano"][:, 0]), rng).astype(jnp.float32)
    pers_latents = model.encode_views(
        params, jnp.asarray(batch["images"]), rng).astype(jnp.float32)
    pers_ctx, pano_ctx = model.embed_prompt(params, batch, cfg.num_views)
    eh, ew = cfg.equi_latent_hw
    pr = cfg.pers_latent_res
    m = cfg.num_views
    cams = batch["cameras"]
    fov = jnp.asarray(cams["FoV"], jnp.float32)
    theta = jnp.asarray(cams["theta"], jnp.float32)
    phi = jnp.asarray(cams["phi"], jnp.float32)

    pn, vn = model.init_noise(jax.random.PRNGKey(7), 1, (eh, ew), (pr, pr),
                              theta[0], phi[0])

    timesteps = np.asarray(model.schedule.timesteps)
    shift = int(cfg.rot_diff / 360.0 * ew)
    phase_sites = model.make_phase_sites(1)
    from panfusion_tpu.nn.epp import EPPSite  # noqa: F401
    site_map, _ = model._site_dedup_map()
    n_phases = jax.tree.leaves(phase_sites)[0].shape[0]

    null_ctx = model.encode_text(params, [""])
    null_p = jnp.broadcast_to(null_ctx[:, None], (1, m, *null_ctx.shape[1:]))
    pers_ctx2 = jnp.concatenate([null_p, pers_ctx], 0).astype(cfg.dtype)
    null_e = jnp.broadcast_to(null_ctx, (1, *null_ctx.shape[1:]))
    pano_ctx2 = jnp.concatenate([null_e, pano_ctx], 0).astype(cfg.dtype)

    for k in (45, 35, 20, 0):
        t = int(timesteps[k])
        tb = jnp.asarray([t])
        x_pano = add_noise(model.schedule, pano_latent, pn, tb)
        x_pers = add_noise(model.schedule, pers_latents, vn, tb[:, None])

        # --- training-style forward (batch cameras, no rotation)
        sites = build_epp_sites_batched(pr, (eh, ew), fov, theta, phi,
                                        n_levels=model.n_levels)
        eps_pers_tr, eps_pano_tr = model.dual.apply(
            params["dual"], x_pers.astype(cfg.dtype), x_pano.astype(cfg.dtype),
            tb, pers_ctx.astype(cfg.dtype), pano_ctx.astype(cfg.dtype), sites)
        mse_tr_pano = float(jnp.mean((eps_pano_tr.astype(jnp.float32) - pn) ** 2))
        mse_tr_pers = float(jnp.mean((eps_pers_tr.astype(jnp.float32) - vn) ** 2))

        # --- inference-style forward at loop index i=k (rolled latent,
        # phase-cached sites, CFG tiling; compare the cond half)
        i = k
        phase = i % n_phases
        roll = ((i + 1) * shift) % ew
        x_pano_rot = jnp.roll(x_pano, roll, axis=2)
        uniq = [jax.tree.map(lambda a: a[phase], u) for u in phase_sites]
        sites_i = [uniq[j] for j in site_map]
        sites2 = [_cfg_tile_site(s, 2, m) for s in sites_i]
        pers2 = jnp.concatenate([x_pers, x_pers], 0).astype(cfg.dtype)
        pano2 = jnp.concatenate([x_pano_rot, x_pano_rot], 0).astype(cfg.dtype)
        t2 = jnp.full((2,), t, jnp.int32)
        eps_pers_inf, eps_pano_inf = model.dual.apply(
            params["dual"], pers2, pano2, t2, pers_ctx2, pano_ctx2, sites2)
        eps_pano_c = jnp.roll(eps_pano_inf[1:2].astype(jnp.float32), -roll, axis=2)
        eps_pers_c = eps_pers_inf[1:2].astype(jnp.float32)
        mse_inf_pano = float(jnp.mean((eps_pano_c - pn) ** 2))
        mse_inf_pers = float(jnp.mean((eps_pers_c - vn) ** 2))

        print(f"k={k:2d} t={t:3d}: train pano {mse_tr_pano:.4f} pers "
              f"{mse_tr_pers:.4f} | infer pano {mse_inf_pano:.4f} pers "
              f"{mse_inf_pers:.4f}")


if __name__ == "__main__":
    main()
