"""Experiment runners: the fit/validate/test/predict flows behind the CLI.

These play the role of the Lightning Trainer + task-module hooks in the
reference (SURVEY.md §1 L6/L5): the training loop with time-interval
checkpointing and per-epoch validation images, and the idempotent
test/predict output layout `logs/<run_id>/{test,predict}/<pano_id>/`
(reference PanoGenerator.py:295-303, PanFusion.py:190-203).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.panfusion import PanFusion, tensor_to_image
from .train.checkpoints import CheckpointManager
from .train.logging import ExperimentLogger
from .train.loop import TrainConfig, create_train_state, make_train_step
from .train.params import merge_params


def _device_batch(model: PanFusion, params, batch: Dict):
    """Host batch dict -> arrays for the jitted train step (prompt encoding
    happens here, outside jit, like the frozen CLIP in the reference)."""
    m = batch["cameras"]["theta"].shape[1]
    pers_ctx, pano_ctx = model.embed_prompt(params, batch, m)
    out = {
        "images": jnp.asarray(batch["images"]),
        "pano": jnp.asarray(batch["pano"][:, 0]),
        "pers_ctx": pers_ctx,
        "pano_ctx": pano_ctx,
        "fov": jnp.asarray(batch["cameras"]["FoV"], jnp.float32),
        "theta": jnp.asarray(batch["cameras"]["theta"], jnp.float32),
        "phi": jnp.asarray(batch["cameras"]["phi"], jnp.float32),
    }
    if "pano_layout_cond" in batch:
        out["pano_layout_cond"] = jnp.asarray(batch["pano_layout_cond"][:, 0])
    if "images_layout_cond" in batch:
        out["images_layout_cond"] = jnp.asarray(batch["images_layout_cond"])
    return out


def _check_latent_stats(model, state, loader, tol_std=(0.5, 2.0), tol_mean=0.5):
    """One-batch sanity check that the diffusion model trains against
    ~N(0,1) latents. A mis-calibrated latent_scale/latent_shift (e.g. the
    SD2 constant applied to a from-scratch VAE) buries the signal under the
    unit-variance noise: the eps-loss still converges but every sampled
    image stays noise. Cost: one VAE-encode compile at fit startup."""
    try:
        batch = next(iter(loader))
        if "pano" not in batch:
            return
        from .train.params import merge_params

        params = merge_params(state.trainable, state.frozen)
        z = model.encode_pano(
            params, jnp.asarray(batch["pano"][:, 0]), jax.random.PRNGKey(0)
        )
        z = np.asarray(z.astype(jnp.float32))
        std, mean = float(z.std()), float(z.mean())
        if not (tol_std[0] <= std <= tol_std[1]) or abs(mean) > tol_mean:
            print(
                f"WARNING: encoded latents are far from N(0,1) "
                f"(std={std:.3f}, mean={mean:.3f}) — the diffusion model "
                f"will train at the wrong SNR. Calibrate "
                f"--model.latent_scale/--model.latent_shift with "
                f"tools/calibrate_latents.py (SD's 0.18215 only fits SD's "
                f"own VAE)."
            )
    except Exception as exc:  # diagnostics must never kill fit
        print(f"latent-stats check skipped: {exc}")


def fit(
    model: PanFusion,
    datamodule,
    train_cfg: TrainConfig,
    logger: ExperimentLogger,
    resume: bool = True,
    max_steps: Optional[int] = None,
    seed: int = 0,
    warm_start: Optional[str] = None,
):
    from .train.checkpoints import (CheckpointManager, check_schedule_meta,
                                    schedule_meta_of, warm_start_params)

    sched_meta = schedule_meta_of(
        getattr(model, "cfg", None), objective=train_cfg.objective
    )
    params = model.init_params(jax.random.PRNGKey(seed))
    if warm_start:
        # warm-start fit from a prior run's checkpoint (reference
        # --model.ckpt_path, PanoGenerator.py:86-114 — e.g. initializing
        # the ControlNet stage from the text-to-pano weights)
        from .models.panfusion import _param_trees_of_checkpoint

        warm_dir = os.path.dirname(os.path.abspath(warm_start))
        # warn-only: warm-starting across objectives is legitimate (e.g.
        # stage-0 vae_recon -> diffusion), but the schedule fields must
        # still be surfaced when they differ
        check_schedule_meta(
            warm_dir,
            {k: v for k, v in sched_meta.items() if k != "objective"},
            strict=False, context="warm-start checkpoint",
        )
        ckpt0 = CheckpointManager(warm_dir)
        loaded = ckpt0.restore_raw(os.path.basename(warm_start))
        if loaded is None:
            print(f"WARNING: warm-start checkpoint {warm_start} not found")
        else:
            # explicit CLI calibration must survive the merge: the loaded
            # checkpoint carries its own vae/latent_norm (possibly the SD
            # defaults from a stage-0 recon pretrain), and silently letting
            # it clobber freshly calibrated --model.latent_scale/shift
            # re-creates the wrong-SNR footgun the flags exist to fix.
            # None means "not specified" -> the checkpoint's values win.
            cfg = getattr(model, "cfg", None)
            init_norm = dict(params.get("vae", {}).get("latent_norm", {}))
            for tree in _param_trees_of_checkpoint(loaded):
                params = warm_start_params(params, tree)
            keep = [k for k, explicit in (
                ("scale", cfg is not None and cfg.latent_scale is not None),
                ("shift", cfg is not None and cfg.latent_shift is not None),
            ) if explicit and k in init_norm]
            if keep:
                norm = dict(params["vae"]["latent_norm"])
                for k in keep:
                    norm[k] = init_norm[k]
                params["vae"] = {**params["vae"], "latent_norm": norm}
                print(f"warm start: keeping configured latent_norm {keep} "
                      "over the checkpoint's values")
    datamodule.prepare_data()
    datamodule.setup("fit")
    loader = datamodule.train_dataloader()
    train_cfg.steps_per_epoch = max(1, len(loader))

    # multi-chip: shard over a (data, model) mesh — DP over batch, TP over
    # large kernels / the view axis (the DDP replacement, SURVEY.md §2.8).
    # The data axis must divide the batch and the model axis the view count;
    # otherwise fold that axis down (worst case 1x1 = single-device).
    mesh = None
    if len(jax.devices()) > 1:
        import math

        from .parallel.mesh import make_mesh, shard_params_tp

        n = len(jax.devices())
        b = datamodule.hparams.batch_size
        m = model.cfg.num_views
        data_ax = math.gcd(b, n)
        model_ax = math.gcd(m, n // data_ax)
        if data_ax * model_ax > 1:
            mesh = make_mesh(data_ax * model_ax, shape=(data_ax, model_ax))
            params = shard_params_tp(params, mesh)
            print(f"training on mesh {dict(mesh.shape)}")

    from .train.params import (controlnet_trainable, default_trainable,
                               full_dual_trainable, full_text_trainable,
                               vae_trainable)

    predicate = (
        vae_trainable if train_cfg.objective == "vae_recon"
        else controlnet_trainable if model.cfg.layout_cond
        else full_dual_trainable if train_cfg.trainable == "full"
        else full_text_trainable if train_cfg.trainable == "full_text"
        else default_trainable
    )
    state, opt = create_train_state(model, params, train_cfg, predicate)
    del params  # frozen f32 originals are donated away; drop the last ref
    import gc

    gc.collect()
    ckpt = CheckpointManager(os.path.join(logger.save_dir, "checkpoints"))
    if resume and ckpt.exists("last"):
        # strict: silently continuing an epsilon-trained run under a
        # v-prediction config (or vice versa) trains against garbage targets
        check_schedule_meta(ckpt.ckpt_dir, sched_meta, strict=True,
                            context="resume checkpoint")
        restored = ckpt.restore(state, "last")
        if restored is not None:
            state = restored
            if mesh is not None:
                # orbax restores single-device arrays; re-place on the mesh
                from .parallel.mesh import replicated, shard_params_tp
                from .train.loop import TrainState

                state = TrainState(
                    shard_params_tp(state.trainable, mesh),
                    shard_params_tp(state.frozen, mesh),
                    jax.device_put(state.opt_state, replicated(mesh)),
                    jax.device_put(state.step, replicated(mesh)),
                )
            else:
                # restore returns HOST numpy leaves. trainable/opt_state are
                # replaced by device outputs after the first step, but FROZEN
                # leaves are never written again — leaving them numpy makes
                # every subsequent step re-transfer the full frozen tree
                # host->device. Observed on the tunneled v5e: a resumed fit
                # ran 35% slower and leaked host transfer buffers until the
                # OOM killer took it at 130 GB RSS (~9k steps). Place the
                # whole state on device once instead.
                state = jax.device_put(state)
            print(f"Resumed from step {int(state.step)}")
            # resume hygiene: rows beyond the checkpoint step belong to an
            # aborted/experimental continuation and would interleave two
            # histories in the committed curve (round-4 postmortem)
            truncate = getattr(logger, "truncate_after_step", None)
            if truncate is not None:
                truncate(int(state.step))
    else:
        # fresh-fit hygiene, the resume case's sibling: with no checkpoint
        # to resume, any existing metrics.jsonl is a PREVIOUS run's curve
        # (e.g. checked out of git on a new host whose checkpoints/ was
        # never committed). Appending step-10,20,... rows after it would
        # interleave two histories exactly like the aborted-resume case —
        # observed round 5 when the stage-0 VAE refit appended to the
        # committed 600-step curve. A from-scratch fit owns its file.
        truncate = getattr(logger, "truncate_after_step", None)
        if truncate is not None:
            dropped = truncate(-1)
            if dropped:
                print(f"Fresh fit: dropped {dropped} stale metrics rows "
                      "from a previous run")
        if mesh is None:
            # warm-start leaves checkpoint-loaded HOST numpy leaves in the
            # frozen tree — the same leak d157348 fixed for resumes (the
            # trainable/opt_state leaves are replaced by device outputs
            # after step 1, frozen leaves never are, so every step
            # re-transfers them and the transfer buffers accumulate).
            # Round 5: a warm-started fresh fit OOM-killed at 130 GB RSS /
            # ~10k steps. Place the whole state on device up front.
            state = jax.device_put(state)
    # the sidecar is written alongside each save (CheckpointManager.save),
    # never eagerly: writing it at fit start would relabel an existing
    # `last` trained under a different schedule (ADVICE r4)
    ckpt.schedule_meta = sched_meta

    if train_cfg.objective == "vae_recon":
        from .train.loop import make_vae_loss_fn

        step_fn = make_train_step(model, opt, make_vae_loss_fn(model))
    else:
        step_fn = make_train_step(model, opt)
        _check_latent_stats(model, state, loader)
    rng = jax.random.PRNGKey(seed + 1)
    step = int(state.step)
    start_epoch = step // train_cfg.steps_per_epoch
    for epoch in range(start_epoch, train_cfg.max_epochs):
        for batch in loader:
            params_now = merge_params(state.trainable, state.frozen)
            dev_batch = _device_batch(model, params_now, batch)
            if mesh is not None:
                from .parallel.mesh import shard_batch

                dev_batch = shard_batch(dev_batch, mesh)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, dev_batch, sub)
            step += 1
            if step % 10 == 0:
                from .train.loop import make_lr_schedule

                scalars = {f"train/{k}": float(v) for k, v in metrics.items()}
                # scheduled LR each log step (reference LearningRateMonitor,
                # main.py:41) — without it the cosine/CN-scale schedules
                # are invisible in the JSONL streams. The ControlNet stage
                # trains at constant LR (create_train_state drops cosine,
                # reference PanoGenerator.py:289) — mirror that here.
                lr_cfg = train_cfg
                if getattr(model.cfg, "layout_cond", False):
                    import dataclasses as _dc

                    lr_cfg = _dc.replace(train_cfg, use_cosine=False)
                scalars["train/lr"] = float(make_lr_schedule(lr_cfg)(step))
                logger.log(scalars, step)
            ckpt.maybe_save(state)
            if max_steps is not None and step >= max_steps:
                ckpt.save(state)
                if step % 10 != 0:
                    # short drives (max_steps < the 10-step log interval)
                    # must still leave loss evidence in metrics.jsonl
                    logger.log({f"train/{k}": float(v)
                                for k, v in metrics.items()}, step)
                return state
        last_epoch = epoch == train_cfg.max_epochs - 1
        if last_epoch:
            ckpt.save(state)
        else:
            # short epochs (a 100-step synthetic epoch is ~40 s) must not
            # serialize the full TrainState every time; the 10-minute
            # interval is the reference's checkpoint cadence (main.py:35-39)
            ckpt.maybe_save(state)
        logger.log({"epoch": epoch}, step)
        if (epoch + 1) % max(1, train_cfg.val_every_n_epochs) and not last_epoch:
            continue
        if train_cfg.objective == "vae_recon":
            _validate_vae(model, state, datamodule, logger, step)
        else:
            _validate(model, state, datamodule, logger, rng, step)
    return state


def _validate_vae(model, state, datamodule, logger, step, max_batches: int = 2):
    """Epoch-end check for the vae_recon objective: log GT-vs-recon pano
    pairs (posterior mean, no sampling) instead of running the diffusion
    sampler against a still-random UNet."""
    try:
        loader = datamodule.val_dataloader()
    except Exception:
        return
    params = merge_params(state.trainable, state.frozen)
    for bi, batch in enumerate(loader):
        if bi >= max_batches:
            break
        pano = jnp.asarray(batch["pano"][:1, 0])
        mean, _ = model.vae.apply(params["vae"], pano, method=model.vae.encode)
        rec = np.asarray(
            model.vae.apply(params["vae"], mean,
                            method=lambda m, v: m.decoder(v))
        )
        rec8 = ((np.clip(rec[0], -1, 1) + 1) * 127.5).astype(np.uint8)
        gt8 = ((np.clip(np.asarray(pano[0]), -1, 1) + 1) * 127.5).astype(np.uint8)
        logger.log_image(f"val/vae_recon_{bi}", rec8, step)
        logger.log_image(f"val/vae_gt_{bi}", gt8, step)


def _validate(model, state, datamodule, logger, rng, step, max_batches: int = 4):
    """Epoch-end validation: full inference on a few val samples, logging
    pred-vs-GT panorama pairs (reference limit_val_batches=4 main.py:65 +
    PanFusion.log_val_image, models/pano/PanFusion.py:205-228)."""
    try:
        loader = datamodule.val_dataloader()
    except Exception:
        return
    params = merge_params(state.trainable, state.frozen)
    for bi, batch in enumerate(loader):
        if bi >= max_batches:
            break
        rng, sub = jax.random.split(rng)
        try:
            _, pano = model.inference(params, batch, sub)
        except Exception as exc:  # val must never kill training
            print(f"WARNING: validation inference failed: {exc}")
            return
        logger.log_image(f"val/pano_pred_{bi}", pano[0], step)
        if "pano" in batch:
            gt = batch["pano"][0, 0]
            if gt.dtype != np.uint8:
                gt = ((np.clip(gt, -1, 1) + 1) * 127.5).astype(np.uint8)
            logger.log_image(f"val/pano_gt_{bi}", gt, step)


def predict(
    model: PanFusion,
    params,
    datamodule,
    logger: ExperimentLogger,
    mode: str = "predict",
    ext: str = "jpg",
    seed: int = 0,
):
    """Idempotent text->pano generation into logs/<run>/<mode>/<pano_id>/
    (skips samples whose prompt.txt exists — reference PanFusion.py:190-203).
    Also saves the 20 per-view images for downstream pers metrics."""
    from PIL import Image

    datamodule.setup("predict" if mode == "predict" else "test")
    loader = (
        datamodule.predict_dataloader()
        if mode == "predict"
        else datamodule.test_dataloader()
    )
    # multi-chip serving: shard the view axis over the mesh when more than
    # one device is visible (no-op on a single chip; models without a
    # sharded serving path run as-is)
    mesh = None
    prep = getattr(model, "prepare_inference_mesh", None)
    if prep is not None:
        params, mesh = prep(params)
        if mesh is not None:
            print(f"predicting on mesh {dict(mesh.shape)}")
    rng = jax.random.PRNGKey(seed)
    for bi, batch in enumerate(loader):
        out_dir = os.path.join(logger.save_dir, mode, batch["pano_id"][0])
        prompt_path = os.path.join(out_dir, "prompt.txt")
        if os.path.exists(prompt_path):
            continue
        rng, sub = jax.random.split(rng)
        images, pano = (
            model.inference(params, batch, sub, mesh=mesh)
            if mesh is not None
            else model.inference(params, batch, sub)
        )
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray(pano[0]).save(os.path.join(out_dir, f"pano.{ext}"))
        if mode == "test":
            for i in range(images.shape[1]):
                Image.fromarray(images[0, i]).save(
                    os.path.join(out_dir, f"{i}.png")
                )
        # provenance stamp (VERDICT r4 weak #1): the committed predict
        # panels were once regenerated outside the snapshot path, leaving
        # config.predict.N.json recording a guidance the panels were not
        # sampled with. Every sample now carries the sampling config and
        # snapshot it came from; tools/faed_distance.py embeds these in the
        # gate JSON and tests/test_learning_runs.py cross-checks them.
        import json as _json

        cfg = getattr(model, "cfg", None)
        prov = {
            **getattr(logger, "run_context", {}),
            "pano_id": batch["pano_id"][0],
            "seed": seed,
        }
        for k in ("guidance_scale", "diff_timestep", "prediction_type",
                  "timestep_spacing", "zero_snr", "ddim_eta", "preset"):
            if cfg is not None and hasattr(cfg, k):
                prov[k] = getattr(cfg, k)
        with open(os.path.join(out_dir, "provenance.json"), "w") as f:
            _json.dump(prov, f, indent=2, default=str)
        with open(prompt_path, "w") as f:
            f.write(batch["pano_prompt"][0] + "\n")
        print(f"[{bi + 1}/{len(loader)}] {batch['pano_id'][0]}")
