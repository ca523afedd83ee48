"""Training loop: jitted dual-branch denoising step + optimizer.

Loss parity with the reference training_step (models/pano/PanFusion.py:
64-98): VAE-encode the m views and the circularly padded pano, one shared
timestep per sample, correlated noise, dual-branch epsilon prediction,
MSE(pers) + MSE(pano).

TPU-first: the whole step — including on-device EPP mask construction for
the batch's random cameras — is ONE jitted function; data parallelism comes
from sharding the batch over the mesh 'data' axis (see
panfusion_tpu/parallel), not a DDP process group.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.epp import build_epp_sites_batched
from ..models.panfusion import PanFusion
from ..nn.scheduler import add_noise, velocity_target
from .params import default_trainable, merge_params, partition_params


@dataclasses.dataclass
class TrainConfig:
    lr: float = 2e-4  # reference PanoGenerator.py:64
    max_epochs: int = 10  # reference main.py:68
    steps_per_epoch: int = 1000
    eta_min: float = 1e-7  # reference CosineAnnealingLR (PanoGenerator.py:288)
    weight_decay: float = 0.01  # torch AdamW default
    cn_lr_scale: float = 0.1  # reference get_cn (PanoGenerator.py:153-157)
    use_cosine: bool = True  # disabled when layout_cond (PanoGenerator.py:289)
    grad_accum: int = 1
    # 'adapters' (reference: LoRA + WarpAttn on frozen SD2), 'full'
    # (both UNets + WarpAttn; VAE/text frozen) or 'full_text' (UNets +
    # WarpAttn + text encoder; VAE frozen — from-scratch runs, where the
    # text tower is random and freezing it starves conditioning)
    trainable: str = "adapters"
    # run the epoch-end validation (full 50-step inference on val samples)
    # only every N epochs: a multi-hundred-epoch from-scratch run would
    # otherwise spend a large fraction of chip time sampling panels
    val_every_n_epochs: int = 1
    # 'diffusion' (the reference objective) or 'vae_recon' (first-stage
    # recon pretrain for from-scratch runs; forces the VAE-only trainable
    # set — the reference never trains its VAE, it ships SD2's)
    objective: str = "diffusion"


class TrainState(NamedTuple):
    trainable: Dict
    frozen: Dict
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: TrainConfig):
    """The scheduled LR as a callable of step — used by the optimizer AND
    by the fit loop's train/lr logging (reference LearningRateMonitor,
    main.py:41). Torch CosineAnnealingLR semantics: lr(e) = eta_min +
    (lr0-eta_min)(1+cos(pi e/T))/2, stepped per epoch."""
    if not cfg.use_cosine:
        return lambda step: cfg.lr

    def lr_schedule(step):
        epoch = jnp.minimum(step // cfg.steps_per_epoch, cfg.max_epochs)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * epoch / cfg.max_epochs))
        return cfg.eta_min + (cfg.lr - cfg.eta_min) * cos

    return lr_schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + per-epoch cosine annealing (see make_lr_schedule)."""
    return optax.adamw(make_lr_schedule(cfg), weight_decay=cfg.weight_decay)


def create_train_state(
    model: PanFusion,
    params: Dict,
    cfg: TrainConfig,
    trainable_predicate: Callable = default_trainable,
) -> Tuple[TrainState, optax.GradientTransformation]:
    if model.cfg.layout_cond and cfg.use_cosine:
        # the reference skips the cosine schedule for the ControlNet stage
        # (PanoGenerator.py:289)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, use_cosine=False)
    trainable, frozen = partition_params(params, trainable_predicate)
    if model.cfg.dtype != jnp.float32:
        # mixed precision: frozen towers live in the compute dtype (the
        # reference keeps VAE/CLIP fp16 and only the trainable set matters
        # numerically, PanoGenerator.py:116-130); master trainable params
        # stay f32 for the optimizer. Saves ~4.3 GB HBM at SD2 size.
        from ..models.panfusion import cast_params

        frozen = cast_params(frozen, model.cfg.dtype)
    opt = make_optimizer(cfg)
    if model.cfg.layout_cond:
        # ControlNet param group at cn_lr_scale x lr (reference
        # PanoGenerator.py:153-157, 280-293)
        from .params import lr_scale_mask

        def is_cn(path):
            joined = "/".join(path)
            return "pano_cn" in joined or "pers_cn" in joined

        scales = lr_scale_mask(trainable, is_cn, cfg.cn_lr_scale)
        opt = optax.chain(
            opt,
            optax.masked(
                optax.scale(cfg.cn_lr_scale),
                jax.tree.map(lambda s: s != 1.0, scales),
            ),
        )
    if cfg.grad_accum > 1:
        # gradient accumulation: parameter updates apply every k-th step
        opt = optax.MultiSteps(
            opt, every_k_schedule=cfg.grad_accum
        ).gradient_transformation()
    return (
        TrainState(trainable, frozen, opt.init(trainable), jnp.zeros((), jnp.int32)),
        opt,
    )


def make_loss_fn(model: PanFusion):
    """loss_fn(trainable, frozen, batch, rng) -> (loss, metrics) — the
    dual-branch epsilon-MSE training objective. Exposed standalone so the
    multichip parity tests can compare raw GRADIENTS across mesh shapes
    (tests/test_multichip_train_parity.py), not just post-optimizer state.

    batch (device arrays):
      images: (b, m, h, w, 3) in [-1, 1]
      pano:   (b, H, W, 3) in [-1, 1]
      pers_ctx: (b, m, 77, C); pano_ctx: (b, 77, C)
      fov/theta/phi: (b, m) degrees
    """
    cfg = model.cfg

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        r_vae, r_t, r_noise = jax.random.split(rng, 3)
        b, m = batch["images"].shape[:2]

        latents = model.encode_views(params, batch["images"], r_vae)
        pano_latent = model.encode_pano(params, batch["pano"], r_vae)
        latents = jax.lax.stop_gradient(latents)
        pano_latent = jax.lax.stop_gradient(pano_latent)

        t = jax.random.randint(
            r_t, (b,), 0, model.schedule.num_train_timesteps
        )

        # correlated noise per sample over its own cameras
        eh, ew = pano_latent.shape[1:3]
        ph, pw = latents.shape[2:4]

        def noise_one(rng_i, theta_i, phi_i):
            pn, vn = model.init_noise(rng_i, 1, (eh, ew), (ph, pw), theta_i, phi_i)
            return pn[0], vn[0]

        rngs = jax.random.split(r_noise, b)
        pano_noise, noise = jax.vmap(noise_one)(rngs, batch["theta"], batch["phi"])

        noise_z = add_noise(model.schedule, latents, noise, t[:, None])
        pano_noise_z = add_noise(model.schedule, pano_latent, pano_noise, t)

        sites = build_epp_sites_batched(
            cfg.pers_latent_res, (eh, ew),
            batch["fov"], batch["theta"], batch["phi"],
            n_levels=model.n_levels,
        ) if cfg.use_pers_branch else None

        pano_res = pano_mid = pers_res = pers_mid = None
        if model.pano_cn is not None and "pano_layout_cond" in batch:
            pano_res, pano_mid = model.pano_cn.apply(
                params["pano_cn"],
                pano_noise_z.astype(cfg.dtype), t,
                batch["pano_ctx"].astype(cfg.dtype),
                batch["pano_layout_cond"].astype(cfg.dtype),
            )
        if model.pers_cn is not None and "images_layout_cond" in batch:
            bm = b * m
            pers_res, pers_mid = model.pers_cn.apply(
                params["pers_cn"],
                noise_z.reshape(bm, *noise_z.shape[2:]).astype(cfg.dtype),
                jnp.repeat(t, m),
                batch["pers_ctx"].reshape(bm, *batch["pers_ctx"].shape[2:]).astype(cfg.dtype),
                batch["images_layout_cond"].reshape(
                    bm, *batch["images_layout_cond"].shape[2:]
                ).astype(cfg.dtype),
            )

        denoise, pano_denoise = model.dual.apply(
            params["dual"],
            noise_z.astype(cfg.dtype) if cfg.use_pers_branch else None,
            pano_noise_z.astype(cfg.dtype),
            t,
            batch["pers_ctx"].astype(cfg.dtype) if cfg.use_pers_branch else None,
            batch["pano_ctx"].astype(cfg.dtype),
            sites,
            pers_residuals=pers_res,
            pano_residuals=pano_res,
            pers_mid_residual=pers_mid,
            pano_mid_residual=pano_mid,
        )
        if cfg.prediction_type == "v_prediction":
            # v-target (Salimans & Ho 2022; required with zero-SNR
            # schedules — see nn/scheduler.py make_ddim_schedule)
            pano_target = velocity_target(
                model.schedule, pano_latent, pano_noise, t
            )
            pers_target = velocity_target(
                model.schedule, latents, noise, t[:, None]
            )
        else:
            pano_target, pers_target = pano_noise, noise
        loss_pano = jnp.mean(
            (pano_denoise.astype(jnp.float32) - pano_target) ** 2
        )
        if denoise is not None:
            loss_pers = jnp.mean(
                (denoise.astype(jnp.float32) - pers_target) ** 2
            )
        else:
            loss_pers = jnp.zeros(())
        loss = loss_pers + loss_pano
        return loss, {"loss": loss, "loss_pers": loss_pers, "loss_pano": loss_pano}

    return loss_fn


def make_vae_loss_fn(model: PanFusion):
    """First-stage VAE objective (--trainer.objective=vae_recon): posterior
    sample -> decode, L1 + MSE recon on the pano and the m views, plus a
    small KL to the unit Gaussian (LDM first-stage weighting). Not a
    reference training stage — the reference adapts a frozen pretrained SD2
    VAE (PanoGenerator.py:116-130) — but a from-scratch demo needs the tiny
    VAE to reconstruct before the diffusion fit can produce visible panos."""
    kl_weight = 1e-6

    def one_recon(params, x, rng):
        mean, logvar = model.vae.apply(
            params["vae"], x, method=model.vae.encode
        )
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        rec = model.vae.apply(params["vae"], z, method=lambda m, v: m.decoder(v))
        rec = rec.astype(jnp.float32)
        x = x.astype(jnp.float32)
        recon = jnp.mean(jnp.abs(rec - x)) + jnp.mean((rec - x) ** 2)
        kl = -0.5 * jnp.mean(
            1 + logvar - mean.astype(jnp.float32) ** 2
            - jnp.exp(logvar.astype(jnp.float32))
        )
        return recon, kl

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        r_pano, r_views = jax.random.split(rng)
        recon_pano, kl_pano = one_recon(params, batch["pano"], r_pano)
        views = batch["images"]
        flat = views.reshape(-1, *views.shape[2:])
        recon_views, kl_views = one_recon(params, flat, r_views)
        kl = 0.5 * (kl_pano + kl_views)
        loss = recon_pano + recon_views + kl_weight * kl
        return loss, {
            "loss": loss,
            "recon_pano": recon_pano,
            "recon_views": recon_views,
            "kl": kl,
        }

    return loss_fn


def make_train_step(
    model: PanFusion,
    opt: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""
    if loss_fn is None:
        loss_fn = make_loss_fn(model)

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, state.frozen, batch, rng
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(trainable, state.frozen, opt_state, state.step + 1),
            metrics,
        )

    return train_step
