"""DDIM scheduler as pure functions over a precomputed table (scan-ready).

Numeric parity with diffusers 0.24 DDIMScheduler configured by
stabilityai/stable-diffusion-2-base (reference loads it in
models/pano/PanoGenerator.py:128-130): 1000 train steps, scaled_linear betas
[0.00085, 0.012], prediction_type epsilon, set_alpha_to_one=False,
steps_offset=1, leading timestep spacing, eta=0, clip_sample=False.

Unlike the stateful diffusers object, this is a frozen table + two pure
functions (``add_noise``, ``step``) so the whole 50-step sampling loop jits
as one lax.scan (SURVEY.md §7.1 "jit the whole DDIM loop").
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDIMSchedule(NamedTuple):
    alphas_cumprod: jnp.ndarray  # (num_train_timesteps,)
    final_alpha_cumprod: jnp.ndarray  # scalar
    timesteps: jnp.ndarray  # (num_inference_steps,) descending
    num_train_timesteps: int
    num_inference_steps: int


def make_ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    timestep_spacing: str = "leading",
    zero_snr: bool = False,
) -> DDIMSchedule:
    if not 0 < num_inference_steps <= num_train_timesteps:
        # step_ratio would floor to 0 and every step would run at t=1
        raise ValueError(
            f"num_inference_steps={num_inference_steps} must be in "
            f"[1, {num_train_timesteps}] (diffusers raises here too)"
        )
    betas = (
        np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )
    acp = np.cumprod(1.0 - betas)
    if zero_snr:
        # Rescale betas to zero terminal SNR (Lin et al., "Common Diffusion
        # Noise Schedules and Sample Steps are Flawed", 2024; diffusers
        # rescale_betas_zero_snr): shift+scale sqrt(alpha_bar) so the last
        # entry is exactly 0 — training then sees PURE noise at t=T and the
        # sampler starts on-distribution. Without this, scaled-linear betas
        # leave ~4.7% signal at t=999; a pretrained SD2 shrugs it off, but a
        # from-scratch model learns to lean on that leak and cannot form
        # structure from a pure-noise x_T (observed: synthetic-rooms demo,
        # round 3 — mushy samples at every guidance scale while noised-GT
        # reconstruction from t=981 is perfect). Requires v-prediction:
        # eps-parameterization divides by sqrt(alpha_bar_T)=0.
        sa = np.sqrt(acp)
        sa = (sa - sa[-1]) * (sa[0] / (sa[0] - sa[-1]))
        acp = sa**2
    if timestep_spacing == "leading":
        # 'leading' + steps_offset=1 (diffusers DDIMScheduler.set_timesteps)
        step_ratio = num_train_timesteps // num_inference_steps
        timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(
            np.int32
        ) + 1
        # steps_offset pushes the first timestep to T at full-step counts,
        # one past the alpha table (diffusers would IndexError; jnp would
        # silently clamp-gather) — clamp explicitly
        timesteps = np.minimum(timesteps, num_train_timesteps - 1)
    elif timestep_spacing == "trailing":
        # 'trailing' (diffusers): last inference step lands exactly on
        # t=T-1, so sampling starts at the terminal (zero-SNR) timestep.
        step_ratio = num_train_timesteps / num_inference_steps
        timesteps = np.round(
            np.arange(num_train_timesteps, 0, -step_ratio)
        ).astype(np.int32) - 1
    else:
        raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")
    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(acp, jnp.float32),
        final_alpha_cumprod=jnp.asarray(acp[0], jnp.float32),  # set_alpha_to_one=False
        timesteps=jnp.asarray(timesteps),
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
    )


def add_noise(sched: DDIMSchedule, sample, noise, t):
    """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps. t: int array (b,)."""
    acp = sched.alphas_cumprod[t]
    while acp.ndim < sample.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise


def ddim_step(sched: DDIMSchedule, model_output, t, sample,
              prediction_type: str = "epsilon", eta: float = 0.0, rng=None):
    """One DDIM update (diffusers DDIMScheduler.step parity).

    t is a traced scalar timestep — safe inside lax.scan.

    prediction_type: "epsilon" (SD2 default) or "v_prediction" (required
    with zero-SNR schedules: eps-parameterization divides by
    sqrt(alpha_bar_T) = 0 at the terminal step).
    eta > 0 adds the DDPM-style stochastic term (sigma_t * z); pass rng.
    """
    prev_t = t - sched.num_train_timesteps // sched.num_inference_steps
    alpha_t = sched.alphas_cumprod[t]
    alpha_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )
    if prediction_type == "v_prediction":
        # x0 = sqrt(a) x_t - sqrt(1-a) v;  eps = sqrt(a) v + sqrt(1-a) x_t
        pred_x0 = (
            jnp.sqrt(alpha_t) * sample - jnp.sqrt(1.0 - alpha_t) * model_output
        )
        pred_eps = (
            jnp.sqrt(alpha_t) * model_output + jnp.sqrt(1.0 - alpha_t) * sample
        )
    else:
        pred_x0 = (
            sample - jnp.sqrt(1.0 - alpha_t) * model_output
        ) / jnp.sqrt(alpha_t)
        pred_eps = model_output
    if eta > 0.0:
        if rng is None:
            raise ValueError("eta > 0 requires an rng for the noise term")
        var = (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / alpha_prev)
        sigma = eta * jnp.sqrt(jnp.maximum(var, 0.0))
        # the t=0 boundary (prev_t < 0) takes no stochastic term; clamp
        # BEFORE computing the deterministic direction so the final sample
        # keeps the full sqrt(1-a_prev) coefficient (an unclamped sigma^2
        # here would under-scale the last step's direction term)
        sigma = jnp.where(prev_t >= 0, sigma, 0.0)
        direction = jnp.sqrt(
            jnp.maximum(1.0 - alpha_prev - sigma**2, 0.0)
        ) * pred_eps
        noise = jax.random.normal(rng, sample.shape, jnp.float32)
        return jnp.sqrt(alpha_prev) * pred_x0 + direction + sigma * noise
    direction = jnp.sqrt(1.0 - alpha_prev) * pred_eps
    return jnp.sqrt(alpha_prev) * pred_x0 + direction


def velocity_target(sched: DDIMSchedule, sample, noise, t):
    """v-prediction training target: v = sqrt(acp) eps - sqrt(1-acp) x0.

    This is the live loss target whenever cfg.prediction_type ==
    'v_prediction' (train/loop.py selects it; the demo preset resolves to
    v-prediction since the zero-SNR fix). SD2-base itself is
    eps-parameterized and never uses it."""
    acp = sched.alphas_cumprod[t]
    while acp.ndim < sample.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample
