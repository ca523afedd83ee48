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
    # 'leading' spacing + steps_offset=1 (diffusers DDIMScheduler.set_timesteps)
    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].astype(
        np.int32
    ) + 1
    # steps_offset pushes the first timestep to T at full-step counts,
    # one past the alpha table (diffusers would IndexError; jnp would
    # silently clamp-gather) — clamp explicitly
    timesteps = np.minimum(timesteps, num_train_timesteps - 1)
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


def ddim_step(sched: DDIMSchedule, model_output, t, sample):
    """One deterministic DDIM update (eta=0, epsilon prediction).

    t is a traced scalar timestep — safe inside lax.scan.
    """
    prev_t = t - sched.num_train_timesteps // sched.num_inference_steps
    alpha_t = sched.alphas_cumprod[t]
    alpha_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )
    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_t) * model_output) / jnp.sqrt(alpha_t)
    direction = jnp.sqrt(1.0 - alpha_prev) * model_output
    return jnp.sqrt(alpha_prev) * pred_x0 + direction


def velocity_target(sched: DDIMSchedule, sample, noise, t):
    """v-prediction target (unused by SD2-base but part of the scheduler
    surface): v = sqrt(acp) eps - sqrt(1-acp) x0."""
    acp = sched.alphas_cumprod[t]
    while acp.ndim < sample.ndim:
        acp = acp[..., None]
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * sample
