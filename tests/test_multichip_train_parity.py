"""Multi-chip TRAINING parity (VERDICT round 1, Next #5).

Round 1 proved sharded *inference* equals single-device inference and that
a sharded train step's loss is finite. This pins the actual DDP-replacement
contract (SURVEY §2.8): the same batch + seed must produce the same loss,
the same gradients, and the same updated parameters on a 1-device run and
on 2x4 / 1x8 meshes (DP over batch, TP over large kernels, views over
"model"), and grad_accum=k over k micro-batches must equal one k-times
larger batch step.

Runs on the conftest-forced 8-virtual-device CPU platform.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panfusion_tpu.models import PanFusion, PanFusionConfig
from panfusion_tpu.parallel.mesh import make_mesh, shard_batch, shard_params_tp
from panfusion_tpu.train.loop import (TrainConfig, create_train_state,
                                      make_train_step, merge_params)


def _tiny_model(num_views):
    cfg = PanFusionConfig(
        pano_height=64,
        pers_resolution=64,
        num_views=num_views,
        diff_timestep=2,
        latent_pad=1,
        unet_kwargs=dict(
            block_out_channels=(16, 32, 32, 32),
            layers_per_block=1,
            heads=(1, 1, 1, 1),
            dim_head=8,
            context_dim=16,
        ),
        vae_kwargs=dict(block_out_channels=(4, 8, 8, 8)),
        text_kwargs=dict(vocab_size=1024, hidden_size=16,
                         intermediate_size=32, num_layers=2, num_heads=2),
    )
    return PanFusion(cfg)


def _batch(b, m, seed=0):
    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 360, m, endpoint=False, dtype=np.float32)
    return {
        "images": jnp.asarray(
            rng.normal(size=(b, m, 64, 64, 3)).astype(np.float32) * 0.1),
        "pano": jnp.asarray(
            rng.normal(size=(b, 64, 128, 3)).astype(np.float32) * 0.1),
        "pers_ctx": jnp.zeros((b, m, 77, 16)),
        "pano_ctx": jnp.zeros((b, 77, 16)),
        "fov": jnp.full((b, m), 90.0),
        "theta": jnp.broadcast_to(theta, (b, m)),
        "phi": jnp.zeros((b, m)),
    }


def _leaf_maxdiff(a, b):
    return max(
        float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


def _run_one_step(model, mesh_shape, batch, grad_accum=1):
    """One (or grad_accum) train step(s); returns (losses, updated
    trainable tree as host numpy)."""
    params = model.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(steps_per_epoch=4, grad_accum=grad_accum)
    losses = []
    if mesh_shape is None:
        state, opt = create_train_state(model, params, tc)
        step = make_train_step(model, opt)
        for i in range(grad_accum):
            sub = batch if grad_accum == 1 else {
                k: v[i::grad_accum] if hasattr(v, "ndim") and v.ndim else v
                for k, v in batch.items()
            }
            state, metrics = step(state, sub, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    else:
        mesh = make_mesh(shape=mesh_shape)
        with mesh:
            params = shard_params_tp(params, mesh, min_size=256)
            state, opt = create_train_state(model, params, tc)
            step = make_train_step(model, opt)
            state, metrics = step(state, shard_batch(batch, mesh),
                                  jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    trainable = jax.tree_util.tree_map(np.asarray, state.trainable)
    return losses, trainable


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_mesh_step_matches_single_device(mesh_shape):
    m = 8  # views divide the model axis of both meshes
    model = _tiny_model(m)
    batch = _batch(b=2, m=m)

    loss_1, train_1 = _run_one_step(model, None, batch)
    loss_n, train_n = _run_one_step(model, mesh_shape, batch)

    assert abs(loss_1[0] - loss_n[0]) < 1e-4, (loss_1, loss_n)
    # updated params equal => the gradients the optimizer consumed were
    # equal (AdamW normalizes grad scale, so this is a *stronger* check
    # than comparing raw grads at one point)
    diff = _leaf_maxdiff(train_1, train_n)
    assert diff < 2e-4, f"trainable params diverged: {diff}"


def test_grad_accum_equals_equivalent_single_step():
    """Exact equivalence: grad_accum=2 fed the SAME micro-batch with the
    SAME rng twice accumulates mean(g, g) = g, so the applied AdamW update
    must EQUAL a grad_accum=1 step on that micro-batch (optax MultiSteps
    mean-of-grads contract — the DDP-accumulation semantics)."""
    m = 4
    model = _tiny_model(m)
    half = _batch(b=2, m=m)
    rng = jax.random.PRNGKey(1)
    params = model.init_params(jax.random.PRNGKey(0))

    state_a, opt_a = create_train_state(
        model, params, TrainConfig(steps_per_epoch=4, grad_accum=1))
    step_a = make_train_step(model, opt_a)
    state_a, metrics_a = step_a(state_a, half, rng)

    state_b, opt_b = create_train_state(
        model, params, TrainConfig(steps_per_epoch=4, grad_accum=2))
    step_b = make_train_step(model, opt_b)
    state_b, _ = step_b(state_b, half, rng)
    state_b, metrics_b = step_b(state_b, half, rng)

    assert abs(float(metrics_a["loss"]) - float(metrics_b["loss"])) < 1e-6
    diff = _leaf_maxdiff(state_a.trainable, state_b.trainable)
    assert diff < 1e-6, f"accumulated update != equivalent single step: {diff}"


def test_grad_accum_no_update_mid_cycle():
    """With grad_accum=2, the first micro-step must NOT change params."""
    m = 4
    model = _tiny_model(m)
    params = model.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(steps_per_epoch=4, grad_accum=2)
    state, opt = create_train_state(model, params, tc)
    step = make_train_step(model, opt)
    state1, _ = step(state, _batch(b=2, m=m), jax.random.PRNGKey(1))
    diff = _leaf_maxdiff(state.trainable, state1.trainable)
    assert diff == 0.0, f"params changed mid-accumulation: {diff}"
    state2, _ = step(state1, _batch(b=2, m=m, seed=1), jax.random.PRNGKey(2))
    diff2 = _leaf_maxdiff(state.trainable, state2.trainable)
    assert diff2 > 0.0, "no update applied at the accumulation boundary"
