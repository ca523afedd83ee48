"""The from-scratch 3-stage recipe wiring, end-to-end at tiny size (CPU).

Pins the exact failure mode that burned the first synthetic-rooms demo run
(README.md "From-scratch training demo"): stage-1 diffusion launched without
the stage-0 VAE warm start and without latent calibration trains at the
wrong SNR — eps-loss converges while every sample decodes to noise. The
reference never hits this because it adapts frozen SD2 (its VAE and the
0.18215 scaling ship together, reference models/pano/PanoGenerator.py:213-225);
a from-scratch build must thread VAE weights AND latent statistics from
stage 0 into stage 1, and this test drives that thread through runner.fit:

  stage 0    fit --trainer.objective=vae_recon     (only the VAE trains)
  stage 0.5  calibrate latent scale/shift from the trained VAE
  stage 1    fit --trainer.trainable=full --model.latent_* warm-started
             from the stage-0 checkpoint (VAE frozen, dual UNets train)
"""
import os

import numpy as np
import pytest

# heavy: compiles full train/fit steps on single-core XLA:CPU (minutes cold)
pytestmark = pytest.mark.slow

pytest.importorskip("orbax.checkpoint")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tiny_cfg_kwargs():
    return dict(
        pano_height=64, pers_resolution=32, num_views=8, diff_timestep=2,
        latent_pad=1, scan_chunk=0,
        unet_kwargs=dict(block_out_channels=(8, 16), heads=(1, 1),
                         dim_head=8, context_dim=16, layers_per_block=1),
        vae_kwargs=dict(block_out_channels=(4, 4, 4, 4), layers_per_block=1),
        text_kwargs=dict(hidden_size=16, intermediate_size=32, num_layers=1,
                         num_heads=1),
    )


def _make_tree(tmp_path, n_repeat=8):
    from PIL import Image

    root = tmp_path / "mp3d"
    sdir = root / "s1"
    (sdir / "matterport_stitched_images").mkdir(parents=True)
    (sdir / "blip3_stitched").mkdir()
    (sdir / "blip3").mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((64, 128, 3)) * 255).astype(np.uint8)).save(
        sdir / "matterport_stitched_images" / "v.png"
    )
    (sdir / "blip3_stitched" / "v.txt").write_text("a tiny room\n")
    for i in range(8):
        (sdir / "blip3" / f"v_{i * 45}.txt").write_text(f"view {i}\n")
    np.save(root / "train.npy",
            np.array([["s1/matterport_stitched_images/v_x"]] * n_repeat))
    np.save(root / "test.npy", np.array([["s1/matterport_stitched_images/v_x"]]))
    return root


def test_three_stage_recipe_wiring(tmp_path, capsys):
    from panfusion_tpu.data.matterport3d import Matterport3D
    from panfusion_tpu.models.panfusion import PanFusion, PanFusionConfig
    from panfusion_tpu.runner import fit
    from panfusion_tpu.train.logging import ExperimentLogger
    from panfusion_tpu.train.loop import TrainConfig

    root = _make_tree(tmp_path)
    dm = Matterport3D(
        data_dir=str(root), pano_height=64, pers_resolution=32,
        cam_sampler="horizon", num_workers=0, batch_size=1,
    )

    # ---------------- stage 0: VAE recon pretrain
    model0 = PanFusion(PanFusionConfig(**_tiny_cfg_kwargs()))
    logger0 = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="s0")
    state0 = fit(model0, dm, TrainConfig(max_epochs=1, objective="vae_recon",
                                         lr=1e-3, use_cosine=False),
                 logger0, max_steps=8, seed=0)
    ckpt0 = os.path.join(logger0.save_dir, "checkpoints", "last")
    assert os.path.isdir(ckpt0)
    vae_trained = jax.tree.map(np.asarray, state0.trainable["vae"]["params"])

    # ---------------- stage 0.5: calibrate from the trained VAE
    # (tools/calibrate_latents.py inline: posterior-mean statistics)
    params0 = model0.load_or_init_params(ckpt0, seed=0)
    batch = next(iter(dm.train_dataloader()))
    x = jnp.asarray(batch["pano"][:, 0])
    mean, logvar = model0.vae.apply(params0["vae"], x, method=model0.vae.encode)
    # RAW posterior samples, like the tool — a barely-trained VAE has a
    # wide posterior, so mean-only statistics undershoot the std
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        jax.random.PRNGKey(7), mean.shape, mean.dtype)
    flat = np.asarray(z, np.float64).reshape(-1, z.shape[-1])
    mu, sd = flat.mean(0), np.maximum(flat.std(0), 1e-3)
    shift = ",".join(f"{v:.4f}" for v in mu)
    scale = ",".join(f"{1.0 / v:.4f}" for v in sd)
    capsys.readouterr()  # drop stage-0 output

    # ---------------- stage 1 WITHOUT calibration: the guardrail fires.
    # A KL-barely-trained tiny VAE has near-unit raw latents, so SD's
    # 0.18215 squashes them (std ~0.2 << 0.5) — exactly the silent-noise
    # config the first demo run shipped.
    model_bad = PanFusion(PanFusionConfig(**_tiny_cfg_kwargs()))
    logger_bad = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="s1bad")
    fit(model_bad, dm,
        TrainConfig(max_epochs=1, trainable="full", use_cosine=False),
        logger_bad, max_steps=1, seed=1, warm_start=ckpt0)
    out_bad = capsys.readouterr().out
    assert "far from N(0,1)" in out_bad, out_bad

    # ---------------- stage 1 calibrated: no warning, VAE frozen at the
    # stage-0 weights, dual UNets move
    model1 = PanFusion(PanFusionConfig(**_tiny_cfg_kwargs(),
                                       latent_shift=shift, latent_scale=scale))
    init1 = model1.init_params(jax.random.PRNGKey(1))
    logger1 = ExperimentLogger(log_dir=str(tmp_path / "logs"), run_id="s1")
    state1 = fit(model1, dm,
                 TrainConfig(max_epochs=1, trainable="full", lr=1e-3,
                             use_cosine=False),
                 logger1, max_steps=4, seed=1, warm_start=ckpt0)
    out1 = capsys.readouterr().out
    assert "far from N(0,1)" not in out1, out1

    # VAE weights rode the warm start and stayed frozen through stage 1
    frozen_vae = state1.frozen["vae"]["params"]
    l_trained = jax.tree.leaves(vae_trained)
    l_frozen = [np.asarray(v) for v in jax.tree.leaves(frozen_vae)]
    assert len(l_trained) == len(l_frozen)
    for a, b in zip(l_trained, l_frozen):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # the calibration rode into stage 1's variables (and thus its ckpt)
    np.testing.assert_allclose(
        np.asarray(state1.frozen["vae"]["latent_norm"]["shift"]),
        mu, rtol=1e-3)

    # the dual model actually trained
    moved = sum(
        float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
        for a, b in zip(jax.tree.leaves(init1["dual"]),
                        jax.tree.leaves(state1.trainable["dual"]))
    )
    assert moved > 1e-4
