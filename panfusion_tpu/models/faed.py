"""FAED: panorama autoencoder + Frechet AutoEncoder Distance.

Parity with the reference FAED stack (models/faed/FAED.py, modules.py):
a 5x-downsampling conv autoencoder where EVERY conv wraps the width
circularly (zero-pad height) — the panorama-aware feature extractor behind
the paper's FAED metric — trained with L1 reconstruction (Adam 1e-4,
ExponentialLR 0.99, 60 epochs, batch 4; reference README.md:161).

The metric: encoder features (b, h/32, w/32, 128) -> mean over width ->
cos(latitude) weighting -> (b, 4*pano_height) vectors; streaming mean/cov
accumulation; Frechet distance between real and generated sets
(FAED.py:59-103). Accumulator states are plain float64 numpy on host
(device work is just the encoder forward); under multi-host data
parallelism they sum-reduce exactly like torchmetrics' dist_reduce_fx="sum".
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _pad_wc_hz(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Width-circular + height-zero padding (reference CircularPadding,
    models/faed/modules.py:5-19: zero-pads all sides then overwrites the
    width pad with wrapped columns). NHWC."""
    if p == 0:
        return x
    x = jnp.concatenate([x[:, :, -p:], x, x[:, :, :p]], axis=2)
    return jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)))


class PanoConv(nn.Module):
    """Conv with the FAED circular padding scheme."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _pad_wc_hz(x, self.pad)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class ConvBlock(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PanoConv(self.features, self.kernel, self.stride, self.pad,
                     dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="batchnorm1")(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    features: int
    kernel: int
    pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = PanoConv(self.features, self.kernel, 1, self.pad,
                     dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="batchnorm1")(h)
        h = nn.relu(h)
        h = PanoConv(self.features, self.kernel, 1, self.pad,
                     dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="batchnorm2")(h)
        return h + x


class FAEDEncoder(nn.Module):
    """(b, H, W, 3) -> (b, H/32, W/32, 128)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = PanoConv(32, 9, 1, 4, dtype=self.dtype, name="downconv1")(x)
        x = ResBlock(32, 9, 4, dtype=self.dtype, name="downres1")(x, train)
        x = ConvBlock(64, 4, 2, 1, dtype=self.dtype, name="downconv2")(x, train)
        x = ResBlock(64, 7, 3, dtype=self.dtype, name="downres2")(x, train)
        x = ConvBlock(128, 4, 2, 1, dtype=self.dtype, name="downconv3")(x, train)
        x = ResBlock(128, 5, 2, dtype=self.dtype, name="downres3")(x, train)
        x = ConvBlock(128, 4, 2, 1, dtype=self.dtype, name="downconv4")(x, train)
        x = ResBlock(128, 3, 1, dtype=self.dtype, name="downres4")(x, train)
        x = ConvBlock(128, 4, 2, 1, dtype=self.dtype, name="downconv5")(x, train)
        x = ResBlock(128, 3, 1, dtype=self.dtype, name="downres5")(x, train)
        x = ConvBlock(128, 4, 2, 1, dtype=self.dtype, name="downconv6")(x, train)
        return PanoConv(128, 3, 1, 1, dtype=self.dtype, name="fuse")(x)


class FAEDDecoder(nn.Module):
    """(b, h, w, 128) -> (b, 32h, 32w, 3) in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def up(z):
            b, h, w, c = z.shape
            return jax.image.resize(z, (b, h * 2, w * 2, c), "bilinear")

        x = up(x)
        x = ConvBlock(128, 3, 1, 1, dtype=self.dtype, name="upconv2")(x, train)
        x = ResBlock(128, 3, 1, dtype=self.dtype, name="upres2")(x, train)
        x = up(x)
        x = ConvBlock(128, 3, 1, 1, dtype=self.dtype, name="upconv3")(x, train)
        x = ResBlock(128, 5, 2, dtype=self.dtype, name="upres3")(x, train)
        x = up(x)
        x = ConvBlock(64, 3, 1, 1, dtype=self.dtype, name="upconv4")(x, train)
        x = ResBlock(64, 7, 3, dtype=self.dtype, name="upres4")(x, train)
        x = up(x)
        x = ConvBlock(32, 3, 1, 1, dtype=self.dtype, name="upconv5")(x, train)
        x = ResBlock(32, 9, 4, dtype=self.dtype, name="upres5")(x, train)
        x = up(x)
        x = PanoConv(3, 9, 1, 4, dtype=self.dtype, name="outconv")(x)
        return jnp.tanh(x)


class FAEDAutoEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = FAEDEncoder(dtype=self.dtype, name="encoder")
        self.decoder = FAEDDecoder(dtype=self.dtype, name="decoder")

    def __call__(self, x, train: bool = False):
        return self.decoder(self.encoder(x, train), train)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)


# ---------------------------------------------------------------- metric
# Single implementation shared with FID (metrics/frechet.py): the
# eigh-based form — tr sqrtm(c1 c2) via two symmetric eigendecompositions
# — replaced a local scipy sqrtm copy that cost ~27 s per 2048^2 call on
# near-singular covariances.
from ..metrics.frechet import frechet_distance  # noqa: E402,F401


class FrechetAutoEncoderDistance:
    """Streaming FAED (reference FrechetAutoEncoderDistance,
    models/faed/FAED.py:50-103). `update(imgs_uint8 (b,H,W,3), real=...)`."""

    higher_is_better = False

    def __init__(self, pano_height: int, encoder_apply):
        self.num_features = pano_height * 4
        self.encoder_apply = encoder_apply  # (uint8 NHWC) -> (b, h, w, 128)
        self.reset()

    def reset(self):
        n = self.num_features
        self._sum = {k: np.zeros(n, np.float64) for k in ("real", "fake")}
        self._cov = {k: np.zeros((n, n), np.float64) for k in ("real", "fake")}
        self._n = {"real": 0, "fake": 0}
        self.update_called = False

    def get_activation(self, imgs_uint8: np.ndarray) -> np.ndarray:
        x = jnp.asarray(imgs_uint8, jnp.float32) / 127.5 - 1.0
        feats = self.encoder_apply(x)  # (b, h, w', 128) NHWC
        mean_feature = jnp.mean(feats, axis=2)  # mean over width -> (b, h, 128)
        h = mean_feature.shape[1]
        weight = jnp.cos(jnp.linspace(math.pi / 2, -math.pi / 2, h))
        mean_feature = mean_feature * weight[None, :, None]
        # (b, 128*h) with channel-major ordering like the torch (b, c, h) view
        vec = jnp.moveaxis(mean_feature, -1, 1).reshape(mean_feature.shape[0], -1)
        return np.asarray(vec, np.float64)

    def update(self, imgs_uint8: np.ndarray, real: bool):
        f = self.get_activation(imgs_uint8)
        k = "real" if real else "fake"
        self._sum[k] += f.sum(axis=0)
        self._cov[k] += f.T @ f
        self._n[k] += f.shape[0]
        self.update_called = True

    def merge_state(self, other: "FrechetAutoEncoderDistance"):
        """sum-reduction across data-parallel workers (the torchmetrics
        dist_reduce_fx='sum' contract)."""
        for k in ("real", "fake"):
            self._sum[k] += other._sum[k]
            self._cov[k] += other._cov[k]
            self._n[k] += other._n[k]

    def compute(self) -> float:
        if self._n["real"] < 2 or self._n["fake"] < 2:
            raise RuntimeError("need >=2 samples in both sets for FAED")
        out = {}
        for k in ("real", "fake"):
            n = self._n[k]
            mu = self._sum[k] / n
            cov = (self._cov[k] - n * np.outer(mu, mu)) / (n - 1)
            out[k] = (mu, cov)
        return frechet_distance(*out["real"], *out["fake"])


# ---------------------------------------------------------------- task
@dataclasses.dataclass
class FAEDConfig:
    lr: float = 1e-4  # reference FAED.py:16
    lr_decay: float = 0.99
    max_epochs: int = 60
    pano_height: int = 512
    dtype: Any = jnp.float32


class FAED:
    """Task module: train the autoencoder by L1 pano reconstruction."""

    def __init__(self, cfg: FAEDConfig = FAEDConfig()):
        self.cfg = cfg
        self.net = FAEDAutoEncoder(dtype=cfg.dtype)

    def init_params(self, rng):
        h = min(self.cfg.pano_height, 64)
        return jax.jit(self.net.init, static_argnums=(2,))(
            rng, jnp.zeros((1, h, h * 2, 3)), True
        )

    def make_metric(self, variables) -> FrechetAutoEncoderDistance:
        def encoder_apply(x):
            return self.net.apply(variables, x, method=self.net.encode)

        return FrechetAutoEncoderDistance(self.cfg.pano_height, jax.jit(encoder_apply))

    # -- training ------------------------------------------------------
    def make_train_step(self):
        import optax

        cfg = self.cfg
        # ExponentialLR(0.99)-per-epoch (reference FAED.py:23-32) applies
        # via the lr_scale update multiplier the fit loop passes
        self._opt = optax.adam(cfg.lr)

        def loss_fn(params, batch_stats, batch, lr_scale):
            out, updates = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["pano"], True, mutable=["batch_stats"],
            )
            return jnp.abs(out - batch["pano"]).mean(), updates["batch_stats"]

        @jax.jit
        def step(params, batch_stats, opt_state, batch, lr_scale):
            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, batch, lr_scale
            )
            updates, opt_state = self._opt.update(grads, opt_state, params)
            # scale the UPDATE (effective LR), not the gradient — Adam
            # cancels a constant gradient scale, which made the
            # ExponentialLR schedule a no-op
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            import optax as _optax

            params = _optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def fit(self, datamodule, train_cfg, logger, args):
        import optax

        cfg = self.cfg
        # FAED trains on the pano alone: skip the loader's m perspective
        # crops (its dominant cost)
        if hasattr(datamodule, "hparams"):
            datamodule.hparams.load_images = False
        datamodule.setup("fit")
        loader = datamodule.train_dataloader()
        variables = self.init_params(jax.random.PRNGKey(getattr(args, "seed", 0)))
        params, batch_stats = variables["params"], variables["batch_stats"]
        step_fn = self.make_train_step()
        opt_state = self._opt.init(params)

        from ..train.checkpoints import CheckpointManager

        ckpt = CheckpointManager(f"{logger.save_dir}/checkpoints")
        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}
        if ckpt.exists("last"):
            restored = ckpt.restore(state, "last")
            if restored is not None:
                state = restored
                print(f"Resumed FAED from step {int(state['step'])}")
        params, batch_stats = state["params"], state["batch_stats"]
        opt_state, step = state["opt_state"], int(state["step"])
        steps_per_epoch = max(1, len(loader))
        for epoch in range(step // steps_per_epoch, cfg.max_epochs):
            lr_scale = cfg.lr_decay**epoch
            for batch in loader:
                dev = {"pano": jnp.asarray(batch["pano"][:, 0])}
                params, batch_stats, opt_state, loss = step_fn(
                    params, batch_stats, opt_state, dev, lr_scale
                )
                step += 1
                if step % 10 == 0:
                    # scheduled LR (reference LearningRateMonitor parity:
                    # Adam + ExponentialLR 0.99/epoch, FAED.py:23-32)
                    logger.log({"train/loss": float(loss),
                                "train/lr": cfg.lr * lr_scale}, step)
                state = {"params": params, "batch_stats": batch_stats,
                         "opt_state": opt_state,
                         "step": jnp.asarray(step, jnp.int32)}
                ckpt.maybe_save(state)
                if getattr(args, "max_steps", None) and step >= args.max_steps:
                    break
            ckpt.save(state)
            if getattr(args, "max_steps", None) and step >= args.max_steps:
                break
        return {"params": params, "batch_stats": batch_stats}

    def run_eval(self, datamodule, logger, args):
        raise SystemExit(
            "FAED is an eval-model; use fit to train it or EvalPanoGen to "
            "compute the FAED metric."
        )
