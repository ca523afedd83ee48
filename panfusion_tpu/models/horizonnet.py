"""HorizonNet: panorama layout estimation (net + task + IoU metrics).

Capability parity with the reference HorizonNet stack
(models/horizonnet/HorizonNet.py, external/HorizonNet/model.py): a
width-circular ResNet50 feature pyramid is height-compressed per stage into
one multiscale column feature (GlobalHeightStage), a 2-layer biLSTM predicts
per-column ceiling/floor boundaries ``bon`` (2, W) and a corner heatmap
``cor`` (1, W); host-side Manhattan post-processing (metrics/manhattan.py)
turns them into corner layouts, scored by 2D/3D IoU.

TPU-first notes: the LSTM runs as a jitted lax.scan over the 256-column
sequence (flax nn.RNN); BatchNorm uses flax batch_stats; everything before
the post-proc is one XLA program.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..metrics.manhattan import eval_layout_iou, horizon_to_manhattan_layout
from ..nn.resnet import ResNet50Features, pad_hw

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ConvCompressH(nn.Module):
    """3x3 conv stride (2,1) + BN + ReLU — halves feature height
    (reference model.py:111-124)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = pad_hw(x, 1, 1)
        x = nn.Conv(self.features, (3, 3), strides=(2, 1), padding="VALID",
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class GlobalHeightConv(nn.Module):
    """4x height compression then wrap-aware bilinear width resize to out_w
    (reference model.py:127-145)."""

    in_c: int
    out_c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_w: int, train: bool = False):
        x = ConvCompressH(self.in_c // 2, self.dtype, name="c0")(x, train)
        x = ConvCompressH(self.in_c // 2, self.dtype, name="c1")(x, train)
        x = ConvCompressH(self.in_c // 4, self.dtype, name="c2")(x, train)
        x = ConvCompressH(self.out_c, self.dtype, name="c3")(x, train)

        factor = out_w // x.shape[2]
        x = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h, out_w + 2 * factor, c), "bilinear")
        return x[:, :, factor:-factor]


class BiLSTM(nn.Module):
    """One bidirectional LSTM layer (scan over the column axis)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, w, c)
        # cells named explicitly: auto-naming would bury the params under
        # OptimizedLSTMCell_{0,1}, desyncing the checkpoint converter
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                 name="fwd_cell"),
            name="fwd",
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype,
                                 name="bwd_cell"),
            reverse=True, keep_order=True, name="bwd",
        )
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class HorizonNetCore(nn.Module):
    """x (b, 512, 1024, 3) in [0,1] -> (bon (b, 2, 1024), cor (b, 1, 1024))."""

    out_scale: int = 8
    step_cols: int = 4
    rnn_hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        feats = ResNet50Features(dtype=self.dtype, name="feature_extractor")(
            x, train
        )
        out_w = x.shape[2] // self.step_cols
        cols = []
        for i, f in enumerate(feats):
            c = f.shape[-1]
            g = GlobalHeightConv(c, c // self.out_scale, self.dtype,
                                 name=f"ghc_{i}")(f, out_w, train)
            # (b, h, w, c) -> (b, w, c*h) column features, CHANNEL-major
            # like the torch reference's NCHW reshape(bs, c*h, w)
            # (model.py:150-152) so converted bi_rnn.weight_ih lines up
            b, h, w, cc = g.shape
            cols.append(jnp.transpose(g, (0, 2, 3, 1)).reshape(b, w, cc * h))
        feature = jnp.concatenate(cols, axis=-1)  # (b, out_w, c_last)

        h = BiLSTM(self.rnn_hidden, self.dtype, name="rnn0")(feature)
        h = nn.Dropout(0.5, deterministic=not train)(h)
        h = BiLSTM(self.rnn_hidden, self.dtype, name="rnn1")(h)
        h = nn.Dropout(0.5, deterministic=not train)(h)

        # bias init: cor -1, bon -0.478 / 0.425 (reference model.py:213-216)
        bias0 = np.concatenate([
            np.full(self.step_cols, -1.0),
            np.full(self.step_cols, -0.478),
            np.full(self.step_cols, 0.425),
        ]).astype(np.float32)
        out = nn.Dense(
            3 * self.step_cols, dtype=self.dtype,
            bias_init=lambda *a: jnp.asarray(bias0), name="linear",
        )(h)  # (b, out_w, 12)
        b, w, _ = out.shape
        out = out.reshape(b, w, 3, self.step_cols)
        out = jnp.moveaxis(out, 2, 1).reshape(b, 3, w * self.step_cols)
        return out[:, 1:], out[:, :1]  # bon, cor


# ---------------------------------------------------------------- helpers
def mask_vertical_fov(x: np.ndarray, vertical_fov: float = 85.0) -> np.ndarray:
    """[-1,1] -> [0,1] with top/bottom rows outside the vertical FoV zeroed
    (reference mask_and_normalize, HorizonNet.py:95-103)."""
    x = np.asarray(x, np.float32) / 2.0 + 0.5
    height = x.shape[-3]
    fov_pix = int((vertical_fov / 180.0) * height)
    border = (height - fov_pix) // 2
    x = x.copy()
    x[..., :border, :, :] = 0
    x[..., -border:, :, :] = 0
    return x


def visualize_boundaries(pano01: np.ndarray, bon: np.ndarray,
                         cor_prob: np.ndarray) -> np.ndarray:
    """Render boundary curves + corner probability strip onto the pano
    (the role of the reference's visualize_a_data panel)."""
    img = (np.clip(pano01, 0, 1) * 255).astype(np.uint8).copy()
    H, W = img.shape[:2]
    rows = ((bon / np.pi + 0.5) * H - 0.5).astype(int)
    for curve, color in zip(rows, ((0, 255, 0), (255, 0, 0))):
        for x in range(W):
            y = int(np.clip(curve[x * curve.shape[0] // W], 1, H - 2))
            img[y - 1:y + 2, x] = color
    strip = (np.clip(np.asarray(cor_prob).reshape(-1), 0, 1) * 255).astype(np.uint8)
    cols = (np.arange(W) * strip.shape[0] // W)
    img[:20] = np.stack([strip[cols]] * 3, axis=-1)[None]
    return img


# ---------------------------------------------------------------- metrics
class LayoutIoU:
    """Mean 3D/2D IoU (sum/count states — reference LayoutIoU,
    HorizonNet.py:200-262)."""

    higher_is_better = True

    def __init__(self):
        self.reset()

    def reset(self):
        self._iou3d = 0.0
        self._iou2d = 0.0
        self._n = 0
        self.update_called = False

    def update(self, layout_pred: List[np.ndarray], layout_gt: List[np.ndarray]):
        for dt, gt in zip(layout_pred, layout_gt):
            iou3d, iou2d = eval_layout_iou(np.asarray(dt), np.asarray(gt))
            self._iou3d += iou3d
            self._iou2d += iou2d
            self._n += 1
        self.update_called = True

    def merge_state(self, other):
        self._iou3d += other._iou3d
        self._iou2d += other._iou2d
        self._n += other._n
        self.update_called = self.update_called or other.update_called

    def compute(self) -> Tuple[float, float]:
        n = max(self._n, 1)
        return self._iou3d / n, self._iou2d / n


# ---------------------------------------------------------------- task
@dataclasses.dataclass
class HorizonNetConfig:
    lr: float = 1e-4  # reference HorizonNet.py:73
    vertical_fov: float = 85.0
    log_test_samples: int = 50
    ckpt_path: str = ""
    max_epochs: int = 10
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    dtype: Any = jnp.float32


class HorizonNet:
    def __init__(self, cfg: HorizonNetConfig = HorizonNetConfig()):
        self.cfg = cfg
        self.net = HorizonNetCore(dtype=cfg.dtype)
        self.layout_iou = LayoutIoU()
        self._infer = None
        self._infer_vars = None

    def init_variables(self, rng, hw=(512, 1024)):
        return jax.jit(self.net.init, static_argnums=(2,))(
            rng, jnp.zeros((1, *hw, 3), self.cfg.dtype), False
        )

    def load_variables(self, ckpt_path=None, seed: int = 0, hw=(512, 1024)):
        variables = self.init_variables(jax.random.PRNGKey(seed), hw)
        path = ckpt_path or self.cfg.ckpt_path
        if path:
            from ..train.checkpoints import CheckpointManager

            # ckpt_path points AT the checkpoint (converter saves
            # dst/<kind>): restore dirname/<basename>, like the other
            # models — restoring <path>/last would never find converted
            # weights
            mgr = CheckpointManager(os.path.dirname(os.path.abspath(path)))
            restored = mgr.restore(variables, os.path.basename(path))
            if restored is None and mgr.exists(
                os.path.join(os.path.basename(path), "last")
            ):
                # fit-saved layout: <path>/checkpoints-style 'last' alias
                restored = CheckpointManager(path).restore(variables)
            if restored is not None:
                variables = restored
                self._infer = None  # drop any jit closure over old weights
            else:
                print(f"WARNING: HorizonNet ckpt {path} not found; random init")
        return variables

    def infer_fn(self, variables):
        import functools

        run = jax.jit(
            lambda v, x: self.net.apply(v, x, False)
        )
        return functools.partial(run, variables)

    def predict_layout(self, variables, pano_pm1: np.ndarray,
                       normalize: bool = False):
        """pano [-1,1] (b, H, W, 3) -> (manhattan corner-pixel layouts list,
        bon, cor, masked pano[0,1]) — reference forward (HorizonNet.py:105-111)."""
        x = mask_vertical_fov(pano_pm1, self.cfg.vertical_fov)
        if self._infer is None or self._infer_vars is not variables:
            # cache keyed on the variables object IDENTITY (a strong ref,
            # not id(): a gc'd dict's address can be reused and would
            # silently serve the first call's weights)
            self._infer = self.infer_fn(variables)
            self._infer_vars = variables
        bon, cor = self._infer(jnp.asarray(x))
        bon, cor = np.asarray(bon), np.asarray(cor)
        # the cor head emits logits (BCE-with-logits training); the peak
        # threshold min_v=0.05 assumes probabilities, so sigmoid first —
        # like the vendored inference.py (the reference task module feeds
        # raw logits into its own 0.05 threshold, a quirk not reproduced)
        cor = 1.0 / (1.0 + np.exp(-cor))
        H, W = x.shape[-3], x.shape[-2]
        layouts = []
        for b, c in zip(bon, cor):
            try:
                cor_id, _, _ = horizon_to_manhattan_layout(
                    {"bon": b, "cor": c}, H, W, force_cuboid=False,
                    normalize=normalize,
                )
            except Exception:
                # cuboid fallback grid (reference HorizonNet.py:141-148 —
                # but with the ceil/floor-interleaved row order the IoU
                # metric expects: the reference's sign puts floor rows at
                # even indices, which mirrors the polygon projection)
                cor_id = np.array([
                    [k // 2 * 256, 256 + ((k % 2) * 2 - 1) * 120]
                    for k in range(8)
                ], np.float32)
                if normalize:
                    cor_id[:, 0] /= W
                    cor_id[:, 1] /= H
            layouts.append(cor_id)
        return layouts, bon, cor, x

    # -- training ------------------------------------------------------
    def make_train_step(self):
        import optax

        self._opt = optax.adam(self.cfg.lr)

        def loss_fn(params, batch_stats, rng, pano01, bon_t, cor_t):
            (bon, cor), updates = self.net.apply(
                {"params": params, "batch_stats": batch_stats},
                pano01, True, mutable=["batch_stats"], rngs={"dropout": rng},
            )
            bon_loss = jnp.abs(bon - bon_t).mean()
            cor_loss = optax.sigmoid_binary_cross_entropy(cor, cor_t).mean()
            return bon_loss + cor_loss, (updates["batch_stats"], bon_loss, cor_loss)

        @jax.jit
        def step(params, batch_stats, opt_state, rng, pano01, bon_t, cor_t,
                 lr_scale):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, (new_stats, bon_l, cor_l)), grads = grad_fn(
                params, batch_stats, rng, pano01, bon_t, cor_t
            )
            updates, opt_state = self._opt.update(grads, opt_state, params)
            # scale the UPDATE, not the gradient: Adam's normalized step
            # cancels a constant gradient scale, so scaling grads would
            # make the plateau schedule a no-op
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, bon_l, cor_l

        return step

    def fit(self, datamodule, train_cfg, logger, args):
        cfg = self.cfg
        # HorizonNet trains on pano + horizon targets: skip the loader's
        # m perspective crops (its dominant cost)
        if hasattr(datamodule, "hparams"):
            datamodule.hparams.load_images = False
        datamodule.setup("fit")
        loader = datamodule.train_dataloader()
        sample = next(iter(loader))
        hw = sample["pano"].shape[-3:-1]
        variables = self.load_variables(
            getattr(args, "ckpt_path", None), getattr(args, "seed", 0), hw
        )
        params, batch_stats = variables["params"], variables["batch_stats"]
        step_fn = self.make_train_step()
        opt_state = self._opt.init(params)

        from ..train.checkpoints import CheckpointManager

        ckpt = CheckpointManager(f"{logger.save_dir}/checkpoints")
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        # ReduceLROnPlateau on train loss (reference HorizonNet.py:91-93)
        lr_scale, best_loss, bad_epochs = 1.0, float("inf"), 0
        step = 0
        for epoch in range(cfg.max_epochs):
            epoch_losses = []
            for batch in loader:
                pano01 = jnp.asarray(
                    mask_vertical_fov(batch["pano"][:, 0], cfg.vertical_fov)
                )
                hl = batch["horizon_layout"]
                rng, sub = jax.random.split(rng)
                params, batch_stats, opt_state, loss, bon_l, cor_l = step_fn(
                    params, batch_stats, opt_state, sub, pano01,
                    jnp.asarray(hl["bon"]), jnp.asarray(hl["cor"]), lr_scale,
                )
                epoch_losses.append(float(loss))
                step += 1
                if step % 10 == 0:
                    logger.log(
                        {"train/loss": float(loss), "train/bon_loss": float(bon_l),
                         "train/cor_loss": float(cor_l), "lr_scale": lr_scale},
                        step,
                    )
                ckpt.maybe_save({"params": params, "batch_stats": batch_stats})
                if getattr(args, "max_steps", None) and step >= args.max_steps:
                    break
            mean_loss = float(np.mean(epoch_losses)) if epoch_losses else 0.0
            if mean_loss < best_loss * (1 - 0.01):
                best_loss, bad_epochs = mean_loss, 0
            else:
                bad_epochs += 1
                if bad_epochs > cfg.plateau_patience:
                    lr_scale *= cfg.plateau_factor
                    bad_epochs = 0
            ckpt.save({"params": params, "batch_stats": batch_stats})
            if getattr(args, "max_steps", None) and step >= args.max_steps:
                break
        return {"params": params, "batch_stats": batch_stats}

    # -- eval ----------------------------------------------------------
    def run_eval(self, datamodule, logger, args):
        cfg = self.cfg
        datamodule.setup("test")
        loader = datamodule.test_dataloader()
        variables = self.load_variables(
            getattr(args, "ckpt_path", None), getattr(args, "seed", 0)
        )
        for batch_idx, batch in enumerate(loader):
            layouts, bon, cor, x = self.predict_layout(
                variables, batch["pano"][:, 0]
            )
            if batch_idx < cfg.log_test_samples and logger is not None:
                panel = visualize_boundaries(
                    x[0], bon[0], jax.nn.sigmoid(jnp.asarray(cor[0]))
                )
                logger.log_image("test/layout_raw", panel, batch_idx)
            self.layout_iou.update(
                layouts, [np.asarray(g) for g in batch["manhattan_layout"]]
            )
        iou3d, iou2d = self.layout_iou.compute()
        metrics = {"3D_IoU": iou3d, "2D_IoU": iou2d}
        logger.log_summary(metrics)
        print("test metrics:", metrics)
        return metrics


class LayoutConsistency(LayoutIoU):
    """Layout IoU of a frozen HorizonNet run on *generated* panos
    (reference LayoutConsistency, HorizonNet.py:265-274)."""

    def __init__(self, ckpt_path: str = os.path.join("weights", "horizonnet")):
        super().__init__()
        self.task = HorizonNet()
        self.variables = self.task.load_variables(ckpt_path)

    def update(self, img01: np.ndarray, layout_gt: np.ndarray):
        """``img01`` (H, W, 3) in [0, 1]; ``layout_gt`` corner pixels in the
        IMAGE's own (W, H) space — both are rescaled to the net's trained
        1024x512 frame (eval_layout_iou's coor2xy assumes it; the reference
        always evaluates at native 512x1024, HorizonNet.py:265-274, while
        our demo-preset generations can be smaller)."""
        import cv2

        img = np.asarray(img01, np.float32)
        h, w = img.shape[:2]
        if (h, w) != (512, 1024):
            img = cv2.resize(img, (1024, 512), interpolation=cv2.INTER_LINEAR)
        gt = np.asarray(layout_gt, np.float64) * [1024.0 / w, 512.0 / h]
        imgs = img[None] * 2.0 - 1.0
        layouts, _, _, _ = self.task.predict_layout(self.variables, imgs)
        super().update(layouts, [gt])
