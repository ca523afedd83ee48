"""MvDiffusion baseline: perspective-only multi-view diffusion with
correspondence-aware (CP) attention.

Capability parity with the reference baseline (models/pano/MvDiffusion.py +
external/MVDiffusion/pano/): a single SD2 UNet runs all m horizon-sampled
views batched, and after every down block, the mid block, and every up block
each view cross-attends to a 3x3 homography-warped key neighborhood from its
±1 ring neighbors (CPAttn). Inference stitches the views into a panorama
with mp2e.

TPU-first design differences (vs external/MVDiffusion):
* correspondences and warped key gathers run batched over all views in one
  jitted program (the reference loops per view pair in Python,
  pano/utils.py:12-42, pano/modules.py:36-84);
* the per-pixel 18-token attention is one batched matmul attention (query
  (bm*h*w, 1, c) x kv (bm*h*w, 18, c)) — MXU-shaped, no xformers;
* neighbor gathering uses jnp.roll on the view axis (the horizon ring is
  contiguous in memory).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry.rotations import get_K_R
from ..nn.epp import EPPTransformerBlock
from ..nn.scheduler import add_noise, ddim_step, make_ddim_schedule
from ..nn.unet import UNet2DCondition
from ..ops.resample import remap
from .prompts import PromptConfig, get_pers_prompt


# ---------------------------------------------------------------- geometry
def homographies(R: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(m, 3, 3) rotations/intrinsics -> (m, m, 3, 3) pixel homographies
    H[i, j] mapping view-i pixels to view-j pixels
    (reference pano/utils.py:26-27: K_j R_j^-1 R_i K_i^-1)."""
    K_inv = jnp.linalg.inv(K)
    R_inv = jnp.linalg.inv(R)
    # H_ij = K_j @ R_j^-1 @ R_i @ K_i^-1
    return jnp.einsum(
        "jab,jbc,icd,ide->ijae", K, R_inv, R, K_inv
    )


def warp_pixels(H: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Apply a homography to the full (h, w) pixel grid -> (h, w, 2) xy."""
    x, y = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32))
    ones = jnp.ones_like(x)
    xyz = jnp.stack([x, y, ones], axis=-1).reshape(-1, 3)
    out = xyz @ H.T
    return (out[:, :2] / out[:, 2:]).reshape(h, w, 2)


class PosEmbedding2D(nn.Module):
    """sin/cos positional encoding of 2-d coords -> dim = 4 * n_freqs
    (reference modules/transformer.py PosEmbedding)."""

    n_freqs: int
    dtype: jnp.dtype = jnp.float32

    def __call__(self, xy: jnp.ndarray) -> jnp.ndarray:
        bands = 2.0 ** jnp.arange(self.n_freqs, dtype=jnp.float32)
        enc = xy[..., :, None] * bands  # (..., 2, F)
        pe = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-2)
        return pe.reshape(*xy.shape[:-1], 4 * self.n_freqs).astype(self.dtype)


class CPAttn(nn.Module):
    """Correspondence-aware attention of each view to its ring neighbors.

    x: (b, m, h, w, c) NHWC view features. Every pixel queries the 2*9
    homography-warped key tokens gathered from the ±1 neighbor views, with
    validity masking and relative-reprojection positional encodings
    (reference pano/modules.py CPAttn)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.transformer = EPPTransformerBlock(
            self.dim, max(1, self.dim // 32), 32, dtype=self.dtype,
            name="transformer",
        )
        self.pe = PosEmbedding2D(self.dim // 4, dtype=self.dtype)

    def __call__(self, x, R, K, img_hw: Tuple[int, int]):
        b, m, h, w, c = x.shape
        img_h, img_w = img_hw
        scale = img_h // h  # query pixel-per-feature (== key scale here)

        H_all = jax.vmap(homographies)(R, K)  # (b, m, m, 3, 3)
        idx = jnp.arange(m)
        nb = jnp.stack([(idx - 1) % m, (idx + 1) % m], axis=1)  # (m, 2)

        # H fwd: view i -> neighbor j (full-res pixels); H back: j -> i
        H_fwd = H_all[:, idx[:, None], nb]  # (b, m, 2, 3, 3)
        H_back = H_all[:, nb, idx[:, None]]

        # center-of-feature pixel coords in the query view
        def fwd_xy(Hm):
            return warp_pixels(Hm, img_h, img_w)[
                scale // 2 :: scale, scale // 2 :: scale
            ]

        xy_l = jax.vmap(jax.vmap(jax.vmap(fwd_xy)))(H_fwd)  # (b, m, 2, h, w, 2)
        xy_feat = xy_l / scale - 0.5  # in neighbor-feature coords

        neighbors = jnp.stack(
            [jnp.roll(x, 1, axis=1), jnp.roll(x, -1, axis=1)], axis=2
        )  # (b, m, 2, h, w, c)

        offsets = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
        kvs, rels, masks = [], [], []

        qx, qy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                              jnp.arange(h, dtype=jnp.float32))
        q_xy = (
            jnp.stack([qx, qy], axis=-1) * scale
            + jnp.asarray([scale // 2, scale // 2], jnp.float32)
        )

        def sample(img_hwc, xx, yy):
            out = remap(
                jnp.moveaxis(img_hwc, -1, 0), xx, yy, "bilinear", "zeros"
            )
            return jnp.moveaxis(out, 0, -1)

        for di, dj in offsets:
            xy_o = xy_feat + jnp.asarray([di, dj], jnp.float32)
            # gather neighbor features at the offset warped positions
            kv = jax.vmap(jax.vmap(jax.vmap(sample)))(
                neighbors, xy_o[..., 0], xy_o[..., 1]
            )  # (b, m, 2, h, w, c)
            kvs.append(kv)
            # validity + reprojected relative position (pixel space)
            xy_pix = (xy_o + 0.5) * scale
            ok = (
                (xy_pix[..., 0] > 0) & (xy_pix[..., 0] < img_w)
                & (xy_pix[..., 1] > 0) & (xy_pix[..., 1] < img_h)
            )
            masks.append(ok)
            ones = jnp.ones_like(xy_pix[..., :1])
            pix_h = jnp.concatenate([xy_pix, ones], axis=-1)
            back = jnp.einsum("qmnxy,qmnhwy->qmnhwx", H_back, pix_h)
            back = back[..., :2] / back[..., 2:]
            rels.append((back - q_xy) / scale)

        kv = jnp.stack(kvs, axis=3)     # (b, m, 2, 9, h, w, c)
        rel = jnp.stack(rels, axis=3)
        mask = jnp.stack(masks, axis=3)

        # tokens: 18 kv per query pixel
        kv_t = kv.reshape(b, m, 18, h, w, c).transpose(0, 1, 3, 4, 2, 5)
        rel_t = rel.reshape(b, m, 18, h, w, 2).transpose(0, 1, 3, 4, 2, 5)
        mask_t = mask.reshape(b, m, 18, h, w).transpose(0, 1, 3, 4, 2)

        n = b * m * h * w
        kv_flat = kv_t.reshape(n, 18, c)
        pe_kv = self.pe(rel_t.reshape(n, 18, 2))
        kv_flat = (kv_flat + pe_kv) * mask_t.reshape(n, 18, 1).astype(kv_flat.dtype)

        q_flat = x.reshape(n, 1, c)
        q_pe = self.pe(jnp.zeros((n, 1, 2), jnp.float32))

        out = self.transformer(q_flat, kv_flat, query_pe=q_pe)
        return out.reshape(b, m, h, w, c)


class MVUNet(nn.Module):
    """Single UNet over (b*m) views + CP blocks at block boundaries
    (reference pano/MVGenModel.py:8-140)."""

    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    heads: Tuple[int, ...] = (5, 10, 20, 20)
    dim_head: int = 64
    context_dim: int = 1024
    lora_rank: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.unet = UNet2DCondition(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            heads=self.heads,
            dim_head=self.dim_head,
            context_dim=self.context_dim,
            lora_rank=self.lora_rank,
            dtype=self.dtype,
            name="unet",
        )
        ch = self.block_out_channels
        self.cp_blocks_encoder = tuple(
            CPAttn(c, dtype=self.dtype, name=f"cp_blocks_encoder_{i}")
            for i, c in enumerate(ch)
        )
        self.cp_blocks_mid = CPAttn(ch[-1], dtype=self.dtype, name="cp_blocks_mid")
        self.cp_blocks_decoder = tuple(
            CPAttn(c, dtype=self.dtype, name=f"cp_blocks_decoder_{i}")
            for i, c in enumerate(reversed(ch))
        )

    def __call__(self, latents, timesteps, ctx, R, K,
                 pers_residuals=None, pers_mid_residual=None):
        """latents (b, m, h, w, 4); ctx (b, m, L, C); R/K (b, m, 3, 3)."""
        b, m = latents.shape[:2]
        img_hw = (latents.shape[2] * 8, latents.shape[3] * 8)
        x = latents.reshape(b * m, *latents.shape[2:])
        ctx_f = ctx.reshape(b * m, *ctx.shape[2:])
        temb = self.unet.time_embed(jnp.repeat(timesteps, m))

        def cp(block, t):
            t = t.reshape(b, m, *t.shape[1:])
            t = block(t, R, K, img_hw)
            return t.reshape(b * m, *t.shape[2:])

        x = self.unet.conv_in(x)
        skips = [x]
        for i, block in enumerate(self.unet.down_blocks):
            for j, resnet in enumerate(block.resnets):
                x = resnet(x, temb)
                if block.attentions is not None:
                    x = block.attentions[j](x, ctx_f)
                skips.append(x)
            if m > 1:
                x = cp(self.cp_blocks_encoder[i], x)
            if block.downsamplers is not None:
                x = block.downsamplers[0](x)
                skips.append(x)

        if pers_residuals is not None:
            skips = [s + r for s, r in zip(skips, pers_residuals)]

        mid = self.unet.mid_block
        x = mid.resnets[0](x, temb)
        if m > 1:
            x = cp(self.cp_blocks_mid, x)
        x = mid.attentions[0](x, ctx_f)
        x = mid.resnets[1](x, temb)
        if pers_mid_residual is not None:
            x = x + pers_mid_residual

        for i, block in enumerate(self.unet.up_blocks):
            for j, resnet in enumerate(block.resnets):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = resnet(x, temb)
                if block.attentions is not None:
                    x = block.attentions[j](x, ctx_f)
            if m > 1:
                x = cp(self.cp_blocks_decoder[i], x)
            if block.upsamplers is not None:
                x = block.upsamplers[0](x)

        x = nn.silu(self.unet.conv_norm_out(x))
        x = self.unet.conv_out(x)
        return x.reshape(b, m, *x.shape[1:])


# ---------------------------------------------------------------- task
@dataclasses.dataclass
class MvDiffusionConfig:
    pers_resolution: int = 256
    fov: float = 90.0
    num_views: int = 8  # horizon-8 (reference MvDiffusion cam_sampler)
    guidance_scale: float = 9.0
    diff_timestep: int = 50
    lora_rank: int = 4
    pano_height: int = 512
    prompt: PromptConfig = dataclasses.field(
        default_factory=lambda: PromptConfig(
            pers_prompt_prefix="This is one view of a scene.",
            copy_pano_prompt=True,
        )
    )
    dtype: Any = jnp.float32
    unet_kwargs: Optional[Dict] = None
    vae_kwargs: Optional[Dict] = None
    text_kwargs: Optional[Dict] = None
    # named architecture preset: "sd2" (default) or "tiny" (fast smoke
    # drives via --model.preset=tiny, same contract as PanFusionConfig)
    preset: str = "sd2"

    def __post_init__(self):
        if self.preset == "tiny":
            self.unet_kwargs = {
                **dict(block_out_channels=(32, 64), layers_per_block=1,
                       heads=(1, 2), dim_head=32, context_dim=64),
                **(self.unet_kwargs or {}),
            }
            self.vae_kwargs = {
                **dict(block_out_channels=(8, 8, 8, 8), layers_per_block=1),
                **(self.vae_kwargs or {}),
            }
            self.text_kwargs = {
                **dict(hidden_size=64, intermediate_size=128, num_layers=2,
                       num_heads=2),
                **(self.text_kwargs or {}),
            }

    @property
    def pers_latent_res(self) -> int:
        return self.pers_resolution // 8


class MvDiffusion:
    """Perspective-only baseline task module (reference
    models/pano/MvDiffusion.py)."""

    def __init__(self, cfg: MvDiffusionConfig = MvDiffusionConfig()):
        from ..nn.clip import CLIPTextModel
        from ..nn.tokenizer import load_tokenizer
        from ..nn.vae import AutoencoderKL

        self.cfg = cfg
        self.mv_unet = MVUNet(
            lora_rank=cfg.lora_rank, dtype=cfg.dtype, **(cfg.unet_kwargs or {})
        )
        self.vae = AutoencoderKL(dtype=cfg.dtype, **(cfg.vae_kwargs or {}))
        self.text_encoder = CLIPTextModel(dtype=cfg.dtype, **(cfg.text_kwargs or {}))
        self.tokenizer = load_tokenizer()
        self.schedule = make_ddim_schedule(cfg.diff_timestep)

    def default_cameras(self, m: int):
        from ..geometry.sampling import horizon_sample_camera

        theta, phi = horizon_sample_camera(m)
        theta, phi = np.rad2deg(theta), np.rad2deg(phi)
        res = self.cfg.pers_resolution
        Ks, Rs = [], []
        for t, p in zip(theta, phi):
            Kc, Rc = get_K_R(self.cfg.fov, t, p, res, res)
            Ks.append(np.asarray(Kc))
            Rs.append(np.asarray(Rc))
        return (
            np.stack(Ks).astype(np.float32),
            np.stack(Rs).astype(np.float32),
            theta.astype(np.float32),
            phi.astype(np.float32),
        )

    def init_params(self, rng):
        cfg = self.cfg
        m = cfg.num_views
        pr = cfg.pers_latent_res
        K, R, _, _ = self.default_cameras(m)
        ctx_dim = self.text_encoder.hidden_size
        r_unet, r_vae, r_text = jax.random.split(rng, 3)
        # jit inits: eager flax init is per-primitive dispatch (tunnel-slow)
        unet_params = jax.jit(self.mv_unet.init)(
            r_unet,
            jnp.zeros((1, m, pr, pr, 4), cfg.dtype),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, m, 77, ctx_dim), cfg.dtype),
            jnp.asarray(R)[None],
            jnp.asarray(K)[None] * (pr * 8 / cfg.pers_resolution),
        )
        vae_params = jax.jit(self.vae.init)(
            r_vae, jnp.zeros((1, 64, 64, 3), cfg.dtype), r_vae
        )
        text_params = jax.jit(self.text_encoder.init)(
            r_text, jnp.zeros((1, 77), jnp.int32)
        )
        return {"mv_unet": unet_params, "vae": vae_params, "text": text_params}

    @functools.partial(jax.jit, static_argnames=("self",))
    def _text_apply(self, text_params, ids):
        return self.text_encoder.apply(text_params, ids)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _vae_decode(self, vae_params, z):
        return self.vae.apply(vae_params, z, method=self.vae.decode)

    def encode_text(self, params, texts: List[str]):
        ids = jnp.asarray(self.tokenizer(texts), jnp.int32)
        return self._text_apply(params["text"], ids)

    @functools.partial(jax.jit, static_argnames=("self", "num_views"))
    def _sample_loop(self, params, ctx, null_ctx, R, K, rng, num_views: int):
        cfg = self.cfg
        b = ctx.shape[0]
        m = num_views
        pr = cfg.pers_latent_res
        latents = jax.random.normal(rng, (b, m, pr, pr, 4), jnp.float32).astype(
            cfg.dtype
        )
        null = jnp.broadcast_to(null_ctx[:, None], (b, m, *null_ctx.shape[1:]))
        ctx2 = jnp.concatenate([null, ctx], axis=0).astype(cfg.dtype)
        R2 = jnp.concatenate([R, R], axis=0)
        K2 = jnp.concatenate([K, K], axis=0)
        timesteps = self.schedule.timesteps

        def step(lat, i):
            t = timesteps[i]
            lat2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.full((2 * b,), t, jnp.int32)
            eps = self.mv_unet.apply(params["mv_unet"], lat2, t2, ctx2, R2, K2)
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            lat = ddim_step(
                self.schedule, eps.astype(jnp.float32), t,
                lat.astype(jnp.float32),
            ).astype(cfg.dtype)
            return lat, None

        latents, _ = jax.lax.scan(step, latents, jnp.arange(cfg.diff_timestep))
        return latents

    def inference(self, params, batch: Dict, rng):
        """Text -> (views uint8 (b,m,h,w,3), stitched pano uint8)."""
        from ..geometry.projection import mp2e
        from .panfusion import tensor_to_image

        cfg = self.cfg
        m = cfg.num_views
        b = len(batch["pano_prompt"])
        prompts = get_pers_prompt(cfg.prompt, batch, m)
        ctx = self.encode_text(params, prompts).reshape(b, m, 77, -1)
        null_ctx = self.encode_text(params, [""])
        K, R, theta, phi = self.default_cameras(m)
        scale = cfg.pers_latent_res * 8 / cfg.pers_resolution
        Kd = jnp.broadcast_to(jnp.asarray(K)[None] * scale, (b, m, 3, 3))
        Rd = jnp.broadcast_to(jnp.asarray(R)[None], (b, m, 3, 3))
        latents = self._sample_loop(params, ctx, null_ctx, Rd, Kd, rng, m)

        flat = latents.reshape(b * m, *latents.shape[2:])
        imgs = self._vae_decode(params["vae"], flat)
        imgs = imgs.reshape(b, m, *imgs.shape[1:])
        images = tensor_to_image(imgs)

        panos = []
        for bi in range(b):
            chw = jnp.moveaxis(
                jnp.asarray(images[bi], jnp.float32), -1, 1
            )  # (m, 3, h, w)
            pano = mp2e(
                chw, np.full(m, cfg.fov, np.float32), theta, phi,
                (cfg.pano_height, cfg.pano_height * 2),
            )
            panos.append(np.moveaxis(np.asarray(pano), 0, -1))
        pano_u8 = np.clip(np.stack(panos), 0, 255).astype(np.uint8)
        return images, pano_u8

    # -- driver hooks ---------------------------------------------------
    def load_or_init_params(self, ckpt_path=None, seed: int = 0):
        params = self.init_params(jax.random.PRNGKey(seed))
        if ckpt_path:
            from ..train.checkpoints import CheckpointManager, warm_start_params

            ckpt = CheckpointManager(os.path.dirname(os.path.abspath(ckpt_path)))
            loaded = ckpt.restore(params, os.path.basename(ckpt_path))
            if loaded is not None:
                params = warm_start_params(params, loaded)
        return params

    def run_eval(self, datamodule, logger, args):
        from ..runner import predict as run_predict

        params = self.load_or_init_params(
            getattr(args, "ckpt_path", None), getattr(args, "seed", 0)
        )
        mode = "predict" if args.command == "predict" else "test"
        ext = "jpg" if mode == "predict" else "png"
        return run_predict(
            self, params, datamodule, logger, mode=mode, ext=ext,
            seed=getattr(args, "seed", 0),
        )

    def fit(self, datamodule, train_cfg, logger, args):
        """Train the CP blocks + LoRA by multi-view eps-MSE (reference
        MvDiffusion training_step)."""
        import optax

        from ..train.checkpoints import CheckpointManager
        from ..train.params import (
            default_trainable,
            merge_params,
            partition_params,
        )

        cfg = self.cfg
        datamodule.setup("fit")
        loader = datamodule.train_dataloader()
        params = self.init_params(jax.random.PRNGKey(getattr(args, "seed", 0)))
        trainable, frozen = partition_params(params, default_trainable)
        opt = optax.adamw(train_cfg.lr, weight_decay=train_cfg.weight_decay)
        opt_state = opt.init(trainable)

        @jax.jit
        def train_step(trainable, frozen, opt_state, batch, rng):
            def loss_fn(tr):
                p = merge_params(tr, frozen)
                r_vae, r_t, r_n = jax.random.split(rng, 3)
                images = batch["images"]
                b, m = images.shape[:2]
                flat = images.reshape(b * m, *images.shape[2:])
                z = self.vae.apply(
                    p["vae"], flat, r_vae, method=self.vae.sample_latent
                )
                z = jax.lax.stop_gradient(z.reshape(b, m, *z.shape[1:]))
                t = jax.random.randint(
                    r_t, (b,), 0, self.schedule.num_train_timesteps
                )
                noise = jax.random.normal(r_n, z.shape, jnp.float32)
                noisy = add_noise(self.schedule, z, noise, t[:, None])
                eps = self.mv_unet.apply(
                    p["mv_unet"], noisy.astype(cfg.dtype), t,
                    batch["ctx"].astype(cfg.dtype), batch["R"], batch["K"],
                )
                return jnp.mean((eps.astype(jnp.float32) - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state2 = opt.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state2, loss

        ckpt = CheckpointManager(f"{logger.save_dir}/checkpoints")
        rng = jax.random.PRNGKey(getattr(args, "seed", 0) + 1)
        step = 0
        scale = cfg.pers_latent_res * 8 / cfg.pers_resolution
        for epoch in range(train_cfg.max_epochs):
            for batch in loader:
                m = batch["cameras"]["theta"].shape[1]
                full = merge_params(trainable, frozen)
                prompts = get_pers_prompt(cfg.prompt, batch, m)
                b = len(batch["pano_prompt"])
                ctx = self.encode_text(full, prompts).reshape(b, m, 77, -1)
                dev = {
                    "images": jnp.asarray(batch["images"]),
                    "ctx": ctx,
                    "R": jnp.asarray(batch["cameras"]["R"], jnp.float32),
                    "K": jnp.asarray(batch["cameras"]["K"], jnp.float32) * scale,
                }
                rng, sub = jax.random.split(rng)
                trainable, opt_state, loss = train_step(
                    trainable, frozen, opt_state, dev, sub
                )
                step += 1
                if step % 10 == 0:
                    logger.log({"train/loss": float(loss)}, step)
                ckpt.maybe_save(lambda: merge_params(trainable, frozen))
                if getattr(args, "max_steps", None) and step >= args.max_steps:
                    ckpt.save(merge_params(trainable, frozen))
                    return
            ckpt.save(merge_params(trainable, frozen))
