"""CLIP text encoder (OpenCLIP ViT-H text tower, SD2 flavor) in flax.linen.

Architecture parity with the CLIPTextModel of
stabilityai/stable-diffusion-2-base (reference loads it frozen fp16 in
models/pano/PanoGenerator.py:117-121): vocab 49408, hidden 1024, 23 layers,
16 heads, GELU, causal mask, max 77 positions. Output is the final
layer-normed hidden states (the ``prompt_embeds[0]`` the reference feeds to
the UNets, PanoGenerator.py:197-211).

The tokenizer lives in panfusion_tpu.nn.tokenizer (pure-Python BPE with an
offline fallback — this environment has no network for vocab downloads).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_positions: int = 77
    eps: float = 1e-5


class CLIPAttention(nn.Module):
    hidden: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        d = self.hidden // self.heads
        b, n, _ = x.shape
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, n, self.heads, d)
        k = k.reshape(b, n, self.heads, d)
        v = v.reshape(b, n, self.heads, d)
        out = jax.nn.dot_product_attention(q, k, v, bias=causal_mask)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(
            out.reshape(b, n, self.hidden)
        )


class CLIPLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden, self.heads, dtype=self.dtype, name="self_attn")(
            h, causal_mask
        )
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 23
    num_heads: int = 16
    max_positions: int = 77
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        b, n = input_ids.shape
        tok = nn.Embed(
            self.vocab_size, self.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_positions, self.hidden_size),
        )
        x = tok + pos[None, :n].astype(self.dtype)

        causal = jnp.triu(
            jnp.full((n, n), jnp.finfo(jnp.float32).min, jnp.float32), k=1
        )[None, None]
        for i in range(self.num_layers):
            x = CLIPLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.eps, dtype=self.dtype, name=f"layers_{i}",
            )(x, causal)
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="final_layer_norm")(x)


class CLIPVisionModel(nn.Module):
    """CLIP ViT image tower — used by the CLIP-Score metric
    (reference: torchmetrics CLIPScore in models/pano/EvalPanoGen.py:30-49).
    Defaults are ViT-H/14 (the tower paired with the SD2 text encoder)."""

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (b, H, W, 3) CLIP-normalized. Returns the projected
        image embedding (b, projection_dim)."""
        b = pixel_values.shape[0]
        patches = nn.Conv(
            self.hidden_size,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, -1, self.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.hidden_size)), patches],
            axis=1,
        )
        n = x.shape[1]
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n, self.hidden_size)
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(self.num_layers):
            x = CLIPLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.eps, dtype=self.dtype, name=f"layers_{i}",
            )(x, None)
        pooled = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="post_layernorm")(
            x[:, 0]
        )
        return nn.Dense(
            self.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)


def clip_image_preprocess(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 (b, H, W, 3) -> CLIP-normalized float (b, size, size, 3).

    transformers CLIPProcessor contract: resize the SHORT side to `size`
    (aspect preserved), center-crop to size x size, then OpenAI mean/std —
    a 2:1 panorama contributes its central square, not a squashed image."""
    import cv2

    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    outs = []
    for im in images_uint8:
        h, w = im.shape[:2]
        scale = size / min(h, w)
        nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
        r = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_AREA)
        y0, x0 = (nh - size) // 2, (nw - size) // 2
        outs.append(r[y0:y0 + size, x0:x0 + size])
    out = np.stack(outs).astype(np.float32) / 255.0
    return (out - mean) / std
