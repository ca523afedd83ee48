"""EPP (Equirectangular-Perspective Projection) attention blocks.

The dual-branch coupling of PanFusion: bidirectional masked cross-attention
between the pano latent and the m perspective-view latents with spherical
positional encodings and a soft additive bias in [-1, 1]
(reference: models/pano/modules.py WarpAttn, models/modules/transformer.py).

TPU-first design difference: masks/coords are *inputs* (an ``EPPSite``
pytree) built by panfusion_tpu.models.epp — precomputed once per camera set
and reused across all 50 denoising steps — instead of being recomputed with
host numpy inside every forward at every resolution (the reference's
models/pano/utils.py:10-106 hot-path recompute, see SURVEY.md §3.1).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import CrossAttention, FeedForward


class EPPSite(NamedTuple):
    """Correspondence data of one WarpAttn resolution.

    pers_mask: (b, eh*ew, m*ph*pw) additive bias in [-1, 1]
    equi_mask: (b, m*ph*pw, eh*ew)
    pers_coords: (b*m, ph, pw, 2) lon/lat of each pers pixel
    equi_coords: (eh, ew, 2) lon/lat of each equi pixel
    """

    pers_mask: jnp.ndarray
    equi_mask: jnp.ndarray
    pers_coords: jnp.ndarray
    equi_coords: jnp.ndarray


@functools.lru_cache(maxsize=None)
def spherical_pe_freq_bands(n_freqs: int) -> np.ndarray:
    """Frequency bands of the reference SphericalPE
    (models/modules/transformer.py:165-189): base 2 up to 80 freqs, else
    5000^(1/(N/2.5)); logscale.

    Parity must be bitwise in f32: for n_freqs > 80 the high bands reach
    ~3.4e6, where even a 1-ulp band difference shifts the sin/cos argument
    by ~0.3 rad and the PE features a converted reference checkpoint was
    trained on become wrong. torch's f32 powf differs from numpy's at the
    ulp level, so the bands are computed with torch when importable (the
    conversion/serving images ship it) and f32 numpy otherwise."""
    base = 2.0 if n_freqs <= 80 else 5000.0 ** (1.0 / (n_freqs / 2.5))
    try:
        import torch

        bands = (base ** torch.linspace(0, n_freqs - 1, n_freqs)).numpy()
    except ImportError:  # pragma: no cover - torch is in this image
        bands = np.float32(base) ** np.linspace(
            0.0, n_freqs - 1, n_freqs, dtype=np.float32
        )
    # the lru_cached array is shared by every caller: freeze it so a
    # mutation can't silently corrupt all subsequent positional encodings
    bands.setflags(write=False)
    return bands


def spherical_pe(coords: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """(..., 2) lon/lat -> (..., 4*n_freqs) [sin(lon*f), sin(lat*f),
    cos(lon*f), cos(lat*f)] — ordering parity with the reference."""
    bands = jnp.asarray(spherical_pe_freq_bands(n_freqs), jnp.float32)
    enc = coords[..., :, None] * bands  # (..., 2, F)
    pe = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-2)  # (..., 4, F)
    return pe.reshape(*coords.shape[:-1], 4 * n_freqs).astype(coords.dtype)


class EPPTransformerBlock(nn.Module):
    """The WarpAttn transformer: one cross-attn + GEGLU FF with a *shared*
    pre-norm applied to both query and context, an additive query PE before
    the norm, and zero-initialized output projections so the block starts as
    identity (reference transformer.py:131-162)."""

    dim: int
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, bias=None, query_pe=None):
        # the SHARED pre-norm (one param set normalizes query and context)
        # fuses into the q and kv projections (ops/fused_ln.py) — param
        # tree unchanged (norm1/{scale,bias} via the parameter-only twin)
        from .layers import _LNParams

        ln1 = _LNParams(name="norm1")(self.dim)
        q = x if query_pe is None else x + query_pe
        x = x + CrossAttention(
            self.dim, self.heads, self.dim_head, context_dim=self.dim,
            out_zero_init=True, dtype=self.dtype, name="attn1",
        )(q, context=context, bias=bias, ln=ln1, ln_kv=ln1)
        ln2 = _LNParams(name="norm2")(self.dim)
        x = x + FeedForward(self.dim, zero_init_out=True, dtype=self.dtype,
                            name="ff")(x, ln=ln2)
        return x


class WarpAttn(nn.Module):
    """Bidirectional EPP cross-attention at one resolution.

    One shared EPPTransformerBlock serves both directions (reference
    models/pano/modules.py:11-12) — pano queries perspective keys, then
    perspective queries pano keys, each with its projection mask bias and
    SphericalPE added to keys (and passed as query_pe).
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # heads = dim/32 with dim_head 32 (reference modules.py:11-12);
        # max(1, .) keeps tiny test configs (dim < 32) valid
        self.transformer = EPPTransformerBlock(
            self.dim, max(1, self.dim // 32), 32, dtype=self.dtype,
            name="transformer",
        )
        self.n_freqs = self.dim // 4

    def __call__(self, pers_x, equi_x, site: EPPSite):
        """pers_x: (b*m, ph, pw, c) NHWC; equi_x: (b, eh, ew, c)."""
        bm, ph, pw, c = pers_x.shape
        b, eh, ew, _ = equi_x.shape
        m = bm // b

        pers_pe = spherical_pe(site.pers_coords, self.n_freqs).astype(self.dtype)
        equi_pe = spherical_pe(site.equi_coords, self.n_freqs).astype(self.dtype)

        pers_x_wpe = pers_x + pers_pe
        equi_pe_b = jnp.broadcast_to(equi_pe[None], (b, eh, ew, c))
        equi_x_wpe = equi_x + equi_pe_b

        # pano queries <- perspective keys
        q = equi_x.reshape(b, eh * ew, c)
        kv = pers_x_wpe.reshape(b, m * ph * pw, c)
        q_pe = equi_pe_b.reshape(b, eh * ew, c)
        equi_out = self.transformer(q, kv, bias=site.pers_mask, query_pe=q_pe)

        # perspective queries <- pano keys
        q = pers_x.reshape(b, m * ph * pw, c)
        kv = equi_x_wpe.reshape(b, eh * ew, c)
        q_pe = pers_pe.reshape(b, m * ph * pw, c)
        pers_out = self.transformer(q, kv, bias=site.equi_mask, query_pe=q_pe)

        return (
            pers_out.reshape(bm, ph, pw, c),
            equi_out.reshape(b, eh, ew, c),
        )
