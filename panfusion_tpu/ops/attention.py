"""Biased attention for the EPP blocks: Pallas flash kernel on TPU.

The EPP cross-attention carries a dense float additive bias in [-1, 1]
(the projection masks — reference models/modules/transformer.py:57-74 feeds
them to xformers' memory_efficient_attention). At full size the score
tensor is (heads, 2048, 5120) per sample per direction; materializing it
(what plain XLA attention does) is HBM-bandwidth-bound. On TPU we run the
Pallas flash-attention kernel with additive-bias (`ab`) support, which
streams K/V/bias tiles through VMEM and never materializes scores.

`bias_attention(q, k, v, bias)`:
  q    (b, n, heads, d)
  k, v (b, m, heads, d)
  bias (b, n, m) or (b, 1, n, m) float, broadcast over heads
  -> (b, n, heads, d)

Falls back to jax.nn.dot_product_attention off-TPU, for tiny test shapes
(the kernel needs lane-aligned tiles), and under vmap/tracing contexts the
kernel doesn't support.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu",)
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _flash_ok(b: int, n: int, m: int, heads: int, d: int) -> bool:
    """Shape gate for the Pallas kernel: block-divisible sequence lengths
    and a lane-friendly head dim."""
    if d % 8 != 0:
        return False
    # kernel block minima (128 query, 128 kv); tiny test configs fall back
    return n >= 128 and m >= 128 and n % 128 == 0 and m % 128 == 0


def self_attention(q, k, v):
    """Unbiased attention, flash-routed for large sequences.

    XLA's dot_product_attention materializes the (heads, n, m) score tensor
    in HBM — at the pano UNet's level-0 resolution (8192 tokens) that is
    the dominant cost of the whole denoise step; the Pallas kernel streams
    it through VMEM instead."""
    return bias_attention(q, k, v, None)


def bias_attention(q, k, v, bias=None, force_xla: bool = False):
    """Multi-head attention with optional additive float bias.

    Layouts follow jax.nn.dot_product_attention: (batch, seq, heads, dim).
    """
    if bias is not None and bias.ndim == 3:
        bias4 = bias[:, None]
    else:
        bias4 = bias

    b, n, h, d = q.shape
    m = k.shape[1]

    import os

    use_flash = (
        not force_xla
        and os.environ.get("PANFUSION_NO_FLASH") != "1"
        and _tpu_available()
        and _flash_ok(b, n, m, h, d)
    )
    if use_flash:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            # kernel layout: (b, heads, seq, dim)
            qh = jnp.swapaxes(q, 1, 2)
            kh = jnp.swapaxes(k, 1, 2)
            vh = jnp.swapaxes(v, 1, 2)
            ab = None
            if bias4 is not None:
                # keep ab in the compute dtype — at full size this tensor is
                # (2, 10, 2048, 5120); f32 would be 840 MB of HBM
                ab = jnp.broadcast_to(bias4, (b, h, n, m)).astype(q.dtype)
            def pick(x, cap):
                # largest power-of-two block in [128, cap] dividing the
                # length (fwd AND bwd kernels require exact divisibility).
                # Caps below 128 or off powers of two round DOWN via the
                # min/loop (ADVICE r2: the old loop returned 128 even when
                # cap < 128, silently exceeding the user's cap).
                cand = min(128, 1 << max(int(cap).bit_length() - 1, 0))
                while cand * 2 <= cap and x % (cand * 2) == 0:
                    cand *= 2
                return cand if cand >= 1 and x % cand == 0 else x

            # Block caps are env-tunable so scripts/tune_flash_blocks.py can
            # sweep them on-chip; defaults match the round-1 heuristic (512).
            # NOTE: read at TRACE time — once a jitted caller has compiled,
            # changing the env has no effect (the jit cache keys on the
            # traced graph, not the env); set them before first compilation.
            # defaults tuned end-to-end on the v5e (round 4): bench.py at
            # (bq, bk) = (512,512) 9.57, (1024,512) 9.71, (128,1024) 9.03
            # panos/min — per-op tunnel microbenchmarks are unreliable
            # (async-ack artifacts), so caps are selected by whole-pipeline
            # wall-clock only (BASELINE.md round-4 section)
            bq = pick(n, int(os.environ.get("PANFUSION_FLASH_BQ", "1024")))
            bk = pick(m, int(os.environ.get("PANFUSION_FLASH_BK", "512")))
            # backward blocks stay at the round-1 512 cap (separately
            # env-tunable): the bwd kernels hold dq/dkv accumulators on top
            # of q/k/v tiles, so the fwd-optimal 1024 costs VMEM headroom
            # there without a measured win (tune_flash_blocks.py --grad)
            bqb = pick(n, int(os.environ.get("PANFUSION_FLASH_BQ_BWD", "512")))
            bkb = pick(m, int(os.environ.get("PANFUSION_FLASH_BK_BWD", "512")))
            block = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bqb, block_k_major_dkv=bkb,
                block_k_dkv=bkb, block_q_dkv=bqb,
                block_k_major_dq=bkb, block_k_dq=bkb, block_q_dq=bqb,
            )
            # the kernel computes (q@k^T + ab) * sm_scale — to match the
            # xformers/jax.nn convention q@k^T/sqrt(d) + bias, fold the
            # scale into q and keep sm_scale=1 so the bias stays unscaled
            out = flash_attention(
                qh * jnp.asarray(1.0 / (d ** 0.5), qh.dtype),
                kh, vh, ab=ab, sm_scale=1.0,
                block_sizes=block,
            )
            return jnp.swapaxes(out, 1, 2).astype(q.dtype)
        except (ImportError, AttributeError, TypeError,
                NotImplementedError, ValueError) as exc:
            # jax version drift (moved module / renamed kwarg or field) or
            # a tracing context the kernel doesn't support (missing
            # batching rule -> NotImplementedError, kernel constraint not
            # covered by _flash_ok -> ValueError): fall through to XLA,
            # but never silently — the XLA path materializes the score
            # tensor in HBM and is ~10x slower at full size, so a quiet
            # fallback would look like a perf bug
            _warn_flash_fallback(repr(exc))

    return jax.nn.dot_product_attention(q, k, v, bias=bias4)


@functools.lru_cache(maxsize=8)
def _warn_flash_fallback(reason: str):
    import warnings

    warnings.warn(
        "Pallas flash attention unavailable; falling back to XLA "
        f"attention (expect large slowdown at full size): {reason}",
        RuntimeWarning,
        stacklevel=3,
    )
