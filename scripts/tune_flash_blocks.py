#!/usr/bin/env python
"""On-chip autotune of the Pallas flash-attention block caps.

Sweeps (PANFUSION_FLASH_BQ, PANFUSION_FLASH_BK) over the two hot
attention shapes of the full-size dual-branch denoise step:

  * pano UNet level-0 self-attention: n = m = 8192 tokens (64x128 latent),
    the single most expensive attention site (BASELINE.md);
  * EPP bias cross-attention site 1: 2048 q x 5120 kv x 10 heads with a
    dense additive bias (reference models/modules/transformer.py:57-74).

For each (bq, bk) candidate it times the jitted kernel (median of
``--iters`` runs after a warmup) and prints a table plus the best cap per
shape. The winner is meant to be exported as env defaults for bench.py /
the CLI; results per round are recorded in BASELINE.md.

Usage (run on the real chip):
  python scripts/tune_flash_blocks.py [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_shape(name, b, n, m, h, d, bias, caps, iters, grad=False):
    """Time the jitted kernel per (bq, bk) cap pair; with grad=True, time
    forward+backward instead (ADVICE r2: the caps also set every backward
    block size — block_*_dkv/block_*_dq — so a fwd-only winner can be slow
    or VMEM-infeasible in training; tune inference caps with fwd-only and
    training caps with --grad)."""
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.ops import attention as att

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, m, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, m, h, d), jnp.bfloat16)
    ab = (
        jax.random.uniform(kb, (b, n, m), jnp.bfloat16, -1, 1)
        if bias
        else None
    )

    rows = []
    for bq in caps:
        for bk in caps:
            if n % bq or m % bk:
                continue
            os.environ["PANFUSION_FLASH_BQ"] = str(bq)
            os.environ["PANFUSION_FLASH_BK"] = str(bk)

            if grad:
                # fwd+bwd: grads wrt q/k/v exercise the dkv and dq kernels
                loss = lambda q, k, v, ab: jnp.sum(
                    att.bias_attention(q, k, v, ab).astype(jnp.float32) ** 2
                )
                fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            else:
                fn = jax.jit(lambda q, k, v, ab: att.bias_attention(q, k, v, ab))
            try:
                out = fn(q, k, v, ab)
                jax.block_until_ready(out)
            except Exception as exc:  # kernel rejects this tiling
                print(f"  {name} bq={bq} bk={bk}: FAIL {exc!r}")
                continue
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(q, k, v, ab))
                ts.append(time.perf_counter() - t0)
            med = sorted(ts)[len(ts) // 2] * 1e3
            rows.append((med, bq, bk))
            print(f"  {name} bq={bq} bk={bk}: {med:.3f} ms")
    rows.sort()
    if rows:
        med, bq, bk = rows[0]
        tag = "fwd+bwd" if grad else "fwd"
        print(f"BEST {name} [{tag}]: bq={bq} bk={bk} -> {med:.3f} ms")
    return rows[0] if rows else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--caps", type=int, nargs="*", default=[128, 256, 512, 1024, 2048]
    )
    ap.add_argument(
        "--grad", action="store_true",
        help="time forward+backward (training caps) instead of fwd-only",
    )
    args = ap.parse_args()

    shapes = [
        # (name, b, n, m, heads, d, bias)
        ("pano_L0_self (CFG batch)", 2, 8192, 8192, 5, 64, False),
        ("pano_L1_self", 2, 2048, 2048, 10, 64, False),
        ("epp_site1_bias", 2, 2048, 5120, 10, 64, True),
        ("pers_self_b40", 40, 1024, 1024, 5, 64, False),
    ]
    best = {}
    for name, b, n, m, h, d, bias in shapes:
        r = bench_shape(name, b, n, m, h, d, bias, args.caps, args.iters,
                        grad=args.grad)
        if r:
            best[name] = {"ms": r[0], "bq": r[1], "bk": r[2]}
    print({"best": best, "mode": "fwd+bwd" if args.grad else "fwd"})


if __name__ == "__main__":
    main()
