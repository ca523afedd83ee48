#!/usr/bin/env python
"""On-chip parity + timing sweep for the fused LN/GN->matmul kernels.

Companion to scripts/check_flash_parity.py: runs ops/fused_ln.py's Pallas
kernels against the XLA references on the real TPU across the transformer
shapes the UNets use, reporting max |err| and wall-clock per site. The
interpret-mode tests (tests/test_fused_ln.py) pin the logic on CPU; this
pins the Mosaic lowering + numerics on hardware (reduced-precision f32
band: expect ~1e-3..2e-2 like flash).

Usage: python scripts/check_fused_parity.py [--iters 50]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panfusion_tpu.ops.fused_ln import (affine_matmul,
                                            affine_matmul_reference,
                                            ln_matmul, ln_matmul_reference)

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # (tokens, C, F) for the LN sites of the SD2 pano (64x136 latent) and
    # pers (batch 40, 32x32) branches: qkv (F=3C), cross-q (F=C), GEGLU
    # (F=8C)
    ln_shapes = [
        (8704, 320, 960), (8704, 320, 320), (8704, 320, 2560),
        (2176, 640, 1920), (2176, 640, 5120),
        (544, 1280, 3840), (544, 1280, 10240),
        (40960, 320, 960),  # pers level-0 qkv (b*m*hw = 40*1024)
    ]
    worst = 0.0
    for t, c, f in ln_shapes:
        x = jnp.asarray(rng.normal(size=(t, c)), jnp.bfloat16)
        g = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)), jnp.float32)
        b = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(c, f)) / np.sqrt(c), jnp.bfloat16)

        fused = jax.jit(lambda x, g, b, w: ln_matmul(x, g, b, w))
        ref = jax.jit(lambda x, g, b, w: ln_matmul_reference(x, g, b, w))
        out_f = np.asarray(fused(x, g, b, w), np.float32)
        out_r = np.asarray(ref(x, g, b, w), np.float32)
        err = np.max(np.abs(out_f - out_r))
        worst = max(worst, float(err))

        def bench(fn):
            fn(x, g, b, w).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(x, g, b, w)
            o.block_until_ready()
            return (time.perf_counter() - t0) / args.iters * 1e3

        tf, tr = bench(fused), bench(ref)
        print(f"ln_matmul  t={t:6d} c={c:5d} f={f:6d}  |err|={err:.2e}  "
              f"fused {tf:7.3f} ms vs xla {tr:7.3f} ms  ({tr / tf:4.2f}x)")

    # GN-affine sites: proj_in of SpatialTransformer (F = C)
    for bsz, t, c in [(2, 8704, 320), (2, 2176, 640), (2, 544, 1280),
                      (80, 1024, 320)]:
        x = jnp.asarray(rng.normal(size=(bsz, t, c)), jnp.bfloat16)
        s = jnp.asarray(1 + 0.1 * rng.normal(size=(bsz, c)), jnp.float32)
        tt = jnp.asarray(0.1 * rng.normal(size=(bsz, c)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(c, c)) / np.sqrt(c), jnp.bfloat16)
        fused = jax.jit(lambda x, s, tt, w: affine_matmul(x, s, tt, w))
        ref = jax.jit(
            lambda x, s, tt, w: affine_matmul_reference(x, s, tt, w))
        out_f = np.asarray(fused(x, s, tt, w), np.float32)
        out_r = np.asarray(ref(x, s, tt, w), np.float32)
        err = np.max(np.abs(out_f - out_r))
        worst = max(worst, float(err))

        def bench2(fn):
            fn(x, s, tt, w).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(x, s, tt, w)
            o.block_until_ready()
            return (time.perf_counter() - t0) / args.iters * 1e3

        tf, tr = bench2(fused), bench2(ref)
        print(f"affine_mm  b={bsz:3d} t={t:6d} c={c:5d}  |err|={err:.2e}  "
              f"fused {tf:7.3f} ms vs xla {tr:7.3f} ms  ({tr / tf:4.2f}x)")

    print(f"worst |err| across sites: {worst:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
