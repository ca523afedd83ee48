#!/usr/bin/env python
"""Flash-attention parity check — run manually on a real TPU.

Compares the Pallas flash kernel (ops/attention.py bias_attention) against
the XLA reference path at the full-size EPP shapes and the pano
self-attention shape. The CPU test suite cannot exercise the kernel
(tests/test_attention.py::test_flash_parity_on_tpu is skipped); this script
is the manual counterpart it references.

Usage: python scripts/check_flash_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from panfusion_tpu.ops.attention import bias_attention

    if jax.default_backend() not in ("tpu",):
        print(f"needs a TPU backend, have {jax.default_backend()}")
        return 1

    shapes = [
        # (b, n, m, h, d, biased)   EPP site 1 full size; site 2; pano self
        (2, 2048, 5120, 10, 64, True),
        (2, 512, 1280, 20, 64, True),
        (2, 8192, 8192, 5, 64, False),
        (1, 256, 384, 2, 32, True),
    ]
    worst = 0.0
    for b, n, m, h, d, biased in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, m, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, m, h, d)), jnp.float32)
        bias = (
            jnp.asarray(rng.uniform(-1, 1, size=(b, n, m)), jnp.float32)
            if biased else None
        )
        flash = np.asarray(bias_attention(q, k, v, bias))
        xla = np.asarray(bias_attention(q, k, v, bias, force_xla=True))
        err = float(np.abs(flash - xla).max())
        worst = max(worst, err)
        status = "OK" if err < 5e-3 else "FAIL"
        print(f"({b},{n},{m},{h},{d}) biased={biased}: max err {err:.2e} "
              f"{status}")
    print(f"worst: {worst:.2e}")
    return 0 if worst < 5e-3 else 1


if __name__ == "__main__":
    raise SystemExit(main())
