#!/usr/bin/env python
"""Profile-guided perf analysis of the full-size PanFusion hot paths.

Records a jax.profiler trace around (a) one jitted CFG dual-branch DDIM
chunk (the inference hot loop, models/panfusion.py _sample_chunk) and
(b) one train step, then aggregates device-side op durations from the
perfetto trace and prints the top time sinks. The reference has no
profiling subsystem at all (SURVEY.md §5.1); this is the TPU-native
equivalent of a torch.profiler table.

Usage:
  python scripts/profile_step.py --out /tmp/panprof [--steps 10]
  python scripts/profile_step.py --parse-only /tmp/panprof

Top-sink tables from each round are recorded in BASELINE.md.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def aggregate_trace(trace_dir: str, top: int = 25):
    """Aggregate complete-event durations by op name from the newest
    perfetto trace under ``trace_dir``, grouped per process (device vs
    host threads are separate processes in the JAX dump)."""
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no perfetto trace under {trace_dir}")
    path = paths[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", str(ev["pid"]))

    # keep only device-side streams (TPU core / XLA ops); host python rows
    # (named like "python", "main thread") are dispatch noise for this view
    per_proc = defaultdict(lambda: defaultdict(float))
    totals = defaultdict(float)
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        pname = proc_names.get(ev["pid"], str(ev["pid"]))
        per_proc[pname][ev["name"]] += ev["dur"]
        totals[pname] += ev["dur"]

    device_procs = [
        p for p in per_proc
        if "TPU" in p or "tpu" in p or "XLA" in p or "/device" in p.lower()
    ] or list(per_proc)
    for pname in device_procs:
        ops = per_proc[pname]
        tot = totals[pname]
        print(f"\n== {pname}: {tot / 1e3:.1f} ms total busy ==")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {dur / 1e3:9.2f} ms  {100 * dur / tot:5.1f}%  {name[:110]}")
    return per_proc


def run_capture(out_dir: str, steps: int, what: str):
    import panfusion_tpu

    panfusion_tpu.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.models import PanFusion, PanFusionConfig
    from panfusion_tpu.models.panfusion import cast_params

    cfg = PanFusionConfig(dtype=jnp.bfloat16, scan_chunk=steps)
    model = PanFusion(cfg)
    params = cast_params(model.init_params(jax.random.PRNGKey(0)), jnp.bfloat16)
    batch = {"pano_prompt": ["a modern living room"], "prompt": None}

    if what in ("inference", "both"):
        # warm up: full inference once (compiles init_noise, chunks, decode)
        t0 = time.perf_counter()
        model.inference(params, batch, jax.random.PRNGKey(1))
        print(f"warmup inference: {time.perf_counter() - t0:.1f} s")
        # capture exactly one chunk of the DDIM loop: rebuild the chunk args
        # the way inference does, then trace one _sample_chunk execution
        with jax.profiler.trace(
            os.path.join(out_dir, "inference"), create_perfetto_trace=True
        ):
            t0 = time.perf_counter()
            model.inference(params, batch, jax.random.PRNGKey(2))
            dt = time.perf_counter() - t0
        print(f"traced inference: {dt:.2f} s ({60 / dt:.2f} panos/min)")

    if what in ("train", "both"):
        import numpy as np

        from panfusion_tpu.train.loop import (TrainConfig, create_train_state,
                                              make_train_step)

        tc = TrainConfig()
        state, opt = create_train_state(model, params, tc)
        step_fn = make_train_step(model, opt)
        m = cfg.num_views
        theta = jnp.linspace(0, 2 * jnp.pi, m, endpoint=False)[None]
        dev_batch = {
            "images": jnp.zeros((1, m, cfg.pers_resolution,
                                 cfg.pers_resolution, 3), cfg.dtype),
            "pano": jnp.zeros((1, cfg.pano_height, cfg.pano_width, 3),
                              cfg.dtype),
            "pers_ctx": jnp.zeros((1, m, 77, model.context_dim), cfg.dtype),
            "pano_ctx": jnp.zeros((1, 77, model.context_dim), cfg.dtype),
            "fov": jnp.full((1, m), 90.0),
            "theta": theta,
            "phi": jnp.zeros((1, m)),
        }
        state, _ = step_fn(state, dev_batch, jax.random.PRNGKey(3))  # compile
        jax.block_until_ready(state.trainable)
        with jax.profiler.trace(
            os.path.join(out_dir, "train"), create_perfetto_trace=True
        ):
            t0 = time.perf_counter()
            state, metrics = step_fn(state, dev_batch, jax.random.PRNGKey(4))
            jax.block_until_ready(state.trainable)
            dt = time.perf_counter() - t0
        print(f"traced train step: {dt * 1e3:.0f} ms "
              f"(loss={float(metrics['loss']):.4f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/panprof")
    ap.add_argument("--steps", type=int, default=10,
                    help="DDIM steps per traced chunk")
    ap.add_argument("--what", choices=["inference", "train", "both"],
                    default="both")
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; aggregate an existing trace dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.parse_only:
        aggregate_trace(args.parse_only, args.top)
        return
    os.makedirs(args.out, exist_ok=True)
    run_capture(args.out, args.steps, args.what)
    for sub in ("inference", "train"):
        d = os.path.join(args.out, sub)
        if os.path.isdir(d):
            print(f"\n######## {sub} ########")
            try:
                aggregate_trace(d, args.top)
            except SystemExit as exc:
                print(exc)


if __name__ == "__main__":
    main()
