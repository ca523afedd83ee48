"""panfusion-tpu: TPU-native text-to-360-panorama framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of PanFusion
(CVPR 2024, chengzhag/PanFusion). See SURVEY.md at the repo root for the
reference structural analysis this build follows.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/root/.jax_cache"):
    """Persistent XLA compilation cache (huge win on the single-core CPU
    test platform; also skips TPU recompiles across runs). Call before any
    jitted computation."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", path),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def force_cpu():
    """Pin JAX to the host CPU, conftest-style (tests/conftest.py:11-23).

    The env var alone is NOT enough on hosts with the axon sitecustomize
    hook, which re-forces jax_platforms='axon,cpu' at import — the config
    must be pinned after import too. Safe to call before or after the
    first `import jax`, but MUST run before any computation."""
    import os

    import jax

    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


def resolve_platform(cpu: bool = False) -> str:
    """Tool-side platform policy (VERDICT r4 weak #7).

    Host tools (tools/*.py) hang for tens of minutes on the axon backend
    socket when the TPU tunnel is absent (device init blocks in C with the
    GIL held, so in-process watchdogs never fire). Policy:
      - `cpu=True`, or PANFUSION_CPU=1, or JAX_PLATFORMS=cpu -> pin CPU now;
      - otherwise probe the accelerator in a SUBPROCESS with a timeout
        (PANFUSION_TPU_PROBE_SECS, default 60 s — covers tunnel device init);
        kill-on-timeout works where in-process alarms cannot, and a dead
        probe falls back to CPU in seconds instead of a 25-minute hang.
    Returns the platform chosen ('cpu' or 'accel'). The probe result is
    cached in PANFUSION_PLATFORM_PROBED for child processes."""
    import os

    if (cpu or os.environ.get("PANFUSION_CPU", "") == "1"
            or os.environ.get("JAX_PLATFORMS", "") == "cpu"):
        force_cpu()
        return "cpu"
    cached = os.environ.get("PANFUSION_PLATFORM_PROBED")
    if cached:
        if cached == "cpu":
            force_cpu()
        return cached
    import subprocess
    import sys

    timeout = float(os.environ.get("PANFUSION_TPU_PROBE_SECS", 60))
    try:
        ok = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()"],
            timeout=timeout, capture_output=True,
        ).returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    platform = "accel" if ok else "cpu"
    if platform == "cpu":
        print(f"resolve_platform: accelerator probe failed within "
              f"{timeout:.0f}s; falling back to host CPU")
        force_cpu()
    os.environ["PANFUSION_PLATFORM_PROBED"] = platform
    return platform
