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
