"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU platform (the TPU-native answer to "multi-node without
a cluster" — see SURVEY.md §4).

Must run before jax is imported anywhere.
"""
import os

# Force, not setdefault: the session environment pins JAX_PLATFORMS to the
# tunneled TPU platform, which would route every test compile through the
# remote chip (and ignore the virtual 8-device CPU flag below).
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: single-core XLA:CPU conv compiles take tens
# of seconds; cache them across test runs. (The env-var spelling is not
# honored by this jax build — set via jax.config after import.)
import jax  # noqa: E402

# The axon sitecustomize hook re-forces jax_platforms='axon,cpu' at import,
# so the env var alone is not enough — pin the config after import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Portable cache entries: XLA:CPU AOT blobs record the compile machine's
    # feature set and refuse to load on hosts lacking any of them (observed:
    # avx512/prefer-no-scatter entries from one CI host spamming
    # cpu_aot_loader errors + forcing cold recompiles on the next). Pinning
    # the ISA to the AVX2 baseline makes /root/.jax_cache entries loadable
    # across x86 hosts at a small single-run cost.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
