"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual 8-device CPU platform (the TPU-native answer to "multi-node without
a cluster" — see SURVEY.md §4).

Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
