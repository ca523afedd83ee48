"""Device mesh + sharding rules — the TPU-native replacement for DDP.

The reference's only parallelism is NCCL DDP over 4 GPUs (SURVEY.md §2.8).
Here parallelism is jax.sharding over a Mesh:

* axis "data": batch sharding (DP) — gradients all-reduce over ICI via
  XLA-inserted psum, replacing the DDP ring;
* axis "model": tensor parallelism — large Dense kernels shard their output
  features; XLA inserts all-gathers/reduce-scatters. This also serves as the
  *view* axis for the perspective branch (the (b*m) flattened leading axis
  shards over data x model), the sequence-parallel analog of SURVEY.md §5.7:
  views are independent through the UNet and only couple inside WarpAttn,
  where the bias-attention's KV gather rides the ICI.

No NCCL/MPI layer exists — `jax.distributed.initialize` + these axes replace
the whole thing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None
) -> Mesh:
    """Mesh over ("data", "model"). Default factorization puts the larger
    factor on "model" (ICI-heavy TP traffic stays on the faster axis)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        d = int(np.floor(np.sqrt(n)))
        while n % d:
            d -= 1
        shape = (d, n // d)
    if n == len(jax.devices()):
        # topology-aware layout: keeps the ICI-heavy "model" axis on
        # physically adjacent chips (a naive reshape can split it across
        # slow host/DCN links on real slices)
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_device_mesh(shape, devices=devices)
            return Mesh(arr, ("data", "model"))
        except Exception:
            pass  # fall back to the naive layout (virtual CPU devices)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding."""
    return NamedSharding(mesh, P("data"))


def batch_view_sharding(mesh: Mesh) -> NamedSharding:
    """(b, m, ...) arrays: batch over data, views over model."""
    return NamedSharding(mesh, P("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh, min_size: int = 2**16):
    """Tensor-parallel param placement: shard the output-feature (last) axis
    of large kernels over "model"; replicate everything else.

    Applied post-init with jax.device_put; pjit then propagates the layout
    through the jitted step and inserts the collectives.
    """
    axis = mesh.shape["model"]

    def place(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % axis == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, params)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on the mesh: leading dim over "data", the
    view dim (if present as axis 1 of >=5D arrays) over "model".

    Axes that don't divide their mesh axis (e.g. the pano's singleton
    view dim) replicate instead; non-array leaves (prompt strings) pass
    through untouched."""
    data_ax = mesh.shape["data"]
    model_ax = mesh.shape["model"]

    def place(x):
        if not hasattr(x, "ndim") or not hasattr(x, "shape"):
            return x  # strings / scalars from the collate
        dims = [None] * x.ndim
        if x.ndim >= 1 and x.shape[0] % data_ax == 0:
            dims[0] = "data"
        if x.ndim >= 5 and x.shape[1] % model_ax == 0:
            dims[1] = "model"
        return jax.device_put(x, NamedSharding(mesh, P(*dims)))

    return jax.tree.map(place, batch)
