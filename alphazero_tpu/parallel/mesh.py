"""Device mesh + sharding layer.

The reference scales out with OS processes and filesystem JSON
(``python/scripts/orchestrate_selfplay.py:303-400,693``) and explicitly scopes
out distributed training (``PRD.md:40``).  The TPU-native replacement is one
SPMD program over a pod slice (SURVEY.md §2.8/§5): actor game-batches and
learner data-batches shard over the mesh ``data`` axis; the small CNN's
params replicate (a ``model`` axis exists for forward-compatible tensor
parallelism of bigger trunks); gradients all-reduce over ICI via the
collectives XLA inserts from sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallelism: int = 1,
) -> Mesh:
    """(data, model) mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallelism:
        raise ValueError(
            f"{n} devices not divisible by model_parallelism={model_parallelism}"
        )
    arr = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over data (batch of games / samples)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host pytree with its leading axis sharded over ``data``.
    Leaves whose leading axis is not divisible by the data-axis size are
    replicated instead (tiny debug batches on big meshes still work; GSPMD
    then runs them unsharded)."""
    sh = data_sharding(mesh)
    repl = replicated(mesh)
    n = mesh.shape[DATA_AXIS]

    def put(x):
        if not (hasattr(x, "ndim") and x.ndim):
            return x
        return jax.device_put(x, sh if x.shape[0] % n == 0 else repl)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"batch {global_batch} not divisible by {n} devices")
    return global_batch // n
