"""Multi-host SPMD initialization.

Replaces the reference's process-level scale-out
(``python/scripts/orchestrate_selfplay.py:303-400``: subprocess spawn, game
sharding, core pinning, filesystem merge) with ``jax.distributed`` + one
global mesh: every host runs the same program; the game batch and learner
batch shard over the global ``data`` axis; weights replicate via ICI
collectives inserted by XLA.  There is no inter-process filesystem protocol
to replace — device arrays ARE the transport (SURVEY.md §2.8/§5).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("alphazero_tpu.distributed")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  No-ops on a single process.  On TPU pods
    the arguments are auto-detected from the environment."""
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if explicit or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )


def host_local_batch(global_batch: int) -> int:
    """This host's slice of a globally sharded batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} % {n} hosts != 0")
    return global_batch // n


def make_global_array(local_array, mesh, pspec):
    """Assemble per-host shards into one global sharded array (the
    device-array replacement for orchestrate_selfplay's JSON merge)."""
    from jax.sharding import NamedSharding

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), local_array
    )
