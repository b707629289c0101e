"""Pallas TPU kernel: per-lane arena row gather.

``gather_rows(arr [B, N, K], idx [B]) -> [B, K]`` — each batch lane reads
row ``idx[b]`` of its own arena.  XLA lowers this access pattern to
serialized ~1-2 us/row DMAs (see BENCHLOG.md), and the production search
avoids it with one-hot einsum sweeps that read the whole arena.  This kernel
instead uses ``PrefetchScalarGridSpec``: the row indices are prefetched into
SMEM before the grid runs, so each grid step can DMA exactly the rows it
needs from HBM — O(B*K) bytes of traffic instead of O(B*N*K).

The kernel processes ``LANES_PER_STEP`` lanes per grid step with the row
DMAs issued back-to-back and pipelined by Mosaic's double buffering.

Measured verdict (tools/profile_gather_pallas.py, v5e, [1024, 801, 128]
f32): ~1.96 ms/call — the same ~2 us/row DMA-issue floor the XLA gather
hits.  Per-lane row DMA cost is intrinsic to the hardware, not an XLA
artifact, so `mcts/search.py` keeps the one-hot einsum sweeps (bandwidth-
bound, ~0.1-0.3 ms for the same access) as the production formulation.
This kernel remains as a validated building block for cases with much
larger K (where O(B*K) DMA traffic beats O(B*N*K) sweeps).

Note: on real TPU the row length K must be a multiple of 128 (VMEM lane
tiling); interpret mode has no such restriction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES_PER_STEP = 8


def _kernel(idx_ref, arr_ref, out_ref, scratch, sems):
    """Grid dim 0 walks lane blocks; arr stays in HBM (manual DMA)."""
    step = pl.program_id(0)

    def issue(i, slot):
        lane = step * LANES_PER_STEP + i
        row = idx_ref[lane]
        return pltpu.make_async_copy(
            arr_ref.at[lane, row],  # [K] row in HBM
            scratch.at[slot],
            sems.at[slot],
        )

    # Issue all row DMAs for this block, then drain in order.
    for i in range(LANES_PER_STEP):
        issue(i, i).start()
    for i in range(LANES_PER_STEP):
        issue(i, i).wait()
        out_ref[i, :] = scratch[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(arr: jax.Array, idx: jax.Array,
                interpret: bool = False) -> jax.Array:
    """arr [B, N, K] (any float dtype), idx [B] int32 -> [B, K]."""
    B, N, K = arr.shape
    if B % LANES_PER_STEP:
        raise ValueError(f"B={B} must be a multiple of {LANES_PER_STEP}")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // LANES_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # arr stays in HBM
        out_specs=pl.BlockSpec(
            (LANES_PER_STEP, K),
            lambda step, idx_ref: (step, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((LANES_PER_STEP, K), arr.dtype),
            pltpu.SemaphoreType.DMA((LANES_PER_STEP,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, K), arr.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32), arr)
