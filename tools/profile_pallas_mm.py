"""Probe: does a hand-written Pallas int8 matmul reach the v5e MXU int8
path (~394 TOP/s, 2x bf16)?

Round-1 measured XLA int8 as a dead end (conv 2.5x slower, matmul 1.09x) —
but that verdict applies to XLA's lowering, not the hardware.  This probe
times a minimal Pallas tiled matmul at an ideal MXU shape in bf16 vs int8
to decide whether an int8 conv-trunk kernel is worth building
(VERDICT.md round-1 next-step 1b).

Timing uses the axon methodology (BENCHLOG.md): chain R reps inside one
jit with a data-dependent carry, fetch a scalar, difference two R values.
Run WITHOUT JAX_PLATFORMS=cpu.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, K, N = 8192, 2048, 2048
BM = 512
macs = M * K * N


def make_pallas_mm(dtype, out_dtype):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dtype,
        )

    return pl.pallas_call(
        kernel,
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )


def dev_time(name, body, x0, x1, r1=10, r2=200, reps=3):
    """Chained-op timing with DISTINCT warmup vs timed inputs (the axon
    tunnel dedupes identical dispatches) and a large rep spread so the
    ~30 ms sync jitter is small against the signal; median of ``reps``."""
    import statistics

    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(partial(
            lambda r, x: jax.lax.fori_loop(0, r, lambda i, x: body(x), x), r))
        float(jnp.sum(jnp.abs(fs[r](x0).astype(jnp.float32))))  # warm + sync
    deltas = []
    for _ in range(reps):
        ts = {}
        for r in (r1, r2):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(fs[r](x1).astype(jnp.float32))))
            ts[r] = time.perf_counter() - t0
        deltas.append((ts[r2] - ts[r1]) / (r2 - r1) * 1e3)
    dt = statistics.median(deltas)
    print(f"{name:40s} {dt:7.3f} ms  "
          f"T(FL)OP/s={2 * macs / (dt / 1e3) / 1e12:6.1f}  "
          f"(deltas {['%.3f' % d for d in deltas]})", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    b_f = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    b_i = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    mm_bf16 = make_pallas_mm(jnp.bfloat16, jnp.float32)
    mm_int8 = make_pallas_mm(jnp.int8, jnp.int32)

    a_f = jnp.asarray(rng.standard_normal((M, K)) * 0.02, jnp.bfloat16)
    a_f2 = jnp.asarray(rng.standard_normal((M, K)) * 0.02, jnp.bfloat16)
    dev_time("pallas bf16 mm 8192x2048x2048",
             lambda a: (mm_bf16(a, b_f) * 0.01).astype(jnp.bfloat16),
             a_f, a_f2)

    a_i = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    a_i2 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    dev_time("pallas int8 mm 8192x2048x2048",
             lambda a: (mm_int8(a, b_i) >> 12).astype(jnp.int8), a_i, a_i2)

    # XLA reference points on the same shapes.
    dev_time("xla bf16 mm",
             lambda a: ((a @ b_f) * 0.01).astype(jnp.bfloat16), a_f, a_f2)
    dev_time("xla int8 mm",
             lambda a: (jax.lax.dot_general(
                 a, b_i, (((1,), (0,)), ((), ())),
                 preferred_element_type=jnp.int32) >> 12).astype(jnp.int8),
             a_i, a_i2)


if __name__ == "__main__":
    main()
