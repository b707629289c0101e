"""Isolate the Mosaic s8 dot rate at the fused-trunk tile shapes by
chaining R data-dependent dots INSIDE one pallas kernel (no XLA-side carry
traffic, no per-call overhead in the delta).  Differencing two R values
gives ns/dot -> TOP/s for the exact [BM, K] x [K, N] tile the fused
residual-block kernel would issue.

Run on the real chip.
"""
import time
import statistics
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chained_dot(BM, K, N, R, dtype=jnp.int8):
    """R chained dots: a' derives from acc so nothing folds away."""
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        def body(r, a):
            acc = jax.lax.dot_general(
                a, b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            # data dependence: derive next a from acc (cheap VPU).
            if dtype == jnp.int8:
                d = (acc >> 8).astype(jnp.int8)
            else:
                d = (acc * 0.001).astype(dtype)
            return jnp.concatenate([d] * (K // N), axis=1) if K != N else d

        a = jax.lax.fori_loop(0, R, body, a_ref[:])
        o_ref[:] = jax.lax.dot_general(
            a, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BM, N), acc_t),
    )


def sync(x):
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def probe(BM, K, N, dtype=jnp.int8, r1=50_000, r2=500_000, reps=3):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a0 = jnp.asarray(rng.integers(-127, 128, (BM, K)), jnp.int8)
        a1 = jnp.asarray(rng.integers(-127, 128, (BM, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    else:
        a0 = jnp.asarray(rng.standard_normal((BM, K)), dtype)
        a1 = jnp.asarray(rng.standard_normal((BM, K)), dtype)
        b = jnp.asarray(rng.standard_normal((K, N)), dtype)
    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(chained_dot(BM, K, N, r, dtype))
        sync(fs[r](a0, b))
    deltas = []
    for _ in range(reps):
        ts = {}
        for r in (r1, r2):
            t0 = time.perf_counter()
            sync(fs[r](a1, b))
            ts[r] = time.perf_counter() - t0
        deltas.append((ts[r2] - ts[r1]) / (r2 - r1) * 1e6)
    us = statistics.median(deltas)
    tops = 2 * BM * K * N / (us / 1e6) / 1e12
    name = "s8" if dtype == jnp.int8 else "bf16"
    print(f"{name} dot {BM}x{K}x{N}: {us:8.3f} us/dot  TOP/s={tops:6.1f}",
          flush=True)


if __name__ == "__main__":
    for shape in [(3600, 128, 64), (3600, 128, 128), (3600, 256, 128),
                  (1800, 640, 128), (3600, 640, 64), (7200, 128, 64),
                  (3600, 576, 64)]:
        probe(*shape)
    probe(3600, 128, 128, jnp.bfloat16)
    probe(3600, 128, 64, jnp.bfloat16)
