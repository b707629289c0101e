"""Probe: MXU utilization of Pallas s8 dots at the fused-trunk conv shapes.

The fused residual-block kernel (ops/fused_resnet.py) formulates the 3x3
conv as tap-pair matmuls [M, 128] x [128, 64] (K-paired taps fill the
MXU contraction depth; C=64 leaves half the output lanes).  Question: what
TOP/s does Mosaic deliver at N=64 vs N=128, and how does that compare to
XLA's native int8 conv (measured 333 TOP/s-equivalent at the bench trunk
shape)?  Decides the kernel's formulation before building it.

Run on the real chip (no JAX_PLATFORMS=cpu).
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


def dev_time(name, body, x0, x1, macs, r1=10, r2=200, reps=3):
    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(partial(
            lambda r, x: jax.lax.fori_loop(0, r, lambda i, x: body(x), x), r))
        float(jnp.sum(jnp.abs(fs[r](x0).astype(jnp.float32))))
    deltas = []
    for _ in range(reps):
        ts = {}
        for r in (r1, r2):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(fs[r](x1).astype(jnp.float32))))
            ts[r] = time.perf_counter() - t0
        deltas.append((ts[r2] - ts[r1]) / (r2 - r1) * 1e3)
    dt = statistics.median(deltas)
    print(f"{name:44s} {dt:7.4f} ms  "
          f"TOP/s={2 * macs / (dt / 1e3) / 1e12:6.1f}", flush=True)
    return dt


def pallas_mm(M, K, N, BM):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return pl.pallas_call(
        kernel,
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )


def pallas_mm_multi(M, K, N, BM, taps):
    """One grid step runs ``taps`` accumulated dots (the conv inner loop
    shape: same a-tile, taps different weights)."""
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((BM, N), jnp.int32)
        for t in range(taps):
            acc = acc + jax.lax.dot_general(
                a_ref[:], b_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, K, N), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
    )


def main():
    rng = np.random.default_rng(0)
    M = 14400  # TB=64 x 15 x 15

    for K, N, BM in [(128, 64, 3600), (128, 128, 3600),
                     (576, 64, 3600), (640, 128, 1800)]:
        a0 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        a1 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        mm = pallas_mm(M, K, N, BM)

        def body(a, mm=mm, b=b, K=K, N=N):
            d = (mm(a, b) >> 12).astype(jnp.int8)
            return a + jnp.concatenate([d] * (K // N), axis=1)

        dev_time(f"pallas s8 mm {M}x{K}x{N}", body, a0, a1, M * K * N)

    # The actual conv inner-loop shape: 5 tap-pair dots accumulated.
    K, N, BM, taps = 128, 64, 3600, 5
    a0 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    a1 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (taps, K, N)), jnp.int8)
    mm = pallas_mm_multi(M, K, N, BM, taps)

    def body5(a):
        d = (mm(a, b) >> 12).astype(jnp.int8)
        return a + jnp.concatenate([d] * (K // N), axis=1)

    dev_time(f"pallas s8 5-tap-pair acc {M}x{K}x{N}", body5, a0, a1,
             taps * M * K * N)

    # XLA native int8 conv reference at the fused-chunk shape (TB=512).
    B, H, W, C = 512, 15, 15, 64
    x0 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    x1 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    def conv(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y >> 12).astype(jnp.int8)

    dev_time(f"xla native s8 conv {B}x{H}x{W}x{C}",
             lambda x: conv(x), x0, x1, B * H * W * C * C * 9)


if __name__ == "__main__":
    main()
