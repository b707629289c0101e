"""Probe: int8 vs bf16 at the bench conv shape (v5e).  NEGATIVE RESULT.

v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8.  Measured (see BENCHLOG.md):
bf16 conv 3x3 64->64 @ B=1024 15x15 runs at ~78% of peak; the same conv on
int8 inputs is 2.5x SLOWER (XLA does not use the MXU int8 path for convs),
and even an ideal-shape int8 matmul is only ~1.09x bf16.  int8 inference is
not a lever without hand-written Pallas kernels.

Timing methodology matters on the tunneled ``axon`` platform:
``block_until_ready`` does not force execution there — only a host fetch
does — and identical-input rep loops report impossibly high throughput.
``dev_time`` chains the op R times inside one jit (data-dependent), fetches
a scalar, and differences two R values to cancel the ~30 ms sync latency.
Run WITHOUT JAX_PLATFORMS=cpu.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 1024, 15, 15, 64
macs_conv = B * H * W * 9 * C * C


def dev_time(name, body, x0, macs, r1=20, r2=120):
    """Median device time of ``body`` chained inside one jit."""
    ts = {}
    for r in (r1, r2):
        f = jax.jit(partial(
            lambda r, x: jax.lax.fori_loop(0, r, lambda i, x: body(x), x), r))
        float(jnp.sum(jnp.abs(f(x0).astype(jnp.float32))))  # warm + sync
        t0 = time.perf_counter()
        float(jnp.sum(jnp.abs(f(x0).astype(jnp.float32))))
        ts[r] = time.perf_counter() - t0
    dt = (ts[r2] - ts[r1]) / (r2 - r1) * 1e3
    print(f"{name:44s} {dt:7.3f} ms  TFLOP/s={2*macs/(dt/1e3)/1e12:6.1f}",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)
    w_f = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

    conv = lambda x: jax.lax.conv_general_dilated(  # noqa: E731
        x, w_f, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dev_time("bf16 conv 3x3 64->64", lambda x: jnp.tanh(conv(x)), x_f,
             macs_conv)

    def conv_i8(x):
        y = jax.lax.conv_general_dilated(
            x, w_i, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y >> 9).astype(jnp.int8)  # requantize

    dev_time("int8 conv 3x3 64->64 (+requant)", conv_i8, x_i, macs_conv)

    a_f = jnp.asarray(rng.standard_normal((8192, 2048)) * 0.02, jnp.bfloat16)
    b_f = jnp.asarray(rng.standard_normal((2048, 2048)) * 0.02, jnp.bfloat16)
    macs_mm = 8192 * 2048 * 2048
    dev_time("bf16 big matmul 8192x2048x2048",
             lambda a: jnp.tanh(a @ b_f), a_f, macs_mm, 5, 30)

    a_i = jnp.asarray(rng.integers(-127, 127, (8192, 2048)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 127, (2048, 2048)), jnp.int8)

    def mm_i8(a):
        y = jax.lax.dot_general(a, b_i, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y >> 12).astype(jnp.int8)

    dev_time("int8 big matmul 8192x2048x2048 (+requant)", mm_i8, a_i,
             macs_mm, 5, 30)


if __name__ == "__main__":
    main()
