"""Probe: int8 conv formulations for the bench trunk shape (v5e).

profile_pallas_mm.py (round 2, fixed timing) showed XLA int8 *matmuls* run
at ~369 TOP/s (1.9x bf16) — the round-1 "int8 is a dead end" verdict was a
timing artifact for matmuls; only XLA's CONV lowering is slow in int8.
So: express the 3x3 conv as matmuls and measure.

Variants @ [1024, 15, 15, 64] (the bench trunk shape):
  1. XLA bf16 conv (baseline)
  2. XLA int8 conv (known-bad reference point)
  3. int8 9-tap: pad + 9 shifted [BHW,64]x[64,64] matmuls, int32 accum
  4. int8 im2col: concat 9 taps -> one [BHW,576]x[576,64] matmul
  5. bf16 9-tap (formulation cost without the int8 win)
Each includes a requant (>>7 + int8 cast) so chaining is realistic.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 1024, 15, 15, 64
macs = B * H * W * 9 * C * C


def dev_time(name, body, x0, x1, r1=10, r2=200, reps=3):
    import statistics

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
    print(f"{name:44s} {dt:7.3f} ms  "
          f"T(FL)OP/s={2 * macs / (dt / 1e3) / 1e12:6.1f}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)
    x_f2 = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)
    w_f = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    x_i2 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)

    conv = lambda x: jax.lax.conv_general_dilated(  # noqa: E731
        x, w_f, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    dev_time("1. xla bf16 conv",
             lambda x: jnp.tanh(conv(x)).astype(jnp.bfloat16), x_f, x_f2)

    def conv_i8(x):
        y = jax.lax.conv_general_dilated(
            x, w_i, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y >> 7).astype(jnp.int8)

    dev_time("2. xla int8 conv", conv_i8, x_i, x_i2)

    def taps9(x, w, acc_dtype):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, C), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (B, H, W, C))
                acc = acc + jax.lax.dot_general(
                    sl.reshape(B * H * W, C), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype,
                ).reshape(B, H, W, C)
        return acc

    dev_time("3. int8 9-tap matmuls",
             lambda x: (taps9(x, w_i, jnp.int32) >> 7).astype(jnp.int8),
             x_i, x_i2)

    def im2col(x, w, acc_dtype):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate([
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            for dy in range(3) for dx in range(3)
        ], axis=-1)  # [B, H, W, 9C]
        return jax.lax.dot_general(
            cols.reshape(B * H * W, 9 * C), w.reshape(9 * C, C),
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        ).reshape(B, H, W, C)

    dev_time("4. int8 im2col matmul",
             lambda x: (im2col(x, w_i, jnp.int32) >> 7).astype(jnp.int8),
             x_i, x_i2)

    dev_time("5. bf16 9-tap matmuls",
             lambda x: jnp.tanh(taps9(x, w_f, jnp.float32)).astype(jnp.bfloat16),
             x_f, x_f2)


if __name__ == "__main__":
    main()


def extra():
    """Variant 6/7: realistic requant epilogues (what the quantized trunk
    will actually run)."""
    rng = np.random.default_rng(1)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    x_i2 = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (3, 3, C, C)), jnp.int8)
    scale = jnp.asarray(rng.standard_normal(C) * 1e-4 + 1e-3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)

    def conv_raw(x):
        return jax.lax.conv_general_dilated(
            x, w_i, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    def conv_requant(x):
        y = conv_raw(x).astype(jnp.float32) * scale + bias
        y = jnp.maximum(y, 0.0)
        return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

    dev_time("6. int8 conv + f32 requant epilogue", conv_requant, x_i, x_i2)

    xb = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)
    xb2 = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.1, jnp.bfloat16)

    def block(xpair):
        # residual block: q(x) -> conv1 -> requant -> conv2 -> dequant bf16
        # -> SE gate (bf16) -> + residual -> relu -> next (bf16, int8)
        x_bf = xpair
        xq = jnp.clip(jnp.round(x_bf.astype(jnp.float32) * 127.0),
                      -127, 127).astype(jnp.int8)
        h = conv_requant(xq)
        h2 = conv_raw(h).astype(jnp.float32) * scale + bias  # dequant
        h2 = h2.astype(jnp.bfloat16)
        gate = jax.nn.sigmoid(jnp.mean(h2, axis=(1, 2)))[:, None, None, :]
        out = jnp.maximum(x_bf + h2 * gate, 0)
        return out.astype(jnp.bfloat16)

    global macs
    macs_save = macs
    macs = macs * 2  # two convs per block
    dev_time("7. full int8 residual block (2 convs+SE)", block, xb, xb2)
    macs = macs_save


extra()
