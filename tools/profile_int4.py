"""Probe: does XLA on v5e lower int4 convolutions to a faster MXU path?
Also re-measure forward cost vs chunk size (512/1024/2048) for the int8
trunk.  dev_time methodology: chain R data-dependent reps inside one jit,
fetch a scalar, difference two R values (see BENCHLOG axon timing caveat).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_DN = ("NHWC", "HWIO", "NHWC")


def dev_time(fn, x, r_lo=10, r_hi=110):
    def chain(x, r):
        def body(i, acc):
            y = fn(acc)
            # data dependence: feed a tiny function of y back in
            return acc + (y.astype(jnp.float32).ravel()[0] * 0).astype(acc.dtype)
        return lax.fori_loop(0, r, body, x)

    f_lo = jax.jit(lambda x: chain(x, r_lo))
    f_hi = jax.jit(lambda x: chain(x, r_hi))
    for f in (f_lo, f_hi):
        float(jnp.sum(f(x).astype(jnp.float32)))
    t = {}
    for name, f in (("lo", f_lo), ("hi", f_hi)):
        t0 = time.perf_counter()
        float(jnp.sum(f(x).astype(jnp.float32)))
        t[name] = time.perf_counter() - t0
    return (t["hi"] - t["lo"]) / (r_hi - r_lo) * 1e3  # ms per rep


B, H, Wd, C = 1024, 15, 15, 64
key = jax.random.key(0)
x8 = jax.random.randint(key, (B, H, Wd, C), -127, 127, jnp.int8)
w8 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)

def conv8(x):
    y = lax.conv_general_dilated(x, w8, (1, 1), "SAME",
                                 dimension_numbers=_DN,
                                 preferred_element_type=jnp.int32)
    # requant epilogue back to s8 so reps chain
    return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

print(f"int8 conv+requant {B}x{H}x{Wd}x{C}: {dev_time(conv8, x8):.4f} ms")

try:
    x4 = x8.astype(jnp.int4)
    w4 = w8.astype(jnp.int4)

    def conv4(x):
        y = lax.conv_general_dilated(x, w4, (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 3, -7, 7).astype(jnp.int4)

    print(f"int4 conv+requant: {dev_time(conv4, x4):.4f} ms")
except Exception as e:
    print("int4 conv failed:", type(e).__name__, str(e)[:200])

try:
    w4 = w8.astype(jnp.int4)

    def conv_w4a8(x):
        y = lax.conv_general_dilated(x, w4.astype(jnp.int8), (1, 1), "SAME",
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    print(f"w4(as s8)a8 conv: {dev_time(conv_w4a8, x8):.4f} ms")
except Exception as e:
    print("w4a8 failed:", type(e).__name__, str(e)[:200])

# ---- chunk-size sweep on the production int8 forward ----
from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig  # noqa: E402
from alphazero_tpu.models.quant import make_int8_eval_fn  # noqa: E402

env = registry.create_game("gomoku", 15)
model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
params = model.init(jax.random.key(0),
                    jnp.zeros((1,) + env.observation_shape, jnp.float32))
calib = jax.vmap(env.observation)(
    jax.vmap(lambda _: env.init())(jnp.arange(8)))

obs = jax.random.uniform(key, (16384,) + env.observation_shape, jnp.float32)
for chunk in (512, 1024, 2048, 4096):
    ev = make_int8_eval_fn(model, params, calib_obs=calib, chunk=chunk)

    def fwd(o):
        lg, val = ev(o, None)
        return lg

    jf = jax.jit(fwd)
    float(jnp.sum(jf(obs)))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(jf(obs)))
        times.append(time.perf_counter() - t0)
    t = min(times) * 1e3
    print(f"chunk={chunk}: {t:.2f} ms per 16384 forwards "
          f"({t/16:.3f} ms per 1024)")
