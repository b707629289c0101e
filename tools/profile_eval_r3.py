"""Round-3 NN-eval profiling at the wave-step leaf-batch shape.

The round-2 trace (tools/profile_trace.py) showed the chunked int8 lax.map
is ~75% of the wave step (19.9 of 26.5 ms at B*W=16384): per 512-chunk
0.62 ms, of which only ~0.3 ms is conv — the rest is requant clamp passes
and per-iteration f32[64] constant re-staging inside the while loop.

This tool times eval variants directly at [16384, 11, 15, 15] bf16:
  map512 / map1024   — lax.map chunks (production today)
  unroll512/1024/2048 — python-unrolled chunk loop inside ONE jit
  mono               — single 16384 pass
  bf16-unroll1024    — folded bf16 for comparison

Methodology: distinct operands per call (iteration scalar rolls the batch
inside jit) + scalar-reduced outputs accumulated through a dependency
chain; one host fetch at the end.  Run on the real chip from /root/repo:
  python tools/profile_eval_r3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.models.resnet import (  # noqa: E402
    AZResNet, ResNetConfig, fold_batch_norm,
)
from alphazero_tpu.models import quant as Q  # noqa: E402

TOT = int(os.environ.get("PROF_TOTAL", str(16384)))
REPS = int(os.environ.get("PROF_REPS", "24"))

env = registry.create_game("gomoku", 15)
model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
params = model.init(jax.random.key(0),
                    jnp.zeros((1,) + env.observation_shape, jnp.float32))
calib = jax.vmap(env.observation)(
    jax.vmap(lambda _: env.init())(jnp.arange(8)))

fp = Q.extract_folded(model, params)
scales = Q.calibrate(fp, [calib])
qp = Q.quantize(fp, scales)

# A realistic obs batch: random plausible planes.
key = jax.random.key(1)
obs = jax.random.bernoulli(key, 0.3, (TOT, 11, 15, 15)).astype(jnp.bfloat16)


def time_fn(fn, label):
    f = jax.jit(fn)
    s = f(obs, jnp.int32(0))  # compile
    float(s)
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(REPS):
        acc = acc + f(obs, jnp.int32(i + 1))
    float(acc)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:22s} {dt*1e3:8.3f} ms  ({dt/TOT*1e9:6.1f} ns/obs)",
          flush=True)
    return dt


def reduce_out(logits, value):
    return (jnp.sum(logits.astype(jnp.float32) * 1e-6)
            + jnp.sum(value)).astype(jnp.float32)


def quant_in(o, c):
    o = jnp.roll(o, c, axis=0)  # distinct operand per rep
    x = jnp.transpose(o.astype(jnp.float32), (0, 2, 3, 1))
    return Q._quant_act(x, qp["in_scale"])


def make_map(chunk):
    def fn(o, c):
        xq = quant_in(o, c)
        chunks = xq.reshape((TOT // chunk, chunk) + xq.shape[1:])
        lg, vl = jax.lax.map(lambda q: Q.forward_int8_from_q(qp, q), chunks)
        return reduce_out(lg.reshape(TOT, -1), vl.reshape(TOT))
    return fn


def make_unroll(chunk):
    def fn(o, c):
        xq = quant_in(o, c)
        outs = []
        for i in range(TOT // chunk):
            outs.append(Q.forward_int8_from_q(
                qp, jax.lax.dynamic_slice_in_dim(xq, i * chunk, chunk, 0)))
        lg = jnp.concatenate([a for a, _ in outs])
        vl = jnp.concatenate([b for _, b in outs])
        return reduce_out(lg, vl)
    return fn


def mono(o, c):
    xq = quant_in(o, c)
    lg, vl = Q.forward_int8_from_q(qp, xq)
    return reduce_out(lg, vl)


def make_bf16_unroll(chunk):
    def fn(o, c):
        o = jnp.roll(o, c, axis=0)
        outs = []
        for i in range(TOT // chunk):
            outs.append(Q.forward_bf16(
                fp, jax.lax.dynamic_slice_in_dim(o, i * chunk, chunk, 0)))
        lg = jnp.concatenate([a for a, _ in outs])
        vl = jnp.concatenate([b for _, b in outs])
        return reduce_out(lg, vl)
    return fn


print(f"TOT={TOT} reps={REPS}")
time_fn(make_map(512), "int8 map512 (prod)")
time_fn(make_map(1024), "int8 map1024")
time_fn(make_unroll(512), "int8 unroll512")
time_fn(make_unroll(1024), "int8 unroll1024")
time_fn(make_unroll(2048), "int8 unroll2048")
time_fn(mono, "int8 mono16384")
time_fn(make_bf16_unroll(1024), "bf16 unroll1024")
