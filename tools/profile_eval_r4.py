"""Round-4 int8-eval decomposition at the production chunk shape.

profile_eval_r3 put the full int8 unroll512 eval at ~1337 ns/obs
(684 us per 512-chunk) while the 13-conv chain accounts for ~442 us —
a ~240 us/chunk non-conv margin.  This tool attributes it by timing
nested prefixes of forward_int8_from_q at [512, 15, 15, 64]:

  quant        — NCHW->NHWC transpose + input quantize only
  stem         — + stem conv + requant
  trunk-nose   — + 6 blocks WITHOUT SE gates (gate == 1)
  trunk        — + 6 blocks with SE gates (production trunk)
  full         — + heads (production eval)
  heads-i8     — full with int8 1x1 head convs

Differences between successive rows isolate each stage.  Methodology:
device-side fori_loop chains with a data-dependent carry (axon rules,
BENCHLOG), distinct warm/timed operands, median of reps.
Run on the real chip:  python tools/profile_eval_r4.py
"""
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.models import quant as Q  # noqa: E402
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig  # noqa: E402

B = 512


def build():
    env = registry.create_game("gomoku", 15)
    model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
    params = model.init(
        jax.random.key(0), jnp.zeros((1,) + env.observation_shape,
                                     jnp.float32))
    calib = jax.vmap(env.observation)(
        jax.vmap(lambda _: env.init())(jnp.arange(8)))
    qp = Q.build_quantized_params(model, params, calib)
    return env, qp


def stage_fn(qp, stage):
    """obs f32 NCHW [B,11,15,15] -> f32 scalar-ish output per stage."""

    def fn(obs):
        x = jnp.transpose(obs.astype(jnp.float32), (0, 2, 3, 1))
        xq = Q._quant_act(x, qp["in_scale"])
        if stage == "quant":
            return xq.astype(jnp.float32).sum()
        st = qp["stem"]
        y = (Q._conv_i8(xq, st["wq"]).astype(jnp.float32) * st["m"]
             + st["bias"])
        a = jax.nn.relu(y).astype(jnp.bfloat16)
        aq = jax.lax.optimization_barrier(
            Q._quant_act(a, st["out_scale"]))
        if stage == "stem":
            return aq.astype(jnp.float32).sum()
        s_prev = st["out_scale"]
        for blk in qp["blocks"]:
            h = (Q._conv_i8(aq, blk["wq1"]).astype(jnp.float32)
                 * blk["m1"] + blk["b1"])
            hq = Q._quant_act(jax.nn.relu(h), blk["mid_scale"])
            hq = jax.lax.optimization_barrier(hq)
            if stage == "trunk-nose":
                g = 1.0
            else:
                g = Q._se_gate_precomputed(hq, blk)
            h2 = (Q._conv_i8(hq, blk["wq2"]).astype(jnp.float32)
                  * blk["m2"] + blk["b2"]).astype(jnp.bfloat16)
            a_deq = aq.astype(jnp.bfloat16) * (
                jnp.asarray(s_prev, jnp.float32) / 127.0
            ).astype(jnp.bfloat16)
            a = jax.nn.relu(a_deq + h2 * g)
            aq = jax.lax.optimization_barrier(
                Q._quant_act(a, blk["out_scale"]))
            s_prev = blk["out_scale"]
        if stage in ("trunk", "trunk-nose"):
            return aq.astype(jnp.float32).sum()
        if stage == "heads-i8":
            logits, value = Q._heads_int8(qp, aq)
        else:
            logits, value = Q._heads(qp, a)
        return logits.sum() + value.sum()

    return fn


def dev_time(name, fn, obs0, obs1, r1=10, r2=60, reps=3):
    """Chain r reps inside one jit: carry a scalar that perturbs the obs
    so every iteration is data-dependent."""

    def chained(r, obs):
        def body(i, carry):
            s, o = carry
            out = fn(o + s * 1e-9)
            return out * 1e-20, o

        s, _ = jax.lax.fori_loop(0, r, body, (jnp.float32(0), obs))
        return s

    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(partial(chained, r))
        float(fs[r](obs0))
    deltas = []
    for _ in range(reps):
        ts = {}
        for r in (r1, r2):
            t0 = time.perf_counter()
            float(fs[r](obs1))
            ts[r] = time.perf_counter() - t0
        deltas.append((ts[r2] - ts[r1]) / (r2 - r1) * 1e6)
    us = statistics.median(deltas)
    print(f"{name:12s} {us:9.1f} us/chunk512", flush=True)
    return us


def main():
    env, qp = build()
    rng = np.random.default_rng(0)
    shape = (B,) + env.observation_shape
    obs0 = jnp.asarray(rng.random(shape) > 0.9, jnp.float32)
    obs1 = jnp.asarray(rng.random(shape) > 0.9, jnp.float32)

    rows = {}
    for stage in ("quant", "stem", "trunk-nose", "trunk", "full",
                  "heads-i8"):
        rows[stage] = dev_time(stage, stage_fn(qp, stage), obs0, obs1)

    print("\nattribution (us/chunk512):", flush=True)
    print(f"  input quantize : {rows['quant']:8.1f}")
    print(f"  stem conv      : {rows['stem'] - rows['quant']:8.1f}")
    print(f"  12 block convs : {rows['trunk-nose'] - rows['stem']:8.1f}")
    print(f"  SE gates       : {rows['trunk'] - rows['trunk-nose']:8.1f}")
    print(f"  heads bf16     : {rows['full'] - rows['trunk']:8.1f}")
    print(f"  heads int8     : {rows['heads-i8'] - rows['trunk']:8.1f}")
    print(f"  full           : {rows['full']:8.1f}")


if __name__ == "__main__":
    main()
