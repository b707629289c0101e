"""Decompose the int8 inference forward (models/quant.forward_int8) on the
real chip: full model vs trunk-only vs no-SE vs no-heads, plus per-component
estimates.  Uses the chained-loop dev_time methodology (see BENCHLOG
"Axon timing caveat")."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig
from alphazero_tpu.models import quant

B = int(os.environ.get("PROF_BATCH", "1024"))


def dev_time(name, body, x0, x1, r1=5, r2=50, reps=3):
    import statistics

    fs = {}
    for r in (r1, r2):
        fs[r] = jax.jit(partial(
            lambda r, x: jax.lax.fori_loop(
                0, r, lambda i, x: body(x), x), r))
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
    print(f"{name:40s} {dt:7.3f} ms", flush=True)
    return dt


def main():
    env = GomokuEnv(board_size=15)
    model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1,) + env.observation_shape,
                                       jnp.float32))
    fp = quant.extract_folded(model, params)
    calib = jax.vmap(env.observation)(
        jax.vmap(lambda _: env.init())(jnp.arange(8)))
    scales = quant.calibrate(fp, [calib.astype(jnp.float32)])
    qp = quant.quantize(fp, scales)

    rngnp = np.random.default_rng(0)
    C, H, W = env.observation_shape
    obs0 = jnp.asarray(rngnp.random((B, C, H, W)), jnp.float32)
    obs1 = jnp.asarray(rngnp.random((B, C, H, W)), jnp.float32)

    # obs -> obs chained loop: route the logits back into the obs so the
    # loop is data-dependent (prevents dedupe in the axon tunnel).
    def chain(fwd):
        def body(o):
            logits, value = fwd(o)
            d = (jnp.mean(logits) + jnp.mean(value)).astype(jnp.float32)
            return o + d * 1e-9
        return body

    dev_time("full int8 forward", chain(lambda o: quant.forward_int8(qp, o)),
             obs0, obs1)

    # Trunk only (convs + requant + SE + residual), heads replaced by sums.
    def trunk_only(o):
        x = jnp.transpose(o.astype(jnp.float32), (0, 2, 3, 1))
        xq = quant._quant_act(x, qp["in_scale"])
        st = qp["stem"]
        y = (quant._conv_i8(xq, st["wq"]).astype(jnp.float32) * st["m"]
             + st["bias"])
        a = jax.nn.relu(y).astype(jnp.bfloat16)
        aq = quant._quant_act(a, st["out_scale"])
        for blk in qp["blocks"]:
            h = (quant._conv_i8(aq, blk["wq1"]).astype(jnp.float32)
                 * blk["m1"] + blk["b1"])
            hq = quant._quant_act(jax.nn.relu(h), blk["mid_scale"])
            h2 = (quant._conv_i8(hq, blk["wq2"]).astype(jnp.float32)
                  * blk["m2"] + blk["b2"]).astype(jnp.bfloat16)
            a = jax.nn.relu(a + h2 * quant._se_gate(h2, blk["se1"],
                                                    blk["se2"]))
            aq = quant._quant_act(a, blk["out_scale"])
        return jnp.sum(a, axis=(1, 2)), jnp.mean(a, axis=(1, 2, 3))

    dev_time("trunk only (no heads)", chain(trunk_only), obs0, obs1)

    # Trunk without SE (straight residual).
    def trunk_nose(o):
        x = jnp.transpose(o.astype(jnp.float32), (0, 2, 3, 1))
        xq = quant._quant_act(x, qp["in_scale"])
        st = qp["stem"]
        y = (quant._conv_i8(xq, st["wq"]).astype(jnp.float32) * st["m"]
             + st["bias"])
        a = jax.nn.relu(y).astype(jnp.bfloat16)
        aq = quant._quant_act(a, st["out_scale"])
        for blk in qp["blocks"]:
            h = (quant._conv_i8(aq, blk["wq1"]).astype(jnp.float32)
                 * blk["m1"] + blk["b1"])
            hq = quant._quant_act(jax.nn.relu(h), blk["mid_scale"])
            h2 = (quant._conv_i8(hq, blk["wq2"]).astype(jnp.float32)
                  * blk["m2"] + blk["b2"]).astype(jnp.bfloat16)
            a = jax.nn.relu(a + h2)
            aq = quant._quant_act(a, blk["out_scale"])
        return jnp.sum(a, axis=(1, 2)), jnp.mean(a, axis=(1, 2, 3))

    dev_time("trunk without SE", chain(trunk_nose), obs0, obs1)

    # Pure conv chain: int8 conv + >>7 requant only (no f32 epilogue).
    wq = qp["blocks"][0]["wq1"]

    def conv_chain(xq):
        for _ in range(13):
            y = quant._conv_i8(xq, wq)
            xq = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
        return xq

    xq0 = jnp.asarray(rngnp.integers(-127, 128, (B, H, W, 64)), jnp.int8)
    xq1 = jnp.asarray(rngnp.integers(-127, 128, (B, H, W, 64)), jnp.int8)
    dev_time("13x int8 conv + shift requant", conv_chain, xq0, xq1)

    # f32-epilogue conv chain: conv + f32 scale/bias/relu/quant (the
    # production epilogue) to isolate epilogue cost.
    m = qp["blocks"][0]["m1"]
    b = qp["blocks"][0]["b1"]

    def conv_chain_f32(xq):
        for _ in range(13):
            y = quant._conv_i8(xq, wq).astype(jnp.float32) * m + b
            xq = quant._quant_act(jax.nn.relu(y), 4.0)
        return xq

    dev_time("13x int8 conv + f32 requant", conv_chain_f32, xq0, xq1)

    # Heads only.
    a0 = jnp.asarray(rngnp.random((B, H, W, 64)), jnp.bfloat16)
    a1 = jnp.asarray(rngnp.random((B, H, W, 64)), jnp.bfloat16)

    def heads_body(a):
        logits, value = quant._heads(qp, a)
        d = (jnp.mean(logits) + jnp.mean(value)).astype(jnp.bfloat16)
        return a + d * 1e-6

    dev_time("heads only", heads_body, a0, a1)


if __name__ == "__main__":
    main()
