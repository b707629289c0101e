"""Chip duty-cycle + achieved-TOPS figure for the bench step (VERDICT r4
weak #7: SURVEY §7 stage-4's ">=90% duty cycle" exit criterion was never
reported as a number).

Runs the production bench configuration (B games, 800 sims, W=16 waves,
production int8 executor) to steady state, traces a timed window with the
JAX profiler, and reports from the xplane dump:

  * duty cycle: TPU sync-op busy time / host wall time of the window,
  * engine/NN split: convolution-family op time vs everything else,
  * achieved int8 TOPS in the conv chain: analytic conv MACs per wave
    step / measured conv device time, vs the v5e peak (394.7 int8 TOPS)
    — i.e. MXU MFU for the NN portion,
  * (context) the conv chain is HBM-bandwidth-bound at this geometry
    (BENCHLOG rounds 3-4), so conv-TOPS MFU is expected to be low while
    duty cycle is the criterion that matters.

Usage (real chip):  python tools/profile_mfu.py
Env: MFU_BATCH (1024), MFU_SIMS (800), MFU_MOVES (4), MFU_TRACE
(/tmp/jaxtrace_mfu).  Appends a JSON record to docs/mfu.json.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alphazero_tpu.utils.platform import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_INT8_TOPS_PEAK = 394.7  # per chip (public v5e spec)


def conv_macs_per_obs(cfg, obs_shape, num_actions):
    """Analytic MAC count of the quantized conv chain for ONE observation
    (trunk 3x3 convs + 1x1 head convs; SE/dense excluded — they run bf16
    and are ~6% of FLOPs)."""
    C_in, H, W = obs_shape
    ch = cfg.channels
    macs = H * W * 9 * C_in * ch  # stem
    macs += cfg.num_blocks * 2 * H * W * 9 * ch * ch
    macs += H * W * ch * (cfg.policy_channels + cfg.value_channels)
    return macs


def main():
    batch = int(os.environ.get("MFU_BATCH", "1024"))
    sims = int(os.environ.get("MFU_SIMS", "800"))
    moves = int(os.environ.get("MFU_MOVES", "4"))
    trace_dir = os.environ.get("MFU_TRACE", "/tmp/jaxtrace_mfu")

    from alphazero_tpu import production
    from alphazero_tpu.core import registry
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.quant import (
        make_int8_eval_fn,
        make_rollout_calib_fn,
    )
    from alphazero_tpu.models.resnet import (
        AZResNet,
        ResNetConfig,
        make_inference_eval_fn,
    )
    from alphazero_tpu.selfplay.actor import SelfPlayConfig, make_host_actor

    env = registry.create_game("gomoku", 15)
    model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
    params = model.init(
        jax.random.key(0), jnp.zeros((1,) + env.observation_shape,
                                     jnp.float32)
    )
    calib = make_rollout_calib_fn(
        env, make_inference_eval_fn(model, params),
        n=production.CALIB_GAMES, plies=production.CALIB_PLIES,
        every=production.CALIB_EVERY,
    )(None, jax.random.key(7))
    eval_fn = make_int8_eval_fn(
        model, params, calib_obs=calib, chunk=production.INT8_CHUNK,
        residual=production.INT8_RESIDUAL, heads=production.INT8_HEADS,
        calib_percentile=production.INT8_CALIB_PERCENTILE,
    )
    config = SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=sims, wave_size=16),
        max_moves=64,
    )
    step, init_states = make_host_actor(env, eval_fn, config, batch)

    if os.environ.get("MFU_MIDGAME", "0") == "1":
        # Midgame regime (bench's sustained figure): advance 40 plies by
        # cheap policy sampling before tracing.
        from alphazero_tpu.mcts.search import masked_softmax

        @jax.jit
        def policy_move(states, rng):
            obs = jax.vmap(env.observation)(states)
            logits, _ = eval_fn(obs, jax.vmap(env.to_play)(states))
            legal = jax.vmap(env.legal_mask)(states)
            probs = masked_softmax(logits, legal)
            acts = jax.random.categorical(rng, jnp.log(probs + 1e-9))
            return jax.vmap(env.step)(states, acts.astype(jnp.int32))

        for i in range(40):
            init_states = policy_move(init_states, jax.random.key(500 + i))
        jax.block_until_ready(init_states.move_count)

    # Warm up: compile + one full move.
    st, rec = step(init_states, jax.random.key(1))
    jax.block_until_ready(rec.action)

    # Traced steady-state window.
    if hasattr(step, "reset"):
        step.reset()
    st = init_states
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(moves):
            st, rec = step(st, jax.random.key(2 + i))
        jax.block_until_ready(rec.action)
        wall_s = time.perf_counter() - t0
    done_moves = batch * moves

    # ---- parse the xplane dump ------------------------------------------
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    busy_s = 0.0
    conv_s = 0.0
    fam_time = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                base = name.split(" = ")[0]
                if base.startswith(("%copy-start", "%slice-start",
                                    "%copy-done", "%slice-done")):
                    continue  # overlapped async DMA
                dur = ev.duration_ps / 1e12
                busy_s += dur
                fam = re.sub(r"\.\d+$", "", base)
                fam_time[fam] += dur
                if "convolution" in name or "conv" in fam:
                    conv_s += dur

    duty = busy_s / wall_s
    nn_frac = conv_s / busy_s if busy_s else 0.0

    # Conv work actually executed in the window: every simulation wave
    # evaluates B*W leaves; per move ceil(sims/16) waves ran, plus the
    # root evaluation batch of B.
    waves_per_move = -(-sims // 16)
    obs_evaluated = done_moves * (waves_per_move * 16 + 1)
    macs = conv_macs_per_obs(ResNetConfig(), env.observation_shape,
                             env.num_actions) * obs_evaluated
    conv_tops = 2 * macs / conv_s / 1e12 if conv_s else 0.0

    top = sorted(fam_time.items(), key=lambda kv: -kv[1])[:8]
    rec_out = {
        "regime": ("midgame" if os.environ.get("MFU_MIDGAME", "0") == "1"
                   else "opening"),
        "batch": batch, "sims": sims, "moves_timed": moves,
        "wall_s": round(wall_s, 3),
        "moves_per_s": round(done_moves / wall_s, 1),
        "device_busy_s": round(busy_s, 3),
        "duty_cycle": round(duty, 4),
        "conv_device_s": round(conv_s, 3),
        "nn_conv_fraction_of_busy": round(nn_frac, 4),
        "achieved_int8_tops_conv": round(conv_tops, 1),
        "v5e_int8_tops_peak": V5E_INT8_TOPS_PEAK,
        "conv_mxu_mfu": round(conv_tops / V5E_INT8_TOPS_PEAK, 4),
        "top_op_families_s": {k: round(v, 4) for k, v in top},
    }
    print(json.dumps(rec_out))
    out = "docs/mfu.json"
    hist = []
    if os.path.exists(out):
        with open(out) as f:
            hist = json.load(f)
    hist.append(rec_out)
    os.makedirs("docs", exist_ok=True)
    with open(out, "w") as f:
        json.dump(hist, f, indent=2)


if __name__ == "__main__":
    main()
