"""Self-play throughput benchmark (the north-star metric).

Measures moves/s/chip on Gomoku 15x15 with 800-simulation MCTS — the
reference's stock demo configuration (``data/games/proc_0/selfplay.log:1-16``:
800 sims, batch 8, FP16, 18 threads; its selfplay binary prints moves/sec,
``src/selfplay/selfplay_main.cpp:128-154``).

Two regimes, both measured every run (VERDICT r3 #9):
  * opening — the first 16 moves from the empty board (shallow trees,
    depth-biased upward); this is ``value`` for round-over-round
    comparability with BENCH_r01-r03.
  * midgame — the same 16 searched moves from positions advanced 40 plies
    by cheap policy sampling; the honest sustained figure, reported as
    ``midgame`` in the same JSON line.

Baselines (BASELINE.md): ``vs_baseline`` divides by the PRD-derived
40 moves/s (reference PRD.md:13 aspiration).  ``vs_reference_measured``
divides by the MEASURED throughput of the parity-patched reference
selfplay binary on this host's CPU when tools/parity/ has produced one
(tools/parity/reference_baseline.json), else is omitted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MOVES_PER_S = 40.0
REF_MEASURED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tools", "parity", "reference_baseline.json",
)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    sims = int(os.environ.get("BENCH_SIMS", "800"))
    moves = int(os.environ.get("BENCH_MOVES", "16"))
    reuse = os.environ.get("BENCH_REUSE", "0") == "1"
    # Default W=16 simulation waves (see MCTSConfig.wave_size) — the
    # reference's BATCHED self-play mode (its stock demo runs batch 8);
    # measured: W=1: 557, W=8: 753, W=16: 779 moves/s.
    wave = int(os.environ.get("BENCH_WAVE", "16"))
    game = os.environ.get("BENCH_GAME", "gomoku")
    board = int(os.environ.get("BENCH_BOARD", "15"))
    # "both" (default) | "opening" | "midgame"
    mode = os.environ.get("BENCH_MODE", "both")

    import jax

    # Persistent compilation cache: remote axon compiles run ~400s cold; the
    # cache makes repeat benches start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from alphazero_tpu.core import registry
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.models.resnet import (
        AZResNet,
        ResNetConfig,
        make_inference_eval_fn,
    )
    from alphazero_tpu.selfplay.actor import SelfPlayConfig, make_host_actor

    env = registry.create_game(game, board)
    model = AZResNet(num_actions=env.num_actions, cfg=ResNetConfig())
    rng = jax.random.key(0)
    params = model.init(
        rng, jnp.zeros((1,) + env.observation_shape, jnp.float32)
    )
    eval_params = None
    if os.environ.get("BENCH_EVAL", "") == "stub":
        # Engine-only decomposition: uniform evaluator, no NN.
        from alphazero_tpu.models.stub import make_uniform_eval_fn

        eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    elif os.environ.get("BENCH_INT8", "1") == "1":
        # int8 MXU trunk (models/quant.py): conv weights+activations
        # quantized, ~2x conv throughput on v5e; validated for argmax
        # agreement / logit correlation in tests/test_quant.py.  All
        # defaults come from alphazero_tpu/production.py — the ONE
        # executor configuration shared with the training Pipeline and
        # the A/B harness (pinned by tests/test_production.py).
        from alphazero_tpu import production
        from alphazero_tpu.models.quant import (
            make_int8_eval_fn,
            make_rollout_calib_fn,
        )
        from alphazero_tpu.models.resnet import make_inference_eval_fn

        # Mid-game rollout calibration (the production regime; VERDICT r4
        # weak #3 — the bench previously calibrated from 8 empty boards
        # with max-abs, the configuration measured -15 Elo).
        calib = make_rollout_calib_fn(
            env, make_inference_eval_fn(model, params),
            n=production.CALIB_GAMES, plies=production.CALIB_PLIES,
            every=production.CALIB_EVERY,
        )(None, jax.random.key(7))
        # BENCH_CHUNK: lax.map chunk for the NN leaf batch (0 = monolithic).
        # Sweep at B=1024/W=16: 512: 849, 1024: 821, 256: 826, 2048: 32.
        chunk = int(os.environ.get("BENCH_CHUNK",
                                   str(production.INT8_CHUNK)))
        # BENCH_CHUNK_MODE: "unroll" (python-unrolled chunk loop, default)
        # or "map" (lax.map) — see models/quant.make_int8_eval_fn.
        cmode = os.environ.get("BENCH_CHUNK_MODE", "unroll")
        # BENCH_QP_ARGS=1: quantized params as jit ARGUMENTS
        # (make_int8_eval_params) instead of baked trace constants.
        # Measured a big LOSS (547 vs 766 moves/s): the ~500 tiny
        # constant fusions per wave are cheaper than runtime staging, and
        # constant scales fold into the conv epilogues.  Default stays
        # constants; the params path exists for weight refreshes without
        # retracing (training-loop use).
        pct = float(os.environ.get(
            "BENCH_PCT", str(production.INT8_CALIB_PERCENTILE)))
        if os.environ.get("BENCH_QP_ARGS", "0") == "1":
            from alphazero_tpu.models.quant import make_int8_eval_params

            eval_fn, eval_params = make_int8_eval_params(
                model, params, calib_obs=calib, chunk=chunk or None,
                chunk_mode=cmode, calib_percentile=pct)
        else:
            # BENCH_RESIDUAL: "int8" (default — s8-only trunk stream; the
            # conv chain is HBM-bandwidth-bound and the bf16 master copy
            # was ~half the inter-block traffic; measured 808.8 vs 769.7
            # moves/s adjacent A/B) or "bf16" (exact master copy).
            resid = os.environ.get("BENCH_RESIDUAL",
                                   production.INT8_RESIDUAL)
            # BENCH_HEADS: "int8" runs the 1x1 head convs on the s8 trunk
            # activation (no final bf16 trunk copy); "bf16" keeps them on
            # the bf16 stream.  (A Pallas fused-trunk variant was probed
            # and rejected on measurement — BENCHLOG round 4.)
            heads = os.environ.get("BENCH_HEADS", production.INT8_HEADS)
            eval_fn = make_int8_eval_fn(model, params, calib_obs=calib,
                                        chunk=chunk or None, chunk_mode=cmode,
                                        residual=resid, heads=heads,
                                        calib_percentile=pct)
    else:
        # BN-folded bf16 inference (models/resnet.fold_batch_norm).
        eval_fn = make_inference_eval_fn(model, params)

    # Tree reuse (reference updateWithMove, parallel_mcts.cpp:1065) with the
    # "topup" budget: each move runs only enough fresh simulations that every
    # lane's root reaches `sims` visits — equal root visit quality to a
    # from-scratch search, fewer NN forwards per move.
    # BENCH_WAVE>1: W virtual-loss descents per dispatch sharing one NN
    # batch — the reference's BATCHED self-play mode (see
    # MCTSConfig.wave_size); amortizes per-op engine overhead.
    config = SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=sims, tree_reuse=reuse,
                        reuse_budget="topup", wave_size=wave),
        max_moves=moves,
    )
    # Host-driven actor: per-sim executables with donated arenas (see
    # mcts/search.make_host_search) — measured ~3x over the scanned loop.
    with_params = eval_params is not None

    def build_step(cfg_):
        _step, init_states_ = make_host_actor(env, eval_fn, cfg_, batch,
                                              with_params=with_params)
        if with_params:
            def s(st, r, _p=eval_params, _f=_step):
                return _f(_p, st, r)
            s.search = getattr(_step, "search", None)
            s.reset = getattr(_step, "reset", lambda: None)
        else:
            s = _step
        return s, init_states_

    step, init_states = build_step(config)
    # Continuous (recycled) self-play for the "sustained" regime: finished
    # lanes restart immediately — the production generation mode (lockstep
    # idling of finished lanes is the whole opening-vs-midgame gap; the
    # traced per-move device cost is identical in both regimes).
    recycle_cfg = SelfPlayConfig(
        mcts=config.mcts if not reuse else MCTSConfig(
            num_simulations=sims, wave_size=wave),
        max_moves=moves, recycle=True,
    )

    def fresh_states():
        return jax.vmap(lambda _: env.init())(jnp.arange(batch))

    def advance_midgame(states, plies=40):
        """Advance every game ``plies`` cheap policy-sampled moves — the
        midgame regime (VERDICT r1 #9: opening-16 is depth-biased)."""
        from alphazero_tpu.mcts.search import masked_softmax

        @jax.jit
        def policy_move(states, rng):
            obs = jax.vmap(env.observation)(states)
            tp = jax.vmap(env.to_play)(states)
            if with_params:
                logits, _ = eval_fn(eval_params, obs, tp)
            else:
                logits, _ = eval_fn(obs, tp)
            legal = jax.vmap(env.legal_mask)(states)
            probs = masked_softmax(logits, legal)
            acts = jax.random.categorical(rng, jnp.log(probs + 1e-9))
            return jax.vmap(env.step)(states, acts.astype(jnp.int32))

        for i in range(plies):
            states = policy_move(states, jax.random.key(1000 + i))
        jax.block_until_ready(states.move_count)
        return states

    # Repetition policy (VERDICT r4 #1: BENCH_r04 recorded a 29% regression
    # that the builder's same-code run contradicted — ONE timed rep has no
    # defense against environment variance).  Each regime now times
    # ``moves`` searched moves from the SAME start states at least
    # BENCH_REPS times (rep 0 preceded by a one-move compile warmup),
    # keeps repeating until the last two reps agree within BENCH_STABLE_PCT
    # (warmup-until-stable), and reports the MEDIAN with every per-rep
    # number recorded in the JSON and on stderr.
    min_reps = int(os.environ.get("BENCH_REPS", "3"))
    max_reps = int(os.environ.get("BENCH_MAX_REPS", "6"))
    stable_pct = float(os.environ.get("BENCH_STABLE_PCT", "3.0"))

    def one_rep(stepf, states, rep):
        """Time ``moves`` searched moves from ``states``; fresh tree state
        per rep (step.reset) so every rep does identical work."""
        if hasattr(stepf, "reset"):
            stepf.reset()
        done_moves = 0
        done_games = 0
        fresh_sims = 0
        st = states
        t0 = time.perf_counter()
        for i in range(moves):
            st, rec = stepf(st, jax.random.key(1000 * rep + 2 + i))
            done_moves += int(jnp.sum(rec.active))
            done_games += int(jnp.sum(rec.ended_winner != -2))
            fresh_sims += getattr(
                getattr(stepf, "search", None), "last_fresh_sims", sims
            )
        jax.block_until_ready(rec.action)
        elapsed = time.perf_counter() - t0
        return (done_moves / elapsed, done_games / elapsed * 60.0,
                fresh_sims / max(1, moves), elapsed)

    def timed_run(stepf, states):
        """Median-of-reps throughput.  Returns (moves_per_s median,
        games_per_min median, fresh_sims_per_move, total_elapsed,
        compile_s, rep_values)."""
        if hasattr(stepf, "reset"):
            stepf.reset()
        t0 = time.perf_counter()
        _, rec = stepf(states, jax.random.key(1))
        jax.block_until_ready(rec.action)
        compile_s = time.perf_counter() - t0

        reps = []
        gpms = []
        fresh = 0.0
        total_elapsed = 0.0
        for rep in range(max_reps):
            mps, gpm, fresh, elapsed = one_rep(stepf, states, rep)
            reps.append(mps)
            gpms.append(gpm)
            total_elapsed += elapsed
            if len(reps) >= min_reps:
                a, b = reps[-2], reps[-1]
                if abs(a - b) / max(a, b) * 100.0 <= stable_pct:
                    break
        med = sorted(reps)[len(reps) // 2]
        gpm_med = sorted(gpms)[len(gpms) // 2]
        return med, gpm_med, fresh, total_elapsed, compile_s, reps

    results = {}
    if mode in ("both", "opening"):
        results["opening"] = timed_run(step, init_states)
    if mode in ("both", "midgame", "sustained"):
        mid_states = advance_midgame(fresh_states())
    if mode in ("both", "midgame"):
        results["midgame"] = timed_run(step, mid_states)
    if mode in ("both", "sustained") and not reuse:
        # Guarded: the sustained regime must never cost the primary record
        # (it compiles a second, recycle-variant step program).
        try:
            sustained_step, _ = build_step(recycle_cfg)
            results["sustained"] = timed_run(sustained_step, mid_states)
        except Exception as e:  # pragma: no cover - defensive
            print(f"# sustained regime failed: {e!r}", file=sys.stderr)

    primary = "opening" if "opening" in results else mode
    mps, _gpm, fresh, elapsed, compile_s, rep_values = results[primary]
    suffix = "" if primary == "opening" else f"_{primary}"
    result = {
        "metric": (
            f"selfplay_moves_per_s_per_chip_{game}{board}_{sims}sims{suffix}"
        ),
        "value": round(mps, 2),
        "unit": "moves/s",
        "vs_baseline": round(mps / BASELINE_MOVES_PER_S, 2),
        "reps": [round(r, 1) for r in rep_values],
    }
    if "midgame" in results and primary == "opening":
        mid = results["midgame"][0]
        result["midgame"] = round(mid, 2)
        result["midgame_vs_baseline"] = round(mid / BASELINE_MOVES_PER_S, 2)
        result["midgame_reps"] = [round(r, 1) for r in results["midgame"][5]]
    if "sustained" in results:
        # Continuous self-play from midgame start states: finished lanes
        # recycle into fresh games (production generation mode); also the
        # completed-games rate the PRD states its throughput target in
        # (>=50 gomoku games/min, PRD.md:13).
        sus = results["sustained"]
        result["sustained"] = round(sus[0], 2)
        result["sustained_games_per_min"] = round(sus[1], 1)
        result["sustained_reps"] = [round(r, 1) for r in sus[5]]
    if os.path.exists(REF_MEASURED_PATH):
        with open(REF_MEASURED_PATH) as f:
            ref = json.load(f)
        ref_mps = float(ref.get("moves_per_s", 0) or 0)
        if ref_mps > 0:
            result["reference_measured_moves_per_s"] = ref_mps
            result["vs_reference_measured"] = round(mps / ref_mps, 2)
            if "midgame" in result:
                result["midgame_vs_reference_measured"] = round(
                    result["midgame"] / ref_mps, 2
                )
    print(json.dumps(result))
    for name, (m, gpm, fr, el, co, reps_list) in results.items():
        print(
            f"# {name}: median {m:.1f} moves/s over "
            f"{len(reps_list)} reps {[round(r, 1) for r in reps_list]} "
            f"games/min={gpm:.1f} batch={batch} sims={sims} "
            f"timed_moves={moves}/rep reuse={reuse} wave={wave} "
            f"fresh_sims/move={fr:.0f} "
            f"total_elapsed={el:.1f}s compile={co:.1f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
