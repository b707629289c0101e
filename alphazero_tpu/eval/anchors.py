"""Fixed anchor players — a stable internal rating scale.

All published strength numbers were previously self-relative between a
run's own checkpoints, so ratings were not comparable across runs or
rounds (VERDICT r4 missing #3; the reference PRD states absolute targets,
PRD.md:11, but its own ``EloTracker`` is just as self-relative).  This
module defines a FIXED, parameter-free opponent pool; rating every
candidate against the same pool (and Bradley-Terry-fitting the joint
match table anchored on a pool member, elo/bradley_terry.py) makes every
curve commensurable across runs on the same game.

Pool (weak -> strong; all deterministic given the rng key):
  * ``uniform_mcts_N`` — uniform-policy evaluator (the reference
    ``RandomPolicyNetwork`` analog, models/stub.py) under an N-simulation
    search.  Strength rises with N; these are the reference ladder.
  * ``attack_defense_64`` (gomoku only) — the attack/defense threat
    heuristic (ops/attack_defense.py, reference AttackDefenseModule)
    biasing a uniform policy, 64 sims: a shallow tactical player.
"""
from __future__ import annotations

from typing import Tuple

from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn

# Names, weak -> strong.  uniform_mcts_256 is the canonical Bradley-Terry
# anchor (pinned to 1500 when present).
POOL = ("uniform_mcts_16", "uniform_mcts_64", "attack_defense_64",
        "uniform_mcts_256")
CANONICAL = "uniform_mcts_256"
CANONICAL_RATING = 1500.0


def make_anchor(env, name: str) -> Tuple:
    """(eval_fn, MCTSConfig) for a pool member.  The search config is part
    of the anchor's identity — anchors always play at their OWN fixed
    simulation count (via eval/arena.play_match_sides), independent of the
    candidate's."""
    if name.startswith("uniform_mcts_"):
        sims = int(name.rsplit("_", 1)[1])
        eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
    elif name == "attack_defense_64":
        if "gomoku" not in type(env).__name__.lower():
            raise ValueError("attack_defense anchor is gomoku-only")
        from alphazero_tpu.ops.attack_defense import policy_bias_eval_fn

        sims = 64
        eval_fn = policy_bias_eval_fn(
            make_uniform_eval_fn(env.num_actions, value_noise=0.1),
            board_size=env.board_size, scale=1.0,
        )
    else:
        raise ValueError(f"unknown anchor {name!r} (pool: {POOL})")
    cfg = MCTSConfig(
        num_simulations=sims,
        dirichlet_epsilon=0.0,
        wave_size=min(16, sims),
    )
    return eval_fn, cfg
