"""High-level facade.

Parity target: the reference ``AlphaZero`` pImpl facade
(``include/alphazero/AlphaZero.h:9-33``): initialize from a config file,
run self-play, train, evaluate, get a best action — one object tying the
subsystems together.
"""
from __future__ import annotations

import json
from typing import Optional

import jax
import jax.numpy as jnp


class AlphaZero:
    """One-stop engine: wraps pipeline (train/self-play), arena (evaluate)
    and single-position search (best action)."""

    def __init__(self, config=None):
        from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

        if config is None:
            config = PipelineConfig()
        self.config = config
        self.pipeline = Pipeline(config)
        self.env = self.pipeline.env
        self.model = self.pipeline.model

    @classmethod
    def from_config_file(cls, path: str) -> "AlphaZero":
        from alphazero_tpu.training.pipeline import PipelineConfig
        from alphazero_tpu.utils.config import from_dict

        with open(path) as f:
            return cls(from_dict(PipelineConfig, json.load(f)))

    @classmethod
    def for_game(cls, game: str, board_size: Optional[int] = None
                 ) -> "AlphaZero":
        from alphazero_tpu.utils.config import default_pipeline_config

        return cls(default_pipeline_config(game, board_size))

    # ---- the reference facade surface -----------------------------------

    def run_self_play(self, num_games: int = 0):
        """Generate self-play games into the replay buffer (reference
        ``runSelfPlay(numGames)``, AlphaZero.h:9-33).  Runs as many
        actor iterations (of ``games_per_iteration`` each — the compiled
        batch shape) as needed to produce at least ``num_games`` games;
        ``num_games=0`` runs one configured iteration.  Returns the last
        iteration's entry with a ``total_games`` tally."""
        per_iter = self.config.games_per_iteration
        iters = max(1, -(-int(num_games) // per_iter)) if num_games else 1
        entry = None
        for i in range(iters):
            entry = self.pipeline.run_iteration(i)
        entry["total_games"] = per_iter * iters
        return entry

    def train_network(self, iterations: Optional[int] = None):
        return self.pipeline.run(iterations)

    def evaluate_model(self, other_params=None, num_games: int = 16,
                       simulations: int = 100):
        from alphazero_tpu.eval.arena import ArenaConfig, play_match_host
        from alphazero_tpu.mcts.search import MCTSConfig
        from alphazero_tpu.models.resnet import make_inference_eval_fn
        from alphazero_tpu.models.stub import make_uniform_eval_fn

        eval_a = make_inference_eval_fn(
            self.model, self.pipeline.state.params
        )
        if other_params is None:
            eval_b = make_uniform_eval_fn(self.env.num_actions,
                                          value_noise=0.1)
        else:
            eval_b = make_inference_eval_fn(self.model, other_params)

        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=simulations,
                            dirichlet_epsilon=0.0,
                            wave_size=min(16, simulations)),
            max_moves=self.config.selfplay.max_moves,
            opening_random_moves=4,
        )
        # Host-driven match loop (works at production search depth;
        # mirrored random openings keep deep-search games diverse).
        res = play_match_host(self.env, eval_a, eval_b, jax.random.key(0),
                              cfg, num_games)
        return {
            "wins": int(res.wins_a),
            "losses": int(res.wins_b),
            "draws": int(res.draws),
        }

    def get_best_action(self, state, simulations: int = 200,
                        rng: Optional[jax.Array] = None) -> int:
        from alphazero_tpu.mcts.search import MCTSConfig, search
        from alphazero_tpu.models.resnet import make_inference_eval_fn

        eval_fn = make_inference_eval_fn(
            self.model, self.pipeline.state.params
        )

        cfg = MCTSConfig(num_simulations=simulations, dirichlet_epsilon=0.0)
        batched = jax.tree_util.tree_map(lambda x: x[None], state)
        out = search(self.env, eval_fn, batched,
                     rng if rng is not None else jax.random.key(0), cfg)
        return int(jnp.argmax(out.visit_counts[0]))

    def save(self, path: str):
        from alphazero_tpu.models.io import save_model

        save_model(path, self.pipeline.state.params,
                   getattr(self.config, "model_kind", "resnet"),
                   self.env.num_actions, self.pipeline.model.cfg)
