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
        """One self-play iteration (records go to the replay buffer)."""
        return self.pipeline.run_iteration(0)

    def train_network(self, iterations: Optional[int] = None):
        return self.pipeline.run(iterations)

    def evaluate_model(self, other_params=None, num_games: int = 16,
                       simulations: int = 100):
        from alphazero_tpu.eval.arena import ArenaConfig, play_match
        from alphazero_tpu.mcts.search import MCTSConfig
        from alphazero_tpu.models.stub import make_uniform_eval_fn

        def eval_a(obs, to_play=None):
            return self.model.apply(self.pipeline.state.params, obs)

        if other_params is None:
            eval_b = make_uniform_eval_fn(self.env.num_actions,
                                          value_noise=0.1)
        else:
            def eval_b(obs, to_play=None):
                return self.model.apply(other_params, obs)

        cfg = ArenaConfig(
            mcts=MCTSConfig(num_simulations=simulations,
                            dirichlet_epsilon=0.0),
            max_moves=self.config.selfplay.max_moves,
        )
        res = jax.jit(
            lambda r: play_match(self.env, eval_a, eval_b, r, cfg, num_games)
        )(jax.random.key(0))
        return {
            "wins": int(res.wins_a),
            "losses": int(res.wins_b),
            "draws": int(res.draws),
        }

    def get_best_action(self, state, simulations: int = 200,
                        rng: Optional[jax.Array] = None) -> int:
        from alphazero_tpu.mcts.search import MCTSConfig, search

        def eval_fn(obs, to_play=None):
            return self.model.apply(self.pipeline.state.params, obs)

        cfg = MCTSConfig(num_simulations=simulations, dirichlet_epsilon=0.0)
        batched = jax.tree_util.tree_map(lambda x: x[None], state)
        out = search(self.env, eval_fn, batched,
                     rng if rng is not None else jax.random.key(0), cfg)
        return int(jnp.argmax(out.visit_counts[0]))

    def save(self, path: str):
        from alphazero_tpu.models.io import save_model

        save_model(path, self.pipeline.state.params, "resnet",
                   self.env.num_actions, self.config.model)
