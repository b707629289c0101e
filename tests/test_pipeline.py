"""End-to-end pipeline smoke tests: actor -> replay -> learner + orbax
checkpoint round-trip (reference integration-test analog, SURVEY.md §4)."""
import numpy as np
import pytest

import jax

from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.resnet import ResNetConfig
from alphazero_tpu.selfplay.actor import SelfPlayConfig
from alphazero_tpu.training.learner import LearnerConfig
from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig


def tiny_config(tmp_path, **kw):
    defaults = dict(
        game="gomoku",
        board_size=5,
        model=ResNetConfig(num_blocks=1, channels=16),
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_alpha=0.5),
            max_moves=25,
            temperature_drop_move=4,
        ),
        learner=LearnerConfig(
            learning_rate=1e-3, scheduler="constant", total_steps=100
        ),
        iterations=2,
        games_per_iteration=8,
        train_steps_per_iteration=4,
        train_batch_size=32,
        replay_capacity=4096,
        min_replay_before_training=32,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=1,
    )
    defaults.update(kw)
    return PipelineConfig(**defaults)


class TestPipeline:
    def test_two_iterations_train(self, tmp_path):
        pipe = Pipeline(tiny_config(tmp_path))
        e1 = pipe.run_iteration(0)
        assert e1["moves"] > 0
        assert e1["replay_size"] > 0
        e2 = pipe.run_iteration(1)
        assert "loss" in e2  # enough replay to train by iteration 2
        # Trains 4 steps per iteration once the buffer floor is crossed.
        assert int(pipe.state.step) in (4, 8)

    def test_checkpoint_roundtrip(self, tmp_path):
        pipe = Pipeline(tiny_config(tmp_path))
        pipe.run_iteration(0)
        pipe.run_iteration(1)
        pipe.save_checkpoint(1)

        pipe2 = Pipeline(tiny_config(tmp_path))
        step = pipe2.restore_checkpoint()
        assert step == 1
        assert int(pipe2.state.step) == int(pipe.state.step)
        p1 = jax.tree_util.tree_leaves(pipe.state.params)
        p2 = jax.tree_util.tree_leaves(pipe2.state.params)
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_history_written(self, tmp_path):
        cfg = tiny_config(tmp_path)
        pipe = Pipeline(cfg)
        pipe.run(iterations=1)
        import json
        import os

        path = os.path.join(cfg.checkpoint_dir, "history.json")
        with open(path) as f:
            hist = json.load(f)
        assert len(hist) == 1
