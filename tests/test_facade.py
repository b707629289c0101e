"""Facade smoke tests (reference AlphaZero.h surface)."""
import jax.numpy as jnp

from alphazero_tpu.facade import AlphaZero
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.resnet import ResNetConfig
from alphazero_tpu.selfplay.actor import SelfPlayConfig
from alphazero_tpu.training.learner import LearnerConfig
from alphazero_tpu.training.pipeline import PipelineConfig


def tiny(tmp_path):
    return PipelineConfig(
        game="gomoku",
        board_size=5,
        model=ResNetConfig(num_blocks=1, channels=16),
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_alpha=0.5),
            max_moves=25, temperature_drop_move=4,
        ),
        learner=LearnerConfig(scheduler="constant", total_steps=10),
        iterations=1,
        games_per_iteration=4,
        train_steps_per_iteration=2,
        train_batch_size=16,
        min_replay_before_training=16,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )


class TestFacade:
    def test_selfplay_train_best_action(self, tmp_path):
        az = AlphaZero(tiny(tmp_path))
        entry = az.run_self_play()
        assert entry["moves"] > 0
        state = az.env.init()
        action = az.get_best_action(state, simulations=8)
        assert 0 <= action < az.env.num_actions

    def test_run_self_play_honors_num_games(self, tmp_path):
        az = AlphaZero(tiny(tmp_path))
        # games_per_iteration=4; asking for 6 games runs 2 iterations.
        entry = az.run_self_play(num_games=6)
        assert entry["total_games"] == 8
        assert entry["iteration"] == 1

    def test_evaluate_and_save(self, tmp_path):
        az = AlphaZero(tiny(tmp_path))
        res = az.evaluate_model(num_games=4, simulations=4)
        assert res["wins"] + res["losses"] + res["draws"] == 4
        az.save(str(tmp_path / "model.msgpack"))
        assert (tmp_path / "model.msgpack").exists()
        assert (tmp_path / "model.msgpack.json").exists()

    def test_from_config_file(self, tmp_path):
        from alphazero_tpu.utils.config import save_config

        path = str(tmp_path / "cfg.json")
        save_config(tiny(tmp_path), path)
        az = AlphaZero.from_config_file(path)
        assert az.env.board_size == 5
