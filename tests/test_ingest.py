"""Records -> training ingestion (reference prepare_dataset /
Dataset.loadFromFile path, train.py:92,246 + dataset.cpp:64-114)."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.core.types import GameResult
from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.selfplay.game_record import (
    GameRecord,
    load_records_dir,
    records_to_training_arrays,
)

ENV = GomokuEnv(board_size=7)
A = ENV.num_actions


def make_record(moves, result):
    rec = GameRecord(game_type=ENV.game_type, board_size=7)
    for a in moves:
        pol = np.zeros(A)
        pol[a] = 1.0
        rec.add_move(a, pol, 0.0)
    rec.set_result(result)
    return rec


class TestRecordIngestion:
    def test_replay_regenerates_states_and_targets(self):
        # Black (player 0) wins: moves alternate black/white.
        recs = [
            make_record([0, 7, 1, 8, 2, 9, 3, 10, 4], GameResult.WIN_PLAYER1),
            make_record([24, 25, 17], GameResult.WIN_PLAYER2),
        ]
        states, policy, z, mask = records_to_training_arrays(ENV, recs)
        T, G = z.shape
        assert (T, G) == (9, 2)
        # Mask matches record lengths.
        np.testing.assert_array_equal(
            np.asarray(mask).sum(0), [9, 3]
        )
        # Value targets: winner 0 -> +1 on black-to-move positions.
        z0 = np.asarray(z[:, 0])
        np.testing.assert_array_equal(z0[0::2], 1.0)  # black to move
        np.testing.assert_array_equal(z0[1::2], -1.0)
        z1 = np.asarray(z[:3, 1])
        np.testing.assert_array_equal(z1, [-1.0, 1.0, -1.0])  # white wins
        # Replayed move counts advance correctly.
        mc = np.asarray(states.move_count)  # [T, G]
        np.testing.assert_array_equal(mc[:, 0], np.arange(9))
        # Policies pass through.
        assert float(policy[0, 0, 0]) == 1.0

    def test_children_indexed_policy_falls_back_to_onehot(self):
        rec = GameRecord(game_type=ENV.game_type, board_size=7)
        rec.add_move(5, [0.5, 0.5], 0.0)  # wrong-length policy (quirk)
        rec.set_result(GameResult.DRAW)
        _, policy, z, _ = records_to_training_arrays(ENV, [rec])
        assert float(policy[0, 0, 5]) == 1.0
        assert float(policy[0, 0].sum()) == 1.0
        assert float(z[0, 0]) == 0.0

    def test_roundtrip_via_files_and_pipeline(self, tmp_path):
        from alphazero_tpu.mcts.search import MCTSConfig
        from alphazero_tpu.models.resnet import ResNetConfig
        from alphazero_tpu.selfplay.actor import SelfPlayConfig
        from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

        recs = [
            make_record([0, 7, 1, 8, 2, 9, 3, 10, 4], GameResult.WIN_PLAYER1)
            for _ in range(4)
        ]
        for i, r in enumerate(recs):
            r.save(str(tmp_path / f"g{i}.json"))
        loaded = load_records_dir(str(tmp_path))
        assert len(loaded) == 4

        cfg = PipelineConfig(
            game="gomoku", board_size=7,
            model=ResNetConfig(num_blocks=1, channels=16),
            selfplay=SelfPlayConfig(mcts=MCTSConfig(num_simulations=4),
                                    max_moves=8),
            iterations=1, games_per_iteration=2,
            train_steps_per_iteration=2, train_batch_size=16,
            replay_capacity=512, min_replay_before_training=1,
            checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=100,
        )
        pipe = Pipeline(cfg)
        n = pipe.ingest_record_files(str(tmp_path))
        assert n == 36
        assert int(pipe.buffer.size) == 36
        hist = pipe.run_training_only(1)
        assert np.isfinite(hist[0]["loss"])
