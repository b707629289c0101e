"""Self-play actor + game-record tests — analog of the reference
integration tests (tests/integration/gomoku_integration_test.cpp plays moves
and asserts GameRecord round-trip; SURVEY.md §4)."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.core.types import GameResult, GameType
from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn
from alphazero_tpu.selfplay import game_record
from alphazero_tpu.selfplay.actor import (
    SelfPlayConfig,
    play_games,
    value_targets,
)

ENV = GomokuEnv(board_size=5)
EVAL = make_uniform_eval_fn(ENV.num_actions, value_noise=0.1)
CFG = SelfPlayConfig(
    mcts=MCTSConfig(num_simulations=16, dirichlet_epsilon=0.25,
                    dirichlet_alpha=0.5),
    max_moves=25,
    temperature_drop_move=6,
)


def run_games(B=4, seed=0):
    fn = jax.jit(
        lambda r: play_games(ENV, EVAL, r, CFG, batch_size=B)
    )
    return fn(jax.random.key(seed))


class TestPlayGames:
    def test_games_complete(self):
        out = run_games(B=4)
        # 5x5 freestyle gomoku with 16-sim search finishes within 25 moves.
        assert bool(jnp.all(jax.vmap(ENV.terminal_flag)(out.states)))
        assert bool(jnp.all(out.length > 0))

    def test_moves_legal_and_recorded(self):
        out = run_games(B=2)
        actions = np.asarray(out.actions)  # [T, B]
        active = np.asarray(out.active)
        # Replay each game and verify every recorded move was legal.
        for b in range(2):
            s = ENV.init()
            for t in range(actions.shape[0]):
                if not active[t, b]:
                    break
                legal = ENV.legal_mask(s)
                assert bool(legal[actions[t, b]]), (t, b, actions[t, b])
                s = ENV.step(s, jnp.asarray(actions[t, b]))
            assert bool(s.terminal)

    def test_policies_normalized(self):
        out = run_games(B=2)
        active = np.asarray(out.active)
        sums = np.asarray(out.policies.sum(-1))
        np.testing.assert_allclose(sums[active], 1.0, rtol=1e-4)

    def test_value_targets_sign(self):
        out = run_games(B=4)
        z = np.asarray(value_targets(out))  # [T, B]
        winner = np.asarray(out.winner)
        tp = np.asarray(out.to_play)
        active = np.asarray(out.active)
        for b in range(4):
            for t in range(z.shape[0]):
                if not active[t, b]:
                    break
                if winner[b] < 0:
                    assert z[t, b] == 0.0
                elif winner[b] == tp[t, b]:
                    assert z[t, b] == 1.0
                else:
                    assert z[t, b] == -1.0

    def test_determinism(self):
        o1 = run_games(B=2, seed=7)
        o2 = run_games(B=2, seed=7)
        np.testing.assert_array_equal(o1.actions, o2.actions)


class TestGameRecord:
    def test_roundtrip(self, tmp_path):
        out = run_games(B=2)
        recs = game_record.records_from_selfplay(ENV, out)
        assert len(recs) == 2
        rec = recs[0]
        assert rec.game_type == GameType.GOMOKU
        assert len(rec.moves) == int(out.length[0])
        p = tmp_path / "game.json"
        rec.save(str(p))
        rec2 = game_record.GameRecord.load(str(p))
        assert rec2.result == rec.result
        assert [m.action for m in rec2.moves] == [m.action for m in rec.moves]
        np.testing.assert_allclose(rec2.moves[0].policy, rec.moves[0].policy)

    def test_reference_schema_fields(self, tmp_path):
        """JSON field names must match game_record.h for interop."""
        out = run_games(B=1)
        rec = game_record.records_from_selfplay(ENV, out)[0]
        d = rec.to_json()
        assert set(d) == {
            "game_type", "board_size", "use_variant_rules", "moves",
            "result", "timestamp",
        }
        assert set(d["moves"][0]) == {
            "action", "policy", "value", "thinking_time_ms"
        }
        assert d["result"] in (1, 2, 3)


class TestNativeEncoder:
    def test_native_matches_python(self, tmp_path):
        from alphazero_tpu.native import get_azrecord

        mod = get_azrecord()
        if mod is None:
            import pytest

            pytest.skip("no native toolchain")
        out = run_games(B=1)
        rec = game_record.records_from_selfplay(ENV, out)[0]
        native = json.loads(rec.to_json_bytes())
        pure = rec.to_json()
        assert native["game_type"] == pure["game_type"]
        assert native["result"] == pure["result"]
        assert len(native["moves"]) == len(pure["moves"])
        for m_n, m_p in zip(native["moves"], pure["moves"]):
            assert m_n["action"] == m_p["action"]
            np.testing.assert_allclose(
                m_n["policy"], m_p["policy"], rtol=1e-5, atol=1e-7
            )
        # Round-trips through the standard loader.
        p = tmp_path / "native.json"
        rec.save(str(p))
        rec2 = game_record.GameRecord.load(str(p))
        assert [m.action for m in rec2.moves] == [
            m.action for m in rec.moves
        ]
