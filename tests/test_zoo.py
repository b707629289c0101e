"""The committed model-zoo bundles are real trained nets.

Loads every bundle in models_zoo/, runs the forward pass, and checks the
tactical-competence floor (with a small search on top, as deployment
would): take an immediate five-in-a-row win; block an opponent's simple
four.  A random initialization fails these at better than chance, a
trained flagship passes them — so the test pins that the committed
weights are the trained ones, not a re-init.

Reference analog: its packaged models are exercised through
python/scripts/evaluate.py; there is no committed-weights test to port —
this guards OUR reproducibility contract (models_zoo/README.md).
"""
import os

import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

ZOO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "models_zoo")
FLAGSHIP = os.path.join(ZOO, "flagship_gomoku15")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FLAGSHIP), reason="no committed flagship bundle"
)


@pytest.fixture(scope="module")
def flagship():
    from alphazero_tpu.core import registry
    from alphazero_tpu.models.io import load_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    env = registry.create_game("gomoku", 15)
    model, params = load_model(FLAGSHIP, env.observation_shape)
    return env, make_inference_eval_fn(model, params)


def _position(env, moves):
    """Play ``moves`` [(row, col), ...] from the empty board; batch of 1."""
    states = jax.vmap(lambda _: env.init())(jnp.arange(1))
    for r, c in moves:
        a = jnp.array([r * 15 + c], jnp.int32)
        states = jax.vmap(env.step)(states, a)
    return states


def _search_action(env, eval_fn, states, sims=48):
    from alphazero_tpu.mcts.search import MCTSConfig
    from alphazero_tpu.selfplay.actor import SelfPlayConfig, move_once

    cfg = SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=sims, dirichlet_epsilon=0.0),
        temperature_drop_move=0,  # greedy
    )
    _, rec = move_once(env, eval_fn, states, jax.random.key(0), cfg)
    return int(rec.action[0])


def test_forward_finite(flagship):
    env, eval_fn = flagship
    states = _position(env, [(7, 7), (6, 6)])
    obs = jax.vmap(env.observation)(states)
    logits, value = eval_fn(obs, jax.vmap(env.to_play)(states))
    assert bool(jnp.isfinite(logits).all()) and bool(
        jnp.isfinite(value).all())
    assert logits.shape == (1, env.num_actions)


def test_takes_immediate_win(flagship):
    env, eval_fn = flagship
    # X has a simple four on row 7 (cols 3-6), (7,2) blocked; X to move.
    states = _position(env, [
        (7, 3), (7, 2), (7, 4), (0, 0), (7, 5), (1, 0), (7, 6), (2, 0),
    ])
    a = _search_action(env, eval_fn, states)
    assert a == 7 * 15 + 7, f"expected the winning move (7,7), got {a}"


def test_blocks_immediate_loss(flagship):
    env, eval_fn = flagship
    # X has a simple four on row 7 (cols 3-6), (7,2) blocked; O to move —
    # (7,7) is the only move that doesn't lose on the spot.
    states = _position(env, [
        (7, 3), (7, 2), (7, 4), (0, 0), (7, 5), (1, 0), (7, 6),
    ])
    a = _search_action(env, eval_fn, states)
    assert a == 7 * 15 + 7, f"expected the blocking move (7,7), got {a}"


GO9 = os.path.join(ZOO, "go9")


@pytest.mark.skipif(not os.path.exists(GO9), reason="no committed go9 bundle")
class TestGo9Zoo:
    @pytest.fixture(scope="class")
    def go9(self):
        from alphazero_tpu.core import registry
        from alphazero_tpu.models.io import load_model
        from alphazero_tpu.models.resnet import make_inference_eval_fn

        env = registry.create_game("go", 9)
        model, params = load_model(GO9, env.observation_shape)
        return env, make_inference_eval_fn(model, params)

    def test_forward_finite(self, go9):
        env, eval_fn = go9
        states = jax.vmap(lambda _: env.init())(jnp.arange(2))
        obs = jax.vmap(env.observation)(states)
        logits, value = eval_fn(obs, jax.vmap(env.to_play)(states))
        assert bool(jnp.isfinite(logits).all()) and bool(
            jnp.isfinite(value).all())
        assert logits.shape == (2, env.num_actions)

    def test_beats_uniform_at_equal_sims(self, go9):
        """Strength floor: the committed net wins a small equal-sims match
        against the uniform-MCTS anchor (on chip it went 48-0 at 128
        sims; here 8 games at 16-vs-16 sims must take a clear majority —
        a random init hovers near 50%)."""
        env, eval_fn = go9
        from alphazero_tpu.eval import anchors
        from alphazero_tpu.eval.arena import play_match_sides
        from alphazero_tpu.mcts.search import MCTSConfig

        cand = (eval_fn, MCTSConfig(num_simulations=16,
                                    dirichlet_epsilon=0.0))
        res = play_match_sides(
            env, cand, anchors.make_anchor(env, "uniform_mcts_16"),
            jax.random.key(7), 8, max_moves=162, opening_random_moves=2,
        )
        assert int(res.wins_a) >= 6, (
            f"trained go9 net should beat uniform_mcts_16: "
            f"+{int(res.wins_a)} -{int(res.wins_b)} ={int(res.draws)}"
        )


CHESS = os.path.join(ZOO, "chess_dev")


@pytest.mark.skipif(not os.path.exists(CHESS),
                    reason="no committed chess bundle")
def test_chess_dev_forward_finite():
    """chess_dev is a short-run demonstration net (models_zoo/README.md);
    its strength evidence is chip-measured (docs/train_zoo_chess.json) —
    CI only pins that the committed bundle loads and runs."""
    from alphazero_tpu.core import registry
    from alphazero_tpu.models.io import load_model
    from alphazero_tpu.models.resnet import make_inference_eval_fn

    env = registry.create_game("chess")
    model, params = load_model(CHESS, env.observation_shape)
    eval_fn = make_inference_eval_fn(model, params)
    states = jax.vmap(lambda _: env.init())(jnp.arange(2))
    obs = jax.vmap(env.observation)(states)
    logits, value = eval_fn(obs, jax.vmap(env.to_play)(states))
    assert bool(jnp.isfinite(logits).all()) and bool(
        jnp.isfinite(value).all())
    assert logits.shape == (2, env.num_actions)
