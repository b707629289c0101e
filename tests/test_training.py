"""Training stack tests: loss, schedulers, replay buffer, train step.

Analog of the reference python/tests/test_training.py (SURVEY.md §4).
"""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig
from alphazero_tpu.training import replay, schedulers
from alphazero_tpu.training.learner import (
    LearnerConfig,
    create_train_state,
    train_step,
)
from alphazero_tpu.training.loss import alphazero_loss

ENV = GomokuEnv(board_size=7)
A = ENV.num_actions


class TestLoss:
    def test_perfect_prediction_low_loss(self):
        target = jnp.zeros((2, 4)).at[:, 1].set(1.0)
        logits = jnp.log(target + 1e-9) * 10  # sharp at the target
        out = alphazero_loss(logits, jnp.asarray([1.0, -1.0]), target,
                             jnp.asarray([1.0, -1.0]))
        assert float(out.value_loss) == 0.0
        assert float(out.policy_loss) < 0.01

    def test_uniform_policy_loss(self):
        logits = jnp.zeros((1, 4))
        target = jnp.full((1, 4), 0.25)
        out = alphazero_loss(logits, jnp.zeros((1,)), target, jnp.zeros((1,)))
        np.testing.assert_allclose(float(out.policy_loss), np.log(4), rtol=1e-5)

    def test_gradients_flow(self):
        target = jnp.zeros((1, 4)).at[0, 2].set(1.0)

        def f(logits):
            return alphazero_loss(
                logits, jnp.zeros((1,)), target, jnp.ones((1,))
            ).total

        g = jax.grad(f)(jnp.ones((1, 4)))
        # d/dlogits cross-entropy = softmax(logits) - target.
        assert bool(jnp.any(g != 0))
        np.testing.assert_allclose(
            np.asarray(g[0]), np.full(4, 0.25) - np.asarray(target[0]),
            atol=1e-6,
        )


class TestSchedulers:
    def test_warmup_cosine(self):
        s = schedulers.make("warmup_cosine", 1.0, total_steps=100,
                            warmup_steps=10)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-5)
        assert float(s(100)) < 0.01

    def test_step_decay(self):
        s = schedulers.make("step", 1.0, total_steps=90, step_size=30)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(30)), 0.1, rtol=1e-5)
        np.testing.assert_allclose(float(s(60)), 0.01, rtol=1e-5)

    def test_cyclic(self):
        s = schedulers.make("cyclic_cosine", 1.0, total_steps=100,
                            cycle_steps=20)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(20)), 1.0)
        assert float(s(10)) < 0.6


class TestReplay:
    def test_add_and_sample(self):
        buf = replay.create(ENV, capacity=64, num_actions=A)
        B = 8
        states = jax.vmap(lambda _: ENV.init())(jnp.arange(B))
        pol = jnp.full((B, A), 1.0 / A)
        val = jnp.ones((B,))
        mask = jnp.ones((B,), bool)
        buf = jax.jit(replay.add)(buf, states, pol, val, mask)
        assert int(buf.size) == B
        batch = jax.jit(
            lambda b, r: replay.sample(b, ENV, r, 4)
        )(buf, jax.random.key(0))
        assert batch.obs.shape == (4, 11, 7, 7)
        assert batch.policy.shape == (4, A)
        np.testing.assert_allclose(batch.value, 1.0)

    def test_mask_filters(self):
        buf = replay.create(ENV, capacity=64, num_actions=A)
        B = 8
        states = jax.vmap(lambda _: ENV.init())(jnp.arange(B))
        pol = jnp.full((B, A), 1.0 / A)
        val = jnp.ones((B,))
        mask = jnp.arange(B) < 3
        buf = jax.jit(replay.add)(buf, states, pol, val, mask)
        assert int(buf.size) == 3

    def test_ring_wraparound(self):
        buf = replay.create(ENV, capacity=8, num_actions=A)
        B = 8
        states = jax.vmap(lambda _: ENV.init())(jnp.arange(B))
        pol = jnp.full((B, A), 1.0 / A)
        add = jax.jit(replay.add)
        for i in range(3):
            buf = add(buf, states, pol, jnp.full((B,), float(i)),
                      jnp.ones((B,), bool))
        assert int(buf.size) == 8  # capped at capacity
        np.testing.assert_allclose(buf.value, 2.0)  # fully overwritten

    def test_augmentation_consistency(self):
        """Policy mass must follow the board transform."""
        env = ENV
        s = env.init()
        s = env.step(s, jnp.asarray(0))  # stone at (0,0)
        obs = env.observation(s)
        pol = jnp.zeros((A,)).at[0].set(1.0)  # all mass at (0,0)
        for sym in range(8):
            o2, p2 = replay.augment(obs, pol, jnp.int32(sym), 7)
            # The policy argmax must land where plane 1 (the opponent stone,
            # white to move) moved.
            stone_pos = jnp.argmax(o2[1].reshape(-1))
            assert int(jnp.argmax(p2)) == int(stone_pos), f"sym {sym}"

    def test_augment_pass_action_fixed(self):
        pol = jnp.zeros((50,)).at[49].set(1.0)  # 7x7 go + pass
        obs = jnp.zeros((3, 7, 7))
        for sym in range(8):
            _, p2 = replay.augment(obs, pol, jnp.int32(sym), 7)
            assert float(p2[49]) == 1.0


class TestTrainStep:
    def test_loss_decreases(self):
        model = AZResNet(num_actions=A,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        cfg = LearnerConfig(learning_rate=3e-3, scheduler="constant",
                            total_steps=50, warmup_steps=0)
        state, tx = create_train_state(
            model, jax.random.key(0), ENV.observation_shape, cfg
        )
        rng = jax.random.key(1)
        obs = jax.random.normal(rng, (16, 11, 7, 7))
        target_pol = jax.nn.softmax(
            jax.random.normal(jax.random.key(2), (16, A)), -1
        )
        target_val = jnp.tanh(jax.random.normal(jax.random.key(3), (16,)))
        batch = replay.Batch(obs=obs, policy=target_pol, value=target_val)

        step = jax.jit(lambda s, b: train_step(s, b, model, tx, cfg))
        _, m0 = step(state, batch)
        for _ in range(30):
            state, m = step(state, batch)
        assert float(m.loss) < float(m0.loss)
        assert int(state.step) == 30


class TestConfigSystem:
    def test_roundtrip(self, tmp_path):
        from alphazero_tpu.training.pipeline import PipelineConfig
        from alphazero_tpu.utils.config import (
            default_pipeline_config,
            from_dict,
            load_config,
            save_config,
            to_dict,
        )

        cfg = default_pipeline_config("gomoku", 9)
        p = str(tmp_path / "cfg.json")
        save_config(cfg, p)
        cfg2 = load_config(PipelineConfig, p)
        assert cfg2.board_size == 9
        assert cfg2.selfplay.mcts.num_simulations == \
            cfg.selfplay.mcts.num_simulations
        assert cfg2.model.channels == cfg.model.channels

    def test_shipped_configs_load(self):
        import glob

        from alphazero_tpu.training.pipeline import PipelineConfig
        from alphazero_tpu.utils.config import load_config

        paths = glob.glob("config/*.json")
        assert len(paths) >= 3
        for p in paths:
            cfg = load_config(PipelineConfig, p)
            assert cfg.games_per_iteration > 0
