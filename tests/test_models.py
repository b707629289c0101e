"""Model tests (shapes, dtypes, grads) — analog of the reference
python/tests/test_models.py (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.models.resnet import AZResNet, ResNetConfig


class TestAZResNet:
    def test_forward_shapes(self):
        model = AZResNet(num_actions=225,
                         cfg=ResNetConfig(num_blocks=2, channels=32))
        obs = jnp.zeros((4, 11, 15, 15), jnp.float32)
        params = model.init(jax.random.key(0), obs)
        logits, value = jax.jit(model.apply)(params, obs)
        assert logits.shape == (4, 225)
        assert value.shape == (4,)
        assert logits.dtype == jnp.float32

    def test_value_bounded(self):
        model = AZResNet(num_actions=82,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        obs = jax.random.normal(jax.random.key(1), (8, 8, 9, 9))
        params = model.init(jax.random.key(0), obs)
        _, value = model.apply(params, obs)
        assert bool(jnp.all(jnp.abs(value) <= 1.0))

    def test_params_fp32_compute_bf16(self):
        model = AZResNet(num_actions=225,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        obs = jnp.zeros((1, 11, 15, 15))
        params = model.init(jax.random.key(0), obs)
        dtypes = {p.dtype for p in jax.tree_util.tree_leaves(params)}
        assert dtypes == {jnp.dtype(jnp.float32)}

    def test_differentiable(self):
        from alphazero_tpu.training.loss import alphazero_loss

        model = AZResNet(num_actions=49,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        obs = jax.random.normal(jax.random.key(2), (2, 11, 7, 7))
        params = model.init(jax.random.key(0), obs)
        target = jnp.zeros((2, 49)).at[:, 3].set(1.0)

        def loss(p):
            logits, value = model.apply(p, obs)
            # Heads are zero-initialized (saturation guard), so use the real
            # loss — its gradient is nonzero at zero outputs.
            return alphazero_loss(logits, value, target,
                                  jnp.ones((2,))).total

        grads = jax.grad(loss)(params)
        gnorm = sum(
            float(jnp.sum(jnp.abs(g)))
            for g in jax.tree_util.tree_leaves(grads)
        )
        assert gnorm > 0 and np.isfinite(gnorm)

    def test_deterministic(self):
        model = AZResNet(num_actions=225,
                         cfg=ResNetConfig(num_blocks=1, channels=16))
        obs = jax.random.normal(jax.random.key(3), (2, 11, 15, 15))
        params = model.init(jax.random.key(0), obs)
        l1, v1 = model.apply(params, obs)
        l2, v2 = model.apply(params, obs)
        np.testing.assert_array_equal(l1, l2)


class TestRandWire:
    def test_forward_and_reproducible_wiring(self):
        from alphazero_tpu.models.randwire import (
            DDWRandWireResNet, RandWireConfig, watts_strogatz_dag,
        )

        cfg = RandWireConfig(num_blocks=2, nodes_per_block=4, channels=16)
        model = DDWRandWireResNet(num_actions=81, cfg=cfg)
        obs = jnp.zeros((2, 8, 9, 9))
        params = model.init(jax.random.key(0), obs)
        logits, value = jax.jit(model.apply)(params, obs)
        assert logits.shape == (2, 81)
        assert value.shape == (2,)
        # Same seed -> same DAG (reproducibility, ddw_randwire.py:172).
        assert watts_strogatz_dag(8, 4, 0.75, 7) == watts_strogatz_dag(
            8, 4, 0.75, 7
        )
        assert watts_strogatz_dag(8, 4, 0.75, 7) != watts_strogatz_dag(
            8, 4, 0.75, 8
        )

    def test_dag_acyclic(self):
        from alphazero_tpu.models.randwire import watts_strogatz_dag

        for seed in range(5):
            edges = watts_strogatz_dag(16, 4, 0.75, seed)
            assert all(u < v for u, v in edges)


class TestBatchNormFold:
    """BN-folded inference (models/resnet.fold_batch_norm): the reference
    family's BatchNorm (ddw_randwire.py:27-45) folded into conv weights."""

    def _model(self):
        from alphazero_tpu.models.resnet import AZResNet, ResNetConfig

        cfg = ResNetConfig(num_blocks=2, channels=32, norm="batch")
        return AZResNet(num_actions=49, cfg=cfg)

    def test_fold_matches_after_training_steps(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from alphazero_tpu.models.resnet import fold_batch_norm
        from alphazero_tpu.training.learner import (
            LearnerConfig,
            create_train_state,
            train_step,
        )
        from alphazero_tpu.training.replay import Batch

        model = self._model()
        lcfg = LearnerConfig()
        state, tx = create_train_state(model, jax.random.key(0), (3, 7, 7),
                                       lcfg)
        rng = jax.random.key(1)
        for i in range(3):  # make the running stats non-trivial
            rng, sub = jax.random.split(rng)
            obs = jax.random.normal(sub, (8, 3, 7, 7))
            batch = Batch(obs=obs, policy=jnp.ones((8, 49)) / 49,
                          value=jnp.zeros((8,)))
            state, _ = train_step(state, batch, model, tx, lcfg)

        obs = jax.random.normal(jax.random.key(9), (4, 3, 7, 7))
        l1, v1 = model.apply(state.params, obs)  # inference (running stats)
        fm, fv = fold_batch_norm(model, state.params)
        l2, v2 = fm.apply(fv, obs)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=2e-2)
        # The folded tree must contain no norm parameters at all.
        flat = jax.tree_util.tree_flatten_with_path(fv)[0]
        assert not any("BatchNorm" in str(k) for k, _ in flat)

    def test_inference_eval_fn_folds(self):
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.models.resnet import make_inference_eval_fn

        model = self._model()
        vs = model.init(jax.random.key(0), jnp.zeros((1, 3, 7, 7)))
        eval_fn = make_inference_eval_fn(model, vs)
        logits, value = eval_fn(jnp.zeros((2, 3, 7, 7)))
        assert logits.shape == (2, 49) and value.shape == (2,)
