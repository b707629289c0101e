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
