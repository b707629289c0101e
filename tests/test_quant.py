"""int8 inference trunk tests (models/quant.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.models.quant import (
    extract_folded,
    forward_bf16,
    make_int8_eval_fn,
)
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig, fold_batch_norm
from alphazero_tpu.training.learner import (
    LearnerConfig,
    create_train_state,
    train_step,
)
from alphazero_tpu.training.replay import Batch


def trained_model(steps=5):
    cfg = ResNetConfig(num_blocks=2, channels=32)
    model = AZResNet(num_actions=49, cfg=cfg)
    lcfg = LearnerConfig()
    st, tx = create_train_state(model, jax.random.key(0), (3, 7, 7), lcfg)
    rng = jax.random.key(1)
    for _ in range(steps):
        rng, sub = jax.random.split(rng)
        obs = jax.random.uniform(sub, (16, 3, 7, 7))
        pol = jax.nn.softmax(jax.random.normal(sub, (16, 49)))
        batch = Batch(obs=obs, policy=pol,
                      value=jnp.sin(jnp.arange(16.0)))
        st, _ = train_step(st, batch, model, tx, lcfg)
    return model, st.params


class TestQuant:
    def test_bf16_executor_matches_flax_exactly(self):
        model, params = trained_model()
        obs = jax.random.uniform(jax.random.key(9), (8, 3, 7, 7))
        fm, fv = fold_batch_norm(model, params)
        l_flax, v_flax = fm.apply(fv, obs)
        fp = extract_folded(model, params)
        l_ref, v_ref = forward_bf16(fp, obs)
        np.testing.assert_array_equal(np.asarray(l_flax), np.asarray(l_ref))
        np.testing.assert_array_equal(np.asarray(v_flax), np.asarray(v_ref))

    def test_int8_matches_bf16_closely(self):
        model, params = trained_model()
        obs = jax.random.uniform(jax.random.key(9), (32, 3, 7, 7))
        fm, fv = fold_batch_norm(model, params)
        l_f, v_f = fm.apply(fv, obs)
        ev = make_int8_eval_fn(model, params, calib_obs=obs)
        l_q, v_q = ev(obs)
        agree = float(
            (jnp.argmax(l_q, -1) == jnp.argmax(l_f, -1)).mean()
        )
        corr = float(np.corrcoef(np.asarray(l_q).ravel(),
                                 np.asarray(l_f).ravel())[0, 1])
        assert agree >= 0.9
        assert corr >= 0.99
        assert float(jnp.abs(v_q - v_f).mean()) < 0.02

    def test_int8_residual_carry_matches_closely(self):
        """residual="int8" (s8-only trunk stream, the bench default —
        the conv chain is HBM-bandwidth-bound, BENCHLOG round 3) must hold
        the same quality bars as the bf16-residual int8 path."""
        model, params = trained_model()
        obs = jax.random.uniform(jax.random.key(9), (32, 3, 7, 7))
        fm, fv = fold_batch_norm(model, params)
        l_f, v_f = fm.apply(fv, obs)
        ev = make_int8_eval_fn(model, params, calib_obs=obs,
                               residual="int8")
        l_q, v_q = ev(obs)
        agree = float(
            (jnp.argmax(l_q, -1) == jnp.argmax(l_f, -1)).mean()
        )
        corr = float(np.corrcoef(np.asarray(l_q).ravel(),
                                 np.asarray(l_f).ravel())[0, 1])
        assert agree >= 0.9
        assert corr >= 0.99
        assert float(jnp.abs(v_q - v_f).mean()) < 0.03

    def test_int8_eval_fn_shapes_and_default_calibration(self):
        model, params = trained_model(steps=1)
        ev = make_int8_eval_fn(model, params)  # zero-obs calibration
        logits, value = ev(jnp.zeros((4, 3, 7, 7)))
        assert logits.shape == (4, 49)
        assert value.shape == (4,)
        assert np.isfinite(np.asarray(logits)).all()

    def test_tap_sum_se_mean_identity(self):
        # mean_hw(SAME conv(x)) == sum_taps K[tap]^T . tap_sum(x) / HW —
        # the algebraic identity _se_gate_precomputed relies on.
        from alphazero_tpu.models.quant import _conv_i8, _tap_sums

        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.integers(-127, 128, (4, 7, 9, 16)), jnp.int8
        )
        w = jnp.asarray(rng.integers(-127, 128, (3, 3, 16, 8)), jnp.int8)
        direct = _conv_i8(x, w).astype(jnp.float32).mean((1, 2))
        taps = _tap_sums(x).astype(jnp.float32)
        via_taps = jnp.einsum(
            "btc,tco->bo", taps, w.astype(jnp.float32).reshape(9, 16, 8)
        ) / (7 * 9)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(via_taps), rtol=1e-5, atol=1e-4
        )


class TestParamsStyleEval:
    def test_params_eval_matches_closure_eval(self):
        """make_int8_eval_params (qp as jit arguments) must produce
        bit-identical outputs to make_int8_eval_fn (qp as constants) —
        both unroll-chunked and monolithic."""
        from alphazero_tpu.models.quant import (
            make_int8_eval_fn, make_int8_eval_params,
        )

        cfg = ResNetConfig(num_blocks=2, channels=16)
        model = AZResNet(num_actions=49, cfg=cfg)
        obs_shape = (11, 7, 7)
        params = model.init(
            jax.random.key(0), jnp.zeros((1,) + obs_shape, jnp.float32)
        )
        calib = jax.random.uniform(jax.random.key(1), (8,) + obs_shape)
        obs = jax.random.uniform(jax.random.key(2), (8,) + obs_shape)

        for chunk in (None, 4):
            closure = make_int8_eval_fn(
                model, params, calib_obs=calib, chunk=chunk)
            fn, qp = make_int8_eval_params(
                model, params, calib_obs=calib, chunk=chunk)
            l1, v1 = jax.jit(closure)(obs)
            l2, v2 = jax.jit(fn)(qp, obs)
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_params_eval_heads_parity(self):
        """heads= threads through make_int8_eval_params (advisor r3):
        the params path must match the closure path for int8 heads too."""
        from alphazero_tpu.models.quant import (
            make_int8_eval_fn, make_int8_eval_params,
        )

        cfg = ResNetConfig(num_blocks=2, channels=16)
        model = AZResNet(num_actions=49, cfg=cfg)
        obs_shape = (11, 7, 7)
        params = model.init(
            jax.random.key(0), jnp.zeros((1,) + obs_shape, jnp.float32)
        )
        calib = jax.random.uniform(jax.random.key(1), (8,) + obs_shape)
        obs = jax.random.uniform(jax.random.key(2), (8,) + obs_shape)

        closure = make_int8_eval_fn(
            model, params, calib_obs=calib, chunk=None,
            residual="int8", heads="int8")
        fn, qp = make_int8_eval_params(
            model, params, calib_obs=calib, chunk=None,
            residual="int8", heads="int8")
        l1, v1 = jax.jit(closure)(obs)
        l2, v2 = jax.jit(fn)(qp, obs)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
