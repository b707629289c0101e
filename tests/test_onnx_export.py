"""ONNX export with round-trip output-parity verification
(models/export_onnx.py; reference python/scripts/export_model.py:294).

No onnx package exists in this image, so parity is verified the strong
way available: the exported FILE is parsed back from bytes by the
module's own minimal ONNX reader and replayed with numpy, then compared
against the JAX folded forward — the serialized artifact itself is
exercised end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.core import registry
from alphazero_tpu.models.export_onnx import (
    export_onnx,
    load_and_run_onnx,
    verify_onnx_export,
)
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig


def _tiny_model(env):
    model = AZResNet(num_actions=env.num_actions,
                     cfg=ResNetConfig(num_blocks=2, channels=16))
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1,) + env.observation_shape, jnp.float32),
    )
    return model, params


def _real_obs(env, n=4):
    """Mid-game-ish observations: random legal rollouts."""
    states = jax.vmap(lambda _: env.init())(jnp.arange(n))
    rng = jax.random.key(3)
    for i in range(6):
        rng, sub = jax.random.split(rng)
        legal = jax.vmap(env.legal_mask)(states)
        acts = jax.random.categorical(
            sub, jnp.where(legal, 0.0, -1e9)
        ).astype(jnp.int32)
        states = jax.vmap(env.step)(states, acts)
    return jax.vmap(env.observation)(states)


class TestOnnxExport:
    def test_export_and_parity(self, tmp_path):
        env = registry.create_game("gomoku", 9)
        model, params = _tiny_model(env)
        path = str(tmp_path / "az.onnx")
        export_onnx(model, params, env.observation_shape, path)
        devs = verify_onnx_export(model, params, _real_obs(env), path)
        assert devs["max_logit_dev"] < 2e-2, devs
        assert devs["max_value_dev"] < 2e-2, devs

    def test_dynamic_batch(self, tmp_path):
        """The graph declares a dynamic batch dim; replay at two batch
        sizes from one exported file."""
        env = registry.create_game("gomoku", 9)
        model, params = _tiny_model(env)
        path = str(tmp_path / "az.onnx")
        export_onnx(model, params, env.observation_shape, path)
        for n in (1, 3):
            obs = np.asarray(_real_obs(env, n), np.float32)
            logits, value = load_and_run_onnx(path, obs)
            assert logits.shape == (n, env.num_actions)
            assert value.shape == (n,)
            assert np.all(np.abs(value) <= 1.0)

    def test_file_is_onnx_shaped(self, tmp_path):
        """Structural checks on the serialized ModelProto: ir_version,
        opset 13, graph with nodes/initializers/io."""
        from alphazero_tpu.models.export_onnx import _fields, _parse_msg

        env = registry.create_game("gomoku", 9)
        model, params = _tiny_model(env)
        path = str(tmp_path / "az.onnx")
        export_onnx(model, params, env.observation_shape, path)
        with open(path, "rb") as f:
            msg = _parse_msg(f.read())
        assert _fields(msg, 1)[0] == 8  # ir_version
        opset = _parse_msg(_fields(msg, 8)[0])
        assert _fields(opset, 2)[0] == 13
        graph = _parse_msg(_fields(msg, 7)[0])
        assert len(_fields(graph, 1)) > 10  # nodes
        assert len(_fields(graph, 5)) > 10  # initializers
        assert len(_fields(graph, 11)) == 1  # input
        assert len(_fields(graph, 12)) == 2  # outputs
