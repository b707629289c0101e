"""TorchScript export parity (models/export_torch.py).

The external interchange format (reference: python/scripts/export_model.py
TorchScript/ONNX): the exported .pt must reproduce the JAX BN-folded
forward.  Final layers are zero-initialized in AZResNet, so the params are
perturbed first — otherwise the parity check would only compare zeros.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alphazero_tpu.core import registry  # noqa: E402
from alphazero_tpu.models.export_torch import (  # noqa: E402
    export_torchscript,
    verify_export,
)
from alphazero_tpu.models.resnet import AZResNet, ResNetConfig  # noqa: E402


def _perturbed_model(env, seed=0):
    model = AZResNet(num_actions=env.num_actions,
                     cfg=ResNetConfig(num_blocks=2, channels=32))
    params = model.init(
        jax.random.key(seed),
        jnp.zeros((1,) + env.observation_shape, jnp.float32),
    )
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(seed + 1), len(leaves))
    leaves = [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf
        for leaf, k in zip(leaves, keys)
    ]
    return model, jax.tree_util.tree_unflatten(treedef, leaves)


def _nontrivial_obs(env, batch=8, moves=6, seed=0):
    rng = np.random.default_rng(seed)
    states = jax.vmap(lambda _: env.init())(jnp.arange(batch))
    for _ in range(moves):
        legal = jax.vmap(env.legal_mask)(states)
        acts = jnp.argmax(jnp.asarray(rng.random(legal.shape)) * legal, -1)
        states = jax.vmap(env.step)(states, acts.astype(jnp.int32))
    return jax.vmap(env.observation)(states)


def test_torchscript_roundtrip_parity(tmp_path):
    env = registry.create_game("gomoku", 9)
    model, params = _perturbed_model(env)
    pt = str(tmp_path / "az.pt")
    export_torchscript(model, params, env.observation_shape, pt)

    obs = _nontrivial_obs(env)
    devs = verify_export(model, params, obs, pt, atol=5e-2)
    # Outputs must be non-trivial (perturbed final layers) yet agree.
    ts = torch.jit.load(pt).eval()
    with torch.no_grad():
        logits, value = ts(torch.from_numpy(np.asarray(obs, np.float32)))
    assert float(logits.abs().max()) > 1e-3
    assert float(value.abs().max()) > 1e-4
    assert devs["max_logit_dev"] <= 5e-2


def test_torchscript_loads_standalone(tmp_path):
    """The artifact must be loadable without alphazero_tpu on the path —
    torch.jit.load only (what an external LibTorch runtime does)."""
    env = registry.create_game("gomoku", 9)
    model, params = _perturbed_model(env, seed=3)
    pt = str(tmp_path / "az.pt")
    export_torchscript(model, params, env.observation_shape, pt)
    ts = torch.jit.load(pt).eval()
    with torch.no_grad():
        logits, value = ts(torch.zeros((2,) + env.observation_shape))
    assert logits.shape == (2, env.num_actions)
    assert value.shape == (2,)
