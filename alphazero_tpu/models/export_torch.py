"""TorchScript export — the external model interchange format.

The reference deploys nets as TorchScript/ONNX
(``python/scripts/export_model.py``, ``simple_export.py``); a trained
alphazero_tpu model should likewise be usable OUTSIDE this framework.
This module rebuilds the BN-folded inference network (``norm="none"``
AZResNet: convs-with-bias + SE + policy/value heads) as a plain
``torch.nn.Module``, copies the flax weights in (HWIO -> OIHW), and
``torch.jit.trace``s it to a portable ``.pt`` — loadable by any LibTorch
runtime, including the reference's own C++ ``TorchNeuralNetwork``
(``src/nn/torch_neural_network.cpp:224-280`` expects exactly this
(policy_logits, value) forward on NCHW observation planes).

torch is CPU-only in this image; export runs on host, no TPU involved.
"""
from __future__ import annotations

from typing import Any, Tuple

import numpy as np


def _require_torch():
    try:
        import torch  # noqa: F401
    except ImportError as e:  # pragma: no cover — torch is in the image
        raise RuntimeError(
            "TorchScript export needs torch (CPU build is enough)"
        ) from e
    import torch

    return torch


def build_torch_module(model, variables):
    """Torch mirror of the BN-folded AZResNet.  Returns (module, cfg)."""
    torch = _require_torch()
    from alphazero_tpu.models.quant import extract_folded

    fp = extract_folded(model, variables)  # folds BN, flat dict of arrays
    cfg = model.cfg
    num_actions = model.num_actions

    def conv2d(w, kernel_size):
        k = np.asarray(w["kernel"], np.float32)  # HWIO
        b = np.asarray(w["bias"], np.float32)
        out_c, in_c = k.shape[3], k.shape[2]
        m = torch.nn.Conv2d(in_c, out_c, kernel_size,
                            padding=kernel_size // 2, bias=True)
        m.weight.data = torch.from_numpy(
            np.transpose(k, (3, 2, 0, 1)).copy())  # HWIO -> OIHW
        m.bias.data = torch.from_numpy(b.copy())
        return m

    def linear(w):
        k = np.asarray(w["kernel"], np.float32)  # [in, out]
        b = np.asarray(w["bias"], np.float32)
        m = torch.nn.Linear(k.shape[0], k.shape[1], bias=True)
        m.weight.data = torch.from_numpy(k.T.copy())
        m.bias.data = torch.from_numpy(b.copy())
        return m

    class TorchSE(torch.nn.Module):
        def __init__(self, blk):
            super().__init__()
            self.fc1 = linear(blk["se1"])
            self.fc2 = linear(blk["se2"])

        def forward(self, x):
            s = x.mean(dim=(2, 3))
            s = torch.relu(self.fc1(s))
            g = torch.sigmoid(self.fc2(s))
            return x * g[:, :, None, None]

    class TorchBlock(torch.nn.Module):
        def __init__(self, blk):
            super().__init__()
            self.conv1 = conv2d(blk["conv1"], 3)
            self.conv2 = conv2d(blk["conv2"], 3)
            self.se = TorchSE(blk)

        def forward(self, x):
            h = torch.relu(self.conv1(x))
            h = self.se(self.conv2(h))
            return torch.relu(x + h)

    class TorchAZResNet(torch.nn.Module):
        """(policy_logits [B, A], value [B]) from NCHW obs planes —
        the reference TorchNeuralNetwork forward contract."""

        def __init__(self):
            super().__init__()
            self.stem = conv2d(fp["stem"], 3)
            self.blocks = torch.nn.ModuleList(
                [TorchBlock(b) for b in fp["blocks"]]
            )
            self.policy_conv = conv2d(fp["policy_conv"], 1)
            self.policy_fc = linear(fp["policy_dense"])
            self.value_conv = conv2d(fp["value_conv"], 1)
            self.value_fc1 = linear(fp["value_dense1"])
            self.value_fc2 = linear(fp["value_dense2"])

        def forward(self, obs):
            x = torch.relu(self.stem(obs))
            for blk in self.blocks:
                x = blk(x)
            # flax flattens NHWC; torch tensors are NCHW -> permute first
            # so the dense layers see the same feature order.
            p = torch.relu(self.policy_conv(x))
            p = p.permute(0, 2, 3, 1).reshape(p.shape[0], -1)
            logits = self.policy_fc(p)
            v = torch.relu(self.value_conv(x))
            v = v.permute(0, 2, 3, 1).reshape(v.shape[0], -1)
            v = torch.relu(self.value_fc1(v))
            value = torch.tanh(self.value_fc2(v)).squeeze(-1)
            return logits, value

    module = TorchAZResNet().eval()
    return module, {"num_actions": num_actions,
                    "num_blocks": cfg.num_blocks,
                    "channels": cfg.channels}


def export_torchscript(model, variables, obs_shape: Tuple[int, int, int],
                       out_path: str) -> str:
    """Trace the torch mirror on a dummy observation and save ``.pt``."""
    torch = _require_torch()
    module, _ = build_torch_module(model, variables)
    dummy = torch.zeros((1,) + tuple(obs_shape), dtype=torch.float32)
    with torch.no_grad():
        traced = torch.jit.trace(module, dummy)
    traced.save(out_path)
    return out_path


def verify_export(model, variables, obs: Any, pt_path: str,
                  atol: float = 2e-2) -> dict:
    """Load the .pt back and compare against the JAX folded forward on
    real observations.  Returns the max abs deviations."""
    torch = _require_torch()
    import jax

    from alphazero_tpu.models.resnet import make_inference_eval_fn

    eval_fn = make_inference_eval_fn(model, variables)
    jl, jv = jax.jit(eval_fn)(obs)
    ts = torch.jit.load(pt_path).eval()
    with torch.no_grad():
        tl, tv = ts(torch.from_numpy(np.asarray(obs, np.float32)))
    dl = float(np.max(np.abs(np.asarray(jl) - tl.numpy())))
    dv = float(np.max(np.abs(np.asarray(jv) - tv.numpy())))
    if dl > atol or dv > atol:
        raise AssertionError(
            f"TorchScript export diverges: logits {dl:.4f}, value {dv:.4f}"
        )
    return {"max_logit_dev": dl, "max_value_dev": dv}
