"""Model export / packaging CLI.

Parity: the reference's export_model.py / simple_export.py /
package_model.py (TorchScript/ONNX export + distribution zips).  Here the
deployable artifact is the (msgpack params, JSON config) bundle from
models/io.py; this tool converts checkpoints to bundles and zips them with
metadata for distribution.
"""
from __future__ import annotations

import argparse
import json
import os
import time
import zipfile


def export_from_checkpoint(checkpoint_dir, out_path, game, board_size,
                           blocks, channels, step=None):
    from alphazero_tpu.core import registry
    from alphazero_tpu.models.io import save_model
    from alphazero_tpu.models.resnet import ResNetConfig
    from alphazero_tpu.training.learner import LearnerConfig
    from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

    env = registry.create_game(game, board_size)
    cfg = PipelineConfig(
        game=game, board_size=board_size,
        model=ResNetConfig(num_blocks=blocks, channels=channels),
        checkpoint_dir=checkpoint_dir,
        learner=LearnerConfig(total_steps=1),
    )
    pipe = Pipeline(cfg)
    restored = pipe.restore_checkpoint(step)
    save_model(out_path, pipe.state.params, "resnet", env.num_actions,
               cfg.model)
    return restored


def package(bundle_path, zip_path, metadata=None):
    meta = {
        "format": "alphazero_tpu.bundle.v1",
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        **(metadata or {}),
    }
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(bundle_path, os.path.basename(bundle_path))
        z.write(bundle_path + ".json",
                os.path.basename(bundle_path) + ".json")
        z.writestr("metadata.json", json.dumps(meta, indent=2))
    return zip_path


def main(argv=None):
    from alphazero_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", default=None,
                   help="orbax checkpoint dir to convert to a bundle")
    p.add_argument("--bundle", default=None,
                   help="existing (msgpack, JSON) bundle to export directly "
                   "(e.g. models_zoo/flagship_gomoku15); mutually exclusive "
                   "with --checkpoint-dir")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--game", default="gomoku")
    p.add_argument("--board-size", type=int, default=15)
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--output", default="model.msgpack")
    p.add_argument("--package", default=None,
                   help="also write a distribution zip here")
    p.add_argument("--torchscript", default=None,
                   help="also export a TorchScript .pt here (the external "
                   "interchange format; loadable by any LibTorch runtime, "
                   "including the reference's TorchNeuralNetwork)")
    p.add_argument("--onnx", default=None,
                   help="also export an ONNX file here (opset 13; the "
                   "reference's second export format, export_model.py:294). "
                   "Output parity is verified by parsing the file back and "
                   "replaying it with numpy (no onnx runtime in this image)")
    args = p.parse_args(argv)

    if (args.bundle is None) == (args.checkpoint_dir is None):
        p.error("exactly one of --checkpoint-dir / --bundle is required")
    if args.bundle is not None:
        args.output = args.bundle
        step = None
    else:
        step = export_from_checkpoint(
            args.checkpoint_dir, args.output, args.game, args.board_size,
            args.blocks, args.channels, args.step,
        )
    out = {"bundle": args.output, "checkpoint_step": step}
    if args.torchscript:
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.core import registry
        from alphazero_tpu.models.export_torch import (
            export_torchscript,
            verify_export,
        )
        from alphazero_tpu.models.io import load_model

        env = registry.create_game(args.game, args.board_size)
        model, params = load_model(args.output, env.observation_shape)
        export_torchscript(model, params, env.observation_shape,
                           args.torchscript)
        obs = jax.vmap(env.observation)(
            jax.vmap(lambda _: env.init())(jnp.arange(4))
        )
        out["torchscript"] = args.torchscript
        out["torchscript_parity"] = verify_export(
            model, params, obs, args.torchscript
        )
    if args.onnx:
        import jax
        import jax.numpy as jnp

        from alphazero_tpu.core import registry
        from alphazero_tpu.models.export_onnx import (
            export_onnx,
            verify_onnx_export,
        )
        from alphazero_tpu.models.io import load_model

        env = registry.create_game(args.game, args.board_size)
        model, params = load_model(args.output, env.observation_shape)
        export_onnx(model, params, env.observation_shape, args.onnx)
        obs = jax.vmap(env.observation)(
            jax.vmap(lambda _: env.init())(jnp.arange(4))
        )
        out["onnx"] = args.onnx
        out["onnx_parity"] = verify_onnx_export(model, params, obs,
                                                args.onnx)
    if args.package:
        package(args.output, args.package,
                {"game": args.game, "board_size": args.board_size,
                 "checkpoint_step": step})
        out["package"] = args.package
    print(json.dumps(out))


if __name__ == "__main__":
    main()
