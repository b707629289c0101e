"""Real 2-process multi-host test (VERDICT r3 #6).

Launches two OS processes that ``jax.distributed.initialize`` against a
localhost coordinator (2 virtual CPU devices each -> 4 global), then
exercises the true multi-host code paths that the single-process suite
can only no-op:

  * ``parallel/distributed.initialize`` (explicit coordinator branch),
  * ``make_global_array`` assembling per-host shards (XLA:CPU Gloo
    collectives carry the cross-host traffic),
  * ``Pipeline.ingest_record_files``'s ``process_count() > 1`` branch
    (training/pipeline.py) — each host ingests its own record shard and
    the replay ring ends up globally sharded,
  * one ``run_training_only`` step over the sharded buffer — cross-host
    gradient all-reduce; both hosts must compute the identical loss.

The reference's analog is orchestrate_selfplay's subprocess + filesystem
merge (python/scripts/orchestrate_selfplay.py:303-400); here device
arrays are the transport (SURVEY.md SS2.8).
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
pid = int(sys.argv[1]); port = sys.argv[2]; tmp = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
from alphazero_tpu.parallel import distributed
distributed.initialize(f"127.0.0.1:{{port}}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
from jax.sharding import PartitionSpec as P
from alphazero_tpu.parallel import mesh as meshlib

mesh = meshlib.make_mesh()
local = np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * pid
ga = distributed.make_global_array(local, mesh, P(meshlib.DATA_AXIS))
assert ga.shape == (8, 2), ga.shape
tot = jax.jit(lambda x: x.sum(), out_shardings=meshlib.replicated(mesh))(ga)
expected = sum((np.arange(8) + 100.0 * p).sum() for p in range(2))
assert abs(float(tot) - expected) < 1e-3, (float(tot), expected)

from alphazero_tpu.core.types import GameResult, GameType
from alphazero_tpu.selfplay.game_record import GameRecord

host_dir = os.path.join(tmp, f"host{{pid}}")
os.makedirs(host_dir, exist_ok=True)
rng = np.random.default_rng(pid)
for g in range(2):
    rec = GameRecord(GameType.GOMOKU, 5)
    for a in rng.choice(25, size=4, replace=False):
        pol = np.zeros(25); pol[a] = 1.0
        rec.add_move(int(a), pol, 0.1)
    rec.set_result(GameResult.WIN_PLAYER1)
    rec.save(os.path.join(host_dir, f"g{{g}}.json"))

from alphazero_tpu.models.resnet import ResNetConfig
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.selfplay.actor import SelfPlayConfig
from alphazero_tpu.training.learner import LearnerConfig
from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

cfg = PipelineConfig(
    game="gomoku", board_size=5,
    model=ResNetConfig(num_blocks=1, channels=16),
    selfplay=SelfPlayConfig(mcts=MCTSConfig(num_simulations=4), max_moves=8),
    learner=LearnerConfig(scheduler="constant", total_steps=10),
    games_per_iteration=4, train_steps_per_iteration=1,
    train_batch_size=8, replay_capacity=256,
    min_replay_before_training=8,
    checkpoint_dir=os.path.join(tmp, f"ckpt{{pid}}"),
)
pipe = Pipeline(cfg)
n = pipe.ingest_record_files(host_dir)
size = int(pipe.buffer.size)
assert n == 8, n          # 2 games x 4 moves, this host's shard
assert size == 16, size   # both hosts' shards land in the global ring
out = pipe.run_training_only(1)
print(f"MULTIHOST_OK pid={{pid}} loss={{out[0]['loss']:.6f}}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_ingest_and_train(tmp_path):
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER.format(repo=REPO))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(p), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out
    # Cross-host determinism: both hosts computed the same loss.
    losses = [line.split("loss=")[1] for out in outs
              for line in out.splitlines() if "MULTIHOST_OK" in line]
    assert len(losses) == 2 and losses[0] == losses[1], losses
