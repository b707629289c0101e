"""End-to-end pipeline smoke tests: actor -> replay -> learner + orbax
checkpoint round-trip (reference integration-test analog, SURVEY.md §4).

Each scenario runs in a SUBPROCESS on a 4-virtual-device CPU mesh.  Root
cause of the old in-process flakiness: XLA:CPU cross-device collectives
use a rendezvous with a HARDCODED 40s termination timeout
(xla/.../rendezvous.cc "Expected N threads to join ... Exiting to ensure a
consistent program state" -> CHECK-fail -> SIGABRT, which faulthandler
reports as a bare "Fatal Python error: Aborted").  On a small host (this
CI box has 2 cores) an 8-party all-reduce misses that deadline whenever
anything else — another test's 45s chess-legality compile, a concurrent
bench — competes for the cores, killing the whole pytest process.  The
subprocess contains the blast radius (a readable error instead of a dead
suite) and 4 devices halve the rendezvous width; full 8-device Pipeline
coverage still runs in the driver's dryrun_multichip outside pytest.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PRELUDE = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
from pathlib import Path
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.resnet import ResNetConfig
from alphazero_tpu.selfplay.actor import SelfPlayConfig
from alphazero_tpu.training.learner import LearnerConfig
from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

def tiny_config(tmp_path, **kw):
    defaults = dict(
        game="gomoku",
        board_size=5,
        model=ResNetConfig(num_blocks=1, channels=16),
        selfplay=SelfPlayConfig(
            mcts=MCTSConfig(num_simulations=8, dirichlet_alpha=0.5),
            max_moves=25,
            temperature_drop_move=4,
        ),
        learner=LearnerConfig(
            learning_rate=1e-3, scheduler="constant", total_steps=100
        ),
        iterations=2,
        games_per_iteration=8,
        train_steps_per_iteration=4,
        train_batch_size=32,
        replay_capacity=4096,
        min_replay_before_training=32,
        checkpoint_dir=str(Path(tmp_path) / "ckpt"),
        checkpoint_every=1,
    )
    defaults.update(kw)
    return PipelineConfig(**defaults)
"""


def run_pipeline_script(body: str, tmp_path) -> None:
    """Run a pipeline scenario in a fresh interpreter on the 8-device CPU
    backend; assertions inside ``body`` surface as non-zero exit."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # min(4, cores) devices, overriding the suite-wide 8: see module
    # docstring.  Round 3: 4 virtual devices on this 2-core box missed the
    # 40s rendezvous deadline even with the suite otherwise idle (each
    # collective party needs a core-resident thread; 4 parties on 2 cores
    # rely on preemption timing) — reproduced at a pre-round commit, so
    # environmental, not a regression.  Round 5: even TWO parties on the
    # 2-core box abort whenever anything sustained (a TPU training run's
    # host loop, a concurrent suite) shares the cores — both retry
    # attempts died.  On <=2-core hosts use ONE device: the pipeline's
    # end-to-end logic is identical and there are no cross-device
    # collectives left to race the deadline.  Never exceed the physical
    # core count; wider sharding coverage lives in dryrun_multichip + the
    # sharded-equals-unsharded checks of test_parallel.py.
    cores = os.cpu_count() or 2
    n_dev = min(4, cores) if cores > 2 else 1
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={n_dev}"]
    )
    script = _PRELUDE.format(repo=REPO) + body.format(tmp=str(tmp_path))
    for attempt in (0, 1):
        proc = subprocess.run(
            [sys.executable, "-c", script], env=env, cwd=REPO,
            capture_output=True, text=True, timeout=1200,
        )
        if proc.returncode == 0:
            return
        # XLA:CPU's hardcoded 40s collective-rendezvous deadline aborts
        # under host CPU contention (module docstring) — an environmental
        # SIGABRT, not a product failure.  Retry that signature once:
        # the rendezvous message when XLA prints it, or the bare
        # SIGABRT/"Fatal Python error: Aborted" that faulthandler reduces
        # it to.  Anything else fails immediately; a real product abort
        # still fails on the retry.
        stderr = proc.stderr or ""
        environmental = (
            "rendezvous" in stderr
            or "Fatal Python error: Aborted" in stderr
            or proc.returncode == -6
        )
        if attempt == 0 and environmental:
            continue
        break
    assert proc.returncode == 0, (
        f"pipeline subprocess failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-1000:]}\n{proc.stderr[-3000:]}"
    )


class TestPipeline:
    def test_two_iterations_train(self, tmp_path):
        run_pipeline_script("""
pipe = Pipeline(tiny_config({tmp!r}))
e1 = pipe.run_iteration(0)
assert e1["moves"] > 0, e1
assert e1["replay_size"] > 0, e1
e2 = pipe.run_iteration(1)
assert "loss" in e2, e2  # enough replay to train by iteration 2
# Trains 4 steps per iteration once the buffer floor is crossed.
assert int(pipe.state.step) in (4, 8), int(pipe.state.step)
""", tmp_path)

    def test_inference_modes(self, tmp_path):
        """The production actor runs the fast inference path (VERDICT r3
        #3): the default "folded" transform must agree with raw
        model.apply, and an int8 iteration must run end-to-end with the
        quantized params refreshed from the learner weights."""
        run_pipeline_script("""
import jax, dataclasses
import jax.numpy as jnp
import numpy as np

from alphazero_tpu import production
# The default executor IS the production executor (VERDICT r4 weak #4).
assert PipelineConfig().inference == production.INFERENCE
assert PipelineConfig().int8_calib_percentile == \
    production.INT8_CALIB_PERCENTILE

cfg = tiny_config({tmp!r}, iterations=1, inference="folded")
pipe = Pipeline(cfg)

# Folded eval == raw eval on real observations (BN-fold exactness).
obs = jax.vmap(pipe.env.observation)(
    jax.vmap(lambda _: pipe.env.init())(jnp.arange(4))
)
lf, vf = pipe.model.apply(pipe.state.params, obs)
ev = pipe._eval_transform(pipe.state.params)
from alphazero_tpu.models.resnet import AZResNet
folded = AZResNet(num_actions=pipe.env.num_actions,
                  cfg=dataclasses.replace(cfg.model, norm="none"))
lg, vg = folded.apply(ev, obs)
np.testing.assert_allclose(np.asarray(lf), np.asarray(lg),
                           atol=2e-2, rtol=1e-2)
np.testing.assert_allclose(np.asarray(vf), np.asarray(vg), atol=2e-2)
e = pipe.run_iteration(0)
assert e["moves"] > 0, e

# int8 mode: quantized actor iteration end-to-end.
pipe8 = Pipeline(tiny_config({tmp!r}, iterations=1, inference="int8",
                             int8_chunk=0))
e8 = pipe8.run_iteration(0)
assert e8["moves"] > 0, e8
""", tmp_path)

    def test_randwire_pipeline(self, tmp_path):
        """model_kind="randwire" runs the reference's canonical model
        family through the production pipeline (inference falls back to
        raw for non-foldable models)."""
        run_pipeline_script("""
cfg = tiny_config({tmp!r}, iterations=1,
                  model_kind="randwire",
                  model_options=(("num_blocks", 1),
                                 ("nodes_per_block", 3),
                                 ("channels", 16)))
pipe = Pipeline(cfg)
e = pipe.run_iteration(0)
assert e["moves"] > 0, e
""", tmp_path)

    def test_checkpoint_roundtrip(self, tmp_path):
        run_pipeline_script("""
import numpy as np
import jax
pipe = Pipeline(tiny_config({tmp!r}))
pipe.run_iteration(0)
pipe.run_iteration(1)
pipe.save_checkpoint(1)

pipe2 = Pipeline(tiny_config({tmp!r}))
step = pipe2.restore_checkpoint()
assert step == 1, step
assert int(pipe2.state.step) == int(pipe.state.step)
p1 = jax.tree_util.tree_leaves(pipe.state.params)
p2 = jax.tree_util.tree_leaves(pipe2.state.params)
for a, b in zip(p1, p2):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
""", tmp_path)

    def test_history_written(self, tmp_path):
        run_pipeline_script("""
import json, os
cfg = tiny_config({tmp!r})
pipe = Pipeline(cfg)
pipe.run(iterations=1)
path = os.path.join(cfg.checkpoint_dir, "history.json")
with open(path) as f:
    hist = json.load(f)
assert len(hist) == 1, hist
""", tmp_path)
