"""Short end-to-end training demo on the chip, then arena vs the
uniform-random player.  DEMO_GAME=gomoku (default) or go, DEMO_ITERS=N.

Evidence artifact: /tmp/train_demo.json (history + win rate).
"""
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.eval.arena import ArenaConfig, play_match
from alphazero_tpu.mcts.search import MCTSConfig
from alphazero_tpu.models.resnet import ResNetConfig
from alphazero_tpu.models.stub import make_uniform_eval_fn
from alphazero_tpu.selfplay.actor import SelfPlayConfig
from alphazero_tpu.training.learner import LearnerConfig
from alphazero_tpu.training.pipeline import Pipeline, PipelineConfig

ITERS = int(os.environ.get("DEMO_ITERS", "8"))
GAME = os.environ.get("DEMO_GAME", "gomoku")
WAVE = int(os.environ.get("DEMO_WAVE", "1"))
BOARD = int(os.environ.get("DEMO_BOARD", "9"))
GAMES = int(os.environ.get("DEMO_GAMES", "512"))
SIMS = int(os.environ.get("DEMO_SIMS", "128"))

MAXM = BOARD * BOARD + 1
config = PipelineConfig(
    game=GAME,
    board_size=BOARD,
    model=ResNetConfig(num_blocks=4, channels=64),
    selfplay=SelfPlayConfig(
        mcts=MCTSConfig(num_simulations=SIMS, dirichlet_alpha=0.2,
                        wave_size=WAVE),
        max_moves=MAXM,
        temperature_drop_move=12,
    ),
    learner=LearnerConfig(
        learning_rate=2e-3, scheduler="constant",
        total_steps=ITERS * 64,
    ),
    iterations=ITERS,
    games_per_iteration=GAMES,
    train_steps_per_iteration=64,
    train_batch_size=2048,
    replay_capacity=200_000,
    min_replay_before_training=4096,
    checkpoint_dir="/tmp/demo_ckpt",
    checkpoint_every=10**9,
)

pipe = Pipeline(config)
t0 = time.time()
history = pipe.run(ITERS)
train_s = time.time() - t0

# Arena: trained net vs uniform-random player.
env = pipe.env
model = pipe.model
params = pipe.state.params


def eval_trained(obs, to_play=None):
    return model.apply(params, obs)


eval_random = make_uniform_eval_fn(env.num_actions, value_noise=0.1)
acfg = ArenaConfig(
    mcts=MCTSConfig(num_simulations=64, dirichlet_epsilon=0.0),
    max_moves=MAXM,
    temperature=0.1,
)
res = jax.jit(
    lambda r: play_match(env, eval_trained, eval_random, r, acfg, 64)
)(jax.random.key(7))
result = {
    "iterations": ITERS,
    "train_wall_s": round(train_s, 1),
    "history": history,
    "arena_vs_random": {
        "wins": int(res.wins_a), "losses": int(res.wins_b),
        "draws": int(res.draws),
    },
}
with open("/tmp/train_demo.json", "w") as f:
    json.dump(result, f, indent=2)
print(json.dumps({
    "game": GAME,
    "final_loss": history[-1].get("loss"),
    "first_loss": next((h.get("loss") for h in history if "loss" in h),
                       None),
    "win_rate_vs_random": int(res.wins_a) / 64,
    "train_wall_s": round(train_s, 1),
}))
