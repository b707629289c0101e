"""Fixed-seed search parity vs the REFERENCE C++ engine.

``tools/parity/parity_dump.cpp`` (built by ``tools/parity/build.sh`` from a
patched copy of the reference — the checked-in code has compile errors and
two expansionMutex self-deadlocks) runs the reference's serial deterministic
search (numThreads=1, Dirichlet off, LibTorch-off uniform evaluator =
uniform policy over legal moves, value 0; ``torch_neural_network.cpp:202-221``)
on Gomoku 15x15 and dumps per-position root visit counts.  The committed
dump is ``tools/parity/reference_dump_gomoku15.json``.

This test replays the same positions through ``alphazero_tpu``'s search in
``parity_mode`` (see MCTSConfig.parity_mode for the replicated reference
quirks) and asserts EXACT agreement on:

  * total root visits,
  * the number of visited actions,
  * the full SORTED visit-count vector (multiset equality).

Why the multiset and not per-action counts: the reference's per-action
assignment depends on its child creation order, which is the iteration
order of a ``std::unordered_set<int>`` (``gomoku_state.cpp:544-577``) — a
libstdc++ hash-table artifact, not engine behavior.  Within one search all
children of a node are exchangeable under the uniform evaluator (equal
priors, value==0, equal-size subtrees at the tested shallow depths), so the
search dynamics determine exactly the visit multiset; the action labels are
an implementation-defined permutation.  PARITY.md documents this metric.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.gomoku import GomokuEnv
from alphazero_tpu.mcts.search import MCTSConfig, search
from alphazero_tpu.models.stub import make_uniform_eval_fn

DUMP = os.path.join(os.path.dirname(__file__), "..", "tools", "parity",
                    "reference_dump_gomoku15.json")


def load_cases():
    with open(DUMP) as f:
        return [json.loads(line) for line in f if line.strip()]


CASES = load_cases()


@pytest.mark.parametrize("case", CASES,
                         ids=[f"pos{len(c['position'])}ply_{c['sims']}sims"
                              for c in CASES])
def test_visit_multiset_matches_reference(case):
    env = GomokuEnv(board_size=15)
    cfg = MCTSConfig(
        num_simulations=case["sims"],
        c_puct=1.5,  # reference MCTSConfig default
        dirichlet_epsilon=0.0,
        parity_mode=True,
        max_children=env.num_actions,  # full-width slots (reference keeps
        # every legal child, expandNodeWithPolicy)
    )
    eval_fn = make_uniform_eval_fn(env.num_actions, value_noise=0.0)

    state = env.init()
    for mv in case["position"]:
        state = env.step(state, jnp.asarray(mv, jnp.int32))
    states = jax.tree_util.tree_map(lambda x: x[None], state)

    out = jax.jit(
        lambda s, r: search(env, eval_fn, s, r, cfg)
    )(states, jax.random.key(0))
    ours = np.asarray(out.visit_counts[0])
    ref = np.asarray(case["visits"])

    assert ours.sum() == ref.sum() == case["sims"]
    assert (ours > 0).sum() == (ref > 0).sum()
    np.testing.assert_array_equal(np.sort(ours), np.sort(ref))
