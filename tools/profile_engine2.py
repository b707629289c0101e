"""Engine ablation profiling with the PRODUCTION execution shape:
host-driven per-sim executables with donated arenas (exactly how the bench
runs), timing 800-sim batches end-to-end with a host fetch per batch.

Reconstructs _simulate_once from mcts.search internals with pieces ablated
(each variant is logically wrong but shape/donation-faithful), so the
difference vs the full step is that piece's true cost.

Run from /root/repo on the real chip (no JAX_PLATFORMS).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from alphazero_tpu.games.gomoku import GomokuEnv  # noqa: E402
from alphazero_tpu.mcts import search as S  # noqa: E402
from alphazero_tpu.models.stub import make_uniform_eval_fn  # noqa: E402

B = int(os.environ.get("PROF_BATCH", "1024"))
SIMS = int(os.environ.get("PROF_SIMS", "800"))

env = GomokuEnv(board_size=15)
uniform = make_uniform_eval_fn(env.num_actions)
cfg = S.MCTSConfig(num_simulations=SIMS, dirichlet_epsilon=0.0)


def sim_step(tree, slot, *, do_select=True, do_leaf=True, do_writes=True,
             do_backprop=True, do_states=True):
    """_simulate_once with ablations (mirrors mcts/search.py)."""
    Bn = tree.batch_size
    N = tree.capacity
    K = tree.prior.shape[-1]
    proto = env.init()
    if do_select:
        sel = S._select(tree, cfg)
    else:
        # Fake a selection at the root with a rotating action.
        action0 = (tree.visits[:, 0] + slot) % jnp.int32(224)
        sel = S._SelectResult(
            leaf=jnp.zeros((Bn,), jnp.int32),
            action=action0,
            slot=jnp.full((Bn,), -1, jnp.int32),
            root_action=action0,
            leaf_terminal=jnp.zeros((Bn,), bool),
            leaf_onehot=S._onehot(jnp.zeros((Bn,), jnp.int32), N),
            mask_even=S._onehot(jnp.zeros((Bn,), jnp.int32), N, jnp.float32),
            mask_odd=jnp.zeros((Bn, N), jnp.float32),
            length=jnp.zeros((Bn,), jnp.int32),
        )
    expand = ~sel.leaf_terminal
    new = jnp.asarray(slot, jnp.int32)

    if do_leaf:
        leaf_packed = S._gather_leaf_states(tree.states, sel.leaf_onehot,
                                            Bn, N)
        leaf_state = S._unpack_state(leaf_packed, proto, env)
        child_state = jax.vmap(env.step)(leaf_state, sel.action)
        obs = jax.vmap(env.observation)(child_state)
        child_to_play = jax.vmap(env.to_play)(child_state)
        logits, value = uniform(obs, child_to_play)
        legal = jax.vmap(env.legal_mask)(child_state)
        full_prior = S.masked_softmax(logits, legal)
        topv, topa = jax.lax.approx_max_k(full_prior, K)
        topa = topa.astype(jnp.int32)
        child_term = jax.vmap(env.terminal_flag)(child_state)
        child_winner = jax.vmap(env.winner)(child_state)
        child_tval = S.terminal_value(child_winner, child_to_play)
    else:
        child_state = jax.vmap(lambda _: env.init())(jnp.arange(Bn))
        value = jnp.zeros((Bn,), jnp.float32)
        topv = jnp.full((Bn, K), 1.0 / K, jnp.bfloat16)
        topa = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (Bn, K))
        child_term = jnp.zeros((Bn,), bool)
        child_tval = jnp.zeros((Bn,), jnp.float32)

    states = tree.states
    prior_arr, cchild, caction = tree.prior, tree.cchild, tree.caction
    parent, terminal, tvalue, depth = (tree.parent, tree.terminal,
                                       tree.tvalue, tree.depth)
    paction, pslot = tree.paction, tree.pslot
    root_child = tree.root_child
    if do_writes:
        if do_states:
            states = jax.tree_util.tree_map(
                lambda arr, val: S._write_row(arr, new, val, expand),
                tree.states, S._pack_state(child_state, env),
            )
        prior_arr = S._write_row(tree.prior, new, topv, expand)
        cchild = S._write_row(
            tree.cchild, new,
            jnp.where(topv > 0, -1.0, -2.0).astype(tree.cchild.dtype),
            expand)
        caction = S._write_row(
            tree.caction, new,
            jnp.where(topv > 0, topa, -1).astype(jnp.float32), expand)
        parent = S._write_row(tree.parent, new,
                              jnp.where(expand, sel.leaf, -1), expand)
        terminal = S._write_row(tree.terminal, new, child_term, expand)
        tvalue = S._write_row(tree.tvalue, new, child_tval, expand)
        depth = S._write_row(tree.depth, new, sel.length + 1, expand)
        paction = S._write_row(tree.paction, new,
                               jnp.where(expand, sel.action, -1), expand)
        pslot = S._write_row(tree.pslot, new,
                             jnp.where(expand, sel.slot, -1), expand)
        from_root = sel.slot < 0
        oh_a_bool = S._onehot(sel.root_action, tree.num_actions, jnp.bool_)
        root_child = jnp.where(
            (expand & from_root)[:, None] & oh_a_bool, new, tree.root_child)
        oh_leaf_bool = sel.leaf_onehot > 0
        oh_slot = (jnp.maximum(sel.slot, 0)[:, None]
                   == jnp.arange(K, dtype=jnp.int32)[None, :])
        link = ((expand & ~from_root)[:, None, None]
                & oh_leaf_bool[:, :, None] & oh_slot[:, None, :])
        cchild = jnp.where(link, new.astype(cchild.dtype), cchild)

    visits, value_sum = tree.visits, tree.value_sum
    root_evisits, root_evalue = tree.root_evisits, tree.root_evalue
    if do_backprop:
        leaf_tval = S._vec_gather(tree.tvalue, sel.leaf_onehot)
        leaf_val = jnp.where(sel.leaf_terminal, leaf_tval,
                             jnp.where(child_term, child_tval, value))
        L = sel.length + expand.astype(jnp.int32)
        l_even = (L % 2 == 0)[:, None]
        v = leaf_val[:, None]
        visits = tree.visits + (sel.mask_even + sel.mask_odd).astype(jnp.int32)
        value_sum = (tree.value_sum
                     + jnp.where(l_even, v, -v) * sel.mask_even
                     + jnp.where(l_even, -v, v) * sel.mask_odd)
        visits = S._write_row(
            visits, new,
            jax.lax.dynamic_index_in_dim(visits, new, 1, False)
            + jnp.where(expand, 1, 0), jnp.ones((Bn,), bool))
        value_sum = S._write_row(
            value_sum, new,
            jax.lax.dynamic_index_in_dim(value_sum, new, 1, False)
            + jnp.where(expand, leaf_val, 0.0), jnp.ones((Bn,), bool))
        oh_a_bool = S._onehot(sel.root_action, tree.num_actions, jnp.bool_)
        backed = (sel.length >= 1) | (expand & (sel.slot < 0))
        sign1 = jnp.where(L % 2 == 1, leaf_val, -leaf_val)
        root_evisits = tree.root_evisits + jnp.where(
            backed[:, None] & oh_a_bool, 1, 0)
        root_evalue = tree.root_evalue + jnp.where(
            backed[:, None] & oh_a_bool, sign1[:, None], 0.0)

    return tree.replace(
        root_child=root_child, root_evisits=root_evisits,
        root_evalue=root_evalue, visits=visits, value_sum=value_sum,
        parent=parent, terminal=terminal, tvalue=tvalue, depth=depth,
        paction=paction, pslot=pslot, prior=prior_arr, cchild=cchild,
        caction=caction, states=states,
    )


@jax.jit
def init_tree(rng):
    states = jax.vmap(lambda _: env.init())(jnp.arange(B))
    obs = jax.vmap(env.observation)(states)
    logits, value = uniform(obs, None)
    return S.instantiate_tree(env, states, logits, value, cfg, rng)


def run_variant(name, **abl):
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(tree, slot):
        return sim_step(tree, slot, **abl)

    # Warm.
    tree = init_tree(jax.random.key(0))
    for s in range(8):
        tree = step(tree, s + 1)
    float(jnp.sum(tree.visits))
    # Timed: full SIMS-sim batch, fetch at the end (the bench shape).
    tree = init_tree(jax.random.key(1))
    float(jnp.sum(tree.visits))  # sync before timing
    t0 = time.perf_counter()
    for s in range(SIMS):
        tree = step(tree, s + 1)
    float(jnp.sum(tree.visits))
    dt = (time.perf_counter() - t0) / SIMS * 1e3
    print(f"{name:36s} {dt:7.3f} ms/sim", flush=True)
    return dt


def main():
    full = run_variant("full")
    run_variant("no select", do_select=False)
    run_variant("no leaf pipeline", do_leaf=False)
    run_variant("no state-arena write", do_states=False)
    run_variant("no writes at all", do_writes=False)
    run_variant("no backprop", do_backprop=False)
    print(f"(bench-derived engine cost ~1.04 ms/sim; full here = {full:.3f})")


if __name__ == "__main__":
    main()
