"""Batched array-arena MCTS.

TPU-native replacement for the reference MCTS engine — ``ParallelMCTS``
(``src/mcts/parallel_mcts.cpp``, ``include/alphazero/mcts/parallel_mcts.h:41-282``),
``MCTSNode`` (``mcts_node.h:29-275``), ``ThreadPool`` and the leaf-batching
``BatchQueue`` (``include/alphazero/nn/batch_queue.h:28-266``).

The reference keeps one pointer-tree per game and uses N CPU threads with
virtual loss + a future-based queue to batch leaf evaluations onto the GPU.
On TPU the entire apparatus inverts into data parallelism: B independent
trees live in fixed-size struct-of-arrays arenas ``[B, num_nodes]`` and are
advanced in lockstep inside one jitted program — one PUCT descent, one env
step, one fused NN forward of all B leaves, one backprop per simulation.
Leaf batching happens *by construction* (SURVEY.md §2.8), so there is no
queue, no virtual loss, no mutexes, and determinism is free.

Search phases per simulation (all shapes static):
  select   - lockstep ``while_loop`` PUCT descent per tree
  expand   - reserve arena slot ``sim+1``; ``vmap``'d env.step on leaves
  evaluate - one batched policy/value forward for all B new nodes
  backprop - lockstep ``while_loop`` walk to the root with sign flips
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.core.types import terminal_value

# eval_fn: (obs [B, C, H, W], to_play [B] i32) -> (logits [B, A], value [B])
# Plain evaluators ignore to_play; arena evaluators use it to route each
# position to the parameter set playing that side (eval/arena.py).
EvalFn = Callable[[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]

UNVISITED = jnp.int32(-1)
ROOT = jnp.int32(0)


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search knobs; a trimmed, TPU-shaped analog of the reference's
    25-knob ``MCTSConfig`` (``parallel_mcts.h:41-74``).  Thread/queue/mutex
    knobs have no TPU counterpart; batch size is the tree-batch dimension.
    """

    num_simulations: int = 800
    c_puct: float = 1.5  # reference default cPuct (parallel_mcts.h)
    dirichlet_alpha: float = 0.3
    dirichlet_epsilon: float = 0.25
    fpu_reduction: float = 0.0  # reference fpuReduction
    # Q assigned to unvisited children: "zero" (AlphaZero default) or
    # "parent" (parent mean minus fpu_reduction, the reference's FPU path,
    # mcts_node.cpp:97-107).
    unvisited_q: str = "zero"
    # Reference quirk: +0.05*(5-visits) bonus for children with <5 visits
    # (mcts_node.cpp:112-116).  Off by default.
    diversity_bonus: bool = False

    @property
    def num_nodes(self) -> int:
        return self.num_simulations + 1


@struct.dataclass
class Tree:
    """B fixed-capacity tree arenas.  Node 0 is the root.  ``value_sum`` is
    accumulated from the perspective of the player to move at each node, so a
    child's Q seen from its parent is ``-value_sum/visits``."""

    visits: jax.Array  # i32 [B, N]
    value_sum: jax.Array  # f32 [B, N]
    prior: jax.Array  # bf16 [B, N, A]; exactly 0 on illegal actions
    children: jax.Array  # i16/i32 [B, N, A]; -1 = unexpanded edge
    parent: jax.Array  # i16/i32 [B, N]; -1 at root
    terminal: jax.Array  # bool [B, N]
    tvalue: jax.Array  # f32 [B, N] terminal value (node-to-play perspective)
    states: Any  # env-state pytree, leaves [B, N, ...]

    @property
    def batch_size(self) -> int:
        return self.visits.shape[0]

    @property
    def capacity(self) -> int:
        return self.visits.shape[1]


class SearchOutput(NamedTuple):
    visit_counts: jax.Array  # i32 [B, A] root child visits
    action_weights: jax.Array  # f32 [B, A] normalized visit distribution
    root_value: jax.Array  # f32 [B] mean root value
    tree: Tree


def masked_softmax(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """Softmax over legal actions; exact zeros elsewhere; uniform-over-legal
    if the evaluator output underflows (the reference renormalizes or falls
    back to uniform, parallel_mcts.cpp:681-745)."""
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(legal, logits, neg)
    p = jax.nn.softmax(masked, axis=-1)
    p = jnp.where(legal, p, 0.0)
    total = jnp.sum(p, axis=-1, keepdims=True)
    n_legal = jnp.maximum(jnp.sum(legal, axis=-1, keepdims=True), 1)
    uniform = legal.astype(p.dtype) / n_legal
    return jnp.where(total > 0, p / jnp.maximum(total, 1e-30), uniform)


def _child_scores(tree: Tree, node: jax.Array, config: MCTSConfig) -> jax.Array:
    """PUCT scores over actions for each tree's current ``node`` ([B] ->
    [B, A]).  Illegal actions (prior == 0) score -inf."""
    b = jnp.arange(tree.batch_size)
    prior = tree.prior[b, node].astype(jnp.float32)  # [B, A]
    child = tree.children[b, node].astype(jnp.int32)  # [B, A]
    cidx = jnp.maximum(child, 0)
    cv = jnp.take_along_axis(tree.visits, cidx, axis=1)  # [B, A]
    cw = jnp.take_along_axis(tree.value_sum, cidx, axis=1)
    expanded = child >= 0
    cv = jnp.where(expanded, cv, 0)
    cw = jnp.where(expanded, cw, 0.0)

    node_visits = tree.visits[b, node]  # [B]
    node_value = tree.value_sum[b, node] / jnp.maximum(node_visits, 1)

    q_visited = -cw / jnp.maximum(cv, 1)
    if config.unvisited_q == "parent":
        q_unvisited = node_value - config.fpu_reduction
    else:
        q_unvisited = jnp.zeros_like(node_value)
    q = jnp.where(cv > 0, q_visited, q_unvisited[:, None])

    u = (
        config.c_puct
        * prior
        * jnp.sqrt(jnp.maximum(node_visits, 1).astype(jnp.float32))[:, None]
        / (1.0 + cv)
    )
    score = q + u
    if config.diversity_bonus:
        score = score + jnp.where(cv < 5, 0.05 * (5 - cv), 0.0)
    return jnp.where(prior > 0, score, -jnp.inf)


class _SelectCarry(NamedTuple):
    node: jax.Array  # [B] current node per tree
    action: jax.Array  # [B] chosen action at stop (expansion edge)
    done: jax.Array  # [B]
    leaf_terminal: jax.Array  # [B] stopped on a terminal node


def _select(tree: Tree, config: MCTSConfig) -> _SelectCarry:
    """Lockstep PUCT descent: every live lane walks one edge per iteration
    until it hits an unexpanded edge or a terminal node."""
    B = tree.batch_size
    b = jnp.arange(B)

    def cond(c: _SelectCarry):
        return jnp.any(~c.done)

    def body(c: _SelectCarry):
        term_here = tree.terminal[b, c.node]
        stop_terminal = ~c.done & term_here
        scores = _child_scores(tree, c.node, config)
        action = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        child = tree.children[b, c.node, action].astype(jnp.int32)
        stop_expand = ~c.done & ~term_here & (child == UNVISITED)
        advance = ~c.done & ~term_here & (child != UNVISITED)
        return _SelectCarry(
            node=jnp.where(advance, child, c.node),
            action=jnp.where(stop_expand | advance, action, c.action),
            done=c.done | stop_terminal | stop_expand,
            leaf_terminal=c.leaf_terminal | stop_terminal,
        )

    init = _SelectCarry(
        node=jnp.zeros((B,), jnp.int32),
        action=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
        leaf_terminal=jnp.zeros((B,), jnp.bool_),
    )
    return jax.lax.while_loop(cond, body, init)


def _backprop(tree: Tree, start: jax.Array, value: jax.Array) -> Tree:
    """Walk from ``start`` to the root adding ``value`` with per-ply sign
    flips (players alternate in all supported games; reference
    ``backpropagate``, parallel_mcts.cpp:782-833)."""
    B = tree.batch_size
    b = jnp.arange(B)

    def cond(carry):
        node, _, visits, value_sum = carry
        return jnp.any(node >= 0)

    def body(carry):
        node, val, visits, value_sum = carry
        active = node >= 0
        idx = jnp.maximum(node, 0)
        visits = visits.at[b, idx].add(jnp.where(active, 1, 0))
        value_sum = value_sum.at[b, idx].add(jnp.where(active, val, 0.0))
        nxt = jnp.where(active, tree.parent[b, idx].astype(jnp.int32), -1)
        return nxt, -val, visits, value_sum

    _, _, visits, value_sum = jax.lax.while_loop(
        cond, body, (start, value, tree.visits, tree.value_sum)
    )
    return tree.replace(visits=visits, value_sum=value_sum)


def instantiate_tree(
    env, root_states, root_logits, root_value, config: MCTSConfig, rng=None
) -> Tree:
    """Allocate arenas and install the evaluated root (with Dirichlet
    exploration noise when ``rng`` is given; reference ``addDirichletNoise``,
    parallel_mcts.cpp:1110)."""
    B = root_value.shape[0]
    N = config.num_nodes
    A = root_logits.shape[-1]

    legal = jax.vmap(env.legal_mask)(root_states)  # [B, A]
    prior = masked_softmax(root_logits, legal)
    if rng is not None and config.dirichlet_epsilon > 0:
        noise = jax.random.gamma(
            rng, config.dirichlet_alpha, shape=(B, A)
        )
        noise = jnp.where(legal, noise, 0.0)
        noise = noise / jnp.maximum(noise.sum(-1, keepdims=True), 1e-30)
        prior = (1 - config.dirichlet_epsilon) * prior + (
            config.dirichlet_epsilon
        ) * noise
        prior = jnp.where(legal, prior, 0.0)

    def tile(x):  # [B, ...] -> [B, N, ...] (root state broadcast to all slots)
        return jnp.broadcast_to(x[:, None], (B, N) + x.shape[1:])

    states = jax.tree_util.tree_map(tile, root_states)
    term = jax.vmap(env.terminal_flag)(root_states)
    to_play = jax.vmap(env.to_play)(root_states)
    winner = jax.vmap(env.winner)(root_states)
    tval = terminal_value(winner, to_play)

    # Compact arena dtypes: bf16 priors and 16-bit node indices halve the
    # HBM footprint and gather bandwidth of the [B, N, A] arrays.
    idx_dtype = jnp.int16 if N <= 32767 else jnp.int32
    prior_arr = jnp.zeros((B, N, A), jnp.bfloat16).at[:, 0].set(
        prior.astype(jnp.bfloat16)
    )
    root_v = jnp.where(term, tval, root_value)
    return Tree(
        visits=jnp.zeros((B, N), jnp.int32).at[:, 0].set(1),
        value_sum=jnp.zeros((B, N), jnp.float32).at[:, 0].set(root_v),
        prior=prior_arr,
        children=jnp.full((B, N, A), -1, idx_dtype),
        parent=jnp.full((B, N), -1, idx_dtype),
        terminal=jnp.zeros((B, N), jnp.bool_).at[:, 0].set(term),
        tvalue=jnp.zeros((B, N), jnp.float32).at[:, 0].set(tval),
        states=states,
    )


def _simulate_once(env, eval_fn: EvalFn, tree: Tree, sim: jax.Array,
                   config: MCTSConfig) -> Tree:
    B = tree.batch_size
    b = jnp.arange(B)
    sel = _select(tree, config)
    leaf, action = sel.node, sel.action

    # --- expand: reserve slot sim+1 in every arena ---
    new = (sim + 1).astype(jnp.int32)
    leaf_state = jax.tree_util.tree_map(lambda x: x[b, leaf], tree.states)
    child_state = jax.vmap(env.step)(leaf_state, action)

    obs = jax.vmap(env.observation)(child_state)
    child_to_play = jax.vmap(env.to_play)(child_state)
    logits, value = eval_fn(obs, child_to_play)
    legal = jax.vmap(env.legal_mask)(child_state)
    prior = masked_softmax(logits, legal)

    child_term = jax.vmap(env.terminal_flag)(child_state)
    child_winner = jax.vmap(env.winner)(child_state)
    child_tval = terminal_value(child_winner, child_to_play)

    expand = ~sel.leaf_terminal  # lanes that actually add a node
    cdt = tree.children.dtype
    children = tree.children.at[b, leaf, action].set(
        jnp.where(
            expand, new.astype(cdt), tree.children[b, leaf, action]
        )
    )
    write = lambda arr, val: arr.at[b, new].set(
        jnp.where(expand.reshape((B,) + (1,) * (val.ndim - 1)), val, arr[b, new])
    )
    states = jax.tree_util.tree_map(
        lambda arr, val: arr.at[b, new].set(
            jnp.where(
                expand.reshape((B,) + (1,) * (val.ndim - 1)), val, arr[b, new]
            )
        ),
        tree.states,
        child_state,
    )
    tree = tree.replace(
        children=children,
        prior=write(tree.prior, prior.astype(tree.prior.dtype)),
        parent=tree.parent.at[b, new].set(
            jnp.where(expand, leaf.astype(cdt), jnp.asarray(-1, cdt))
        ),
        terminal=tree.terminal.at[b, new].set(
            jnp.where(expand, child_term, False)
        ),
        tvalue=tree.tvalue.at[b, new].set(jnp.where(expand, child_tval, 0.0)),
        states=states,
    )

    # --- evaluate + backprop ---
    # Expanded lanes: NN value unless the new child is terminal (true value
    # takes precedence).  Terminal-leaf lanes: revisit the stored value.
    leaf_value = jnp.where(
        sel.leaf_terminal,
        tree.tvalue[b, leaf],
        jnp.where(child_term, child_tval, value),
    )
    start = jnp.where(sel.leaf_terminal, leaf, new)
    return _backprop(tree, start, leaf_value)


def search(
    env,
    eval_fn: EvalFn,
    root_states,
    rng: jax.Array,
    config: MCTSConfig,
) -> SearchOutput:
    """Run ``config.num_simulations`` batched simulations from the given
    roots.  Fully jittable; the env and config are static."""
    noise_rng, _ = jax.random.split(rng)
    obs = jax.vmap(env.observation)(root_states)
    logits, value = eval_fn(obs, jax.vmap(env.to_play)(root_states))
    tree = instantiate_tree(env, root_states, logits, value, config, noise_rng)

    def body(t, sim):
        return _simulate_once(env, eval_fn, t, sim, config), ()

    tree, _ = jax.lax.scan(
        body, tree, jnp.arange(config.num_simulations), unroll=1
    )

    b = jnp.arange(tree.batch_size)
    root_children = tree.children[:, 0]  # [B, A]
    cidx = jnp.maximum(root_children, 0)
    counts = jnp.take_along_axis(tree.visits, cidx, axis=1)
    counts = jnp.where(root_children >= 0, counts, 0)
    weights = counts / jnp.maximum(counts.sum(-1, keepdims=True), 1)
    root_value = tree.value_sum[:, 0] / jnp.maximum(tree.visits[:, 0], 1)
    return SearchOutput(
        visit_counts=counts,
        action_weights=weights.astype(jnp.float32),
        root_value=root_value,
        tree=tree,
    )


def select_action(
    rng: jax.Array, visit_counts: jax.Array, temperature: jax.Array
) -> jax.Array:
    """Temperature action selection over root visit counts ([B, A] -> [B]);
    T == 0 means argmax (reference ``selectAction``,
    parallel_mcts.cpp:987-1047).  ``temperature`` may be scalar or [B].
    Rows with zero total visits (terminal roots) return action 0 — callers
    rely on env.step's terminal no-op."""
    B = visit_counts.shape[0]
    counts = visit_counts.astype(jnp.float32)
    temp = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (B,))
    t = jnp.maximum(temp, 1e-6)[:, None]
    logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1)) / t, -jnp.inf)
    # Guard all -inf rows for categorical.
    any_visits = counts.sum(-1) > 0
    safe_logits = jnp.where(any_visits[:, None], logits, 0.0)
    sampled = jax.random.categorical(rng, safe_logits, axis=-1)
    greedy = jnp.argmax(counts, axis=-1)
    pick = jnp.where(temp <= 1e-6, greedy, sampled)
    return jnp.where(any_visits, pick, 0).astype(jnp.int32)
