"""Batched array-arena MCTS.

TPU-native replacement for the reference MCTS engine — ``ParallelMCTS``
(``src/mcts/parallel_mcts.cpp``, ``include/alphazero/mcts/parallel_mcts.h:41-282``),
``MCTSNode`` (``mcts_node.h:29-275``), ``ThreadPool`` and the leaf-batching
``BatchQueue`` (``include/alphazero/nn/batch_queue.h:28-266``).

The reference keeps one pointer-tree per game and uses N CPU threads with
virtual loss + a future-based queue to batch leaf evaluations onto the GPU.
On TPU the apparatus inverts into data parallelism: B independent trees live
in fixed-capacity struct-of-arrays arenas and advance in lockstep inside one
jitted program — one PUCT descent, one env step, one fused NN forward of all
B leaves, one backprop per simulation.  Leaf batching exists *by
construction* (SURVEY.md §2.8): no queue, no mutexes, deterministic.

Memory-system design (profiled on v5e): per-lane dynamic indexing (gather/
scatter with a different index per batch row) serializes into ~1us/row DMAs
on TPU, so the hot loop avoids it entirely:

  * The root is special-cased with dense [B, A] stat arrays (prior, edge
    visits, edge values, child pointers): root PUCT is pure elementwise
    work, and the root is on every simulation's path.
  * Non-root nodes keep top-K children slots ([B, N, K]; K plays the
    reference's progressive-widening maxChildren role,
    parallel_mcts.cpp:1299).  Row access uses one-hot einsum sweeps —
    bandwidth-bound MXU/VPU work instead of serialized row DMAs.
  * Per-node statistics live in [B, N] arrays; backprop accumulates one-hot
    path masks during the descent and applies them in one shot.
  * Arena slot ``sim+1`` is allocated every simulation, so expansion writes
    are dynamic-update-slices at a *scalar* index — the fast path.
"""
from __future__ import annotations

import dataclasses
import math
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

# Child pointers are stored as f16 (exact integers to 2048) for arenas up
# to 2046 nodes — the bench regime, where the descent sweeps only half the
# bytes.  Larger arenas automatically switch to f32 pointers (exact to
# 2^24), whose sweeps must run at Precision.HIGHEST (a single-pass bf16
# matmul is only exact to 256).
_MAX_F16_NODES = 2046


def _cchild_dtype(num_nodes: int):
    if num_nodes > (1 << 24):
        raise ValueError(
            f"arena of {num_nodes} nodes exceeds the f32-exact "
            "child-pointer range (2^24)"
        )
    return jnp.float16 if num_nodes <= _MAX_F16_NODES else jnp.float32


def _pack_state(state, env=None):
    """Convert an env-state pytree into einsum-friendly dtypes so leaf
    gathers need no whole-arena conversion sweeps: small ints/bools -> bf16,
    larger ints -> f32, uint32 (Zobrist lanes) -> two exact 16-bit f32
    halves stacked on a trailing axis.  Envs may provide a denser custom
    packing via ``pack_for_arena``/``unpack_from_arena`` (e.g. gomoku packs
    board rows into bitfield f32 lanes)."""
    if env is not None and hasattr(env, "pack_for_arena"):
        return env.pack_for_arena(state)

    def pack(x):
        if x.dtype == jnp.uint32:
            hi = (x >> 16).astype(jnp.float32)
            lo = (x & jnp.uint32(0xFFFF)).astype(jnp.float32)
            return jnp.stack([hi, lo], axis=-1)
        if x.dtype in (jnp.int8, jnp.bool_):
            return x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x.astype(jnp.float32)
        return x

    return jax.tree_util.tree_map(pack, state)


def _unpack_state(packed, template, env=None):
    """Inverse of _pack_state; ``template`` supplies the original dtypes
    (and detects the uint32 split by its extra trailing axis)."""
    if env is not None and hasattr(env, "unpack_from_arena"):
        return env.unpack_from_arena(packed)

    def unpack(p, t):
        if t.dtype == jnp.uint32:
            hi = jnp.round(p[..., 0]).astype(jnp.uint32)
            lo = jnp.round(p[..., 1]).astype(jnp.uint32)
            return (hi << 16) | lo
        if jnp.issubdtype(t.dtype, jnp.integer) or t.dtype == jnp.bool_:
            return jnp.round(p).astype(t.dtype)
        return p.astype(t.dtype)

    return jax.tree_util.tree_map(unpack, packed, template)


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search knobs; a trimmed, TPU-shaped analog of the reference's 25-knob
    ``MCTSConfig`` (``parallel_mcts.h:41-74``)."""

    num_simulations: int = 800
    c_puct: float = 1.5  # reference default cPuct (parallel_mcts.h)
    dirichlet_alpha: float = 0.3
    dirichlet_epsilon: float = 0.25
    fpu_reduction: float = 0.0  # reference fpuReduction
    # Q for unvisited children: "zero" (AlphaZero default) or "parent"
    # (parent mean minus fpu_reduction — the reference's FPU path,
    # mcts_node.cpp:97-107).
    unvisited_q: str = "zero"
    # Reference quirk: +0.05*(5-visits) bonus for VISITED children with <5
    # visits (mcts_node.cpp:112-116; unvisited children short-circuit to
    # +inf before the bonus).  Off by default.
    diversity_bonus: bool = False
    # Parity mode: replicate the reference's serial deterministic search
    # exactly (tests/test_parity_reference.py vs tools/parity/parity_dump):
    # unvisited children score +inf and are taken in slot order
    # (mcts_node.cpp:63-66 + std::max_element first-max), the diversity
    # bonus is on, and the root's PUCT parent-visit count is inflated to
    # 4s+3 at simulation s — the reference adds virtual loss to the root
    # twice per simulation (selectLeafWithPath entry + the path loop,
    # parallel_mcts.cpp:461,293-295) but removes it once (backpropagate),
    # so root visitCount during descent = real_visits + 3*(s+1).  Use with
    # max_children >= num_actions so slots are full-width action-ordered.
    parity_mode: bool = False
    # Non-root nodes track their top-K prior actions (the root keeps the
    # full action space).
    max_children: int = 32
    # Hard cap on descent depth (latency bound / safety).
    max_depth: int = 128
    # TD(λ) backprop (reference useTemporalDifference/tdLambda,
    # parallel_mcts.h:52-53, backprop at parallel_mcts.cpp:825-833):
    # walking leaf->root, after each sign flip the value is mixed with the
    # parent's current mean, v <- (1-λ)·(-parent_mean) + λ·v  (the reference
    # mixes the *negated* parent mean; replicated as-is).  None = off (the
    # default): backprop is the one-shot path-mask fast path.
    td_lambda: float | None = None
    # Tree reuse between moves (reference ParallelMCTS::updateWithMove,
    # parallel_mcts.cpp:1065: the played child's subtree becomes the new
    # root).  When on, `reroot` compacts up to ``reuse_cap`` surviving nodes
    # to the front of the arena at each move boundary and new simulations
    # allocate from slot ``reuse_cap`` — so the arena is
    # ``reuse_cap + num_simulations`` nodes.  ``reuse_budget`` sets how many
    # fresh simulations each move runs: "fixed" = always num_simulations
    # (the reference's behavior — reuse buys quality); "topup" = only until
    # every lane's root has >= num_simulations visits (reuse buys speed at
    # equal visit quality).
    tree_reuse: bool = False
    reuse_cap: int = 512
    reuse_budget: str = "topup"  # "topup" | "fixed"
    # Re-noise cadence for the reused root (reference re-injects Dirichlet
    # every 2 moves on the kept tree, self_play_manager.cpp:209-211).
    renoise_every: int = 2
    # Transposition table (reference TranspositionTable,
    # include/alphazero/mcts/transposition_table.h:23-292 — fixed
    # power-of-2 entry array keyed by the position's Zobrist hash, storing
    # (policy, value); ParallelMCTS consults it before the NN eval,
    # parallel_mcts.cpp:835-917).  TPU rendition: per-lane direct-mapped
    # arrays [B, tt_size] carried in the Tree; at expansion each leaf's
    # ``env.position_hash`` is looked up, and a full-key match substitutes
    # the cached (top-K prior, value) for the fresh NN output; misses store
    # ALWAYS-replace entries (the reference default policy).  The NN batch
    # still runs — in lockstep SPMD the TT cannot buy throughput, it buys
    # the reference's cross-path eval-reuse semantics (hits matter when the
    # evaluator is stochastic or params moved between stores) and its
    # hit-rate accounting.  0 = off (default; ~3% step cost when on).
    tt_size: int = 0
    # Simulation waves: W virtual-loss PUCT descents per dispatched step,
    # then ONE batched eval/install/backprop over the W leaves — the
    # reference's BATCHED self-play mode (self_play_manager.cpp:166-175
    # forces it; virtual loss de-correlates the in-flight descents,
    # parallel_mcts.cpp:461-535).  On TPU this amortizes the per-op
    # dispatch overhead that dominates engine cost (BENCHLOG round 2:
    # install/bookkeeping ops, not the descent sweeps, are the bottleneck).
    # wave_size=1 is the exact-sequential path (used by parity tests).
    wave_size: int = 1
    virtual_loss: float = 3.0  # reference MCTSConfig::virtualLoss default

    @property
    def waves(self) -> int:
        return -(-self.num_simulations // self.wave_size)

    @property
    def num_nodes(self) -> int:
        slots = self.waves * self.wave_size
        if self.tree_reuse:
            return self.reuse_cap + slots
        return slots + 1


@struct.dataclass
class Tree:
    """B fixed-capacity tree arenas.  Node 0 is the root.

    ``value_sum`` accumulates from the perspective of the player to move at
    each node, so a child's Q seen from its parent is ``-value_sum/visits``.
    Root children are dense over the full action space; deeper nodes use
    ``K = max_children`` prior-ranked slots."""

    # Dense root stats over the full action space.
    root_prior: jax.Array  # f32 [B, A]
    root_child: jax.Array  # i32 [B, A]; -1 unexpanded
    root_evisits: jax.Array  # i32 [B, A] edge visit counts
    root_evalue: jax.Array  # f32 [B, A] value sums (child perspective)
    # Per-node stats.
    visits: jax.Array  # i32 [B, N]
    value_sum: jax.Array  # f32 [B, N] (node-to-play perspective)
    parent: jax.Array  # i32 [B, N]; -1 at root
    terminal: jax.Array  # bool [B, N]
    tvalue: jax.Array  # f32 [B, N] terminal value
    depth: jax.Array  # i32 [B, N]
    # Reroot bookkeeping (written once per expansion at a scalar index; read
    # only at move boundaries by `reroot` — never swept in the descent).
    paction: jax.Array  # i32 [B, N] env action leading into the node; -1 root
    pslot: jax.Array  # i32 [B, N] slot index in parent's K-row; -1 from root
    # Top-K children slots of non-root nodes.  The descent loop sweeps only
    # prior (bf16) and cchild (f16 — integers <= 2048 are exact); slot env
    # actions live in caction and are gathered ONCE per simulation after the
    # descent stops, not每 iteration.
    prior: jax.Array  # bf16 [B, N, K]
    cchild: jax.Array  # f16 [B, N, K]; -1 = unexpanded, -2 = pad
    caction: jax.Array  # f32 [B, N, K]; env action per slot, -1 pad
    states: Any  # env-state pytree, einsum-packed (see _pack_state)
    tt: Any = None  # TTable when config.tt_size > 0

    @property
    def batch_size(self) -> int:
        return self.visits.shape[0]

    @property
    def capacity(self) -> int:
        return self.visits.shape[1]

    @property
    def num_actions(self) -> int:
        return self.root_prior.shape[-1]


@struct.dataclass
class TTable:
    """Per-lane direct-mapped transposition table (see MCTSConfig.tt_size).

    Keys are the 64-bit position hash split into four exact 16-bit f32
    halves so lookups/stores run as one-hot einsum contractions (int
    gathers would serialize into per-lane DMAs).  ``topv``/``topa`` cache
    the stored position's top-K prior slots — the array analog of the
    reference entry's policy vector (transposition_table.h:30-60)."""

    key: jax.Array  # f32 [B, S, 4] 16-bit hash halves
    valid: jax.Array  # f32 [B, S] 0/1 occupancy
    value: jax.Array  # f32 [B, S] cached leaf value (to-play perspective)
    topv: jax.Array  # bf16 [B, S, K] cached top-K prior probabilities
    topa: jax.Array  # f32 [B, S, K] cached top-K env actions
    hits: jax.Array  # i32 [B] lookup hits (reference TT hit-rate stats)
    stores: jax.Array  # i32 [B]


def _tt_init(B: int, S: int, K: int) -> TTable:
    return TTable(
        key=jnp.zeros((B, S, 4), jnp.float32),
        valid=jnp.zeros((B, S), jnp.float32),
        value=jnp.zeros((B, S), jnp.float32),
        topv=jnp.zeros((B, S, K), jnp.bfloat16),
        topa=jnp.full((B, S, K), -1.0, jnp.float32),
        hits=jnp.zeros((B,), jnp.int32),
        stores=jnp.zeros((B,), jnp.int32),
    )


def _hash_halves(h: jax.Array) -> jax.Array:
    """u32 [..., 2] -> f32 [..., 4] exact 16-bit halves."""
    m = jnp.uint32(0xFFFF)
    return jnp.stack(
        [(h[..., 0] >> 16).astype(jnp.float32),
         (h[..., 0] & m).astype(jnp.float32),
         (h[..., 1] >> 16).astype(jnp.float32),
         (h[..., 1] & m).astype(jnp.float32)],
        axis=-1,
    )


def _tt_process(
    tt: TTable,
    h: jax.Array,  # u32 [B, W, 2] leaf position hashes
    lookup_elig: jax.Array,  # bool [B, W] expanding non-terminal walkers
    store_elig: jax.Array,  # bool [B, W] canonical subset of the above
    value: jax.Array,  # f32 [B, W] NN value
    topv: jax.Array,  # [B, W, K] NN top-K prior
    topa: jax.Array,  # i32 [B, W, K] NN top-K actions
):
    """Lookup-then-store against the per-lane table (reference
    evaluateState's TT consult + store, parallel_mcts.cpp:835-917).
    Returns (tt', value', topv', topa', hit).  All index-carrying
    contractions run at Precision.HIGHEST (values exceed bf16-exact
    range); everything is one pass per wave, off the descent hot loop."""
    B, W = value.shape
    S = tt.valid.shape[1]
    halves = _hash_halves(h)  # f32 [B, W, 4]
    idx = (h[..., 1] & jnp.uint32(S - 1)).astype(jnp.int32)  # [B, W]
    oh = (
        idx[:, :, None] == jnp.arange(S, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)  # [B, W, S]

    key_row = jnp.einsum("bws,bsx->bwx", oh, tt.key,
                         preferred_element_type=jnp.float32, precision=_HI)
    valid_row = jnp.einsum("bws,bs->bw", oh, tt.valid,
                           preferred_element_type=jnp.float32)
    hit = lookup_elig & (valid_row > 0.5) & jnp.all(key_row == halves, -1)
    val_row = jnp.einsum("bws,bs->bw", oh, tt.value,
                         preferred_element_type=jnp.float32, precision=_HI)
    topv_row = jnp.einsum("bws,bsk->bwk", oh, tt.topv,
                          preferred_element_type=jnp.float32)
    topa_row = jnp.einsum("bws,bsk->bwk", oh, tt.topa,
                          preferred_element_type=jnp.float32, precision=_HI)

    value2 = jnp.where(hit, val_row, value)
    topv2 = jnp.where(hit[..., None], topv_row.astype(topv.dtype), topv)
    topa2 = jnp.where(hit[..., None],
                      jnp.round(topa_row).astype(jnp.int32), topa)

    # Store on miss, ALWAYS-replace (reference default policy); first
    # writer per slot wins within the wave so each slot receives at most
    # one entry and the scatter einsums below are exact single-term sums.
    want = store_elig & ~hit
    wrange = jnp.arange(W, dtype=jnp.int32)
    dup = (
        (idx[:, :, None] == idx[:, None, :])
        & want[:, :, None] & want[:, None, :]
        & (wrange[None, :, None] > wrange[None, None, :])
    )
    store = want & ~jnp.any(dup, axis=2)
    ohs = oh * store[:, :, None].astype(oh.dtype)  # [B, W, S]
    written = jnp.einsum("bws->bs", ohs.astype(jnp.float32))
    new_key = jnp.einsum("bws,bwx->bsx", ohs, halves, precision=_HI,
                         preferred_element_type=jnp.float32)
    new_val = jnp.einsum("bws,bw->bs", ohs, value, precision=_HI,
                         preferred_element_type=jnp.float32)
    new_topv = jnp.einsum("bws,bwk->bsk", ohs,
                          topv.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    new_topa = jnp.einsum("bws,bwk->bsk", ohs, topa.astype(jnp.float32),
                          precision=_HI,
                          preferred_element_type=jnp.float32)
    wmask = written > 0.5
    tt = tt.replace(
        key=jnp.where(wmask[..., None], new_key, tt.key),
        valid=jnp.where(wmask, 1.0, tt.valid),
        value=jnp.where(wmask, new_val, tt.value),
        topv=jnp.where(wmask[..., None], new_topv.astype(jnp.bfloat16),
                       tt.topv),
        topa=jnp.where(wmask[..., None], new_topa, tt.topa),
        # Accounting on CANONICAL walkers only so hits + stores equals the
        # number of canonical expansions and hits/(hits+stores) matches the
        # reference's per-expansion hit rate: `hit & store_elig` excludes
        # wave duplicates (which share the canonical walker's outcome), and
        # `want` counts store *attempts* including those suppressed by the
        # same-slot dedupe (each is still a canonical miss).
        hits=tt.hits + jnp.sum(hit & store_elig, axis=1).astype(jnp.int32),
        stores=tt.stores + jnp.sum(want, axis=1).astype(jnp.int32),
    )
    return tt, value2, topv2, topa2, hit


class SearchOutput(NamedTuple):
    visit_counts: jax.Array  # i32 [B, A] root child visits
    action_weights: jax.Array  # f32 [B, A] normalized visit distribution
    root_value: jax.Array  # f32 [B] mean root value
    tree: Tree


def masked_softmax(logits: jax.Array, legal: jax.Array) -> jax.Array:
    """Softmax over legal actions; exact zeros elsewhere; uniform-over-legal
    fallback (the reference renormalizes or falls back to uniform,
    parallel_mcts.cpp:681-745)."""
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(legal, logits, neg)
    p = jax.nn.softmax(masked, axis=-1)
    p = jnp.where(legal, p, 0.0)
    total = jnp.sum(p, axis=-1, keepdims=True)
    n_legal = jnp.maximum(jnp.sum(legal, axis=-1, keepdims=True), 1)
    uniform = legal.astype(p.dtype) / n_legal
    return jnp.where(total > 0, p / jnp.maximum(total, 1e-30), uniform)


def _topk_masked_prior(logits: jax.Array, legal: jax.Array, K: int):
    """Top-K prior slots without materializing the full softmax.

    Softmax is monotone per row, so the top-K actions of the masked prior
    are the top-K of the masked logits; their probabilities are recovered
    with one logsumexp.  Rows with no legal action (terminal leaves) get
    all-zero slot priors — identical to ``masked_softmax``'s output there.
    Returns (topv f32 [B,K], topa i32 [B,K])."""
    neg = jnp.float32(-1e30)
    masked = jnp.where(legal, logits.astype(jnp.float32), neg)
    topl, topa = jax.lax.approx_max_k(masked, K)
    lse = jax.nn.logsumexp(masked, axis=-1, keepdims=True)
    topv = jnp.where(topl > 0.5 * neg, jnp.exp(topl - lse), 0.0)
    return topv, topa


def _onehot(idx: jax.Array, n: int, dtype=jnp.bfloat16) -> jax.Array:
    """[B] -> [B, n] one-hot — the TPU-friendly dynamic-access primitive."""
    return (
        idx[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]
    ).astype(dtype)


def _row_gather(arr3: jax.Array, onehot_b16: jax.Array,
                precision=None) -> jax.Array:
    """arr3[b, idx_b, :] for all b via one-hot contraction:
    [B, N] x [B, N, K] -> [B, K].  Pass ``precision=HIGHEST`` when the
    values are f32 integers > 256 (e.g. wide child pointers): the default
    TPU f32 matmul is a single bf16 pass."""
    if arr3.dtype in (jnp.bfloat16, jnp.float16, jnp.float32):
        return jnp.einsum(
            "bn,bnk->bk", onehot_b16, arr3,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    oh = onehot_b16.astype(arr3.dtype)
    return jnp.sum(oh[:, :, None] * arr3, axis=1)


def _vec_gather(arr2: jax.Array, onehot_b16: jax.Array,
                precision=None) -> jax.Array:
    """arr2[b, idx_b] via one-hot: [B, N] x [B, N] -> [B].  Use
    ``precision=HIGHEST`` for f32 integer payloads > 256 (see
    _row_gather)."""
    if arr2.dtype in (jnp.bfloat16, jnp.float32):
        return jnp.einsum("bn,bn->b", onehot_b16, arr2,
                          preferred_element_type=jnp.float32,
                          precision=precision)
    return jnp.sum(onehot_b16.astype(arr2.dtype) * arr2, axis=1)


def _radix_gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[b, idx[b, m], :] via a two-level (radix) one-hot contraction:
    [B, N, C] gathered at i32 [B, M] -> f32 [B, M, C].

    Equivalent to the flat [B, M, N] one-hot einsum, but materializes two
    O(M·√N) one-hots plus an O(M·√N·C) intermediate instead of one O(M·N)
    one-hot — at the wave-select shape (M = W·K = 512, N ≈ 800) that's
    ~250 MB of traffic per level instead of ~1.7 GB, and it was the
    dominant engine cost at wave_size 16 (BENCHLOG round 2).

    Precision: stage 1 selects one column within each √N-block (every
    output element is a single table value, no summation), stage 2 selects
    the block — values are read at bf16 precision (batched einsums
    truncate operands through bf16 at default precision).  Used ONLY for
    PUCT child visit/value statistics, where a ±0.4% misread of counts
    beyond 256 shifts exploration marginally; structural payloads
    (pointers, states, hashes) use HIGHEST sweeps instead."""
    B, N, C = table.shape
    r2 = max(1, int(math.isqrt(N - 1)) + 1)  # ceil(sqrt(N))
    r1 = -(-N // r2)
    pad = r1 * r2 - N
    t4 = table if pad == 0 else jnp.pad(table, ((0, 0), (0, pad), (0, 0)))
    t4 = t4.reshape(B, r1, r2, C)
    hi = idx // r2
    lo = idx - hi * r2
    oh_lo = (
        lo[:, :, None] == jnp.arange(r2, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)
    oh_hi = (
        hi[:, :, None] == jnp.arange(r1, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)
    # Stage 1: within-block select, [B,M,r2] x [B,r1,r2,C] -> [B,M,r1,C].
    # bf16 output is exact: each element is one bf16-truncated table value.
    t = jnp.einsum("bml,bhlc->bmhc", oh_lo, t4,
                   preferred_element_type=jnp.bfloat16)
    # Stage 2: block select, [B,M,r1] x [B,M,r1,C] -> [B,M,C].
    return jnp.einsum("bmh,bmhc->bmc", oh_hi, t,
                      preferred_element_type=jnp.float32)


def _puct(
    prior: jax.Array,  # f32 [B, S] slot priors (0 on pad/illegal)
    child_visits: jax.Array,  # [B, S]
    child_value: jax.Array,  # f32 [B, S] value sums, child perspective
    node_visits: jax.Array,  # [B]
    node_value: jax.Array,  # [B] mean value of the node
    config: MCTSConfig,
) -> jax.Array:
    cv = child_visits.astype(jnp.float32)
    q_visited = -child_value / jnp.maximum(cv, 1.0)
    if config.unvisited_q == "parent":
        q_un = (node_value - config.fpu_reduction)[:, None]
    else:
        q_un = jnp.zeros_like(node_value)[:, None]
    q = jnp.where(cv > 0, q_visited, q_un)
    u = (
        config.c_puct
        * prior
        * jnp.sqrt(jnp.maximum(node_visits, 1).astype(jnp.float32))[:, None]
        / (1.0 + cv)
    )
    score = q + u
    if config.diversity_bonus or config.parity_mode:
        score = score + jnp.where((cv > 0) & (cv < 5), 0.05 * (5 - cv), 0.0)
    if config.parity_mode:
        # Unvisited children win outright, earliest slot first (reference
        # +inf + first-max; slot order == action order in parity mode).
        S = prior.shape[-1]
        idx = jnp.arange(S, dtype=jnp.float32)[None, :]
        score = jnp.where((cv == 0) & (prior > 0), 1e6 - idx, score)
    return jnp.where(prior > 0, score, -jnp.inf)


def instantiate_tree(
    env, root_states, root_logits, root_value, config: MCTSConfig, rng=None,
    capacity: int | None = None, tt: TTable | None = None,
) -> Tree:
    """Allocate arenas and install the evaluated root (with Dirichlet
    exploration noise when ``rng`` is given; reference ``addDirichletNoise``,
    parallel_mcts.cpp:1110).  ``capacity`` overrides the arena
    node count (bucketed arena growth was measured a net loss on v5e:
    per-sim cost is not capacity-bound; see BENCHLOG.md)."""
    B = root_value.shape[0]
    N = config.num_nodes if capacity is None else capacity
    A = root_logits.shape[-1]
    K = min(config.max_children, A)

    legal = jax.vmap(env.legal_mask)(root_states)  # [B, A]
    prior = masked_softmax(root_logits, legal)
    if rng is not None and config.dirichlet_epsilon > 0:
        noise = jax.random.gamma(rng, config.dirichlet_alpha, shape=(B, A))
        noise = jnp.where(legal, noise, 0.0)
        noise = noise / jnp.maximum(noise.sum(-1, keepdims=True), 1e-30)
        prior = (1 - config.dirichlet_epsilon) * prior + (
            config.dirichlet_epsilon
        ) * noise
        prior = jnp.where(legal, prior, 0.0)

    cdt = _cchild_dtype(max(N, config.num_nodes))

    def tile(x):  # [B, ...] -> [B, N, ...] (root in slot 0)
        # Materialized zeros + row write — NOT broadcast_to: a broadcast
        # carry defeats XLA's in-place loop aliasing and turns every arena
        # row update into a whole-array copy per simulation.
        base = jnp.zeros((B, N) + x.shape[1:], x.dtype)
        return jax.lax.dynamic_update_index_in_dim(base, x, 0, 1)

    states = jax.tree_util.tree_map(tile, _pack_state(root_states, env))
    term = jax.vmap(env.terminal_flag)(root_states)
    to_play = jax.vmap(env.to_play)(root_states)
    winner = jax.vmap(env.winner)(root_states)
    tval = terminal_value(winner, to_play)
    root_v = jnp.where(term, tval, root_value)

    if config.tt_size:
        if config.tt_size & (config.tt_size - 1):
            raise ValueError("tt_size must be a power of two")
        if tt is None:
            tt = _tt_init(B, config.tt_size, K)
    else:
        tt = None

    return Tree(
        root_prior=prior.astype(jnp.float32),
        root_child=jnp.full((B, A), -1, jnp.int32),
        root_evisits=jnp.zeros((B, A), jnp.int32),
        root_evalue=jnp.zeros((B, A), jnp.float32),
        visits=jnp.zeros((B, N), jnp.int32).at[:, 0].set(1),
        value_sum=jnp.zeros((B, N), jnp.float32).at[:, 0].set(root_v),
        parent=jnp.full((B, N), -1, jnp.int32),
        terminal=jnp.zeros((B, N), jnp.bool_).at[:, 0].set(term),
        tvalue=jnp.zeros((B, N), jnp.float32).at[:, 0].set(tval),
        depth=jnp.zeros((B, N), jnp.int32),
        paction=jnp.full((B, N), -1, jnp.int32),
        pslot=jnp.full((B, N), -1, jnp.int32),
        prior=jnp.zeros((B, N, K), jnp.bfloat16),
        cchild=jnp.full((B, N, K), -2.0, cdt),
        caction=jnp.full((B, N, K), -1.0, jnp.float32),
        states=states,
        tt=tt,
    )


class _SelectResult(NamedTuple):
    leaf: jax.Array  # [B] node where the descent stopped
    action: jax.Array  # [B] env action of the expansion edge
    slot: jax.Array  # [B] child slot at the leaf (-1 when leaf is root)
    root_action: jax.Array  # [B] action taken at the root (first edge)
    leaf_terminal: jax.Array  # [B] stopped on a terminal node
    leaf_onehot: jax.Array  # bf16 [B, N] one-hot of the leaf node
    mask_even: jax.Array  # f32 [B, N] path nodes at even depth (incl. root)
    mask_odd: jax.Array  # f32 [B, N]
    length: jax.Array  # [B] depth of the leaf (edges from root)


class _Carry(NamedTuple):
    node: jax.Array
    action: jax.Array
    slot: jax.Array
    done: jax.Array
    leaf_terminal: jax.Array
    oh_node: jax.Array
    mask_even: jax.Array
    mask_odd: jax.Array
    length: jax.Array
    depth: jax.Array


def _select(tree: Tree, config: MCTSConfig,
            vloss_nodes: jax.Array | None = None,
            vloss_root: jax.Array | None = None) -> _SelectResult:
    """Lockstep PUCT descent: iteration 0 on the dense root arrays;
    deeper iterations via one-hot sweeps over the top-K slot arrays.

    ``vloss_nodes`` (f32 [B, N] per-node counts) / ``vloss_root`` (f32
    [B, A] per-root-edge counts) carry virtual losses from in-flight wave
    descents (reference addVirtualLoss, parallel_mcts.cpp:461-535): each
    count adds ``config.virtual_loss`` pessimistic visits — visits and
    child-perspective value sums both increase, so the parent-view Q of a
    touched edge drops."""
    B = tree.batch_size
    N = tree.capacity
    K = tree.prior.shape[-1]

    visits_f = tree.visits.astype(jnp.float32)
    vsum_f = tree.value_sum
    ev_f = tree.root_evisits.astype(jnp.float32)
    ew_f = tree.root_evalue
    if vloss_nodes is not None:
        vl = jnp.float32(config.virtual_loss)
        visits_f = visits_f + vl * vloss_nodes
        vsum_f = vsum_f + vl * vloss_nodes
        ev_f = ev_f + vl * vloss_root
        ew_f = ew_f + vl * vloss_root

    # --- root step (dense, elementwise) ---
    root_term = tree.terminal[:, 0]
    nv0 = visits_f[:, 0]
    nval0 = vsum_f[:, 0] / jnp.maximum(nv0, 1)
    if config.parity_mode:
        # Reference root visit inflation: see MCTSConfig.parity_mode.
        nv0 = 4 * (nv0 - 1) + 3
    scores = _puct(
        tree.root_prior, ev_f, ew_f,
        nv0, nval0, config,
    )
    root_action = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    oh_a = _onehot(root_action, tree.num_actions)
    child0 = _vec_gather(tree.root_child, oh_a).astype(jnp.int32)

    done0 = root_term | (child0 == UNVISITED)
    node = jnp.where(done0, 0, child0)
    oh_node = _onehot(node, N)
    mask_even = _onehot(jnp.zeros((B,), jnp.int32), N, jnp.float32)  # root
    mask_odd = jnp.where(
        done0[:, None], 0.0, oh_node.astype(jnp.float32)
    )

    init = _Carry(
        node=node,
        action=root_action,
        slot=jnp.full((B,), -1, jnp.int32),
        done=done0,
        leaf_terminal=root_term,
        oh_node=oh_node,
        mask_even=mask_even,
        mask_odd=mask_odd,
        length=jnp.where(done0, 0, 1).astype(jnp.int32),
        depth=jnp.ones((), jnp.int32),
    )

    stats = jnp.stack([visits_f, vsum_f], axis=-1)  # f32 [B, N, 2]
    krange = jnp.arange(K, dtype=jnp.int32)

    def cond(c: _Carry):
        return jnp.any(~c.done) & (c.depth < config.max_depth)

    def body(c: _Carry):
        oh = c.oh_node  # bf16 [B, N]
        term_here = _vec_gather(tree.terminal.astype(jnp.float32), oh) > 0.5
        stop_terminal = ~c.done & term_here

        prior_row = _row_gather(tree.prior, oh)  # f32 [B, K]
        child_row = jnp.round(
            _row_gather(
                tree.cchild, oh,
                precision=(jax.lax.Precision.HIGHEST
                           if tree.cchild.dtype == jnp.float32 else None),
            )
        ).astype(jnp.int32)  # f16 sweep exact to 2048; f32 wide mode HIGHEST
        # Child stats of every slot via [B, K, N] one-hot contraction.
        cidx = jnp.maximum(child_row, 0)
        oh_children = (
            cidx[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        cstats = jnp.einsum(
            "bkn,bnc->bkc", oh_children, stats,
            preferred_element_type=jnp.float32,
        )
        has_child = child_row >= 0
        cv = jnp.where(has_child, cstats[..., 0], 0.0)
        cw = jnp.where(has_child, cstats[..., 1], 0.0)

        nv = _vec_gather(visits_f, oh)
        nw = _vec_gather(vsum_f, oh)
        node_value = nw / jnp.maximum(nv, 1.0)

        sc = _puct(prior_row, cv, cw, nv, node_value, config)
        k_star = jnp.argmax(sc, axis=-1).astype(jnp.int32)
        oh_k = k_star[:, None] == krange[None, :]
        child = jnp.sum(jnp.where(oh_k, child_row + 2, 0), axis=-1) - 2
        child = jnp.maximum(child, -1)  # pad slots (-2) act as unexpanded

        stop_expand = ~c.done & ~term_here & (child == UNVISITED)
        advance = ~c.done & ~term_here & (child != UNVISITED)

        new_node = jnp.where(advance, child, c.node)
        new_oh = _onehot(new_node, N)
        parity_even = (c.depth + 1) % 2 == 0
        add = jnp.where(advance[:, None], new_oh.astype(jnp.float32), 0.0)

        return _Carry(
            node=new_node,
            action=c.action,
            slot=jnp.where(stop_expand | advance, k_star, c.slot),
            done=c.done | stop_terminal | stop_expand,
            leaf_terminal=c.leaf_terminal | stop_terminal,
            oh_node=jnp.where(advance[:, None], new_oh, c.oh_node),
            mask_even=c.mask_even + jnp.where(parity_even, add, 0.0),
            mask_odd=c.mask_odd + jnp.where(parity_even, 0.0, add),
            length=jnp.where(advance, c.length + 1, c.length),
            depth=c.depth + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    # The expansion edge's env action: gathered once from caction (kept out
    # of the descent loop so only prior+cchild sweep per iteration).
    # HIGHEST: action values reach 4672 (chess) — beyond bf16-exact range.
    act_row = _row_gather(tree.caction, out.oh_node,
                          precision=jax.lax.Precision.HIGHEST)  # f32 [B, K]
    k_oh = out.slot[:, None] == jnp.arange(K, dtype=jnp.int32)[None, :]
    slot_action = jnp.round(
        jnp.sum(jnp.where(k_oh, act_row, 0.0), axis=-1)
    ).astype(jnp.int32)
    action = jnp.where(out.slot < 0, root_action, slot_action)
    return _SelectResult(
        leaf=out.node,
        action=action,
        slot=out.slot,
        root_action=root_action,
        leaf_terminal=out.leaf_terminal,
        leaf_onehot=out.oh_node,
        mask_even=out.mask_even,
        mask_odd=out.mask_odd,
        length=out.length,
    )


def _write_row(arr, new: jax.Array, values: jax.Array, keep: jax.Array):
    """arr[:, new] = where(keep, values, arr[:, new]) with scalar ``new``
    (dynamic-update-slice fast path — no per-lane indexing)."""
    old = jax.lax.dynamic_index_in_dim(arr, new, 1, False)
    kb = keep.reshape((-1,) + (1,) * (values.ndim - 1))
    merged = jnp.where(kb, values.astype(arr.dtype), old)
    return jax.lax.dynamic_update_index_in_dim(arr, merged, new, 1)


def _gather_leaf_states(states_packed, onehot_bf16, B, N):
    """One-hot gather of each lane's leaf row from the packed state arenas
    (all leaves already bf16/f32 — pure einsum sweeps, zero conversion
    traffic).  2-D one-hot contractions are EXACT at default precision on
    both CPU and TPU (probed round 3: f32 12739 and f16 2045 payloads read
    back bit-exact) — only the batched 3-D forms truncate through bf16 and
    need Precision.HIGHEST (see _simulate_wave)."""

    def gather(x):
        flat = x.reshape(B, N, -1)
        out = jnp.einsum("bn,bnx->bx", onehot_bf16, flat,
                         preferred_element_type=jnp.float32)
        return out.reshape((B,) + x.shape[2:]).astype(x.dtype)

    return jax.tree_util.tree_map(gather, states_packed)


class _TDCarry(NamedTuple):
    oh: jax.Array  # bf16 [B, N] one-hot of the node being updated
    val: jax.Array  # f32 [B] value applied at that node
    active: jax.Array  # bool [B]
    visits: jax.Array  # i32 [B, N]
    value_sum: jax.Array  # f32 [B, N]
    edge_val: jax.Array  # f32 [B] value recorded at the depth-1 node
    edge_hit: jax.Array  # bool [B]


def _backprop_td(start: jax.Array, leaf_val: jax.Array,
                 visits: jax.Array, value_sum: jax.Array,
                 config: MCTSConfig, parent: jax.Array):
    """Sequential leaf->root backprop with the reference's TD(λ) mixing
    (parallel_mcts.cpp:800-833): update node, flip sign, then
    v <- (1-λ)·(-parent_mean) + λ·v before updating the parent.  Returns
    (visits, value_sum, edge_val [B], edge_hit [B]) where edge_* capture the
    value applied at the depth-1 node (feeds the dense root edge stats)."""
    B, N = visits.shape
    lam = jnp.float32(config.td_lambda)

    init = _TDCarry(
        oh=_onehot(start, N),
        val=leaf_val,
        active=jnp.ones((B,), bool),
        visits=visits,
        value_sum=value_sum,
        edge_val=jnp.zeros((B,), jnp.float32),
        edge_hit=jnp.zeros((B,), bool),
    )

    def cond(c: _TDCarry):
        return jnp.any(c.active)

    def body(c: _TDCarry):
        ohf = c.oh.astype(jnp.float32)
        upd = jnp.where(c.active, 1.0, 0.0)[:, None] * ohf
        new_visits = c.visits + upd.astype(jnp.int32)
        new_vsum = c.value_sum + jnp.where(
            c.active, c.val, 0.0
        )[:, None] * ohf

        par = jnp.round(
            _vec_gather(parent.astype(jnp.float32), c.oh,
                        precision=jax.lax.Precision.HIGHEST)
        ).astype(jnp.int32)
        at_depth1 = c.active & (par == 0)

        oh_par = _onehot(jnp.maximum(par, 0), N)
        pv_sum = _vec_gather(new_vsum, oh_par)
        pv_n = _vec_gather(new_visits.astype(jnp.float32), oh_par)
        parent_mean = pv_sum / jnp.maximum(pv_n, 1.0)
        flipped = -c.val
        mixed = (1.0 - lam) * (-parent_mean) + lam * flipped

        return _TDCarry(
            oh=oh_par,
            val=mixed,
            active=c.active & (par >= 0),
            visits=new_visits,
            value_sum=new_vsum,
            edge_val=jnp.where(at_depth1, c.val, c.edge_val),
            edge_hit=c.edge_hit | at_depth1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out.visits, out.value_sum, out.edge_val, out.edge_hit


def _simulate_once(env, eval_fn: EvalFn, tree: Tree, slot: jax.Array,
                   config: MCTSConfig) -> Tree:
    """One batched simulation; the expanded node is installed at arena index
    ``slot`` (a scalar — callers allocate sequentially: ``sim+1`` for fresh
    trees, ``reuse_cap + t`` after a reroot)."""
    B = tree.batch_size
    N = tree.capacity
    K = tree.prior.shape[-1]
    proto = env.init()  # dtype template for state packing (trace constant)
    sel = _select(tree, config)
    expand = ~sel.leaf_terminal
    new = jnp.asarray(slot, jnp.int32)

    # --- expand: step the env on every lane's leaf ---
    leaf_packed = _gather_leaf_states(tree.states, sel.leaf_onehot, B, N)
    leaf_state = _unpack_state(leaf_packed, proto, env)
    child_state = jax.vmap(env.step)(leaf_state, sel.action)

    obs = jax.vmap(env.observation)(child_state)
    child_to_play = jax.vmap(env.to_play)(child_state)
    logits, value = eval_fn(obs, child_to_play)
    legal = jax.vmap(env.legal_mask)(child_state)
    full_prior = masked_softmax(logits, legal)
    if config.parity_mode and K == full_prior.shape[-1]:
        # Identity slots: slot k <-> action k, so slot order is action
        # order (the reference's child creation order surrogate).
        topv = full_prior
        topa = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :], full_prior.shape
        )
    else:
        # approx_max_k hits the TPU fast path (lax.top_k full-sorts: ~3ms
        # at [1024, 225] vs ~0.1ms approximate).  Slot priors are heuristic
        # orderings, so the ~2% recall loss is immaterial.
        topv, topa = jax.lax.approx_max_k(full_prior, K)  # [B, K]
        topa = topa.astype(jnp.int32)

    child_term = jax.vmap(env.terminal_flag)(child_state)
    child_winner = jax.vmap(env.winner)(child_state)
    child_tval = terminal_value(child_winner, child_to_play)

    # --- transposition table (W=1 shapes; see _simulate_wave) ---
    tt = tree.tt
    if config.tt_size:
        h = jax.vmap(env.position_hash)(child_state)[:, None, :]
        elig = (expand & ~child_term)[:, None]
        tt, v1, tv1, ta1, _ = _tt_process(
            tt, h, elig, elig, value[:, None], topv[:, None], topa[:, None],
        )
        value, topv, topa = v1[:, 0], tv1[:, 0], ta1[:, 0]

    # --- install the new node at arena slot `new` (scalar-index writes) ---
    states = jax.tree_util.tree_map(
        lambda arr, val: _write_row(arr, new, val, expand),
        tree.states, _pack_state(child_state, env),
    )
    prior_arr = _write_row(tree.prior, new, topv, expand)
    cchild = _write_row(
        tree.cchild, new,
        jnp.where(topv > 0, -1.0, -2.0).astype(tree.cchild.dtype), expand,
    )
    caction = _write_row(
        tree.caction, new,
        jnp.where(topv > 0, topa, -1).astype(jnp.float32), expand,
    )
    parent = _write_row(tree.parent, new,
                        jnp.where(expand, sel.leaf, -1), expand)
    terminal = _write_row(tree.terminal, new, child_term, expand)
    tvalue = _write_row(tree.tvalue, new, child_tval, expand)
    depth = _write_row(tree.depth, new, sel.length + 1, expand)
    paction = _write_row(tree.paction, new,
                         jnp.where(expand, sel.action, -1), expand)
    pslot = _write_row(tree.pslot, new,
                       jnp.where(expand, sel.slot, -1), expand)

    # --- link the parent's edge to the new node ---
    from_root = sel.slot < 0
    oh_a_bool = _onehot(sel.root_action, tree.num_actions, jnp.bool_)
    root_child = jnp.where(
        (expand & from_root)[:, None] & oh_a_bool, new, tree.root_child
    )
    oh_leaf_bool = sel.leaf_onehot > 0
    oh_slot = (
        jnp.maximum(sel.slot, 0)[:, None]
        == jnp.arange(K, dtype=jnp.int32)[None, :]
    )
    link = (
        (expand & ~from_root)[:, None, None]
        & oh_leaf_bool[:, :, None]
        & oh_slot[:, None, :]
    )
    cchild = jnp.where(link, new.astype(cchild.dtype), cchild)

    # --- backprop via the accumulated path masks ---
    leaf_tval = _vec_gather(tree.tvalue, sel.leaf_onehot)
    leaf_val = jnp.where(
        sel.leaf_terminal,
        leaf_tval,
        jnp.where(child_term, child_tval, value),
    )
    if config.td_lambda is not None:
        # Opt-in TD(λ) path: sequential parent-pointer walk (needs each
        # node's running mean, so the one-shot mask trick doesn't apply).
        start = jnp.where(expand, new, sel.leaf)
        visits, value_sum, edge_val, edge_hit = _backprop_td(
            start, leaf_val, tree.visits, tree.value_sum, config, parent,
        )
        root_evisits = tree.root_evisits + jnp.where(
            edge_hit[:, None] & oh_a_bool, 1, 0
        )
        root_evalue = tree.root_evalue + jnp.where(
            edge_hit[:, None] & oh_a_bool, edge_val[:, None], 0.0
        )
    else:
        L = sel.length + expand.astype(jnp.int32)  # depth of backprop start
        l_even = (L % 2 == 0)[:, None]
        v = leaf_val[:, None]
        visits = tree.visits + (
            sel.mask_even + sel.mask_odd
        ).astype(jnp.int32)
        value_sum = (
            tree.value_sum
            + jnp.where(l_even, v, -v) * sel.mask_even
            + jnp.where(l_even, -v, v) * sel.mask_odd
        )
        # The new node itself (depth L, sign +v).
        visits = _write_row(
            visits, new,
            jax.lax.dynamic_index_in_dim(visits, new, 1, False)
            + jnp.where(expand, 1, 0),
            jnp.ones((B,), bool),
        )
        value_sum = _write_row(
            value_sum, new,
            jax.lax.dynamic_index_in_dim(value_sum, new, 1, False)
            + jnp.where(expand, leaf_val, 0.0),
            jnp.ones((B,), bool),
        )

        # --- root edge stats (child-perspective sums; child at depth 1) ---
        backed = (sel.length >= 1) | (expand & from_root)
        sign1 = jnp.where(L % 2 == 1, leaf_val, -leaf_val)
        root_evisits = tree.root_evisits + jnp.where(
            backed[:, None] & oh_a_bool, 1, 0
        )
        root_evalue = tree.root_evalue + jnp.where(
            backed[:, None] & oh_a_bool, sign1[:, None], 0.0
        )

    return tree.replace(
        root_child=root_child,
        root_evisits=root_evisits,
        root_evalue=root_evalue,
        visits=visits,
        value_sum=value_sum,
        parent=parent,
        terminal=terminal,
        tvalue=tvalue,
        depth=depth,
        paction=paction,
        pslot=pslot,
        prior=prior_arr,
        cchild=cchild,
        caction=caction,
        states=states,
        tt=tt,
    )


class _WaveSelect(NamedTuple):
    leaf: jax.Array  # i32 [B, W]
    action: jax.Array  # i32 [B, W]
    slot: jax.Array  # i32 [B, W] (-1 when leaf is root)
    root_action: jax.Array  # i32 [B, W]
    leaf_terminal: jax.Array  # bool [B, W]
    oh_leaves: jax.Array  # bf16 [B, W, N]
    # Signed path mask: +1 at even-depth path nodes (incl. root), -1 at
    # odd-depth ones, 0 off-path.  One walker visits a node at most once,
    # so entries stay in {-1, 0, +1} — exact in bf16, half the carry bytes
    # of the two f32 masks it replaces (round 3).
    mask_signed: jax.Array  # bf16 [B, W, N]
    length: jax.Array  # i32 [B, W]


class _WaveCarry(NamedTuple):
    node: jax.Array
    slot: jax.Array
    done: jax.Array
    leaf_terminal: jax.Array
    oh_node: jax.Array
    mask_signed: jax.Array
    length: jax.Array
    depth: jax.Array


def _select_wave(tree: Tree, config: MCTSConfig, W: int) -> _WaveSelect:
    """W lockstep virtual-loss PUCT descents sharing every arena sweep.

    Exactness: in a tree, two walkers occupying the same node have walked
    the identical path, so all virtual-loss interactions happen between
    same-level same-node walkers — resolving each level's choices in rank
    order (walker w sees the edges walkers 0..w-1 just picked, on cheap
    [B,K] gathered rows) reproduces fully-sequential virtual loss while
    the big [B,N,K] prior/cchild sweeps are read ONCE per level for all W
    walkers (sequential selects re-read them per walker: measured 0.64 ms
    per select at B=1024, the dominant wave cost)."""
    B = tree.batch_size
    N = tree.capacity
    K = tree.prior.shape[-1]
    A = tree.num_actions
    VL = jnp.float32(config.virtual_loss)

    visits_f = tree.visits.astype(jnp.float32)
    vsum_f = tree.value_sum

    # --- root level: rank-ordered dense PUCT ---
    root_term = tree.terminal[:, 0]
    nv0 = visits_f[:, 0]
    nval0 = vsum_f[:, 0] / jnp.maximum(nv0, 1)
    ev = tree.root_evisits.astype(jnp.float32)
    ew = tree.root_evalue
    extra = jnp.zeros((B, A), jnp.float32)
    root_actions = []
    for w in range(W):
        sc = _puct(tree.root_prior, ev + VL * extra, ew + VL * extra,
                   nv0 + VL * w, nval0, config)
        a_w = jnp.argmax(sc, axis=-1).astype(jnp.int32)
        extra = extra + _onehot(a_w, A, jnp.float32)
        root_actions.append(a_w)
    root_action = jnp.stack(root_actions, 1)  # [B, W]
    oh_ra = (
        root_action[:, :, None] == jnp.arange(A, dtype=jnp.int32)[None, None]
    )
    child0 = jnp.sum(
        jnp.where(oh_ra, tree.root_child[:, None, :] + 2, 0), axis=-1
    ) - 2  # [B, W]

    done0 = root_term[:, None] | (child0 == UNVISITED)
    node = jnp.where(done0, 0, child0)
    oh_node = (
        node[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None]
    ).astype(jnp.bfloat16)
    root_oh = jnp.zeros((B, W, N), jnp.bfloat16).at[:, :, 0].set(1.0)
    mask_signed = root_oh - jnp.where(
        done0[:, :, None], jnp.bfloat16(0.0), oh_node
    )

    init = _WaveCarry(
        node=node,
        slot=jnp.full((B, W), -1, jnp.int32),
        done=done0,
        leaf_terminal=jnp.broadcast_to(root_term[:, None], (B, W)),
        oh_node=oh_node,
        mask_signed=mask_signed,
        length=jnp.where(done0, 0, 1).astype(jnp.int32),
        depth=jnp.ones((), jnp.int32),
    )

    stats = jnp.stack([visits_f, vsum_f], axis=-1)  # f32 [B, N, 2]
    krange = jnp.arange(K, dtype=jnp.int32)

    def cond(c: _WaveCarry):
        return jnp.any(~c.done) & (c.depth < config.max_depth)

    def body(c: _WaveCarry):
        oh = c.oh_node  # bf16 [B, W, N]
        term_here = jnp.einsum(
            "bwn,bn->bw", oh, tree.terminal.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) > 0.5
        prior_row = jnp.einsum(
            "bwn,bnk->bwk", oh, tree.prior,
            preferred_element_type=jnp.float32,
        )
        # Pointer sweep MUST be HIGHEST: unlike the W=1 2-D sweeps (exact
        # at default precision on both CPU and TPU), every BATCHED (3-D)
        # einsum truncates its operands through bf16 at default precision
        # — measured identically on XLA:CPU and v5e: f16 pointer 2045
        # reads as 2048, f32 12739 as 12736 (round 3).  That silently
        # corrupted wave-descent links beyond node 256.
        child_row = jnp.round(jnp.einsum(
            "bwn,bnk->bwk", oh, tree.cchild,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )).astype(jnp.int32)
        cidx = jnp.maximum(child_row, 0).reshape(B, W * K)
        cstats = _radix_gather_rows(stats, cidx).reshape(B, W, K, 2)
        has_child = child_row >= 0
        cv = jnp.where(has_child, cstats[..., 0], 0.0)
        cw = jnp.where(has_child, cstats[..., 1], 0.0)

        # HIGHEST: 3-D einsums truncate through bf16 at default precision
        # (see child_row above); node visits exceed 256 routinely.
        nv = jnp.einsum("bwn,bn->bw", oh, visits_f,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        nw = jnp.einsum("bwn,bn->bw", oh, vsum_f,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        node_value = nw / jnp.maximum(nv, 1.0)

        # Rank-ordered per-level virtual loss on the gathered [B,K] rows.
        extra_k = jnp.zeros((B, W, K), jnp.float32)
        samec = jnp.zeros((B, W), jnp.float32)
        ks = []
        for w in range(W):
            sc = _puct(
                prior_row[:, w],
                cv[:, w] + VL * extra_k[:, w],
                cw[:, w] + VL * extra_k[:, w],
                nv[:, w] + VL * samec[:, w],
                node_value[:, w],
                config,
            )
            k_w = jnp.argmax(sc, axis=-1).astype(jnp.int32)
            same = (c.node == c.node[:, w:w + 1]) & ~c.done & ~c.done[:, w:w + 1]
            oh_k = (k_w[:, None] == krange[None, :]).astype(jnp.float32)
            # A walker stopping on a terminal node contributes node virtual
            # loss (its path ends here) but no edge choice.
            picks = same & ~term_here[:, w:w + 1]
            extra_k = extra_k + picks[:, :, None].astype(jnp.float32) \
                * oh_k[:, None, :]
            samec = samec + same.astype(jnp.float32)
            ks.append(k_w)
        k_star = jnp.stack(ks, 1)  # [B, W]

        oh_k = k_star[:, :, None] == krange[None, None, :]
        child = jnp.sum(jnp.where(oh_k, child_row + 2, 0), axis=-1) - 2
        child = jnp.maximum(child, -1)

        stop_expand = ~c.done & ~term_here & (child == UNVISITED)
        advance = ~c.done & ~term_here & (child != UNVISITED)

        new_node = jnp.where(advance, child, c.node)
        new_oh = (
            new_node[:, :, None]
            == jnp.arange(N, dtype=jnp.int32)[None, None]
        ).astype(jnp.bfloat16)
        parity_even = (c.depth + 1) % 2 == 0
        sign = jnp.where(parity_even, jnp.bfloat16(1.0), jnp.bfloat16(-1.0))
        add = jnp.where(advance[:, :, None], new_oh * sign,
                        jnp.bfloat16(0.0))

        return _WaveCarry(
            node=new_node,
            slot=jnp.where(stop_expand | advance, k_star, c.slot),
            done=c.done | (~c.done & term_here) | stop_expand,
            leaf_terminal=c.leaf_terminal | (~c.done & term_here),
            oh_node=jnp.where(advance[:, :, None], new_oh, c.oh_node),
            mask_signed=c.mask_signed + add,
            length=jnp.where(advance, c.length + 1, c.length),
            depth=c.depth + 1,
        )

    out = jax.lax.while_loop(cond, body, init)

    act_row = jnp.einsum(
        "bwn,bnk->bwk", out.oh_node, tree.caction,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    k_oh = out.slot[:, :, None] == krange[None, None, :]
    slot_action = jnp.round(
        jnp.sum(jnp.where(k_oh, act_row, 0.0), axis=-1)
    ).astype(jnp.int32)
    action = jnp.where(out.slot < 0, root_action, slot_action)
    return _WaveSelect(
        leaf=out.node,
        action=action,
        slot=out.slot,
        root_action=root_action,
        leaf_terminal=out.leaf_terminal,
        oh_leaves=out.oh_node,
        mask_signed=out.mask_signed,
        length=out.length,
    )


def _write_rows(arr, start: jax.Array, values: jax.Array, keep: jax.Array):
    """arr[:, start:start+W] = where(keep, values, old) with scalar
    ``start`` (one dynamic-slice read-modify-write — the W-row block analog
    of _write_row)."""
    W = values.shape[1]
    old = jax.lax.dynamic_slice_in_dim(arr, start, W, 1)
    kb = keep.reshape(keep.shape + (1,) * (values.ndim - 2))
    merged = jnp.where(kb, values.astype(arr.dtype), old)
    return jax.lax.dynamic_update_slice_in_dim(arr, merged, start, 1)


def _simulate_wave(env, eval_fn: EvalFn, tree: Tree, slot: jax.Array,
                   config: MCTSConfig) -> Tree:
    """One wave of ``W = config.wave_size`` simulations per lane: W PUCT
    descents with accumulating virtual loss, then ONE batched env-step +
    NN eval over the B*W leaves, a W-row block install at arena slots
    [slot, slot+W), combined child links and a combined backprop.

    This is the TPU rendition of the reference's BATCHED search mode
    (self_play_manager.cpp:166-175 + BatchQueue): in-flight simulations
    are de-correlated by virtual loss and their leaf evaluations share one
    NN batch.  Two walkers reaching the same unexpanded edge are merged
    exactly (the child state and its evaluation are identical, so the
    duplicate's visit/value land on the first walker's node — the arena
    analog of the reference's expansion-mutex dedupe).

    Engine rationale (BENCHLOG round 2): per-sim engine cost is dominated
    by fixed per-op dispatch overhead (installs/bookkeeping), not by the
    descent sweeps — batching W sims per dispatched program divides that
    overhead by W."""
    B = tree.batch_size
    N = tree.capacity
    K = tree.prior.shape[-1]
    A = tree.num_actions
    W = config.wave_size
    if config.td_lambda is not None or config.parity_mode:
        raise ValueError("wave_size > 1 is incompatible with td_lambda / "
                         "parity_mode (use the sequential path)")
    proto = env.init()
    base = jnp.asarray(slot, jnp.int32)

    # --- W lockstep virtual-loss descents (shared sweeps) ---
    sel = _select_wave(tree, config, W)
    leafs = sel.leaf                 # i32 [B, W]
    actions = sel.action             # i32 [B, W]
    expand0 = ~sel.leaf_terminal     # [B, W]
    oh_leaves = sel.oh_leaves        # bf16 [B, W, N]
    lengths = sel.length             # i32 [B, W]
    slots_k = sel.slot               # i32 [B, W]
    from_root = slots_k < 0

    # --- merge duplicate expansions (same leaf, same edge) ---
    # first[b, w] = smallest w2 <= w with the same (leaf, action) expansion
    # (w itself when unique) — one [B, W, W] comparison instead of the
    # O(W^2) scalar-op chain.
    wrange = jnp.arange(W, dtype=jnp.int32)
    same = (
        (leafs[:, :, None] == leafs[:, None, :])
        & (actions[:, :, None] == actions[:, None, :])
        & expand0[:, :, None] & expand0[:, None, :]
        & (wrange[None, :, None] >= wrange[None, None, :])
    )  # bool [B, W(src), W(candidate)]
    first = jnp.argmax(same, axis=2).astype(jnp.int32)  # first True wins
    first = jnp.where(expand0, first, wrange[None, :])  # non-expanding: self
    expand = expand0 & (first == wrange[None, :])  # canonical walkers only

    # --- batched leaf pipeline over B*W ---
    # bf16 payloads (board cells, flags: values exact in bf16) take the
    # single-pass sweep; wider payloads (bit-packed rows, hash halves,
    # counters — up to 2^16) run at HIGHEST because BATCHED einsums
    # truncate operands through bf16 at default precision on both CPU and
    # TPU (round-3 finding; the W=1 2-D gathers never had this problem).
    def _gather_wave(x):
        flat = x.reshape(B, N, -1)
        if x.dtype == jnp.bfloat16:
            out = jnp.einsum("bwn,bnx->bwx", oh_leaves, flat,
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("bwn,bnx->bwx",
                             oh_leaves.astype(jnp.float32), flat,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        return out.reshape((B * W,) + x.shape[2:]).astype(x.dtype)

    leaf_packed = jax.tree_util.tree_map(_gather_wave, tree.states)
    leaf_state = _unpack_state(leaf_packed, proto, env)
    child_state = jax.vmap(env.step)(leaf_state, actions.reshape(-1))
    obs = jax.vmap(env.observation)(child_state)
    child_to_play = jax.vmap(env.to_play)(child_state)
    logits, value = eval_fn(obs, child_to_play)
    legal = jax.vmap(env.legal_mask)(child_state)
    # Top-K straight from the masked logits (softmax is monotone per row),
    # then reconstruct the K probabilities from one logsumexp — avoids
    # materializing the full [B*W, A] softmax just to keep K of its values.
    topv, topa = _topk_masked_prior(logits, legal, K)
    topa = topa.astype(jnp.int32)
    child_term = jax.vmap(env.terminal_flag)(child_state)
    child_winner = jax.vmap(env.winner)(child_state)
    child_tval = terminal_value(child_winner, child_to_play)

    def bw(x):  # [B*W, ...] -> [B, W, ...]
        return x.reshape((B, W) + x.shape[1:])

    topv_w, topa_w = bw(topv), bw(topa)
    cterm_w, ctval_w = bw(child_term), bw(child_tval)
    value_w = bw(value)

    # --- transposition table: consult before using the NN output, store
    # on miss (reference parallel_mcts.cpp:835-917) ---
    tt = tree.tt
    if config.tt_size:
        h = jax.vmap(env.position_hash)(child_state).reshape(B, W, 2)
        lookup_elig = expand0 & ~cterm_w  # duplicates too: same hash,
        store_elig = expand & ~cterm_w    # same hit verdict as canonical
        tt, value_w, topv_w, topa_w, _ = _tt_process(
            tt, h, lookup_elig, store_elig, value_w, topv_w, topa_w,
        )

    # --- install W rows (one block write per arena array) ---
    states = jax.tree_util.tree_map(
        lambda arr, val: _write_rows(
            arr, base, val.reshape((B, W) + arr.shape[2:]), expand
        ),
        tree.states, _pack_state(child_state, env),
    )
    prior_arr = _write_rows(tree.prior, base, topv_w, expand)
    cchild = _write_rows(
        tree.cchild, base,
        jnp.where(topv_w > 0, -1.0, -2.0).astype(tree.cchild.dtype), expand,
    )
    caction = _write_rows(
        tree.caction, base,
        jnp.where(topv_w > 0, topa_w, -1).astype(jnp.float32), expand,
    )
    parent = _write_rows(tree.parent, base,
                         jnp.where(expand, leafs, -1), expand)
    terminal = _write_rows(tree.terminal, base, cterm_w, expand)
    tvalue = _write_rows(tree.tvalue, base, ctval_w, expand)
    depth = _write_rows(tree.depth, base, lengths + 1, expand)
    paction = _write_rows(tree.paction, base,
                          jnp.where(expand, actions, -1), expand)
    pslot = _write_rows(tree.pslot, base,
                        jnp.where(expand, slots_k, -1), expand)

    # --- links (combined single passes) ---
    root_child = tree.root_child
    for w in range(W):
        m = (expand[:, w] & from_root[:, w])[:, None] & _onehot(
            sel.root_action[:, w], A, jnp.bool_
        )
        root_child = jnp.where(m, base + w, root_child)

    # Deep links: scatter (base + w) into each canonical walker's
    # (leaf, slot) edge as TWO [B,W,·] x [B,W,·] einsums over the walker
    # axis instead of W sequential [B,N,K] where-passes.  After the dedupe
    # pass (leaf, slot) pairs are unique among linking walkers, so the
    # count is 0/1 and the w-index sum is exact (values < W fit bf16).
    deep = (expand & ~from_root).astype(jnp.bfloat16)  # [B, W]
    oh_slots = (
        slots_k[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)  # [B, W, K] (slot < 0 rows are all-zero)
    src = oh_leaves * deep[:, :, None]  # bf16 [B, W, N]
    link_cnt = jnp.einsum("bwn,bwk->bnk", src, oh_slots,
                          preferred_element_type=jnp.float32)
    link_w = jnp.einsum("bwn,bwk->bnk", src * wrange.astype(jnp.bfloat16)[
        None, :, None], oh_slots, preferred_element_type=jnp.float32)
    cchild = jnp.where(
        link_cnt > 0.5,
        (base.astype(jnp.float32) + link_w).astype(cchild.dtype),
        cchild,
    )

    # --- combined backprop ---
    leaf_tval = jnp.einsum(
        "bwn,bn->bw", oh_leaves, tree.tvalue,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    leaf_term = ~expand0
    leaf_val = jnp.where(
        leaf_term, leaf_tval, jnp.where(cterm_w, ctval_w, value_w)
    )  # f32 [B, W]

    L = lengths + expand0.astype(jnp.int32)  # backprop start depth
    l_even = L % 2 == 0
    sgn = jnp.where(l_even, leaf_val, -leaf_val)  # f32 [B, W]
    # Signed mask: ±1 on the path by depth parity, so
    #   value_add = Σ_w sgn_w · mask_w   and   visit_add = Σ_w |mask_w|.
    vis_add = jnp.sum(
        jnp.abs(sel.mask_signed), axis=1, dtype=jnp.float32
    )
    val_add = jnp.einsum("bwn,bw->bn", sel.mask_signed, sgn,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    visits = tree.visits + vis_add.astype(jnp.int32)
    value_sum = tree.value_sum + val_add

    # New-node stats: duplicates redirect onto the canonical walker's node.
    tgt_oh = first[:, :, None] == wrange[None, None, :]  # [B, W(src), W(tgt)]
    contrib = tgt_oh & expand0[:, :, None]
    cnt = jnp.sum(contrib, axis=1).astype(jnp.int32)  # [B, W(tgt)]
    vsum_new = jnp.sum(
        jnp.where(contrib, leaf_val[:, :, None], 0.0), axis=1
    )  # [B, W]
    keep_all = jnp.ones((B, W), bool)
    old_v = jax.lax.dynamic_slice_in_dim(visits, base, W, 1)
    visits = jax.lax.dynamic_update_slice_in_dim(
        visits, old_v + cnt, base, 1
    )
    old_s = jax.lax.dynamic_slice_in_dim(value_sum, base, W, 1)
    value_sum = jax.lax.dynamic_update_slice_in_dim(
        value_sum, old_s + vsum_new, base, 1
    )
    del keep_all

    # --- root edge stats ---
    backed = (lengths >= 1) | (expand0 & from_root)  # [B, W]
    sign1 = jnp.where(L % 2 == 1, leaf_val, -leaf_val)
    oh_roots = (
        sel.root_action[:, :, None]
        == jnp.arange(A, dtype=jnp.int32)[None, None]
    ).astype(jnp.float32)  # f32 [B, W, A]
    root_evisits = tree.root_evisits + jnp.einsum(
        "bwa,bw->ba", oh_roots, backed.astype(jnp.float32)
    ).astype(jnp.int32)
    root_evalue = tree.root_evalue + jnp.einsum(
        "bwa,bw->ba", oh_roots, jnp.where(backed, sign1, 0.0),
        precision=jax.lax.Precision.HIGHEST,
    )

    return tree.replace(
        root_child=root_child,
        root_evisits=root_evisits,
        root_evalue=root_evalue,
        visits=visits,
        value_sum=value_sum,
        parent=parent,
        terminal=terminal,
        tvalue=tvalue,
        depth=depth,
        paction=paction,
        pslot=pslot,
        prior=prior_arr,
        cchild=cchild,
        caction=caction,
        states=states,
        tt=tt,
    )


def search(
    env,
    eval_fn: EvalFn,
    root_states,
    rng: jax.Array,
    config: MCTSConfig,
    tt: TTable | None = None,
) -> SearchOutput:
    """Run ``config.num_simulations`` batched simulations from the given
    roots.  Fully jittable; env and config are static.  ``tt`` warm-starts
    the transposition table (``config.tt_size`` entries) from a previous
    search — the reference keeps one TT per game across moves
    (self_play_manager.cpp:166-184)."""
    noise_rng, _ = jax.random.split(rng)
    obs = jax.vmap(env.observation)(root_states)
    logits, value = eval_fn(obs, jax.vmap(env.to_play)(root_states))
    tree = instantiate_tree(env, root_states, logits, value, config,
                            noise_rng, tt=tt)

    if config.wave_size > 1:
        def body(t, wv):
            return _simulate_wave(
                env, eval_fn, t, 1 + wv * config.wave_size, config
            ), ()

        tree, _ = jax.lax.scan(body, tree, jnp.arange(config.waves))
    else:
        def body(t, sim):
            return _simulate_once(env, eval_fn, t, sim + 1, config), ()

        tree, _ = jax.lax.scan(
            body, tree, jnp.arange(config.num_simulations), unroll=2
        )

    counts = tree.root_evisits
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
    logits = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1)) / t,
                       -jnp.inf)
    any_visits = counts.sum(-1) > 0
    safe_logits = jnp.where(any_visits[:, None], logits, 0.0)
    sampled = jax.random.categorical(rng, safe_logits, axis=-1)
    greedy = jnp.argmax(counts, axis=-1)
    pick = jnp.where(temp <= 1e-6, greedy, sampled)
    return jnp.where(any_visits, pick, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Tree reuse between moves — the reference ParallelMCTS::updateWithMove
# (src/mcts/parallel_mcts.cpp:1065): after a move is played, the played
# child's subtree survives and becomes the new root.  On the array arenas
# this is a batched compaction: survivors (nodes whose depth-1 ancestor is
# the played child) are permuted to the front of a fresh arena in allocation
# order, all internal indices are remapped, and the played child's slot-row
# stats are scattered into the new dense root arrays.  Everything runs as
# one-hot einsum contractions at Precision.HIGHEST (index arithmetic must be
# exact; a single-pass bf16 matmul is only exact to 256) — this happens once
# per MOVE, not per simulation, so the ~[B,C,N] contractions are off the hot
# path.

_HI = jax.lax.Precision.HIGHEST


def _oh_gather(values: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """values[b, idx[b, j]] for index arrays ([B, M] by [B, N] -> [B, M])
    via one-hot contraction; idx < 0 yields 0."""
    oh = (
        idx[:, :, None] == jnp.arange(n, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)
    return jnp.einsum("bjn,bn->bj", oh, values.astype(jnp.float32),
                      precision=_HI)


def _depth1_ancestor(parent: jax.Array, max_depth: int) -> jax.Array:
    """Per-node depth-1 ancestor (the node's root edge) from parent
    pointers, by pointer jumping: f(j) = j if parent==0 else parent[j]
    (root/unallocated -> -1), iterated to its fixpoint in log2(max_depth)
    doubling steps."""
    B, N = parent.shape
    jj = jnp.arange(N, dtype=jnp.int32)[None, :]
    anc = jnp.where(parent == 0, jj, parent)  # -1 stays -1
    import math

    steps = max(1, math.ceil(math.log2(max(2, max_depth))))
    for _ in range(steps):
        nxt = jnp.round(
            _oh_gather(anc, jnp.maximum(anc, 0), N)
        ).astype(jnp.int32)
        anc = jnp.where(anc > 0, nxt, anc)
    return anc


def reroot(
    env,
    tree: Tree,
    action: jax.Array,  # i32 [B] the move just played
    new_root_states,  # [B] env states AFTER the move (= step(root, action))
    root_logits: jax.Array,  # [B, A] NN policy logits on new_root_states
    root_value: jax.Array,  # f32 [B] NN value on new_root_states
    config: MCTSConfig,
    rng: jax.Array | None = None,
    noise_on=True,  # bool scalar (traced ok): apply Dirichlet this move
) -> Tree:
    """Re-root the arenas on the played child, keeping its subtree's
    statistics (visits, values, expanded children, env states).  Lanes whose
    played action was never expanded get a fresh root (reference
    updateWithMove's else-branch).  The new root's dense prior is rebuilt
    from the fresh NN logits (the same network that produced the stored
    top-K slot priors) + Dirichlet noise — the visit statistics, which carry
    the search's information, are preserved exactly.

    The first ``config.reuse_cap`` survivors (allocation order ~ closest to
    the root) are kept; deeper nodes beyond the cap are dropped and simply
    re-expand on demand (their visit contributions remain in their kept
    ancestors' counts).  New simulations must allocate slots
    ``reuse_cap + t``."""
    B, N = tree.visits.shape
    A = tree.num_actions
    K = tree.prior.shape[-1]
    C = min(config.reuse_cap, N)

    # --- survivors: nodes whose root edge is the played action ---
    oh_a = _onehot(action, A)
    child0 = _vec_gather(tree.root_child, oh_a).astype(jnp.int32)
    # [B]; -1 when the played child was never expanded (i32 sum path: exact)
    has_reuse = child0 >= 0
    anc1 = _depth1_ancestor(tree.parent, config.max_depth + 2)
    member = (
        (anc1 == child0[:, None]) & (tree.visits > 0) & has_reuse[:, None]
    )
    new_idx = jnp.cumsum(member.astype(jnp.int32), axis=1) - 1
    member = member & (new_idx < C)
    old_to_new = jnp.where(member, new_idx, -1).astype(jnp.float32)

    # --- permutation [B, C(new), N(old)] ---
    perm = (
        (new_idx[:, None, :] == jnp.arange(C, dtype=jnp.int32)[None, :, None])
        & member[:, None, :]
    ).astype(jnp.float32)

    def pvec(x):  # [B, N] -> [B, C]
        return jnp.einsum("bji,bi->bj", perm, x.astype(jnp.float32),
                          precision=_HI)

    def pmat(x):  # [B, N, ...] -> [B, C, ...]
        flat = x.reshape(B, N, -1).astype(jnp.float32)
        out = jnp.einsum("bji,bix->bjx", perm, flat, precision=_HI)
        return out.reshape((B, C) + x.shape[2:])

    visits_p = jnp.round(pvec(tree.visits)).astype(jnp.int32)
    vsum_p = pvec(tree.value_sum)
    term_p = pvec(tree.terminal) > 0.5
    tval_p = pvec(tree.tvalue)
    depth_p = jnp.maximum(
        jnp.round(pvec(tree.depth)).astype(jnp.int32) - 1, 0
    )
    paction_p = jnp.round(pvec(tree.paction)).astype(jnp.int32)
    pslot_p = jnp.round(pvec(tree.pslot)).astype(jnp.int32)
    parent_old_p = jnp.round(pvec(tree.parent)).astype(jnp.int32)
    prior_p = pmat(tree.prior).astype(jnp.bfloat16)
    caction_p = pmat(tree.caction)
    cchild_p = pmat(tree.cchild)  # old-frame indices; remapped below
    states_p = jax.tree_util.tree_map(
        lambda x: pmat(x).astype(x.dtype), tree.states
    )

    # --- remap parent pointers into the new frame ---
    parent_p = jnp.round(
        _oh_gather(old_to_new, jnp.maximum(parent_old_p, 0), N)
    ).astype(jnp.int32)
    parent_p = jnp.where(parent_old_p >= 0, parent_p, -1)
    # new root: its old parent was node 0 (non-member) -> old_to_new = -1 ✓

    # --- rebuild child links from (parent, slot) in the new frame ---
    jvals = jnp.arange(C, dtype=jnp.float32)[None, :]
    is_deep = parent_p > 0  # depth >= 2: lives in a K-slot row
    ohp = (
        parent_p[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * is_deep[:, :, None]
    ohs = (
        pslot_p[:, :, None] == jnp.arange(K, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)
    recon = jnp.einsum("bjn,bjk->bnk", ohp * jvals[:, :, None], ohs,
                       precision=_HI)  # [B, C, K]; 0 = no surviving child
    cchild_new = jnp.where(
        cchild_p >= 0,
        jnp.where(recon > 0, recon, -1.0),
        jnp.where(cchild_p > -1.5, -1.0, -2.0),  # keep -1/-2 structure
    ).astype(tree.cchild.dtype)

    # --- dense root arrays from the depth-1 survivors ---
    is_d1 = parent_p == 0
    ohA = (
        paction_p[:, :, None] == jnp.arange(A, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * is_d1[:, :, None]
    root_child_new = jnp.einsum("bja,j->ba", ohA,
                                jnp.arange(C, dtype=jnp.float32),
                                precision=_HI)
    root_child_new = jnp.where(root_child_new > 0,
                               jnp.round(root_child_new), -1).astype(jnp.int32)
    root_evisits_new = jnp.round(jnp.einsum(
        "bja,bj->ba", ohA, visits_p.astype(jnp.float32), precision=_HI
    )).astype(jnp.int32)
    root_evalue_new = jnp.einsum("bja,bj->ba", ohA, vsum_p, precision=_HI)

    # --- fresh root data (used whole for no-reuse lanes; prior for all) ---
    legal = jax.vmap(env.legal_mask)(new_root_states)
    prior = masked_softmax(root_logits, legal)
    if rng is not None and config.dirichlet_epsilon > 0:
        noise = jax.random.gamma(rng, config.dirichlet_alpha, shape=(B, A))
        noise = jnp.where(legal, noise, 0.0)
        noise = noise / jnp.maximum(noise.sum(-1, keepdims=True), 1e-30)
        eps = config.dirichlet_epsilon * jnp.asarray(noise_on, jnp.float32)
        prior = (1 - eps) * prior + eps * noise
        prior = jnp.where(legal, prior, 0.0)

    term = jax.vmap(env.terminal_flag)(new_root_states)
    to_play = jax.vmap(env.to_play)(new_root_states)
    winner = jax.vmap(env.winner)(new_root_states)
    tval = terminal_value(winner, to_play)
    fresh_v = jnp.where(term, tval, root_value)

    # --- assemble the new arena: survivors at [0, C), zeros beyond ---
    ru = has_reuse  # [B]

    def front(x_p, fresh_row=None, dtype=None, fill=0):
        """Survivor block + fresh-lane row 0 override, padded to N."""
        dt = dtype or x_p.dtype
        pad = jnp.full((B, N - C) + x_p.shape[2:], fill, dt)
        x = jnp.concatenate([x_p.astype(dt), pad], axis=1)
        if fresh_row is not None:
            row0 = jax.lax.dynamic_index_in_dim(x, 0, 1, False)
            row0 = jnp.where(
                ru.reshape((-1,) + (1,) * (row0.ndim - 1)),
                row0, fresh_row.astype(dt),
            )
            x = jax.lax.dynamic_update_index_in_dim(x, row0, 0, 1)
        return x

    states_new = jax.tree_util.tree_map(
        lambda xp, fresh: front(xp, fresh_row=fresh),
        states_p, _pack_state(new_root_states, env),
    )

    return Tree(
        root_prior=prior.astype(jnp.float32),
        root_child=jnp.where(ru[:, None], root_child_new, -1),
        root_evisits=jnp.where(ru[:, None], root_evisits_new, 0),
        root_evalue=jnp.where(ru[:, None], root_evalue_new, 0.0),
        visits=front(visits_p, fresh_row=jnp.ones((B,), jnp.int32)),
        value_sum=front(vsum_p, fresh_row=fresh_v, dtype=jnp.float32),
        parent=front(parent_p, fill=-1,
                     fresh_row=jnp.full((B,), -1, jnp.int32)),
        terminal=front(term_p, fresh_row=term),
        tvalue=front(tval_p, fresh_row=tval, dtype=jnp.float32),
        depth=front(depth_p, fresh_row=jnp.zeros((B,), jnp.int32)),
        paction=front(paction_p, fill=-1,
                      fresh_row=jnp.full((B,), -1, jnp.int32)),
        pslot=front(pslot_p, fill=-1,
                    fresh_row=jnp.full((B,), -1, jnp.int32)),
        prior=front(prior_p, fresh_row=jnp.zeros((B, K), jnp.bfloat16)),
        cchild=front(cchild_new, fill=-2.0,
                     fresh_row=jnp.full((B, K), -2.0, jnp.float16)),
        caction=front(caction_p, fill=-1.0,
                      fresh_row=jnp.full((B, K), -1.0, jnp.float32)),
        states=states_new,
        # The table survives the move boundary — the reference keeps one TT
        # per game across its moves (self_play_manager.cpp:166-184).
        tt=tree.tt,
    )


# ---------------------------------------------------------------------------
# Host-driven search: the simulation loop runs in Python with donated
# buffers instead of inside lax.scan.  Profiling on v5e showed the nested
# while-in-scan structure forces XLA to copy the big arena carries every
# iteration (~3ms/sim of pure copy overhead at B=1024); asynchronously
# dispatched per-sim executables with donate_argnums pipeline at the true
# compute cost instead.  Use for top-level self-play/bench driving; the
# jitted `search` remains for composition inside larger programs.

import functools as _functools


def make_host_search(env, eval_fn: EvalFn, config: MCTSConfig,
                     with_params: bool = False):
    """Build a host-driven search callable — ``(root_states, rng)`` or, with
    ``with_params``, ``(params, root_states, rng)`` (params threaded as a
    jit argument so weight updates don't retrace) -> SearchOutput.
    Compiles three executables (init / sim-step with donated tree /
    finalize) and drives the sim loop from Python."""

    if with_params:
        param_eval = eval_fn
    else:
        def param_eval(_, obs, to_play):
            return eval_fn(obs, to_play)

    @jax.jit
    def init_fn(params, root_states, rng):
        noise_rng, _ = jax.random.split(rng)
        obs = jax.vmap(env.observation)(root_states)
        logits, value = param_eval(
            params, obs, jax.vmap(env.to_play)(root_states)
        )
        return instantiate_tree(env, root_states, logits, value, config,
                                noise_rng)

    W = config.wave_size

    @_functools.partial(jax.jit, donate_argnums=(1,))
    def sim_fn(params, tree, slot):
        if W > 1:
            return _simulate_wave(
                env, lambda o, tp: param_eval(params, o, tp), tree, slot,
                config,
            )
        return _simulate_once(
            env, lambda o, tp: param_eval(params, o, tp), tree, slot, config
        )

    @jax.jit
    def finalize_fn(tree):
        counts = tree.root_evisits
        weights = counts / jnp.maximum(counts.sum(-1, keepdims=True), 1)
        root_value = tree.value_sum[:, 0] / jnp.maximum(tree.visits[:, 0], 1)
        return counts, weights.astype(jnp.float32), root_value

    waves = config.waves

    def run_with_params(params, root_states, rng) -> SearchOutput:
        tree = init_fn(params, root_states, rng)
        for t in range(waves):
            tree = sim_fn(params, tree, 1 + t * W)
        counts, weights, root_value = finalize_fn(tree)
        return SearchOutput(
            visit_counts=counts,
            action_weights=weights,
            root_value=root_value,
            tree=tree,
        )

    if with_params:
        return run_with_params
    return lambda root_states, rng: run_with_params(None, root_states, rng)


class HostReuseSearch:
    """Host-driven search with tree reuse between moves (the reference's
    ``updateWithMove`` + every-2-moves re-noise loop,
    self_play_manager.cpp:205-211).

    Call ``run(params, root_states, rng)`` each move; the previous move's
    tree is re-rooted on the action reported via ``notify_action``.  With
    ``config.reuse_budget == "topup"`` each move runs only enough fresh
    simulations that every lane's root reaches ``num_simulations`` visits
    (one small host fetch per move); ``"fixed"`` always runs the full count
    (reference behavior — reuse buys quality, not time).  Call ``reset()``
    whenever the caller swaps in unrelated root states (new games)."""

    def __init__(self, env, eval_fn: EvalFn, config: MCTSConfig,
                 with_params: bool = False):
        if not config.tree_reuse:
            raise ValueError("HostReuseSearch needs config.tree_reuse=True")
        self.config = config
        self._with_params = with_params

        if with_params:
            param_eval = eval_fn
        else:
            def param_eval(_, obs, to_play):
                return eval_fn(obs, to_play)

        @jax.jit
        def init_fn(params, root_states, rng):
            noise_rng, _ = jax.random.split(rng)
            obs = jax.vmap(env.observation)(root_states)
            logits, value = param_eval(
                params, obs, jax.vmap(env.to_play)(root_states)
            )
            return instantiate_tree(env, root_states, logits, value, config,
                                    noise_rng)

        @_functools.partial(jax.jit, donate_argnums=(1,))
        def reroot_fn(params, tree, action, root_states, rng, noise_on):
            obs = jax.vmap(env.observation)(root_states)
            logits, value = param_eval(
                params, obs, jax.vmap(env.to_play)(root_states)
            )
            return reroot(env, tree, action, root_states, logits, value,
                          config, rng=rng, noise_on=noise_on)

        @_functools.partial(jax.jit, donate_argnums=(1,))
        def sim_fn(params, tree, slot):
            if config.wave_size > 1:
                return _simulate_wave(
                    env, lambda o, tp: param_eval(params, o, tp), tree,
                    slot, config,
                )
            return _simulate_once(
                env, lambda o, tp: param_eval(params, o, tp), tree, slot,
                config,
            )

        @jax.jit
        def finalize_fn(tree):
            counts = tree.root_evisits
            weights = counts / jnp.maximum(counts.sum(-1, keepdims=True), 1)
            root_value = (
                tree.value_sum[:, 0] / jnp.maximum(tree.visits[:, 0], 1)
            )
            return counts, weights.astype(jnp.float32), root_value

        @jax.jit
        def min_root_visits(tree):
            return jnp.min(tree.visits[:, 0])

        self._init_fn = init_fn
        self._reroot_fn = reroot_fn
        self._sim_fn = sim_fn
        self._finalize_fn = finalize_fn
        self._min_root_visits = min_root_visits
        self.reset()

    def reset(self):
        self._tree = None
        self._last_action = None
        self._advanced = False
        self._move_idx = 0
        self.last_fresh_sims = 0  # diagnostics: sims run on the last move

    def notify_action(self, action: jax.Array):
        """Record the action about to be played (i32 [B]) so the next call
        re-roots on it."""
        self._last_action = action

    def advance(self, params, action, new_states, rng, noise_on=False):
        """Re-root the kept tree through one played action WITHOUT
        searching — used by arenas to carry the tree through the
        OPPONENT's move (the reference applies updateWithMove on every
        move of the game, own and opponent alike,
        self_play_manager.cpp:205-211).  No-op before the first search."""
        if self._tree is None:
            return
        self._tree = self._reroot_fn(
            params, self._tree, jnp.asarray(action, jnp.int32), new_states,
            rng, jnp.asarray(noise_on, bool),
        )
        self._last_action = None
        self._advanced = True
        self._move_idx += 1

    def run(self, params, root_states, rng) -> SearchOutput:
        cfg = self.config
        sims = cfg.num_simulations
        if self._tree is None:
            tree = self._init_fn(params, root_states, rng)
            start, n_new = 1, sims
        elif self._last_action is None and not self._advanced:
            # Unrelated root states without notify/advance: fresh tree.
            tree = self._init_fn(params, root_states, rng)
            start, n_new = 1, sims
        else:
            if self._last_action is not None:
                noise_on = jnp.asarray(
                    self._move_idx % max(1, cfg.renoise_every) == 0, bool
                )
                tree = self._reroot_fn(params, self._tree,
                                       self._last_action, root_states, rng,
                                       noise_on)
            else:
                # Caller already re-rooted through the played moves via
                # ``advance`` (arena path) — the kept tree is rooted at
                # root_states.
                tree = self._tree
            start = min(cfg.reuse_cap, tree.visits.shape[1])
            if cfg.reuse_budget == "topup":
                reused = int(self._min_root_visits(tree))
                n_new = max(0, min(sims, sims - reused + 1))
            else:
                n_new = sims
        W = cfg.wave_size
        n_new = -(-n_new // W) * W  # round up to whole waves
        for t in range(n_new // W):
            tree = self._sim_fn(params, tree, start + t * W)
        counts, weights, root_value = self._finalize_fn(tree)
        self._tree = tree
        self._last_action = None
        self._advanced = False
        self._move_idx += 1
        self.last_fresh_sims = n_new
        return SearchOutput(
            visit_counts=counts,
            action_weights=weights,
            root_value=root_value,
            tree=tree,
        )

    def __call__(self, *args):
        if self._with_params:
            return self.run(*args)
        params, rest = None, args
        return self.run(params, *rest)
