"""int8 inference trunk for the SE-ResNet.

v5e MXU int8 peak is ~2x bf16, and (measured round 2, tools/
profile_int8_conv.py) XLA's NHWC int8 conv actually delivers it: 0.051 ms
vs 0.101 ms bf16 at the bench trunk shape.  This module turns a trained
``norm="batch"`` AZResNet into a quantized inference function:

  * BN is folded into the convs (models/resnet.fold_batch_norm),
  * trunk 3x3 conv weights are quantized per-output-channel to int8,
  * activations are quantized per-layer with symmetric scales calibrated
    from sample observations (post-ReLU maxima),
  * each conv runs int8 x int8 -> int32 on the MXU, with a fused f32
    requant epilogue (scale, bias, ReLU, round),
  * SE gating, residual adds and both heads stay bf16 (they are ~6% of
    the FLOPs).

The reference ships FP16 inference (torch_neural_network.cpp:267-269); this
is the TPU-native equivalent pushed to the int8 MXU path.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


# --------------------------------------------------------------------------
# Folded-parameter extraction (plain pytrees; no flax at inference time)

def extract_folded(model, variables) -> Dict[str, Any]:
    """Fold BN and pull the conv/dense weights out of the flax tree into a
    flat dict the executors below consume.  Works for ``norm="batch"``
    (folds first) and ``norm="none"`` (already folded) models."""
    from alphazero_tpu.models.resnet import fold_batch_norm

    cfg = model.cfg
    if cfg.norm == "batch":
        _, variables = fold_batch_norm(model, variables)
    elif cfg.norm != "none":
        raise ValueError("int8 path needs a batch- or none-norm model")
    p = variables["params"]

    def conv(d):
        return {"kernel": jnp.asarray(d["kernel"], jnp.float32),
                "bias": jnp.asarray(d["bias"], jnp.float32)}

    def dense(d):
        return {"kernel": jnp.asarray(d["kernel"], jnp.float32),
                "bias": jnp.asarray(d["bias"], jnp.float32)}

    blocks = []
    for i in range(cfg.num_blocks):
        b = p[f"ResBlock_{i}"]
        se = b["SEBlock_0"]
        blocks.append({
            "conv1": conv(b["Conv_0"]),
            "conv2": conv(b["Conv_1"]),
            "se1": dense(se["Dense_0"]),
            "se2": dense(se["Dense_1"]),
        })
    return {
        "stem": conv(p["Conv_0"]),
        "blocks": blocks,
        "policy_conv": conv(p["Conv_1"]),
        "policy_dense": dense(p["Dense_0"]),
        "value_conv": conv(p["Conv_2"]),
        "value_dense1": dense(p["Dense_1"]),
        "value_dense2": dense(p["Dense_2"]),
        "num_blocks": cfg.num_blocks,
    }


# --------------------------------------------------------------------------
# bf16 reference executor (also the calibration pass)

def _conv_bf16(x, w):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w["kernel"].astype(jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=_DN,
    )
    return y + w["bias"].astype(jnp.bfloat16)


def _se_gate_from_mean(s, se1, se2):
    s = jax.nn.relu(s @ se1["kernel"].astype(s.dtype)
                    + se1["bias"].astype(s.dtype))
    return jax.nn.sigmoid(s @ se2["kernel"].astype(s.dtype)
                          + se2["bias"].astype(s.dtype))


def _se_gate(h, se1, se2):
    return _se_gate_from_mean(
        jnp.mean(h, axis=(1, 2)), se1, se2
    )[:, None, None, :]


def _heads(fp, x):
    """Policy/value heads in bf16 from trunk features x [B,H,W,C]."""
    p = jax.nn.relu(_conv1x1(x, fp["policy_conv"]))
    logits = (p.reshape(p.shape[0], -1)
              @ fp["policy_dense"]["kernel"].astype(jnp.bfloat16)
              + fp["policy_dense"]["bias"].astype(jnp.bfloat16))
    v = jax.nn.relu(_conv1x1(x, fp["value_conv"]))
    v = v.reshape(v.shape[0], -1)
    v = jax.nn.relu(v @ fp["value_dense1"]["kernel"].astype(jnp.bfloat16)
                    + fp["value_dense1"]["bias"].astype(jnp.bfloat16))
    v = (v @ fp["value_dense2"]["kernel"].astype(jnp.bfloat16)
         + fp["value_dense2"]["bias"].astype(jnp.bfloat16))
    value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)
    return logits.astype(jnp.float32), value


def _conv1x1(x, w):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w["kernel"].astype(jnp.bfloat16),
        (1, 1), "SAME", dimension_numbers=_DN,
    )
    return y + w["bias"].astype(jnp.bfloat16)


def forward_bf16(fp, obs, collect_stats: bool = False,
                 percentile: float = 0.0):
    """Folded bf16 forward (NCHW obs).  With ``collect_stats`` also returns
    the per-quant-point activation maxima used for calibration (or the
    given abs-activation ``percentile`` in (0, 100) — clipping calibration,
    trades outlier range for bulk resolution)."""
    x = jnp.transpose(obs.astype(jnp.bfloat16), (0, 2, 3, 1))
    stats: List[jax.Array] = []

    def note(t):
        if collect_stats:
            a = jnp.abs(t.astype(jnp.float32))
            stats.append(jnp.percentile(a, percentile)
                         if percentile else jnp.max(a))

    note(x)
    a = jax.nn.relu(_conv_bf16(x, fp["stem"]))
    note(a)
    for blk in fp["blocks"]:
        h = jax.nn.relu(_conv_bf16(a, blk["conv1"]))
        note(h)
        h2 = _conv_bf16(h, blk["conv2"])
        a = jax.nn.relu(a + h2 * _se_gate(h2, blk["se1"], blk["se2"]))
        note(a)
    logits, value = _heads(fp, a)
    if collect_stats:
        return (logits, value), jnp.stack(stats)
    return logits, value


def calibrate(fp, obs_batches, percentile: float = 0.0) -> jax.Array:
    """Max-abs activation scales at every quant point over sample
    observations (the standard static-range calibration), or — with
    ``percentile`` in (0, 100) — abs-percentile scales (max across
    batches of the per-batch percentile)."""
    run = jax.jit(lambda o: forward_bf16(fp, o, collect_stats=True,
                                         percentile=percentile)[1])
    mx = None
    for obs in obs_batches:
        s = run(obs)
        mx = s if mx is None else jnp.maximum(mx, s)
    return jnp.maximum(mx, 1e-6)


# --------------------------------------------------------------------------
# int8 executor

def quantize(fp, act_scales) -> Dict[str, Any]:
    """Build int8 weights + fused requant multipliers.

    ``act_scales``: [1 + 1 + 2*num_blocks] calibration maxima in graph
    order (input, stem out, then per block: mid, out)."""
    qp = {"blocks": []}
    scales = [jnp.asarray(s, jnp.float32) for s in act_scales]
    idx = 0

    def qconv(w, s_in):
        k = w["kernel"]
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8)  # [O]
        wq = jnp.clip(jnp.round(k / sw * 127.0), -127, 127).astype(jnp.int8)
        # x_q = x/s_in*127, w_q = w/sw*127  =>  conv_i32 * m == conv(x, w)
        m = (s_in * sw) / (127.0 * 127.0)
        return wq, m

    s_in = scales[idx]; idx += 1
    wq, m = qconv(fp["stem"], s_in)
    s_stem = scales[idx]; idx += 1
    qp["in_scale"] = s_in
    qp["stem"] = {"wq": wq, "m": m, "bias": fp["stem"]["bias"],
                  "out_scale": s_stem}
    s_prev = s_stem
    for blk in fp["blocks"]:
        wq1, m1 = qconv(blk["conv1"], s_prev)
        s_mid = scales[idx]; idx += 1
        wq2, m2 = qconv(blk["conv2"], s_mid)
        s_out = scales[idx]; idx += 1
        qp["blocks"].append({
            "wq1": wq1, "m1": m1, "b1": blk["conv1"]["bias"],
            "mid_scale": s_mid,
            "wq2": wq2, "m2": m2, "b2": blk["conv2"]["bias"],
            "out_scale": s_out,
            "se1": blk["se1"], "se2": blk["se2"],
        })
        s_prev = s_out
    for k in ("policy_conv", "policy_dense", "value_conv", "value_dense1",
              "value_dense2"):
        qp[k] = fp[k]

    # int8 head convs (heads="int8"): 1x1 convs on the final trunk
    # activation quantized like the trunk (input scale = last block out).
    def q1x1(w, s_in):
        k = w["kernel"]
        sw = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8)
        wq = jnp.clip(jnp.round(k / sw * 127.0), -127, 127).astype(jnp.int8)
        m = (s_in * sw) / (127.0 * 127.0)
        return {"wq": wq, "m": m, "bias": w["bias"]}

    qp["policy_conv_q"] = q1x1(fp["policy_conv"], s_prev)
    qp["value_conv_q"] = q1x1(fp["value_conv"], s_prev)
    return qp


def _conv_i8(xq, wq):
    return jax.lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def _tap_sums(xq):
    """[B,9,C] i32 tap sums of an s8 NHWC input: ``T[ky*3+kx]`` is the sum
    of the input cells a SAME-padded 3x3 conv tap ``(ky, kx)`` touches over
    ALL output positions.  Output position p reads input row ``p + ky - 1``,
    so tap (ky, kx) covers every cell except one border row/column —
    inclusion-exclusion over (total, border rows/cols, corners).

    NOTE a round-4 rewrite as two fused reduce passes (per-row/per-column
    i32 partial sums instead of astype(int32) + five reductions) measured
    FASTER standalone (tools/profile_eval_r4.py: full eval 552->505
    us/chunk) but 3.4% SLOWER end-to-end in the production wave step
    (809.8 -> 782 moves/s, adjacent quick benches) — inside the larger
    search graph XLA fuses the astype form better.  Kept as measured."""
    x = xq.astype(jnp.int32)
    total = x.sum((1, 2))  # [B,C]
    r0, rl = x[:, 0].sum(1), x[:, -1].sum(1)
    c0, cl = x[:, :, 0].sum(1), x[:, :, -1].sum(1)
    zero = jnp.zeros_like(total)
    row_sub = (rl, zero, r0)  # ky=0 never reads the last input row, etc.
    col_sub = (cl, zero, c0)
    corner = {(0, 0): x[:, -1, -1], (0, 2): x[:, -1, 0],
              (2, 0): x[:, 0, -1], (2, 2): x[:, 0, 0]}
    taps = [total - row_sub[ky] - col_sub[kx] + corner.get((ky, kx), zero)
            for ky in range(3) for kx in range(3)]
    return jnp.stack(taps, axis=1)


def _se_gate_precomputed(hq, blk):
    """SE gate [B,1,1,O] computed from the QUANTIZED conv2 input.

    ``mean_hw(conv2(h))`` is a linear functional of the input: with SAME
    padding it equals ``sum_taps K[tap]^T . tap_sum(h) / HW`` — nine tiny
    [C]x[C,O] contractions on i32 tap sums instead of a reduction over the
    materialized [B,H,W,O] conv output.  This breaks the data dependency
    gate <- conv2-output, so XLA fuses conv2's requant + SE scale +
    residual + re-quant into ONE epilogue pass (the separate bf16
    materialize-and-reduce was 13% of self-play device time; BENCHLOG
    round 2).  Also slightly *more* exact than the bf16 mean it replaces
    (i32 tap sums are exact; the f32 contraction rounds once)."""
    hw = hq.shape[1] * hq.shape[2]
    taps = _tap_sums(hq).astype(jnp.float32)  # [B,9,C]
    wq2 = blk["wq2"].astype(jnp.float32).reshape(9, *blk["wq2"].shape[2:])
    s = jnp.einsum("btc,tco->bo", taps, wq2,
                   preferred_element_type=jnp.float32)
    mean = (s * blk["m2"]) / hw + blk["b2"]  # == mean_hw(h2), [B,O]
    g = _se_gate_from_mean(mean.astype(jnp.bfloat16), blk["se1"], blk["se2"])
    return g[:, None, None, :]


def _quant_act(a, scale):
    """bf16 activation -> int8 with symmetric scale."""
    q = jnp.round(a.astype(jnp.float32) * (127.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _heads_int8(qp, aq):
    """Policy/value heads from the QUANTIZED trunk activation: the 1x1
    head convs run s8 x s8 -> s32 with fused requant, so the final bf16
    trunk copy never materializes (heads="int8"; the dense layers stay
    bf16 — they are tiny)."""
    pq = qp["policy_conv_q"]
    p = jax.nn.relu(
        (_conv_i8(aq, pq["wq"]).astype(jnp.float32) * pq["m"] + pq["bias"])
    ).astype(jnp.bfloat16)
    logits = (p.reshape(p.shape[0], -1)
              @ qp["policy_dense"]["kernel"].astype(jnp.bfloat16)
              + qp["policy_dense"]["bias"].astype(jnp.bfloat16))
    vq = qp["value_conv_q"]
    v = jax.nn.relu(
        (_conv_i8(aq, vq["wq"]).astype(jnp.float32) * vq["m"] + vq["bias"])
    ).astype(jnp.bfloat16)
    v = v.reshape(v.shape[0], -1)
    v = jax.nn.relu(v @ qp["value_dense1"]["kernel"].astype(jnp.bfloat16)
                    + qp["value_dense1"]["bias"].astype(jnp.bfloat16))
    v = (v @ qp["value_dense2"]["kernel"].astype(jnp.bfloat16)
         + qp["value_dense2"]["bias"].astype(jnp.bfloat16))
    value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)
    return logits.astype(jnp.float32), value


def forward_int8(qp, obs, residual: str = "bf16", heads: str = "bf16"):
    """Quantized forward (NCHW obs) -> (logits f32, value f32)."""
    x = jnp.transpose(obs.astype(jnp.float32), (0, 2, 3, 1))
    xq = _quant_act(x, qp["in_scale"])
    return forward_int8_from_q(qp, xq, residual, heads)


def forward_int8_from_q(qp, xq, residual: str = "bf16",
                        heads: str = "bf16"):
    """Quantized forward from pre-quantized NHWC s8 input (the chunked
    eval path quantizes ONCE over the whole leaf batch before the chunk
    loop, so the f32 obs isn't re-read/transposed per chunk).

    The ``optimization_barrier`` on each quantized activation pins ONE s8
    materialization point: without it, XLA duplicates the requant into each
    consumer (conv2 + the SE tap sums both read ``hq``) and keeps the raw
    s32 conv accumulator [chunk,15,15,64] alive as the shared value — a
    29.5 MB/chunk write measured at 36 us/conv in the round-3 trace (the
    conv fusions emitted (s32, s8) tuples).  With the barrier the s32
    stays inside the conv's fused epilogue.

    ``residual``: "bf16" keeps a bf16 master copy of the trunk stream for
    the residual adds (exact); "int8" carries ONLY the s8 activation
    between blocks and dequantizes it inside the next conv2 epilogue —
    the trace showed the conv chain is HBM-bandwidth-bound, and the bf16
    master is ~half the inter-block traffic."""
    st = qp["stem"]
    y = _conv_i8(xq, st["wq"]).astype(jnp.float32) * st["m"] + st["bias"]
    a = jax.nn.relu(y).astype(jnp.bfloat16)  # stem out
    if residual == "int8":
        aq = jax.lax.optimization_barrier(_quant_act(a, st["out_scale"]))
        s_prev = st["out_scale"]
        for blk in qp["blocks"]:
            h = (_conv_i8(aq, blk["wq1"]).astype(jnp.float32) * blk["m1"]
                 + blk["b1"])
            hq = _quant_act(jax.nn.relu(h), blk["mid_scale"])
            hq = jax.lax.optimization_barrier(hq)
            g = _se_gate_precomputed(hq, blk)
            h2 = (_conv_i8(hq, blk["wq2"]).astype(jnp.float32) * blk["m2"]
                  + blk["b2"]).astype(jnp.bfloat16)
            a_deq = aq.astype(jnp.bfloat16) * (
                jnp.asarray(s_prev, jnp.float32) / 127.0
            ).astype(jnp.bfloat16)
            a = jax.nn.relu(a_deq + h2 * g)
            aq = jax.lax.optimization_barrier(
                _quant_act(a, blk["out_scale"])
            )
            s_prev = blk["out_scale"]
        if heads == "int8":
            return _heads_int8(qp, aq)
        return _heads(qp, a)

    a, aq = jax.lax.optimization_barrier(
        (a, _quant_act(a, st["out_scale"]))
    )
    for blk in qp["blocks"]:
        h = (_conv_i8(aq, blk["wq1"]).astype(jnp.float32) * blk["m1"]
             + blk["b1"])
        hq = _quant_act(jax.nn.relu(h), blk["mid_scale"])
        hq = jax.lax.optimization_barrier(hq)
        # Gate from tap sums of hq — available BEFORE conv2 runs, so the
        # requant/SE/residual/quant below fuse into conv2's epilogue.
        g = _se_gate_precomputed(hq, blk)
        h2 = (_conv_i8(hq, blk["wq2"]).astype(jnp.float32) * blk["m2"]
              + blk["b2"]).astype(jnp.bfloat16)
        a = jax.nn.relu(a + h2 * g)
        a, aq = jax.lax.optimization_barrier(
            (a, _quant_act(a, blk["out_scale"]))
        )

    if heads == "int8":
        return _heads_int8(qp, aq)
    return _heads(qp, a)


# --------------------------------------------------------------------------
# Calibration-observation generation

def make_rollout_calib_fn(env, eval_fn, n: int = 256, plies: int = 12,
                          every: int = 4, with_params: bool = False):
    """Build ``calib(params, rng) -> obs`` producing MID-GAME observations
    for activation-range calibration: ``n`` games advanced ``plies``
    policy-sampled moves with the net being calibrated, observations
    snapshotted at the start and every ``every`` plies.

    This is the standard calibration helper (VERDICT r4 weak #3: the
    production pipeline calibrated from 8 empty-board observations while
    the +41 Elo evidence used mid-game rollouts — a trained net needs real
    activation ranges, not empty boards).  Fully jittable: the rollout is
    a ``lax.scan``, so the pipeline re-calibrates every weight refresh
    inside one executable.  ``eval_fn(obs, to_play)`` (or
    ``eval_fn(params, obs, to_play)`` with ``with_params``) supplies the
    policy; pass the raw/folded forward of the same model."""
    if with_params:
        param_eval = eval_fn
    else:
        def param_eval(_, obs, to_play):
            return eval_fn(obs, to_play)

    def calib(params, rng):
        states = jax.vmap(lambda _: env.init())(jnp.arange(n))
        first = jax.vmap(env.observation)(states)

        def body(carry, r):
            st = carry
            obs = jax.vmap(env.observation)(st)
            logits, _ = param_eval(params, obs,
                                   jax.vmap(env.to_play)(st))
            legal = jax.vmap(env.legal_mask)(st)
            acts = jax.random.categorical(
                r, jnp.where(legal, logits.astype(jnp.float32), -1e9)
            )
            st = jax.vmap(env.step)(st, acts.astype(jnp.int32))
            return st, jax.vmap(env.observation)(st)

        _, obs_seq = jax.lax.scan(body, states,
                                  jax.random.split(rng, plies))
        picks = obs_seq[every - 1::every]  # [plies//every, n, ...]
        return jnp.concatenate([first[None], picks]).reshape(
            (-1,) + first.shape[1:]
        )

    return calib


# --------------------------------------------------------------------------
# public entry

def build_quantized_params(model, variables, calib_obs=None,
                           calib_percentile: float = 0.0):
    """BN-fold, calibrate and quantize ``model`` -> the flat ``qp`` pytree
    the int8 executors consume.  ``calib_percentile`` in (0, 100) switches
    from max-abs to clipping (percentile) calibration."""
    fp = extract_folded(model, variables)
    if calib_obs is None:
        obs_shape = _infer_obs_shape(model, variables)
        calib_obs = [jnp.zeros((8,) + obs_shape, jnp.float32)]
    elif not isinstance(calib_obs, (list, tuple)):
        calib_obs = [calib_obs]
    scales = calibrate(fp, calib_obs, percentile=calib_percentile)
    return quantize(fp, scales)


def _chunked_int8_eval(qp, obs, chunk, chunk_mode, residual="bf16",
                       heads="bf16"):
    B = obs.shape[0]
    if chunk and B > chunk and B % chunk == 0:
        x = jnp.transpose(obs.astype(jnp.float32), (0, 2, 3, 1))
        xq = _quant_act(x, qp["in_scale"])
        if chunk_mode == "map":
            chunks = xq.reshape((B // chunk, chunk) + xq.shape[1:])
            logits, value = jax.lax.map(
                lambda q: forward_int8_from_q(qp, q, residual, heads),
                chunks
            )
            return (logits.reshape((B,) + logits.shape[2:]),
                    value.reshape((B,)))
        outs = [
            forward_int8_from_q(
                qp, jax.lax.dynamic_slice_in_dim(xq, i * chunk, chunk, 0),
                residual, heads,
            )
            for i in range(B // chunk)
        ]
        return (jnp.concatenate([a for a, _ in outs]),
                jnp.concatenate([b for _, b in outs]))
    return forward_int8(qp, obs, residual, heads)


def make_int8_eval_params(model, variables, calib_obs=None, chunk: int = 512,
                          chunk_mode: str = "unroll",
                          residual: str = "bf16", heads: str = "bf16",
                          calib_percentile: float = 0.0):
    """Params-style int8 evaluator: returns ``(eval_fn, qp)`` where
    ``eval_fn(qp, obs, to_play)`` takes the quantized parameters as a jit
    ARGUMENT (use with ``make_host_actor(..., with_params=True)``).

    Closure-constant qp (make_int8_eval_fn) bakes every scale/weight into
    the executable, and the round-3 device trace showed XLA rematerializes
    them as ~500 tiny constant fusions per wave across the unrolled chunks
    (12% of device time); as runtime arguments they are staged once in HBM
    and simply read.  Also what weight refreshes want: a new qp needs no
    retrace."""
    qp = build_quantized_params(model, variables, calib_obs,
                                calib_percentile)

    def eval_fn(params, obs, to_play=None):
        return _chunked_int8_eval(params, obs, chunk, chunk_mode, residual,
                                  heads)

    return eval_fn, qp


def make_int8_eval_fn(model, variables, calib_obs=None, chunk: int = 512,
                      chunk_mode: str = "unroll", residual: str = "bf16",
                      heads: str = "bf16", calib_percentile: float = 0.0):
    """BN-fold, calibrate and quantize ``model`` into an int8 EvalFn.

    ``calib_obs``: observation array(s) for activation-range calibration;
    defaults to zeros (exact for freshly initialized nets; pass real
    self-play observations for trained nets).

    ``chunk``: batches larger than this run as sequential lax.map chunks.
    Measured on v5e (tools/profile_int8_fwd.py): per-sample cost degrades
    super-linearly past ~1024 — the SE/residual/requant elementwise chain
    and the heads fall out of the conv fusions (B=4096: SE 0->2.2 ms,
    heads 0.12->0.84 ms) while the pure conv chain stays linear.  The
    full-bench chunk sweep at the 15x15 trunk shape measured (moves/s):
    512: 849, 1024: 821, 256: 826, 128: 820, 2048: 32 — 512 is the
    optimum and the default.

    Closure-style int8 evaluator (qp baked as jit constants).
    The chunk loop is PYTHON-UNROLLED inside the caller's jit by default,
    not lax.map: the map while-loop re-stages the requant constants and
    serializes loop bookkeeping every iteration — measured 2.06 us/obs
    (map512) vs 1.34 us/obs (unroll512) at the 16384-leaf wave shape
    (tools/profile_eval_r3.py, round 3).  Prefer make_int8_eval_params
    for hot loops (constants -> arguments)."""
    qp = build_quantized_params(model, variables, calib_obs,
                                calib_percentile)

    def eval_fn(obs, to_play=None):
        return _chunked_int8_eval(qp, obs, chunk, chunk_mode, residual,
                                  heads)

    return eval_fn


def _infer_obs_shape(model, variables) -> Tuple[int, int, int]:
    k = variables["params"]["Conv_0"]["kernel"]  # [3,3,C_in,C]
    c_in = k.shape[2]
    # Board size is not recorded in params; assume square obs via the
    # policy dense fan-in: H*W*policy_channels.
    pd = variables["params"]["Dense_0"]["kernel"].shape[0]
    hw = pd // model.cfg.policy_channels
    side = int(round(hw ** 0.5))
    return (c_in, side, side)
