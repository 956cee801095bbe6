"""Fused Pallas TPU kernel for parallel co-attention.

Fuses the reference's whole ParallelCoAttention block
(/root/reference/model.py:356-397) — affinity matmul ``C = tanh(Q V^T)``, the
two attention maps ``H_v``/``H_q``, both softmaxes, and the attention-weighted
pooling, for all three question-hierarchy levels — into a single VMEM-resident
kernel (the north-star fusion target, SURVEY.md M8/N1).

Design:
- grid over batch blocks; per step, the sample block's ``V`` [BB, S, D],
  stacked levels ``Q`` [BB, 3, L, D], and the (shared) weights live in VMEM;
- ``W_v V`` is computed once per block and reused by all 3 levels (the
  reference recomputes it per level);
- matmuls run on the MXU with fp32 accumulation; softmaxes are fp32 with
  max-subtraction; logical shapes (S=196, L~23) are exact, so Mosaic's
  internal lane padding never leaks into the softmax or the pooling;
- the backward pass recomputes through the numerically-identical XLA
  expression (``coattention_xla``) via ``jax.custom_vjp`` — forward-time
  fusion where it matters, autodiff-exact gradients, no residual storage.

Numerics match ``vqa_tpu.models.coattention.coattention_xla`` (the oracle in
tests) to fp32 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LEVELS = 3


def _kernel(v_ref, q_ref, wv_ref, bv_ref, wq_ref, bq_ref,
            sv_ref, cv_ref, sq_ref, cq_ref,
            out_v_ref, out_q_ref):
    """One batch block: co-attention for all levels.

    Shapes (block): v_ref [BB, S, D]; q_ref [BB, 3, L, D];
    weights: wv/wq [D, D], bv/bq [1, D], sv/sq [D, 1], cv/cq [1, 1];
    outputs: out_v/out_q [BB, 3, D].
    """
    bb, s, d = v_ref.shape
    seq_len = q_ref.shape[2]

    w_v = wv_ref[:]
    w_q = wq_ref[:]
    b_v = bv_ref[:]          # [1, D]
    b_q = bq_ref[:]
    score_v = sv_ref[:]      # [D, 1]
    score_q = sq_ref[:]
    # score biases c_v/c_q are NOT loaded: softmax is shift-invariant, so the
    # scalar bias on the attention logits cancels exactly (and Mosaic cannot
    # broadcast [1,1] -> [BB,S] anyway). The params still exist for
    # checkpoint parity; the XLA path applies them with identical results.
    del cv_ref, cq_ref

    v_all = v_ref[:]                                          # [BB, S, D]
    # W_v V once per block, shared across levels
    vw_all = jax.lax.dot_general(
        v_all.reshape(bb * s, d), w_v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_v.astype(jnp.float32)
    vw_all = vw_all.reshape(bb, s, d)                         # f32 [BB, S, D]

    for level in range(NUM_LEVELS):
        q_lvl = q_ref[:, level]                               # [BB, L, D]
        qw = jax.lax.dot_general(
            q_lvl.reshape(bb * seq_len, d), w_q,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_q.astype(jnp.float32)
        qw = qw.reshape(bb, seq_len, d)                       # f32 [BB, L, D]

        # batched per-sample products (batch dim BB)
        c_aff = jnp.tanh(jax.lax.dot_general(
            q_lvl, v_all,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))              # [BB, L, S]

        h_v = jnp.tanh(vw_all + jax.lax.dot_general(
            c_aff, qw,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))              # [BB, S, D]
        h_q = jnp.tanh(qw + jax.lax.dot_general(
            c_aff, vw_all,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))              # [BB, L, D]

        s_v = jax.lax.dot_general(
            h_v, score_v.astype(jnp.float32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]       # [BB, S]
        s_q = jax.lax.dot_general(
            h_q, score_q.astype(jnp.float32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[..., 0]       # [BB, L]

        a_v = jax.nn.softmax(s_v, axis=-1)                    # [BB, S]
        a_q = jax.nn.softmax(s_q, axis=-1)                    # [BB, L]

        # pooled features: [BB, 1, S] x [BB, S, D] -> [BB, D]
        pooled_v = jax.lax.dot_general(
            a_v[:, None, :], v_all.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]
        pooled_q = jax.lax.dot_general(
            a_q[:, None, :], q_lvl.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)[:, 0, :]

        out_v_ref[:, level, :] = pooled_v.astype(out_v_ref.dtype)
        out_q_ref[:, level, :] = pooled_q.astype(out_q_ref.dtype)


def _use_interpret() -> bool:
    """Interpret mode off-TPU (tests on the simulated CPU mesh)."""
    return jax.devices()[0].platform not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("block_b",))
def _coattention_pallas(params, x_img, q_stacked, block_b: int = 4):
    # block_b=4 keeps the fp32 working set (V, W_v V, H_v at [BB,196,512] each,
    # plus double-buffered input windows) under the 16MB VMEM budget
    W_v, b_v, W_q, b_q, w_v, c_v, w_q, c_q = params
    b, s, d = x_img.shape
    seq_len = q_stacked.shape[2]
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    grid = (b // bb,)
    dtype = x_img.dtype

    out_shape = (
        jax.ShapeDtypeStruct((b, NUM_LEVELS, d), dtype),
        jax.ShapeDtypeStruct((b, NUM_LEVELS, d), dtype),
    )
    in_specs = [
        pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, NUM_LEVELS, seq_len, d), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((bb, NUM_LEVELS, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, NUM_LEVELS, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    flops_per_block = 2 * bb * d * (s * d + NUM_LEVELS * (
        seq_len * d + 3 * seq_len * s + s + seq_len))
    out_v, out_q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops_per_block * grid[0],
            bytes_accessed=(b * s * d + b * NUM_LEVELS * seq_len * d) * 2,
            transcendentals=b * NUM_LEVELS * (seq_len * s + s * d + seq_len * d)),
        interpret=_use_interpret(),
    )(x_img, q_stacked,
      W_v, b_v.reshape(1, d), W_q, b_q.reshape(1, d),
      w_v, c_v.reshape(1, 1), w_q, c_q.reshape(1, 1))
    return out_v, out_q


def _bwd_level_kernel(v_ref, q_ref, wv_ref, bv_ref, wq_ref, bq_ref,
                      sv_ref, sq_ref, gv_ref, gq_ref,
                      dvp_ref, dq_ref, dvw_ref, dwq_ref, dbq_ref,
                      dsv_ref, dsq_ref):
    """Analytic backward for one batch block of ONE hierarchy level.

    Derivation (indices s=spatial, l=seq, d=hidden):
      Hv = tanh(VW + C^T QW), Hq = tanh(QW + C VW), C = tanh(Q V^T),
      av = softmax(Hv w_v), aq = softmax(Hq w_q), v = av^T V, q = aq^T Q.
    Emits the level's dQ, the partial dV (pooling + affinity terms), and the
    level's dVW; the *shared* VW = V W_v + b_v backward (dV += dVW W_v^T,
    dW_v, db_v) runs once in XLA over the summed dVW — splitting per level
    keeps the Mosaic kernel small enough to compile (the 3-level-unrolled
    variant OOM-killed the compiler). The score biases c_v/c_q get exactly
    zero gradient (softmax shift invariance), so they are not inputs.
    Parameter-grad outputs accumulate across sequential grid steps into
    replicated blocks.
    """
    bb, s, d = v_ref.shape
    seq_len = q_ref.shape[1]
    f32 = jnp.float32

    w_v = wv_ref[:]
    w_q = wq_ref[:]
    b_v = bv_ref[:].astype(f32)
    b_q = bq_ref[:].astype(f32)
    score_v = sv_ref[:].astype(f32)                           # [D, 1]
    score_q = sq_ref[:].astype(f32)

    @pl.when(pl.program_id(0) == 0)
    def _init_accumulators():
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dsv_ref[:] = jnp.zeros_like(dsv_ref)
        dsq_ref[:] = jnp.zeros_like(dsq_ref)

    def bdot(a, bm, dims):
        return jax.lax.dot_general(a, bm, dimension_numbers=(dims, ((0,), (0,))),
                                   preferred_element_type=f32)

    v_all = v_ref[:].astype(f32)                              # [BB, S, D]
    vw = (jax.lax.dot_general(
        v_all.reshape(bb * s, d), w_v.astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b_v).reshape(bb, s, d)  # [BB, S, D]

    q_lvl = q_ref[:].astype(f32)                              # [BB, L, D]
    qw = (jax.lax.dot_general(
        q_lvl.reshape(bb * seq_len, d), w_q.astype(f32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + b_q).reshape(bb, seq_len, d)
    c_aff = jnp.tanh(bdot(q_lvl, v_all, (((2,), (2,)))))      # [BB, L, S]
    h_v = jnp.tanh(vw + bdot(c_aff, qw, (((1,), (1,)))))      # [BB, S, D]
    h_q = jnp.tanh(qw + bdot(c_aff, vw, (((2,), (1,)))))      # [BB, L, D]
    s_v = jax.lax.dot_general(h_v, score_v,
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=f32)[..., 0]
    s_q = jax.lax.dot_general(h_q, score_q,
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=f32)[..., 0]
    a_v = jax.nn.softmax(s_v, axis=-1)                        # [BB, S]
    a_q = jax.nn.softmax(s_q, axis=-1)                        # [BB, L]

    gv = gv_ref[:].reshape(bb, d).astype(f32)                 # [BB, 1, D] in
    gq = gq_ref[:].reshape(bb, d).astype(f32)

    # pooled-feature backward (elementwise+reduce: Mosaic rejects dots whose
    # LHS has no non-contracting dims)
    dav = jnp.sum(gv[:, None, :] * v_all, axis=-1)            # [BB, S]
    daq = jnp.sum(gq[:, None, :] * q_lvl, axis=-1)            # [BB, L]
    dV_lvl = a_v[:, :, None] * gv[:, None, :]                 # [BB, S, D]
    dQ_lvl = a_q[:, :, None] * gq[:, None, :]                 # [BB, L, D]

    # softmax backward
    dsv = a_v * (dav - jnp.sum(a_v * dav, axis=-1, keepdims=True))
    dsq = a_q * (daq - jnp.sum(a_q * daq, axis=-1, keepdims=True))

    # score-projection backward (reshape, not integer-index: Mosaic's gather
    # lowering rejects the squeeze-by-index pattern)
    dHv = dsv[:, :, None] * score_v.reshape(1, 1, d)          # [BB, S, D]
    dHq = dsq[:, :, None] * score_q.reshape(1, 1, d)
    dsv_ref[:] = dsv_ref[:] + jnp.sum(h_v * dsv[:, :, None], axis=(0, 1))[:, None]
    dsq_ref[:] = dsq_ref[:] + jnp.sum(h_q * dsq[:, :, None], axis=(0, 1))[:, None]

    # tanh backward of Hv/Hq
    dAv = dHv * (1.0 - h_v * h_v)                             # [BB, S, D]
    dAq = dHq * (1.0 - h_q * h_q)                             # [BB, L, D]

    # Hv = tanh(VW + C^T QW); Hq = tanh(QW + C VW)
    dVW_lvl = dAv + bdot(c_aff, dAq, (((1,), (1,))))          # [BB, S, D]
    dQW = dAq + bdot(c_aff, dAv, (((2,), (1,))))              # [BB, L, D]
    dC = bdot(dAv, qw, (((2,), (2,)))).transpose(0, 2, 1) \
        + bdot(dAq, vw, (((2,), (2,))))                       # [BB, L, S]

    # C = tanh(Q V^T)
    dA = dC * (1.0 - c_aff * c_aff)
    dQ_lvl = dQ_lvl + bdot(dA, v_all, (((2,), (1,))))         # [BB, L, D]
    dV_lvl = dV_lvl + bdot(dA, q_lvl, (((1,), (1,))))         # [BB, S, D]

    # QW = Q Wq + bq (reshape matmuls over flattened batch*seq)
    dqw2d = dQW.reshape(bb * seq_len, d)
    dQ_lvl = dQ_lvl + jax.lax.dot_general(
        dqw2d, w_q.astype(f32), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32).reshape(bb, seq_len, d)
    dwq_ref[:] = dwq_ref[:] + jax.lax.dot_general(
        q_lvl.reshape(bb * seq_len, d), dqw2d,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32)                           # [in, out]
    dbq_ref[:] = dbq_ref[:] + jnp.sum(dQW, axis=(0, 1))[None, :]

    dq_ref[:] = dQ_lvl.astype(dq_ref.dtype)
    dvp_ref[:] = dV_lvl.astype(dvp_ref.dtype)
    dvw_ref[:] = dVW_lvl.astype(dvw_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b",))
def _coattention_pallas_bwd(params, x_img, q_stacked, gv, gq, block_b: int = 2):
    """Backward: one per-level pallas_call each + XLA tail for shared VW.

    Returns (dparams, dV, dQ_stacked).
    """
    W_v, b_v, W_q, b_q, w_v, c_v, w_q, c_q = params
    b, s, d = x_img.shape
    seq_len = q_stacked.shape[2]
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    grid = (b // bb,)
    dtype = x_img.dtype
    f32 = jnp.float32

    rep = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((b, s, d), f32),                 # dV partial
        jax.ShapeDtypeStruct((b, seq_len, d), dtype),         # dQ level
        jax.ShapeDtypeStruct((b, s, d), f32),                 # dVW level
        jax.ShapeDtypeStruct((d, d), f32),                    # dWq partial
        jax.ShapeDtypeStruct((1, d), f32),                    # dbq partial
        jax.ShapeDtypeStruct((d, 1), f32),                    # dw_v partial
        jax.ShapeDtypeStruct((d, 1), f32),                    # dw_q partial
    )
    in_specs = [
        pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, seq_len, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        rep(d, d), rep(1, d), rep(d, d), rep(1, d), rep(d, 1), rep(d, 1),
        # [B, 1, D] with block (bb, 1, d): the trailing (1, d) dims equal the
        # array dims, satisfying Mosaic's block-tiling rule
        pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, seq_len, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        rep(d, d), rep(1, d), rep(d, 1), rep(d, 1),
    )
    level_call = pl.pallas_call(
        _bwd_level_kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=_use_interpret())

    dV = jnp.zeros((b, s, d), f32)
    dVW = jnp.zeros((b, s, d), f32)
    dWq = jnp.zeros((d, d), f32)
    dbq = jnp.zeros((d,), f32)
    dw_v = jnp.zeros((d, 1), f32)
    dw_q = jnp.zeros((d, 1), f32)
    dQ_levels = []
    for level in range(NUM_LEVELS):
        dvp, dq_lvl, dvw, dwq_p, dbq_p, dwv_s, dwq_s = level_call(
            x_img, q_stacked[:, level],
            W_v, b_v.reshape(1, d), W_q, b_q.reshape(1, d), w_v, w_q,
            gv[:, level][:, None, :], gq[:, level][:, None, :])
        dQ_levels.append(dq_lvl)
        dV = dV + dvp
        dVW = dVW + dvw
        dWq = dWq + dwq_p
        dbq = dbq + dbq_p[0]
        dw_v = dw_v + dwv_s
        dw_q = dw_q + dwq_s

    # shared VW = V W_v + b_v backward over the summed dVW (plain XLA)
    dV = dV + jnp.einsum("bsd,ed->bse", dVW, W_v.astype(f32))
    dWv = jnp.einsum("bse,bsd->ed", x_img.astype(f32), dVW)
    dbv = jnp.sum(dVW, axis=(0, 1))

    dparams = (dWv.astype(W_v.dtype), dbv.astype(b_v.dtype),
               dWq.astype(W_q.dtype), dbq.astype(b_q.dtype),
               dw_v.astype(w_v.dtype), jnp.zeros_like(c_v),
               dw_q.astype(w_q.dtype), jnp.zeros_like(c_q))
    return dparams, dV.astype(dtype), jnp.stack(dQ_levels, axis=1)


def _xla_reference(params, x_img, q_stacked):
    """The autodiff/numerics oracle (same math as coattention_xla)."""
    from ..models.coattention import coattention_xla

    levels = [q_stacked[:, i] for i in range(NUM_LEVELS)]
    img_feats, ques_feats = coattention_xla(params, x_img, levels)
    return jnp.stack(img_feats, axis=1), jnp.stack(ques_feats, axis=1)


@jax.custom_vjp
def _coattention_op(params, x_img, q_stacked):
    return _coattention_pallas(params, x_img, q_stacked)


def _fwd(params, x_img, q_stacked):
    return _coattention_pallas(params, x_img, q_stacked), (params, x_img, q_stacked)


# Analytic Pallas backward (recompute-in-kernel). Default off: validated in
# interpret mode (grads match autodiff), but the dev tunnel's remote compile
# helper is OOM-killed (SIGKILL) compiling the 3-level-unrolled kernel body —
# splitting into per-level pallas_calls is the known fix (future round). The
# autodiff-through-XLA fallback is numerically identical. Opt in via
# VQA_PALLAS_BWD=1.
import os

USE_PALLAS_BWD = os.environ.get("VQA_PALLAS_BWD", "0") == "1"


def _bwd(residuals, grads):
    params, x_img, q_stacked = residuals
    if USE_PALLAS_BWD:
        gv, gq = grads
        return _coattention_pallas_bwd(params, x_img, q_stacked, gv, gq)
    _, vjp = jax.vjp(_xla_reference, params, x_img, q_stacked)
    return vjp(grads)


_coattention_op.defvjp(_fwd, _bwd)


def coattention_fused(params, x_img, x_ques_hierarchy):
    """Drop-in for ``coattention_xla``: (list of [B,D], list of [B,D])."""
    q_stacked = jnp.stack(x_ques_hierarchy, axis=1)           # [B, 3, L, D]
    out_v, out_q = _coattention_op(params, x_img, q_stacked)
    return ([out_v[:, i] for i in range(NUM_LEVELS)],
            [out_q[:, i] for i in range(NUM_LEVELS)])
