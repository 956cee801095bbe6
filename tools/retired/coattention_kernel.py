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
  expression (``coattention_xla``) via ``jax.custom_vjp`` — autodiff-exact
  gradients with no residual storage (the analytic in-kernel backward was
  removed: it OOM-kills this environment's Mosaic compiler, see ``_bwd``).

Status (measured, 1x v5e, b160 S=196 D=512 L=23 bf16, round 2): XLA runs
this block in 1.69ms forward / 1.61ms forward+backward — ~2% of the train
step — while the fused kernel takes 2.2ms forward. ``--use_pallas`` is
therefore OFF by default; the kernel remains as the parity-tested fusion
(tests/test_coattention_kernel.py) and the starting point if the workload
ever grows past XLA's fusion horizon (longer L, bigger S).

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


def _xla_reference(params, x_img, q_stacked):
    """The autodiff/numerics oracle (same math as coattention_xla)."""
    from vqa_tpu.models.coattention import coattention_xla

    levels = [q_stacked[:, i] for i in range(NUM_LEVELS)]
    img_feats, ques_feats = coattention_xla(params, x_img, levels)
    return jnp.stack(img_feats, axis=1), jnp.stack(ques_feats, axis=1)


@jax.custom_vjp
def _coattention_op(params, x_img, q_stacked):
    return _coattention_pallas(params, x_img, q_stacked)


def _fwd(params, x_img, q_stacked):
    return _coattention_pallas(params, x_img, q_stacked), (params, x_img, q_stacked)


def _bwd(residuals, grads):
    """Backward = autodiff through the numerically-identical XLA expression.

    An analytic in-kernel backward was built and validated in round 1
    (grads matched autodiff in interpret mode) but could not be compiled on
    this environment's TPU toolchain: the Mosaic compile of the recompute-
    in-kernel body is OOM-killed even when split into per-level pallas_calls
    (round 2, BASELINE.md). Since the whole co-attention block is ~2% of the
    b160@448 train step (1.7ms fwd+bwd through XLA), the analytic kernel was
    removed rather than kept dead — see git history to resurrect it.
    """
    params, x_img, q_stacked = residuals
    _, vjp = jax.vjp(_xla_reference, params, x_img, q_stacked)
    return vjp(grads)


_coattention_op.defvjp(_fwd, _bwd)


def coattention_fused(params, x_img, x_ques_hierarchy):
    """Drop-in for ``coattention_xla``: (list of [B,D], list of [B,D])."""
    q_stacked = jnp.stack(x_ques_hierarchy, axis=1)           # [B, 3, L, D]
    out_v, out_q = _coattention_op(params, x_img, q_stacked)
    return ([out_v[:, i] for i in range(NUM_LEVELS)],
            [out_q[:, i] for i in range(NUM_LEVELS)])
