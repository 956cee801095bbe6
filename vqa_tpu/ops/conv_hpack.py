"""Fused pooled-conv stage via H-pair packing: conv3x3 + bias + ReLU + maxpool2x2.

The VGG11 stack (reference ``model.py:229-236``) pools after convs 1, 3, 5
and 7 (conv 0 has its own space-to-depth kernel, ops/conv_stage1.py). XLA
runs each of those as a direct conv + a separate reduce_window; the r3
probes (BASELINE.md "Round 3: generalized fused conv kernels") showed the
binding costs at these shapes are *around* the dot — lane padding when
C_in=64, the full-resolution f32 epilogue, and the unpooled store — not
the MXU work itself.

This kernel removes all three structurally (tools/exp_hpack_tap.py):

- **H-pair packing**: x [B,H,W,C] -> P [B,H/2,W,2C] with
  ``P[q, w, C*r+c] = x[2q+r, w, c]``. The lane dim becomes 2C (>=128
  everywhere in the stack), so no lane padding, and every dot contracts
  K=2C full lanes. The pack is one XLA fused transpose on the int8/bf16
  input (~2x fewer bytes than the unpacked padded layout at C=64).
- **Phase decomposition**: output row h = 2q'+p. Per output phase p the
  3 H-taps fall on packed rows {q'-1, q'} (p=0) / {q', q'+1} (p=1), giving
  2 packed taps each with a [2C, O] weight block (one half structured
  zeros at the boundary taps). Both phases ride ONE dot per (offset, dw)
  by concatenating their weight blocks to [2C, 2O]: 3 offsets x 3 dw = 9
  dots per row block, 3 slab loads (the middle offset serves both phases).
- **Fused pool**: the 2x2 maxpool's H-reduction is exactly
  ``max(lane-half 0, lane-half 1)`` of the [R, W, 2O] accumulator, and its
  W-reduction a sublane-split reshape-max — ReLU and bias commute with max
  (monotone, scale > 0), so dequant+bias+ReLU run once per POOLED element
  and the store is the pooled map (4x fewer bytes).

int8 path: identical quantization semantics to the int8-XLA stages in
models/vgg.py (per-output-channel symmetric weight scales; activation
scale static per-tensor / static per-input-channel folded into the
weights / dynamic per-batch amax) with exact int32 accumulation — the
result matches the XLA int8 stage + reduce_window it replaces to within
1 ulp of f32 (pooling the int32 accumulator before the affine dequant
picks the same winner because f32 rounding is monotone; the residual is
compiler FMA-contraction freedom in ``acc*scale + bias``), so swapping
the stages carries no accuracy risk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def _pack_h_pairs(x):
    """[B, H, W, C] -> [B, H/2, W, 2C], pair dim minor-adjacent to C."""
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w, c)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h // 2, w, 2 * c))


def _pack_weights(w, dtype, variant="split"):
    """Pack [3, 3, C, O] into per-(offset, dw) weight blocks.

    'split' (the default, 12 dots of [2C, O]): 4 (offset, phase) pairs
      — offset 0 feeds phase 0 as [0; w0], offset 1 feeds phase 0 as
      [w1; w2] and phase 1 as [w0; w1], offset 2 feeds phase 1 as
      [w2; 0] (rows = input pair halves). 1.33x FLOP inflation.
    'merged' (9 dots of [2C, 2O]): offset 1's two phase matrices ride one
      dot by concatenation on O; offsets 0/2 zero-pad the unused phase.
      2x FLOP inflation, fewer dot issues — measured SLOWER than 'split'
      at conv1 (BASELINE.md r3), kept for A/B.
    """
    c, out_ch = w.shape[2], w.shape[3]
    z = jnp.zeros((c, out_ch), w.dtype)
    if variant == "split":
        taps = []
        for pair in ((z, w[0]), (w[1], w[2]), (w[0], w[1]), (w[2], z)):
            for dw in range(3):
                taps.append(jnp.concatenate([pair[0][dw] if pair[0] is not z
                                             else z,
                                             pair[1][dw] if pair[1] is not z
                                             else z], axis=0))
        return jnp.stack(taps).astype(dtype)          # [12, 2C, O]
    zz = jnp.zeros((2 * c, out_ch), w.dtype)
    taps = []
    for off in range(3):
        for dw in range(3):
            if off == 0:
                blk = jnp.concatenate(
                    [jnp.concatenate([z, w[0, dw]], 0), zz], axis=1)
            elif off == 1:
                blk = jnp.concatenate(
                    [jnp.concatenate([w[1, dw], w[2, dw]], 0),
                     jnp.concatenate([w[0, dw], w[1, dw]], 0)], axis=1)
            else:
                blk = jnp.concatenate(
                    [zz, jnp.concatenate([w[2, dw], z], 0)], axis=1)
            taps.append(blk)
    return jnp.stack(taps).astype(dtype)              # [9, 2C, 2O]


def _kernel(xp_ref, w_ref, sc_ref, b_ref, *rest, r_blk, w_img, int8,
            variant, quant_out=False, wpool="post"):
    """One (sample, q'-block) -> pooled out [1, R, W/2, O].

    xp_ref [1, Q+2, W+2, 2C]: the whole padded packed sample, resident in
    VMEM across the row grid axis (Q is an outer, untiled dim — the
    dynamic row slices below are free). w_ref: see _pack_weights;
    sc_ref/b_ref [1, O] (sc = per-out-channel dequant scale, 1.0s for
    bf16). The pool's H-reduction is the max of the two phase
    accumulators (or the accumulator's two lane halves, 'merged').
    ``quant_out``: rest = (inv_next_ref [1, O], out_ref) — the epilogue
    quantizes the pooled f32 values with the NEXT stage's per-channel
    scales (reciprocals) and the store is int8 (the inter-stage handoff,
    models/vgg.py ``int8_handoff``).
    """
    out_ref = rest[-1]
    inv_next_ref = rest[0] if quant_out else None
    start = pl.program_id(1) * r_blk
    out_ch = out_ref.shape[-1]
    acct = jnp.int32 if int8 else jnp.float32
    if variant == "split":
        # (offset, phase) pairs aligned with _pack_weights 'split' order
        accs = [None, None]
        for i, (off, p) in enumerate(((0, 0), (1, 0), (1, 1), (2, 1))):
            slab = xp_ref[0, pl.ds(start + off, r_blk), :, :]  # [R,W+2,2C]
            for dw in range(3):
                d = jax.lax.dot_general(
                    slab[:, dw:dw + w_img, :], w_ref[i * 3 + dw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=acct)
                accs[p] = d if accs[p] is None else accs[p] + d
        m = jnp.maximum(accs[0], accs[1])                     # pool over H
    else:
        acc = None
        for off in range(3):
            slab = xp_ref[0, pl.ds(start + off, r_blk), :, :]  # [R,W+2,2C]
            for dw in range(3):
                d = jax.lax.dot_general(
                    slab[:, dw:dw + w_img, :], w_ref[off * 3 + dw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=acct)
                acc = d if acc is None else acc + d           # [R, W, 2O]
        m = jnp.maximum(acc[..., :out_ch], acc[..., out_ch:])  # pool over H
    if wpool == "pre":
        # REJECTED r4 candidate, kept as an A/B knob: pool W on the int32
        # accumulator before dequant+bias+ReLU. Bit-identical (monotone
        # maps, per-channel scale > 0) and it halves the f32 epilogue's
        # element count — but MEASURED SLOWER on the v5e (stem chain 26.21
        # vs 23.74ms, full stack 52.14 vs 50.21; tools/exp_r4_epi.py):
        # Mosaic's i32 vector max on the sublane-split reshape costs more
        # than the saved f32 work. The f32-late ordering below ships.
        m = m.reshape(r_blk, w_img // 2, 2, out_ch).max(axis=2)
        y = m.astype(jnp.float32) * sc_ref[0][None, None]
        y = jnp.maximum(y + b_ref[0][None, None], 0.0)
    else:
        y = m.astype(jnp.float32) * sc_ref[0][None, None]
        y = jnp.maximum(y + b_ref[0][None, None], 0.0)
        # pool over W: [R, W, O] -> [R, W/2, 2, O] -> max over the pair dim
        # (sublane split; the minor dim stays put, so the reshape is legal)
        y = y.reshape(r_blk, w_img // 2, 2, out_ch).max(axis=2)
    if quant_out:
        y = jnp.clip(jnp.round(y * inv_next_ref[0][None, None]), -127, 127)
    out_ref[0] = y.astype(out_ref.dtype)


def _pick_r_blk(q: int) -> int | None:
    """Rows of POOLED output per grid step.

    Measured on conv1 (q=112): 16 beat 8/56/112 (large blocks blow the
    [R, W, 2O] i32 accumulator past comfortable double-buffering; small
    ones pay more grid steps). Prefer the largest divisor of q <= 16.
    """
    for r in range(min(q, 16), 0, -1):
        if q % r == 0:
            return r
    return None


@functools.partial(jax.jit, static_argnames=("int8", "s_x", "interpret",
                                              "variant", "s_next", "wpool"))
def _conv_hpack(x, w, b, int8: bool = False, s_x=None,
                interpret: bool = False, variant: str = "split",
                s_next=None, wpool: str = "post"):
    """x [B,H,W,C] -> maxpool2x2(relu(conv3x3(x, w) + b)) [B,H/2,W/2,O].

    ``w``/``b`` are the BN-folded weights (any float dtype). int8: quantize
    exactly like the int8-XLA stage in models/vgg.py (s_x: None = dynamic
    per-batch per-tensor amax; float = static per-tensor; tuple(len C) =
    static per-input-channel quant scales, folded into the weights).
    ``s_next`` (tuple, len O): quantize the pooled output with the next
    stage's per-channel scales and store int8 (the inter-stage handoff).
    """
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    q = h // 2
    r_blk = _pick_r_blk(q)
    w32 = w.astype(jnp.float32)

    if int8:
        if isinstance(s_x, tuple):
            s_c = jnp.asarray(s_x, jnp.float32)               # [C]
            x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                            -127, 127).astype(jnp.int8)
            w32 = w32 * s_c[None, None, :, None]
            s_out = 1.0
        else:
            if s_x is None:
                s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                                  1e-12) / 127.0
            x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                            -127, 127).astype(jnp.int8)
            s_out = s_x
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)),
                          1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        w_taps = _pack_weights(w_q, jnp.int8, variant)
        scale = (s_out * s_w)[None]                           # [1, O]
    else:
        x_in = x
        w_taps = _pack_weights(w32, x.dtype, variant)
        scale = jnp.ones((1, out_ch), jnp.float32)

    xp = _pack_h_pairs(x_in)
    # pad: 1 packed row each side (offsets q'-1..q'+1), 1 col each side
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b_arg = b.astype(jnp.float32)[None]                       # [1, O]

    args = [xp, w_taps, scale, b_arg]
    in_specs = [
        pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_taps.shape, lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_dtype = x.dtype
    if s_next is not None:
        inv_next = (1.0 / jnp.asarray(s_next, jnp.float32))[None]  # [1, O]
        args.append(inv_next)
        in_specs.append(pl.BlockSpec(inv_next.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_dtype = jnp.int8
    kernel = functools.partial(_kernel, r_blk=r_blk, w_img=wd, int8=int8,
                               variant=variant, quant_out=s_next is not None,
                               wpool=wpool)
    return pl.pallas_call(
        kernel,
        grid=(batch, q // r_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_blk, wd // 2, out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, q, wd // 2, out_ch), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _xla_reference(x, w, b):
    """Identical math through plain XLA (fallback + parity oracle)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype) + b.astype(x.dtype)
    return jax.lax.reduce_window(jax.nn.relu(y), -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _xla_reference_i8(x, w, b, s_x=None, s_next=None):
    """int8 chain through plain XLA — the models/vgg.py int8 stage +
    reduce_window, byte-for-byte the quantization the kernel implements.
    ``s_next``: quantize the pooled f32 output with the next stage's
    per-channel scales and return int8 (the handoff epilogue)."""
    w32 = w.astype(jnp.float32)
    if isinstance(s_x, tuple):
        s_c = jnp.asarray(s_x, jnp.float32)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                       -127, 127).astype(jnp.int8)
        w32 = w32 * s_c[None, None, :, None]
        s_out = 1.0
    else:
        if s_x is None:
            s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                              1e-12) / 127.0
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
        s_out = s_x
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jax.nn.relu(acc.astype(jnp.float32) * (s_out * s_w) + b)
    if s_next is not None:
        # pool f32, then quantize (== the kernel's pooled-f32 quantize;
        # the order also commutes — monotone)
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.clip(jnp.round(y / jnp.asarray(s_next, jnp.float32)),
                        -127, 127).astype(jnp.int8)
    return jax.lax.reduce_window(y.astype(x.dtype), -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@functools.lru_cache()
def _partitioned(int8: bool, interpret: bool, s_x=None, variant="split",
                 s_next=None, wpool="post"):
    """GSPMD batch-parallel wrapper (same design as conv_stage1.py:
    pallas_call has no SPMD rule, so without this a DP mesh would
    all-gather the conv input; weights/bias replicate, batch shards)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def call(x, w, b):
        return _conv_hpack(x, w, b, int8=int8, s_x=s_x, interpret=interpret,
                           variant=variant, s_next=s_next, wpool=wpool)

    fn = custom_partitioning(call)

    def batch_axis(arg_shapes):
        s = getattr(arg_shapes[0], "sharding", None)
        spec = getattr(s, "spec", None)
        return spec[0] if spec else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(batch_axis(arg_shapes), None, None, None))

    def partition(mesh, arg_shapes, result_shape):
        ba = batch_axis(arg_shapes)
        arg_sh = (NamedSharding(mesh, P(ba, None, None, None)),
                  NamedSharding(mesh, P(None, None, None, None)),
                  NamedSharding(mesh, P(None)))
        return mesh, call, NamedSharding(mesh, P(ba, None, None, None)), arg_sh

    fn.def_partition(
        partition, infer_sharding_from_operands=infer,
        # batch and out-channel partition cleanly; spatial dims never shard
        # in this framework (conv halos would need a halo exchange)
        sharding_rule="b i j c, k l c o, o -> b m n o")
    return fn


def conv_bn_relu_pool(x, w, b, *, force: str | None = None,
                      int8: bool = False, s_x=None, s_next=None):
    """Pooled VGG stage: conv3x3(pad1) + (folded-BN) bias + ReLU + maxpool2x2.

    x [B, H, W, C], w [3, 3, C, O], b [O] -> [B, H/2, W/2, O]. BN must be
    folded into (w, b). Uses the H-pair-packed fused Pallas kernel on TPU,
    the identical XLA expression elsewhere or on unsupported shapes (odd
    H/W, non-3x3) — int8 requests keep int8 numerics on the fallback so
    the same config computes the same values on every platform. ``force``
    ('pallas' | 'xla') overrides for tests/benchmarks; off-TPU, forced
    pallas runs in interpreter mode. ``s_x``: static calibrated activation
    scale for the int8 path (float per-tensor / length-C tuple
    per-input-channel / None = dynamic per-batch amax). ``s_next``
    (int8 only; tuple, len O): quantize the pooled output with the next
    stage's per-channel scales and return int8 — the inter-stage handoff
    (models/vgg.py ``int8_handoff``).
    """
    import os
    _, h, wd, c = x.shape
    assert s_next is None or int8, "s_next is an int8-chain handoff"
    force = force or os.environ.get("VQA_CONVP_FORCE") or None
    # 'split' (12 dots, 1.33x inflation) measured faster than 'merged'
    # (9 dots, 2x) at conv1 — env knob for A/B reruns
    variant = os.environ.get("VQA_HPACK_VARIANT", "split")
    # W-pool placement: 'post' (default, ships) dequants at full W then
    # pools; 'pre' pools the int32 accumulator first — bit-identical but
    # measured SLOWER on-chip (tools/exp_r4_epi.py), kept for A/B reruns
    wpool = os.environ.get("VQA_HPACK_WPOOL", "post")
    supported = (w.shape[:2] == (3, 3) and h % 2 == 0 and wd % 2 == 0
                 and _pick_r_blk(h // 2) is not None)
    if force == "xla" or (force != "pallas" and not (supported and _on_tpu())):
        return _xla_reference_i8(x, w, b, s_x=s_x, s_next=s_next) if int8 \
            else _xla_reference(x, w, b)
    if not supported:
        raise ValueError(f"unsupported pooled-stage shape: x{x.shape} w{w.shape}")
    return _partitioned(int8, not _on_tpu(), s_x, variant, s_next,
                        wpool)(x, w, b)
