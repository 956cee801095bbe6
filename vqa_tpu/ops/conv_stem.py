"""Fused VGG stem: conv0 and conv1 joined by a packed-int8 handoff.

The r3 default path runs the first two VGG stages (reference
``model.py:229-232``: conv 3->64 + pool, conv 64->128 + pool) as two
Pallas kernels with an XLA glue seam between them:

  conv0 i8 kernel -> bf16 NHWC [B, H/2, W/2, 64]      (half-filled lanes)
  XLA glue: quantize (bf16 read) + H-pair pack + pad  (hpack prologue)
  hpack kernel   -> bf16 NHWC [B, H/4, W/4, 128]

The seam costs twice: stage 0 stores a full-resolution bf16 map it just
dequantized (1.31 GB at b160@448), and the hpack prologue immediately
re-quantizes and relayouts it. This module fuses the seam away
(tools/exp_fuse01.py): stage 0's epilogue quantizes with conv1's static
per-input-channel calibration scales and stores the H-pair-packed int8
map [B, H/4, W/2, 128] directly — full lanes, half the bytes, and the
only glue left is the conv boundary pad.

Numerics: the fused handoff quantizes conv1's input from the f32
epilogue value instead of from a bf16-rounded store, so it is *tighter*
than (but not bit-identical to) the unfused chain; the off-TPU fallback
below reproduces the fused numerics through plain XLA so a given
``--fused_stem`` setting computes the same values on every platform
(same 1-ulp FMA-contraction caveat as ops/conv_hpack.py). Requires
static per-input-channel calibration for BOTH stages — with dynamic
scales conv1's quant scale would depend on stage-0 output, which the
fused epilogue cannot know.

Frozen-backbone only (like every int8 stage): no vjp is defined.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv_hpack as chp
from . import conv_stage1 as cs1


def _kernel_conv0_packed(xp_ref, w_ref, scale_ref, inv_s1_ref, b_ref,
                         out_ref, *, seg, r_blk, wo, out_ch):
    """conv0 int8 kernel with a packed-int8 epilogue.

    Same dots/phase-max as conv_stage1._kernel_i8; the epilogue then
    quantizes with conv1's per-input-channel scales (inv_s1_ref [O, 1],
    reciprocal) and stores H row pairs packed onto lanes:
    out[q, w, O*r + c] = q8[2q + r, w, c]; out block [1, seg/2, Wo, 2O].
    """
    for blk in range(seg // r_blk):
        start = pl.program_id(1) * seg + blk * r_blk
        xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]
        views = [xslab[:, a:a + r_blk, bb:bb + wo]
                 for a in range(3) for bb in range(3)]
        p = jnp.concatenate(views, axis=0).transpose(1, 0, 2)
        w_b = jnp.broadcast_to(w_ref[:][None], (r_blk,) + w_ref.shape)
        acc = jax.lax.dot_general(
            w_b, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)             # [R, 4O, Wo]
        m = jnp.maximum(
            jnp.maximum(acc[:, 0 * out_ch:1 * out_ch],
                        acc[:, 1 * out_ch:2 * out_ch]),
            jnp.maximum(acc[:, 2 * out_ch:3 * out_ch],
                        acc[:, 3 * out_ch:4 * out_ch]))
        y = m.astype(jnp.float32) * scale_ref[:][None]    # [R, O, Wo]
        y = jnp.maximum(y + b_ref[:][None], 0.0)
        # quantize for conv1 while O is still on sublanes ([O,1] bcast),
        # then the known-good lane transpose, then the pair interleave as
        # a leading-dim [R//2, 2] reshape split + lane concat (64+64 =
        # 128 lanes). A strided slice qt[0::2] lowers to a >2D gather,
        # which Mosaic rejects ("Only 2D gather is supported"); the
        # leading split reshape (last two dims untouched) is supported.
        q = jnp.clip(jnp.round(y * inv_s1_ref[:][None]), -127, 127)
        qt = q.transpose(0, 2, 1)                         # [R, Wo, O] f32
        qp = qt.reshape(r_blk // 2, 2, wo, out_ch)
        pair = jnp.concatenate([qp[:, 0], qp[:, 1]], axis=-1)
        out_ref[0, pl.ds(blk * (r_blk // 2), r_blk // 2), :, :] = \
            pair.astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("s_x", "s1", "interpret"))
def _conv0_i8_packed(x, w, b, s_x, s1, interpret: bool = False):
    """x [B,H,W,C] -> packed-int8 conv1 input [B, H/4, W/2, 2*O].

    ``s_x``: stage-0 per-input-channel quant scales (tuple, len C).
    ``s1``: conv1 per-input-channel quant scales (tuple, len O) — stage
    0's output channels, from the same calibration table.
    """
    batch, h, _, c = x.shape
    out_ch = w.shape[-1]
    ho, wo = h // 2, x.shape[2] // 2
    n_seg, r_blk = cs1._pick_blocking(ho, wo, 1)
    seg = ho // n_seg

    w32 = w.astype(jnp.float32)
    s_c = jnp.asarray(s_x, jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                   -127, 127).astype(jnp.int8)
    w32 = w32 * s_c[None, None, :, None]
    xp = cs1._pack_planar_s2d(x_q)

    w4 = cs1._pack_w4(w32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w4[:, :out_ch]), axis=0), 1e-12) / 127.
    w_q = jnp.clip(jnp.round(w4 / jnp.tile(s_w, 4)), -127, 127).astype(jnp.int8)
    scale = s_w[:, None]                                  # [O, 1]
    b_arg = b.astype(jnp.float32)[:, None]
    inv_s1 = (1.0 / jnp.asarray(s1, jnp.float32))[:, None]

    kernel = functools.partial(_kernel_conv0_packed, seg=seg, r_blk=r_blk,
                               wo=wo, out_ch=out_ch)
    return pl.pallas_call(
        kernel,
        grid=(batch, n_seg),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * out_ch, w4.shape[0]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(inv_s1.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seg // 2, wo, 2 * out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, ho // 2, wo, 2 * out_ch),
                                       jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_q.T, scale, inv_s1, b_arg)


@functools.partial(jax.jit,
                   static_argnames=("s1", "out_dtype", "interpret",
                                    "s_next", "wpool"))
def _hpack_from_packed(xp, w, b, s1, out_dtype, interpret: bool = False,
                       s_next=None, wpool: str = "post"):
    """hpack conv1 stage from a pre-quantized packed input [B, Q, W, 2C].

    Same kernel body as ops/conv_hpack ('split' variant); only the
    prologue differs — the input is already int8 H-pair packed, so the
    activation quantize/pack collapses to the boundary pad. ``s_next``
    (tuple, len O): quantize the pooled output with conv2's per-channel
    scales and store int8 (the inter-stage handoff continues).
    """
    batch, q, wd, _ = xp.shape
    out_ch = w.shape[-1]
    r_blk = chp._pick_r_blk(q)
    w32 = w.astype(jnp.float32) * jnp.asarray(s1, jnp.float32)[None, None,
                                                               :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    w_taps = chp._pack_weights(w_q, jnp.int8, "split")
    scale = s_w[None]

    xpp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b_arg = b.astype(jnp.float32)[None]
    args = [xpp, w_taps, scale, b_arg]
    in_specs = [
        pl.BlockSpec((1,) + xpp.shape[1:], lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_taps.shape, lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if s_next is not None:
        inv_next = (1.0 / jnp.asarray(s_next, jnp.float32))[None]  # [1, O]
        args.append(inv_next)
        in_specs.append(pl.BlockSpec(inv_next.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        out_dtype = jnp.int8
    kernel = functools.partial(chp._kernel, r_blk=r_blk, w_img=wd,
                               int8=True, variant="split",
                               quant_out=s_next is not None, wpool=wpool)
    return pl.pallas_call(
        kernel,
        grid=(batch, q // r_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, r_blk, wd // 2, out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, q, wd // 2, out_ch),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("s1", "out_dtype", "s_next"))
def _conv1_xla_phases(xp, w, b, s1, out_dtype, s_next=None):
    """conv1 stage on the PACKED int8 input via two XLA phase convs.

    r5 finding (BASELINE.md r5 stem section): Mosaic-authored int8 dots
    plateau at ~125 TF/s at every contraction depth tried, while XLA's own
    int8 conv emitter sustains 334-364 TF/s in this very step at
    C_in >= 128 — and the H-pair-packed handoff [B, Q, W, 2C] IS a
    128-channel tensor. The phase decomposition (output row h = 2q' + p)
    maps conv1 exactly onto two XLA convs with [2, 3, 2C, O] kernels built
    from the same quantized weights the hpack kernel packs:

      phase 0 taps packed rows {q'-1, q'} -> H-padding (1, 0)
      phase 1 taps packed rows {q', q'+1} -> H-padding (0, 1)

    and the 2x2 maxpool's H-reduction is exactly ``max(phase0, phase1)``.
    Dequant+bias+ReLU (+ the s_next handoff quantize) run per phase so XLA
    fuses them into each conv's epilogue (the conv2-7 pattern); max and
    the W-pool then run on the small output dtype. Every post-accumulator
    op is monotone, so this computes bit-identically to the hpack kernel's
    i32-max-first ordering (same argument as ops/conv_hpack.py).
    """
    out_ch = w.shape[-1]
    c = w.shape[2]
    w32 = w.astype(jnp.float32) * jnp.asarray(s1, jnp.float32)[None, None,
                                                               :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)

    z = jnp.zeros((3, c, out_ch), jnp.int8)
    # rows 0:C of the packed channel dim = pair half r=0, rows C:2C = r=1
    k_p0 = jnp.stack([jnp.concatenate([z, w_q[0]], axis=1),
                      jnp.concatenate([w_q[1], w_q[2]], axis=1)])
    k_p1 = jnp.stack([jnp.concatenate([w_q[0], w_q[1]], axis=1),
                      jnp.concatenate([w_q[2], z], axis=1)])

    def phase(kern, h_pad):
        acc = jax.lax.conv_general_dilated(
            xp, kern, (1, 1), [h_pad, (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * s_w
                        + b.astype(jnp.float32), 0.0)
        if s_next is not None:
            inv = 1.0 / jnp.asarray(s_next, jnp.float32)
            return jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)
        return y.astype(out_dtype)

    y0 = phase(k_p0, (1, 0))
    y1 = phase(k_p1, (0, 1))
    m = jnp.maximum(y0, y1)                       # the pool's H-reduction
    init = jnp.iinfo(jnp.int8).min if s_next is not None else -jnp.inf
    return jax.lax.reduce_window(m, jnp.asarray(init, m.dtype), jax.lax.max,
                                 (1, 1, 2, 1), (1, 1, 2, 1), "VALID")


def _xla_reference(x, w0, b0, w1, b1, s_x0, s_x1, out_dtype, s_next=None):
    """The fused numerics through plain XLA (fallback + parity oracle).

    Stage 0 in f32 end-to-end (matching the kernel's f32 epilogue —
    deliberately NOT the unfused chain's bf16 store), then conv1's
    quantize + int8 stage + pool. conv_stage1/conv_hpack's own i8
    references implement exactly these two pieces.
    """
    y0 = cs1._xla_reference_i8(x.astype(jnp.float32), w0, b0, s_x=s_x0)
    out = chp._xla_reference_i8(y0, w1, b1, s_x=s_x1, s_next=s_next)
    return out if s_next is not None else out.astype(out_dtype)


@functools.lru_cache()
def _partitioned(s_x0, s_x1, out_dtype, interpret: bool, s_next=None,
                 wpool="post", conv1_impl="xla_phase"):
    """GSPMD batch-parallel wrapper (same design as conv_stage1/conv_hpack:
    pallas_call has no SPMD rule; weights/bias replicate, batch shards)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def call(x, w0, b0, w1, b1):
        xp = _conv0_i8_packed(x, w0, b0, s_x0, s_x1, interpret=interpret)
        if conv1_impl == "xla_phase":
            return _conv1_xla_phases(xp, w1, b1, s_x1, out_dtype,
                                     s_next=s_next)
        return _hpack_from_packed(xp, w1, b1, s_x1, out_dtype,
                                  interpret=interpret, s_next=s_next,
                                  wpool=wpool)

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
                  NamedSharding(mesh, P(None)),
                  NamedSharding(mesh, P(None, None, None, None)),
                  NamedSharding(mesh, P(None)))
        return mesh, call, NamedSharding(mesh, P(ba, None, None, None)), arg_sh

    fn.def_partition(
        partition, infer_sharding_from_operands=infer,
        # batch and out-channel partition cleanly; spatial dims never shard
        # in this framework (conv halos would need a halo exchange)
        sharding_rule="b h w c, i j c o, o, k l o p, p -> b m n p")
    return fn


def stem_supported(x_shape, w0_shape, w1_shape) -> bool:
    """Both kernels' static shape requirements, checked up front."""
    _, h, wd, c = x_shape
    if w0_shape[:2] != (3, 3) or w1_shape[:2] != (3, 3):
        return False
    if w0_shape[3] != 64 or w1_shape[2] != 64:
        return False          # the packed handoff is built for 2*64 lanes
    if h % 4 or wd % 4:
        return False
    blocking = cs1._pick_blocking(h // 2, wd // 2, 1)
    if blocking is None:
        return False
    n_seg, r_blk = blocking
    seg = (h // 2) // n_seg
    if seg % 2 or r_blk % 2:
        return False          # the packed epilogue stores row PAIRS
    return chp._pick_r_blk(h // 4) is not None


def fused_stem(x, w0, b0, w1, b1, *, s_x0, s_x1, s_next=None,
               force: str | None = None):
    """VGG stem (conv0+BN+ReLU+pool, conv1+BN+ReLU+pool): the conv0
    Pallas kernel and the conv1 stage (XLA phase convs by default, the
    hpack Pallas kernel via VQA_STEM_CONV1=pallas) joined by a
    packed-int8 handoff — no intermediate bf16 map.

    x [B, H, W, C] -> [B, H/4, W/4, 128]. ``w*``/``b*`` are the BN-folded
    weights; ``s_x0``/``s_x1`` the static per-input-channel quant-scale
    tuples for the two stages (mandatory — see module docstring).
    ``s_next`` (tuple, len 128): quantize conv1's pooled output with
    conv2's per-channel scales and return int8 — the inter-stage handoff
    (models/vgg.py ``int8_handoff``) continues into the XLA int8 chain.
    Off-TPU or on unsupported shapes, the identical-numerics XLA
    expression runs instead, so a given --fused_stem setting is
    platform-independent. ``force`` ('pallas' | 'xla') overrides for
    tests/benchmarks.
    """
    import os
    force = force or os.environ.get("VQA_STEM_FORCE") or None
    if not (isinstance(s_x0, tuple) and isinstance(s_x1, tuple)):
        raise ValueError("fused_stem requires static per-channel scales "
                         "for both stages (run calibration first)")
    supported = stem_supported(x.shape, w0.shape, w1.shape)
    if force == "xla" or (force != "pallas"
                          and not (supported and cs1._on_tpu())):
        return _xla_reference(x, w0, b0, w1, b1, s_x0, s_x1, x.dtype,
                              s_next=s_next)
    if not supported:
        raise ValueError(f"unsupported stem shape: x{x.shape} "
                         f"w0{w0.shape} w1{w1.shape}")
    wpool = os.environ.get("VQA_HPACK_WPOOL", "post")
    # conv1 stage implementation: 'xla_phase' (default since r5 — two XLA
    # int8 phase convs on the packed input ride the 334-364 TF/s conv
    # emitter; same-session step A/B: 3,380 vs 3,054 QA/s, +10.7%) |
    # 'pallas' (the r3-r4 hpack kernel, which plateaus at the ~125 TF/s
    # Mosaic in-kernel dot wall, BASELINE.md r5 stem section). Numerics
    # are bit-identical (integer accumulation is order-free; the f32
    # epilogue is elementwise-identical; tests/test_conv_stem.py).
    conv1_impl = os.environ.get("VQA_STEM_CONV1", "xla_phase")
    return _partitioned(s_x0, s_x1, x.dtype, not cs1._on_tpu(),
                        s_next, wpool, conv1_impl)(x, w0, b0, w1, b1)
