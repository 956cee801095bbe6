"""Fused Pallas TPU kernel for the first VGG stage: conv3x3 -> BN -> ReLU -> pool.

Why: XLA's conv emitter runs the stage-1 conv (C_in=3) at ~3% MXU utilization
— 36ms of the 84ms b160@448 VGG-11 stack (tools/profile_vgg.py), for 2.3% of
its FLOPs. The 128-deep systolic array contracts only 27 elements, and the
C=3 input layout pads to 128 lanes in HBM (~42x memory inflation).

Design (TPU-first, no reference counterpart — /root/reference/model.py:229-236
just calls torchvision's cuDNN conv):

- the input is packed once per step (cheap XLA shuffle) into a *planar
  space-to-depth* layout ``[B, 12, H/2+2, W/2+2]``: plane k=(r*2+s)*3+c holds
  input pixel (2i+r, 2j+s, c), zero-padded so the kernel needs no boundary
  logic (the s2d-rewritten taps reproduce conv zero-padding exactly);
- the conv+pool pair becomes one matmul per row block: patches
  ``P [108, R*W/2]`` (9 shifted plane slices x 12 channels, stacked on the
  *leading* dim so no lane relayout happens) against the space-to-depth
  rewritten weights ``W4t [4*O, 108]`` — contraction depth 108 instead of 27;
- bias (BN pre-folded by the caller), ReLU and the 2x2 maxpool (= max over
  the 4 phase channel groups) fuse into the matmul epilogue in VMEM;
- grid is (batch, row-segments); the packed plane (~1.4MB @448) stays
  resident across a sample's segments.

The XLA path (`_xla_reference`) is the numerics oracle and the fallback on
CPU backends and unsupported shapes. BN must already be folded into (w, b) —
see ``vqa_tpu.models.vgg.VGGFeatures``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_reference(x, w, b):
    """conv3x3(pad 1) + bias + ReLU + maxpool2x2 via plain XLA (the oracle)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype) + b
    y = jax.nn.relu(y)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _xla_reference_i8(x, w, b, s_x=None):
    """int8-PTQ stage 1 via plain XLA — the ``_kernel_i8`` oracle AND the
    off-TPU/unsupported-shape fallback, so ``int8=True`` yields the same
    quantized numerics on every platform (dequant-then-pool == the kernel's
    pool-then-dequant: the scale is positive and the bias per-channel).
    ``s_x``: calibrated static activation scale — a Python float (per-tensor)
    or a length-C tuple (per-input-channel; the channel scales fold into the
    weights before weight quantization, so the dot stays a plain int8xint8
    and dequant is by ``s_w`` alone — see models/vgg.py for the derivation);
    None = dynamic per-batch per-tensor amax.
    """
    w32 = w.astype(jnp.float32)
    if isinstance(s_x, tuple):
        s_c = jnp.asarray(s_x, jnp.float32)           # [C] quant scales
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                       -127, 127).astype(jnp.int8)
        w32 = w32 * s_c[None, None, :, None]          # fold into weights
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
    y = jax.nn.relu(acc.astype(jnp.float32) * (s_out * s_w)
                    + b.astype(jnp.float32))
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return y.astype(x.dtype)


def _pack_planar_s2d(x, wo_pad: int | None = None):
    """[B, H, W, C] -> zero-padded planar s2d [B, 4C, H/2+2, (wo_pad|W/2)+2].

    Plane (r*2+s)*C+c at (i, j) = x[:, 2i+r, 2j+s, c] — the channel order
    ``_space_to_depth_kernel`` (models/vgg.py) assigns its input taps.
    ``wo_pad``: widen rows to this many columns (lane-aligned kernels).
    """
    b, h, w, c = x.shape
    wo = w // 2
    xp = x.reshape(b, h // 2, 2, wo, 2, c)
    xp = xp.transpose(0, 2, 4, 5, 1, 3).reshape(b, 4 * c, h // 2, wo)
    right = 1 + ((wo_pad - wo) if wo_pad else 0)
    return jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (1, right)))


def _pack_w4(w):
    """[3, 3, C, O] -> [9*4C, 4O]: flattened s2d-rewritten weights."""
    from ..models.vgg import _space_to_depth_kernel

    w4 = _space_to_depth_kernel(w)                    # [3, 3, 4C, 4O]
    return w4.reshape(9 * w4.shape[2], w4.shape[3])   # [108, 4O]


def _kernel(xp_ref, w_ref, b_ref, out_ref, *, seg, r_blk, wo, out_ch, nhwc_out):
    """One (sample, segment): `seg` pooled output rows in blocks of `r_blk`.

    xp_ref [1, 4C, Ho+2, Wo+2] (full padded plane; revisited across segments),
    w_ref [4O, 9*4C], b_ref [O, 1], out_ref [1, seg, Wo, O] (or [1, O, seg,
    Wo] planar when not nhwc_out).

    Mosaic notes (probed on v5e): patches must stay 3D ([K, R, Wo] — merging
    (R, Wo) into one lane dim is an unsupported shape cast), the matmul is a
    leading-dim-batched dot over R with the weights broadcast, and the bias
    is added *after* the phase max (the 4 phase groups share it, so
    ``relu(max_p(acc_p) + b) == maxpool(relu(conv + b))``; adding it to the
    batched-dot result directly SIGABRTs the Mosaic compiler).
    """
    for blk in range(seg // r_blk):
        start = pl.program_id(1) * seg + blk * r_blk
        xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]  # [4C, R+2, Wo+2]
        views = [xslab[:, a:a + r_blk, bb:bb + wo]        # 9 x [4C, R, Wo]
                 for a in range(3) for bb in range(3)]
        p = jnp.concatenate(views, axis=0).transpose(1, 0, 2)  # [R, 9*4C, Wo]
        w_b = jnp.broadcast_to(w_ref[:][None], (r_blk,) + w_ref.shape)
        acc = jax.lax.dot_general(
            w_b, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [R, 4O, Wo]
        m = jnp.maximum(
            jnp.maximum(acc[:, 0 * out_ch:1 * out_ch], acc[:, 1 * out_ch:2 * out_ch]),
            jnp.maximum(acc[:, 2 * out_ch:3 * out_ch], acc[:, 3 * out_ch:4 * out_ch]))
        m = jnp.maximum(m + b_ref[:].astype(jnp.float32)[None], 0.0)  # [R, O, Wo]
        if nhwc_out:
            out_ref[0, pl.ds(blk * r_blk, r_blk), :, :] = \
                m.transpose(0, 2, 1).astype(out_ref.dtype)
        else:
            out_ref[0, :, pl.ds(blk * r_blk, r_blk), :] = \
                m.transpose(1, 0, 2).astype(out_ref.dtype)


def _kernel_i8(xp_ref, w_ref, scale_ref, b_ref, out_ref, *, seg, r_blk, wo,
               out_ch):
    """int8 variant of ``_kernel`` (NHWC store): int8 patches x int8 weights
    -> int32 accumulate -> phase max -> fp32 dequant (per-out-channel scale,
    activation scale pre-folded by the caller) + bias + ReLU.

    The 4 phase groups of an output channel hold identical weight value sets
    (the s2d rewrite only re-arranges them), so one per-channel scale is
    shared across phases and dequant legally happens AFTER the phase max.
    Data movement halves vs bf16 (int8 planes/patches); the dot runs at the
    MXU's 2x int8 rate.
    """
    for blk in range(seg // r_blk):
        start = pl.program_id(1) * seg + blk * r_blk
        xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]  # [4C, R+2, Wo+2] i8
        views = [xslab[:, a:a + r_blk, bb:bb + wo]
                 for a in range(3) for bb in range(3)]
        p = jnp.concatenate(views, axis=0).transpose(1, 0, 2)  # [R, 108, Wo]
        w_b = jnp.broadcast_to(w_ref[:][None], (r_blk,) + w_ref.shape)
        acc = jax.lax.dot_general(
            w_b, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)             # [R, 4O, Wo] i32
        m = jnp.maximum(
            jnp.maximum(acc[:, 0 * out_ch:1 * out_ch], acc[:, 1 * out_ch:2 * out_ch]),
            jnp.maximum(acc[:, 2 * out_ch:3 * out_ch], acc[:, 3 * out_ch:4 * out_ch]))
        y = m.astype(jnp.float32) * scale_ref[:][None]    # [R, O, Wo]
        y = jnp.maximum(y + b_ref[:][None], 0.0)
        out_ref[0, pl.ds(blk * r_blk, r_blk), :, :] = \
            y.transpose(0, 2, 1).astype(out_ref.dtype)


def _kernel_v2(xp_ref, w_ref, b_ref, out_ref, *, seg, r_blk, wo, out_ch):
    """2D-matmul variant: patches [R*Wo, 9*4C] @ weights [9*4C, 4O].

    One large matmul per row block (M=R*Wo) instead of an R-batched small
    one — M large enough for Mosaic to spread passes across the MXUs.
    Patches build: per tap (a, bb), transpose the [4C, R, Wo] slab to
    [R, Wo, 4C] and concatenate on the minor dim (both probed-supported);
    the (R, Wo) -> R*Wo sublane merge and its inverse split are legal
    because the minor dim stays put. NHWC output, no epilogue transposes.
    """
    for blk in range(seg // r_blk):
        start = pl.program_id(1) * seg + blk * r_blk
        xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]  # [4C, R+2, Wo+2]
        groups = []
        for a in range(3):
            for bb in range(3):
                slab = xslab[:, a:a + r_blk, bb:bb + wo]  # [4C, R, Wo]
                groups.append(slab.transpose(1, 2, 0))    # [R, Wo, 4C]
        p = jnp.concatenate(groups, axis=-1)              # [R, Wo, 9*4C]
        p = p.reshape(r_blk * wo, p.shape[-1])
        acc = jax.lax.dot_general(
            p, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [R*Wo, 4O]
        m = jnp.maximum(
            jnp.maximum(acc[:, 0 * out_ch:1 * out_ch], acc[:, 1 * out_ch:2 * out_ch]),
            jnp.maximum(acc[:, 2 * out_ch:3 * out_ch], acc[:, 3 * out_ch:4 * out_ch]))
        m = jnp.maximum(m + b_ref[:].astype(jnp.float32), 0.0)
        out_ref[0, pl.ds(blk * r_blk, r_blk), :, :] = \
            m.astype(out_ref.dtype).reshape(r_blk, wo, out_ch)


def _kernel_wide(xp_ref, w_ref, b_ref, out_ref, *, r_blk, wo, wo_pad, out_ch):
    """Lane-aligned 2D-matmul variant ('2dw'): one [4O,108]@[108,R*wo_pad] dot.

    Rows are padded to wo_pad (a multiple of 128), which makes the
    [108, R, wo_pad] -> [108, R*wo_pad] lane merge and its inverse legal in
    Mosaic (unaligned merges are unsupported shape casts). The 12.5% junk
    columns at wo..wo_pad are sliced off at the store.
    """
    start = pl.program_id(1) * r_blk
    xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]      # [4C, R+2, wo_pad+2]
    views = [xslab[:, a:a + r_blk, bb:bb + wo_pad]
             for a in range(3) for bb in range(3)]
    p = jnp.concatenate(views, axis=0)                    # [9*4C, R, wo_pad]
    p = p.reshape(p.shape[0], r_blk * wo_pad)
    acc = jax.lax.dot_general(
        w_ref[:], p, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [4O, R*wo_pad]
    m = jnp.maximum(
        jnp.maximum(acc[0 * out_ch:1 * out_ch], acc[1 * out_ch:2 * out_ch]),
        jnp.maximum(acc[2 * out_ch:3 * out_ch], acc[3 * out_ch:4 * out_ch]))
    m = jnp.maximum(m + b_ref[:].astype(jnp.float32), 0.0)
    m = m.astype(out_ref.dtype).reshape(out_ch, r_blk, wo_pad)
    out_ref[0, :, :, :] = m.transpose(1, 2, 0)[:, :wo, :]


def _pick_blocking(ho: int, wo: int, itemsize: int = 2) -> tuple[int, int] | None:
    """(segments, rows-per-block) for the row grid.

    Row-block starts must be multiples of 8 (Mosaic dynamic sublane-slice
    constraint), so r_blk ∈ {16, 8}; segments are the largest r_blk multiple
    dividing ho that keeps the output block under ~2MB VMEM.
    """
    r_blk = 16 if ho % 16 == 0 else (8 if ho % 8 == 0 else None)
    if r_blk is None:
        return None
    # one out row: wo sublanes x padded-O lanes
    row_bytes = max(wo, 8) * 128 * itemsize
    seg = r_blk
    for m in range(ho // r_blk, 0, -1):
        if ho % (m * r_blk) == 0 and m * r_blk * row_bytes <= 2 ** 21:
            seg = m * r_blk
            break
    return ho // seg, r_blk


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def _conv0_pallas(x, w, b, variant: str = "bdot", interpret: bool = False):
    batch, h, _, c = x.shape
    out_ch = w.shape[-1]
    ho, wo = h // 2, x.shape[2] // 2
    n_seg, r_blk = _pick_blocking(ho, wo, jnp.dtype(x.dtype).itemsize)
    wo_pad = -(-wo // 128) * 128
    if variant == "2d":
        # VMEM: M=R*Wo patches + f32 accumulator; one block per grid step
        # (larger unrolled multi-block bodies OOM-kill the Mosaic compiler)
        r_blk = 8 if ho % 8 == 0 else r_blk
        n_seg = ho // r_blk
    elif variant == "2dw":
        n_seg = ho // r_blk  # one row block per grid step
    seg = ho // n_seg

    xp = _pack_planar_s2d(x, wo_pad if variant == "2dw" else None)
    w4 = _pack_w4(w).astype(x.dtype)                  # [9*4C, 4O]

    nhwc_out = variant not in ("bdot_planar", "bdot_planar_raw")
    if nhwc_out:
        out_shape = jax.ShapeDtypeStruct((batch, ho, wo, out_ch), x.dtype)
        out_spec = pl.BlockSpec((1, seg, wo, out_ch), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((batch, out_ch, ho, wo), x.dtype)
        out_spec = pl.BlockSpec((1, out_ch, seg, wo), lambda i, j: (i, 0, j, 0),
                                memory_space=pltpu.VMEM)

    if variant == "2d":
        kernel = functools.partial(_kernel_v2, seg=seg, r_blk=r_blk, wo=wo,
                                   out_ch=out_ch)
        w_arg = w4                                    # [108, 4O]
        b_arg = b[None, :].astype(x.dtype)            # [1, O]
    elif variant == "2dw":
        kernel = functools.partial(_kernel_wide, r_blk=r_blk, wo=wo,
                                   wo_pad=wo_pad, out_ch=out_ch)
        w_arg = w4.T                                  # [4O, 108]
        b_arg = b[:, None].astype(x.dtype)            # [O, 1]
    else:
        kernel = functools.partial(_kernel, seg=seg, r_blk=r_blk, wo=wo,
                                   out_ch=out_ch, nhwc_out=nhwc_out)
        w_arg = w4.T                                  # [4O, 108]
        b_arg = b[:, None].astype(x.dtype)            # [O, 1]

    flops = 2 * batch * ho * wo * (9 * 4 * c) * (4 * out_ch)
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_seg),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + batch * ho * wo * out_ch * x.dtype.itemsize,
            transcendentals=0),
        # the '2d' variant's patch build pads its 4C-lane groups to 128 lanes;
        # the default 16M scoped-vmem budget is too tight for that at 224-wide
        # rows (v5e has headroom above it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_arg, b_arg)
    if not nhwc_out and variant != "bdot_planar_raw":
        out = out.transpose(0, 2, 3, 1)
    return out  # bdot_planar_raw: [B, O, Ho, Wo] for planar-consuming stages


@functools.partial(jax.jit, static_argnames=("interpret", "s_x"))
def _conv0_pallas_i8(x, w, b, interpret: bool = False, s_x=None):
    """int8-PTQ stage 1: quantize image + s2d-rewritten weights, run the
    int8 fused kernel. ``w``/``b`` are the BN-folded weights (any float
    dtype); output is x.dtype NHWC like the bf16 variant. ``s_x``: static
    calibrated activation scale — Python float (per-tensor) or length-C
    tuple (per-input-channel, folded into the weights) — an XLA constant:
    the quantize drops its global-amax reduction and results become
    independent of batch composition; None = dynamic per-batch amax.
    """
    batch, h, _, c = x.shape
    out_ch = w.shape[-1]
    ho, wo = h // 2, x.shape[2] // 2
    # block by the OUTPUT row size — the out block is x.dtype (bf16), not
    # int8; undersizing here unrolls more blocks per body than any measured
    # config (Mosaic-compiler OOM territory, see module notes)
    n_seg, r_blk = _pick_blocking(ho, wo, jnp.dtype(x.dtype).itemsize)
    seg = ho // n_seg

    w32 = w.astype(jnp.float32)
    if isinstance(s_x, tuple):
        # per-input-channel static scales: quantize x per channel, fold the
        # channel scales into the weights before weight quantization (the
        # dot stays plain int8xint8; dequant by s_w alone — models/vgg.py)
        s_c = jnp.asarray(s_x, jnp.float32)           # [C] quant scales
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                       -127, 127).astype(jnp.int8)
        w32 = w32 * s_c[None, None, :, None]
        s_out = 1.0
    else:
        if s_x is None:
            # dynamic per-batch activation scale (normalized images are
            # bounded, but the dynamic amax also serves arbitrary inputs
            # without clipping)
            s_x = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32),
                              1e-12) / 127.0
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)
        s_out = s_x
    xp = _pack_planar_s2d(x_q)                        # int8 planes

    w4 = _pack_w4(w32)                                # [108, 4O] fp32
    # per-output-channel scales; each channel's 4 phase columns contain the
    # same weight values, so one scale per o is exact for all phases
    s_w = jnp.maximum(jnp.max(jnp.abs(w4[:, :out_ch]), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w4 / jnp.tile(s_w, 4)), -127, 127).astype(jnp.int8)
    scale = (s_out * s_w)[:, None]                    # [O, 1] fp32
    b_arg = b.astype(jnp.float32)[:, None]            # [O, 1]

    kernel = functools.partial(_kernel_i8, seg=seg, r_blk=r_blk, wo=wo,
                               out_ch=out_ch)
    out = pl.pallas_call(
        kernel,
        grid=(batch, n_seg),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * out_ch, w4.shape[0]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, seg, wo, out_ch), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, ho, wo, out_ch), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_q.T, scale, b_arg)
    return out


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


@functools.lru_cache()
def _partitioned_conv0(variant: str, interpret: bool, s_x=None):
    """GSPMD-aware wrapper: shard over batch, never gather around the kernel.

    ``pl.pallas_call`` has no SPMD partitioning rule, so under a jit-GSPMD
    mesh (parallel/mesh.py DP) the compiler would otherwise replicate the
    op — an all-gather of the conv input. custom_partitioning declares the
    op batch-parallel: per-device lowering on the local batch shard, weights
    replicated. Both the legacy (partition/infer) and Shardy (sharding_rule)
    protocols are provided; every non-batch factor needs replication (rows
    have conv halos, channels feed the phase-max grouping).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    def call(x, w, b):
        if variant == "i8":
            return _conv0_pallas_i8(x, w, b, interpret=interpret, s_x=s_x)
        return _conv0_pallas(x, w, b, variant=variant, interpret=interpret)

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
        # batch (and out-channel: each output channel is an independent
        # phase-max group) partition cleanly; this framework never shards
        # the spatial dims (h/w halos would need a halo exchange)
        sharding_rule="b i j c, k l c o, o -> b m n o")
    return fn


def conv0_bn_relu_pool(x, w, b, *, force: str | None = None,
                       variant: str = "bdot", int8: bool = False,
                       s_x: float | tuple | None = None):
    """Stage-1 VGG block: conv3x3(pad1) + (folded-BN) bias + ReLU + maxpool2x2.

    x [B, H, W, C], w [3, 3, C, O], b [O] -> [B, H/2, W/2, O]. BN must already
    be folded into (w, b). Uses the fused Pallas kernel on TPU, the identical
    XLA expression elsewhere/on unsupported shapes. ``force`` ('pallas' |
    'xla') overrides for tests/benchmarks; off-TPU, forced pallas runs in
    interpreter mode. ``variant``: 'bdot' (the default: R-batched dots,
    NHWC epilogue) | '2d' (one large matmul per row block) | 'bdot_planar' |
    'bdot_planar_raw' | '2dw' (kept for A/B — all measured slower, see
    BASELINE.md). ``s_x``: static calibrated activation scale for the int8
    path (Python float per-tensor, length-C tuple per-input-channel; None =
    dynamic per-batch amax).
    """
    import os
    b_, h, wd, c = x.shape
    # VQA_CONV0_FORCE=pallas|xla: trace-time override for paths that call
    # through the model (no force kwarg) — used by dryrun_multichip to
    # exercise the custom-partitioned kernel (interpret mode) on a CPU mesh
    force = force or os.environ.get("VQA_CONV0_FORCE") or None
    supported = (w.shape[:2] == (3, 3) and h % 2 == 0 and wd % 2 == 0
                 and _pick_blocking(h // 2, wd // 2) is not None)
    if force == "xla" or (force != "pallas" and not (supported and _on_tpu())):
        # int8 requests keep int8 numerics on the fallback path too, so the
        # same --int8_backbone config computes the same values on every
        # platform (feature caches built off-TPU stay valid on-TPU)
        return _xla_reference_i8(x, w, b, s_x=s_x) if int8 \
            else _xla_reference(x, w, b)
    if not supported:
        raise ValueError(f"unsupported stage-1 shape: x{x.shape} w{w.shape}")
    if int8:
        variant = "i8"  # int8-PTQ kernel (--int8_backbone; see _kernel_i8)
    return _partitioned_conv0(variant, not _on_tpu(), s_x)(x, w, b)
