"""r5 probe: conv0 formulations — spend (or close) the last profiled headroom.

The r5 device profile (BASELINE.md) has the conv0 Pallas kernel
(`ops/conv_stem._conv0_i8_packed`) at 6.63 ms. Its structural dot volume is
444 GF (the s2d rewrite burns 4x the useful 111 GF: each phase group
contracts all 108 s2d taps, 27 nonzero), so at the ~125 TF/s Mosaic
in-kernel dot wall (tools/exp_r5_dotrate.py) its dot floor is ~3.6 ms —
the remaining ~3 ms is epilogue, prime suspect the lane-moving
``q.transpose(0, 2, 1)`` (r2 Mosaic notes: lane-moving relayouts are
10-40x slower than sublane ops).

Variants (all consume the step's real input [B, 448, 448, 3] bf16 and emit
the identical H-pair-packed int8 conv1 handoff [B, 112, 224, 128]; bit-exact
vs the shipped kernel is asserted in EXP_CHECK=1 mode):

  v0_pallas      the shipped kernel (isolated re-measure)
  v1_planar      Pallas kernel minus the lane transpose + pack: quantized
                 epilogue stores PLANAR int8 via the cheap (1,0,2) sublane
                 transpose; XLA finishes with relayout + pair-pack
  v2_xla1        ONE XLA int8 conv on the s2d input (K=108, O=256, the
                 s2d-rewritten kernel verbatim) -> 4-group max -> epilogue
                 -> pack, all XLA
  v3_xla4        FOUR XLA int8 convs (K=108, O=64 each, one per pool phase)
                 with the full epilogue incl. handoff-quantize fused into
                 each conv (monotone, so max commutes), then int8 max + pack

CPU numerics check:  EXP_CHECK=1 python tools/exp_r5_conv0.py
TPU timing:          python tools/exp_r5_conv0.py   [BENCH_BATCH=160]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vqa_tpu.compile_cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402

if os.environ.get("EXP_CHECK", "0") == "1":
    # CPU numerics mode — must override the machine's axon default BOTH
    # ways (CLAUDE.md environment gotchas)
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vqa_tpu.models.vgg import _space_to_depth_kernel  # noqa: E402
from vqa_tpu.ops import conv_stage1 as cs1  # noqa: E402
from vqa_tpu.ops import conv_stem as stem  # noqa: E402

CHECK = os.environ.get("EXP_CHECK", "0") == "1"
B = int(os.environ.get("BENCH_BATCH", 160)) if not CHECK else 2
H = 448 if not CHECK else 32
ITERS = 10


def _quant_inputs(x, w, b, s_x, s1):
    """The shipped kernel's exact prologue: folded/quantized x, w, scales."""
    out_ch = w.shape[-1]
    s_c = jnp.asarray(s_x, jnp.float32)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                   -127, 127).astype(jnp.int8)
    w32 = w.astype(jnp.float32) * s_c[None, None, :, None]
    w4 = _space_to_depth_kernel(w32)                  # [3, 3, 4C, 4O]
    flat = w4.reshape(-1, 4 * out_ch)
    s_w = jnp.maximum(jnp.max(jnp.abs(flat[:, :out_ch]), axis=0),
                      1e-12) / 127.0
    w_q4 = jnp.clip(jnp.round(w4 / jnp.tile(s_w, 4)),
                    -127, 127).astype(jnp.int8)       # [3, 3, 4C, 4O] int8
    inv_s1 = 1.0 / jnp.asarray(s1, jnp.float32)
    return x_q, w_q4, s_w, b.astype(jnp.float32), inv_s1


def _s2d_nhwc(x_q):
    b_, h, w, c = x_q.shape
    x4 = x_q.reshape(b_, h // 2, 2, w // 2, 2, c)
    x4 = x4.transpose(0, 1, 3, 2, 4, 5)
    return x4.reshape(b_, h // 2, w // 2, 4 * c)


def _pair_pack(q8):
    """[B, Ho, Wo, O] int8 -> [B, Ho/2, Wo, 2O]; ch = r*O + c (kernel layout)."""
    b_, ho, wo, o = q8.shape
    return (q8.reshape(b_, ho // 2, 2, wo, o).transpose(0, 1, 3, 2, 4)
            .reshape(b_, ho // 2, wo, 2 * o))


# ---------------------------------------------------------------- v2 / v3

@functools.partial(jax.jit, static_argnames=("s_x", "s1"))
def v2_xla1(x, w, b, s_x, s1):
    x_q, w_q4, s_w, b32, inv_s1 = _quant_inputs(x, w, b, s_x, s1)
    out_ch = w.shape[-1]
    x4 = _s2d_nhwc(x_q)
    acc = jax.lax.conv_general_dilated(
        x4, w_q4, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)             # [B, Ho, Wo, 4O]
    sh = acc.shape
    m = acc.reshape(sh[:3] + (4, out_ch)).max(axis=3)
    y = jnp.maximum(m.astype(jnp.float32) * s_w + b32, 0.0)
    q = jnp.clip(jnp.round(y * inv_s1), -127, 127).astype(jnp.int8)
    return _pair_pack(q)


@functools.partial(jax.jit, static_argnames=("s_x", "s1"))
def v3_xla4(x, w, b, s_x, s1):
    x_q, w_q4, s_w, b32, inv_s1 = _quant_inputs(x, w, b, s_x, s1)
    out_ch = w.shape[-1]
    x4 = _s2d_nhwc(x_q)

    def phase(p):
        acc = jax.lax.conv_general_dilated(
            x4, w_q4[..., p * out_ch:(p + 1) * out_ch], (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * s_w + b32, 0.0)
        # round/clip are monotone nondecreasing, so per-phase quantize
        # commutes with the phase max (same argument as conv_stem)
        return jnp.clip(jnp.round(y * inv_s1), -127, 127).astype(jnp.int8)

    m = jnp.maximum(jnp.maximum(phase(0), phase(1)),
                    jnp.maximum(phase(2), phase(3)))
    return _pair_pack(m)


# ---------------------------------------------------------------- v1

def _kernel_conv0_planar(xp_ref, w_ref, scale_ref, inv_s1_ref, b_ref,
                         out_ref, *, seg, r_blk, wo, out_ch):
    """The shipped _kernel_conv0_packed minus the lane-moving epilogue:
    quantize while O is on sublanes, store planar [O, R, Wo] via the
    sublane-only (1, 0, 2) transpose."""
    for blk in range(seg // r_blk):
        start = pl.program_id(1) * seg + blk * r_blk
        xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]
        views = [xslab[:, a:a + r_blk, bb:bb + wo]
                 for a in range(3) for bb in range(3)]
        p = jnp.concatenate(views, axis=0).transpose(1, 0, 2)
        w_b = jnp.broadcast_to(w_ref[:][None], (r_blk,) + w_ref.shape)
        acc = jax.lax.dot_general(
            w_b, p, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        m = jnp.maximum(
            jnp.maximum(acc[:, 0 * out_ch:1 * out_ch],
                        acc[:, 1 * out_ch:2 * out_ch]),
            jnp.maximum(acc[:, 2 * out_ch:3 * out_ch],
                        acc[:, 3 * out_ch:4 * out_ch]))
        y = m.astype(jnp.float32) * scale_ref[:][None]
        y = jnp.maximum(y + b_ref[:][None], 0.0)
        q = jnp.clip(jnp.round(y * inv_s1_ref[:][None]), -127, 127)
        out_ref[0, :, pl.ds(blk * r_blk, r_blk), :] = \
            q.transpose(1, 0, 2).astype(jnp.int8)     # [O, R, Wo] sublane-only

@functools.partial(jax.jit, static_argnames=("s_x", "s1", "interpret"))
def v1_planar(x, w, b, s_x, s1, interpret: bool = False):
    batch, h, _, c = x.shape
    out_ch = w.shape[-1]
    ho, wo = h // 2, x.shape[2] // 2
    n_seg, r_blk = cs1._pick_blocking(ho, wo, 1)
    seg = ho // n_seg

    x_q, w_q4, s_w, b32, inv_s1 = _quant_inputs(x, w, b, s_x, s1)
    xp = cs1._pack_planar_s2d(x_q)
    w_q = w_q4.reshape(-1, 4 * out_ch)                # [108, 4O]
    scale = s_w[:, None]
    b_arg = b32[:, None]
    inv_arg = inv_s1[:, None]

    kernel = functools.partial(_kernel_conv0_planar, seg=seg, r_blk=r_blk,
                               wo=wo, out_ch=out_ch)
    planar = pl.pallas_call(
        kernel,
        grid=(batch, n_seg),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * out_ch, w_q.shape[0]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(inv_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_ch, seg, wo),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, out_ch, ho, wo), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_q.T, scale, inv_arg, b_arg)
    q = planar.transpose(0, 2, 3, 1)                  # XLA relayout -> NHWC
    return _pair_pack(q)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, H, H, 3), jnp.float32) * 0.8
    x = x.astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 64),
                          jnp.float32) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(2), (64,), jnp.float32) * 0.1
    s_x = tuple([0.02, 0.025, 0.015])
    s1 = tuple([0.03] * 64)

    interp = not cs1._on_tpu()
    v0 = lambda: stem._conv0_i8_packed(x, w, b, s_x, s1, interpret=interp)
    v1 = lambda: v1_planar(x, w, b, s_x, s1, interpret=interp)
    # v2 runs LAST: its [B, 224, 224, 256] int32 conv output is 8.2 GB at
    # b160 and may OOM the 16 GB chip — an OOM can wedge the tunnel, so it
    # must not shadow the other variants' timings
    variants = {"v0_pallas (ships)": v0, "v1_planar+xla_pack": v1,
                "v3_xla4 (K=108,O=64 x4)": lambda: v3_xla4(x, w, b, s_x, s1),
                "v2_xla1 (K=108,O=256)": lambda: v2_xla1(x, w, b, s_x, s1)}

    if CHECK:
        import numpy as np
        ref = np.asarray(v0())
        for name, fn in variants.items():
            got = np.asarray(fn())
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            np.testing.assert_array_equal(got, ref, err_msg=name)
            print(f"{name:26} bit-exact OK {got.shape}")
        return

    only = os.environ.get("EXP_ONLY")
    for name, fn in variants.items():
        if only and only not in name:
            continue
        try:
            out = fn()
            float(jnp.asarray(out).astype(jnp.float32).ravel()[0])  # sync
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn()
            float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{name:26} {ms:7.2f} ms", flush=True)
        except Exception as e:  # e.g. v2's 8 GB int32 materialization OOMs
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"{name:26} FAILED: {msg}", flush=True)
        out = None  # release the device buffer before the next variant


if __name__ == "__main__":
    main()
