"""r5 probe: deepen the hpack kernel's contraction (12xK=128 -> 4xK=384).

The r5 device profile (BASELINE.md) shows the conv1 hpack kernel at
11.68 ms / 101 TF/s effective while the int8-XLA chains in the same step
sustain 334-364 TF/s. Those chains contract K = 9C >= 1152; the hpack
'split' variant issues 12 int8 dots of K = 2C = 128. Hypothesis: shallow-K
int8 dots can't sustain the 2x int8 MXU rate (the doubling comes from
feeding 2 K-elements per cycle), so the kernel is dot-ISSUE-bound, not
overhead-bound.

Variant 'kdeep': per (offset, phase) pair, stack the 3 dw tap slices on a
new axis above lanes and lane-merge-reshape to [R, W, 3*2C] (minor dim 128
stays intact -> legal Mosaic reshape), then ONE dot of K=384 against the
dw-stacked weights [384, O]. Same FLOPs (1.33x structural inflation), 3x
fewer, 3x deeper dots.

Controls: each variant also runs with the dequant epilogue removed
(raw int8 cast of the accumulator) to split dot cost from epilogue cost.

CPU numerics check:  EXP_CHECK=1 python tools/exp_r5_kdepth.py
TPU timing:          python tools/exp_r5_kdepth.py  [BENCH_BATCH=160]
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
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from vqa_tpu.ops.conv_hpack import (_conv_hpack, _pack_h_pairs,  # noqa: E402
                                    _pack_weights, _pick_r_blk,
                                    _xla_reference_i8)

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
CHECK = os.environ.get("EXP_CHECK") == "1"


def timeit(f, *args):
    out = f(*args)
    jnp.asarray(out).block_until_ready()
    float(jnp.asarray(out).astype(jnp.float32).ravel()[0])  # tunnel barrier
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    float(jnp.asarray(out).astype(jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def _pack_weights_kdeep(w_q, dtype):
    """[3,3,C,O] -> [4, 3*2C, O]: per (offset,phase) pair the 3 dw blocks
    of the 'split' packing stacked on K (dw-major, matching the kernel's
    [R, W, 3, 2C] -> [R, W, 3*2C] reshape order)."""
    split = _pack_weights(w_q, dtype, "split")  # [12, 2C, O]
    c2, o = split.shape[1], split.shape[2]
    return split.reshape(4, 3 * c2, o)


def _kernel_kdeep(xp_ref, w_ref, sc_ref, b_ref, *rest, r_blk, w_img,
                  quant_out, dequant=True):
    out_ref = rest[-1]
    inv_next_ref = rest[0] if quant_out else None
    start = pl.program_id(1) * r_blk
    out_ch = out_ref.shape[-1]
    accs = [None, None]
    for i, (off, p) in enumerate(((0, 0), (1, 0), (1, 1), (2, 1))):
        slab = xp_ref[0, pl.ds(start + off, r_blk), :, :]      # [R, W+2, 2C]
        stk = jnp.stack([slab[:, dw:dw + w_img, :] for dw in range(3)],
                        axis=2)                                 # [R, W, 3, 2C]
        stk = stk.reshape(r_blk, w_img, 3 * slab.shape[-1])     # [R, W, 3*2C]
        d = jax.lax.dot_general(stk, w_ref[i],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        accs[p] = d if accs[p] is None else accs[p] + d
    m = jnp.maximum(accs[0], accs[1])
    if not dequant:
        # W-pool on the i32 accumulator via the proven sublane-split
        # reshape (strided slices lower to >2D gathers Mosaic rejects)
        out_ref[0] = m.reshape(r_blk, w_img // 2, 2,
                               m.shape[-1]).max(axis=2).astype(out_ref.dtype)
        return
    y = m.astype(jnp.float32) * sc_ref[0][None, None]
    y = jnp.maximum(y + b_ref[0][None, None], 0.0)
    y = y.reshape(r_blk, w_img // 2, 2, out_ch).max(axis=2)
    if quant_out:
        y = jnp.clip(jnp.round(y * inv_next_ref[0][None, None]), -127, 127)
    out_ref[0] = y.astype(out_ref.dtype)


def _kernel_split_nodequant(xp_ref, w_ref, sc_ref, b_ref, out_ref, *,
                            r_blk, w_img):
    start = pl.program_id(1) * r_blk
    accs = [None, None]
    for i, (off, p) in enumerate(((0, 0), (1, 0), (1, 1), (2, 1))):
        slab = xp_ref[0, pl.ds(start + off, r_blk), :, :]
        for dw in range(3):
            d = jax.lax.dot_general(slab[:, dw:dw + w_img, :],
                                    w_ref[i * 3 + dw],
                                    dimension_numbers=(((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            accs[p] = d if accs[p] is None else accs[p] + d
    m = jnp.maximum(accs[0], accs[1])
    out_ref[0] = m.reshape(r_blk, w_img // 2, 2,
                           m.shape[-1]).max(axis=2).astype(out_ref.dtype)


def run_variant(x, w, b, s_x, s_next, kind: str, interpret: bool):
    """kind: kdeep | kdeep_nodequant | split_nodequant."""
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    q = h // 2
    r_blk = _pick_r_blk(q)
    w32 = w.astype(jnp.float32)

    s_c = jnp.asarray(s_x, jnp.float32)
    x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_c),
                    -127, 127).astype(jnp.int8)
    w32 = w32 * s_c[None, None, :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    scale = s_w[None]

    if kind.startswith("kdeep"):
        w_taps = _pack_weights_kdeep(w_q, jnp.int8)
        kernel = functools.partial(
            _kernel_kdeep, r_blk=r_blk, w_img=wd,
            quant_out=(s_next is not None and kind == "kdeep"),
            dequant=(kind == "kdeep"))
    else:
        w_taps = _pack_weights(w_q, jnp.int8, "split")
        kernel = functools.partial(_kernel_split_nodequant, r_blk=r_blk,
                                   w_img=wd)

    xp = jnp.pad(_pack_h_pairs(x_in), ((0, 0), (1, 1), (1, 1), (0, 0)))
    b_arg = b.astype(jnp.float32)[None]
    args = [xp, w_taps, scale, b_arg]
    in_specs = [
        pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_taps.shape, lambda i, j: (0,) * w_taps.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_dtype = jnp.int8
    if kind == "kdeep" and s_next is not None:
        inv_next = (1.0 / jnp.asarray(s_next, jnp.float32))[None]
        args.append(inv_next)
        in_specs.append(pl.BlockSpec(inv_next.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
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


def main():
    import numpy as np

    interpret = CHECK
    if CHECK:
        jax.config.update("jax_platforms", "cpu")
        b, h, c, o = 2, 16, 64, 128
    else:
        b, h, c, o = B, 224, 64, 128
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, h, h, c), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, o),
                          jnp.float32) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (o,), jnp.float32) * 0.1
    s_x = tuple([0.02] * c)
    s_next = tuple([0.03] * o)

    if CHECK:
        ref = _conv_hpack(x, w, bias, int8=True, s_x=s_x, s_next=s_next,
                          interpret=True)
        out = run_variant(x, w, bias, s_x, s_next, "kdeep", True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
        xla = _xla_reference_i8(x, w, bias, s_x=s_x, s_next=s_next)
        np.testing.assert_array_equal(np.asarray(xla), np.asarray(out))
        print("CHECK OK: kdeep == split == int8-XLA chain (exact)")
        return

    flops = 2 * 9 * b * (h // 2) * h * (2 * c) * o / 1e9  # 1.33x-inflated GF
    variants = [
        ("split (ships, full epilogue)",
         lambda: _conv_hpack(x, w, bias, int8=True, s_x=s_x, s_next=s_next)),
        ("kdeep (full epilogue)",
         lambda: run_variant(x, w, bias, s_x, s_next, "kdeep", False)),
        ("split (dots+ipool, no dequant)",
         lambda: run_variant(x, w, bias, s_x, s_next, "split_nodequant",
                             False)),
        ("kdeep (dots+ipool, no dequant)",
         lambda: run_variant(x, w, bias, s_x, s_next, "kdeep_nodequant",
                             False)),
    ]
    for k, f in variants:
        v = timeit(f)
        print(f"{k:34} {v:7.2f} ms   ({flops / v:6.1f} eff TF/s on "
              f"{flops:.0f} GF inflated)", flush=True)


if __name__ == "__main__":
    main()
