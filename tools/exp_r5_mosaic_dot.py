"""r5 probe: Mosaic in-kernel int8 dot rate vs contraction depth K.

Times a Pallas kernel that issues ONLY dots from VMEM-resident operands
(one slab load per grid row, epilogue = single row store) at the hpack
kernel's M=[R=16 x W=224] and N=128, sweeping K and dtype. This isolates
the MXU issue rate from slicing/epilogue/DMA — the number the quad-pack
(K=256) decision needs: does int8 double past K>=256, and what does
K=128 really sustain?

Run on the real chip: python tools/exp_r5_mosaic_dot.py
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

R = 16      # rows per dot (hpack r_blk)
W = 224     # dot M = R*W rows
N = 128     # out channels
GRID = 700  # grid steps (~ hpack's 160*7 at b160)
NDOTS = 12  # dots per grid step (hpack 'split' issues 12)


def _kernel(x_ref, w_ref, o_ref, *, k, ndots, acct):
    acc = None
    for i in range(ndots):
        d = jax.lax.dot_general(x_ref[0], w_ref[i],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=acct)
        acc = d if acc is None else acc + d
    # store one row: negligible DMA, keeps the dots alive
    o_ref[0] = acc[:1, :, :].astype(o_ref.dtype)


def rate(k, dtype, acct, ndots=NDOTS, iters=5):
    x = (jnp.ones((GRID, R, W, k)) * 2).astype(dtype)
    w = (jnp.ones((ndots, k, N)) * 2).astype(dtype)

    f = pl.pallas_call(
        functools.partial(_kernel, k=k, ndots=ndots, acct=acct),
        grid=(GRID,),
        in_specs=[pl.BlockSpec((1, R, W, k), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, W, N), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, 1, W, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jf = jax.jit(lambda x, w: f(x, w).sum())
    float(jf(x, w))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        v = jf(x, w)
    float(v)
    dt = (time.perf_counter() - t0) / iters
    flops = 2.0 * GRID * ndots * R * W * k * N
    hbm = GRID * R * W * k  # int8 input bytes per pass
    return flops / dt / 1e12, hbm / dt / 1e9, dt * 1e3


def main():
    print(f"# Mosaic in-kernel dot rate, M={R}x{W}, N={N}, grid={GRID}",
          flush=True)
    for dtype, acct, label in ((jnp.int8, jnp.int32, "s8 "),
                               (jnp.bfloat16, jnp.float32, "bf16")):
        for k, nd in ((128, 12), (256, 6), (512, 3)):
            tf, gb, ms = rate(k, dtype, acct, ndots=nd)
            print(f"{label} K={k:4} ndots={nd:2}  {tf:6.1f} TF/s  "
                  f"(input {gb:5.1f} GB/s, {ms:6.2f} ms/pass)", flush=True)


if __name__ == "__main__":
    main()
