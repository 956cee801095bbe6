"""Probe: amortize hpack's per-invocation cost over multi-sample blocks.

r3 VERDICT conv-push candidate (c): the stem's hpack conv1 leg runs a
(batch, q/r_blk) grid — 160 x 7 = 1120 kernel invocations at the flagship
shape. If a meaningful slice of the ~15ms-class non-dot wall is
per-invocation overhead (window setup, semaphores, prologue), processing
``b_blk`` samples per invocation divides it by b_blk while keeping the
per-step accumulator small (the failure mode of fat r_blk blocks: r_blk
112 measured slower than 16).

Times the isolated hpack-conv1-from-packed leg (the only hpack user on
the default path) for b_blk in {1, 2, 4} at r_blk 16, plus an r_blk
sweep at the best b_blk. Exactness: each variant is checked against the
b_blk=1 kernel output (same int8 math, bit-identical expected).

Run:       python tools/exp_r4_bblk.py   [BENCH_BATCH=160 EXP_H=448]
CPU check: EXP_CHECK=1 JAX_PLATFORMS=cpu python tools/exp_r4_bblk.py
"""

from __future__ import annotations

import functools
import json
import os
import time

if os.environ.get("EXP_CHECK"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ.get("EXP_CHECK"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops import conv_hpack as chp

B = int(os.environ.get("BENCH_BATCH", 160))
H = int(os.environ.get("EXP_H", 448))
ITERS = int(os.environ.get("BENCH_STEPS", 10))


def _kernel_bblk(xp_ref, w_ref, sc_ref, b_ref, out_ref, *, b_blk, r_blk,
                 w_img):
    """b_blk samples per invocation; body = conv_hpack 'split' int8 path
    with the r4 pre-dequant W-pool."""
    start = pl.program_id(1) * r_blk
    out_ch = out_ref.shape[-1]
    for s in range(b_blk):
        accs = [None, None]
        for i, (off, p) in enumerate(((0, 0), (1, 0), (1, 1), (2, 1))):
            slab = xp_ref[s, pl.ds(start + off, r_blk), :, :]
            for dw in range(3):
                d = jax.lax.dot_general(
                    slab[:, dw:dw + w_img, :], w_ref[i * 3 + dw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                accs[p] = d if accs[p] is None else accs[p] + d
        m = jnp.maximum(accs[0], accs[1])
        m = m.reshape(r_blk, w_img // 2, 2, out_ch).max(axis=2)
        y = m.astype(jnp.float32) * sc_ref[0][None, None]
        y = jnp.maximum(y + b_ref[0][None, None], 0.0)
        out_ref[s] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("b_blk", "r_blk", "interpret"))
def _hpack_bblk(xp, w_taps, scale, b_arg, b_blk: int, r_blk: int,
                interpret: bool = False):
    batch, qp2, wp2, _ = xp.shape
    q, wd = qp2 - 2, wp2 - 2
    out_ch = w_taps.shape[-1]
    kernel = functools.partial(_kernel_bblk, b_blk=b_blk, r_blk=r_blk,
                               w_img=wd)
    return pl.pallas_call(
        kernel,
        grid=(batch // b_blk, q // r_blk),
        in_specs=[
            pl.BlockSpec((b_blk,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_taps.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_blk, r_blk, wd // 2, out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, q, wd // 2, out_ch),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_taps, scale, b_arg)


def _sync(y):
    return float(jnp.asarray(y).astype(jnp.float32).reshape(-1)[0])


def main():
    check = bool(os.environ.get("EXP_CHECK"))
    interpret = check
    b, h = (4, 32) if check else (B, H)
    # packed-int8 conv1 input, as the fused stem emits it: [B, H/4, W/2, 128]
    q, wd = h // 4, h // 2
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.integers(-127, 128, (b, q, wd, 128), np.int8))
    xpp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 128)).astype(np.float32))
    s1 = tuple(float(v) for v in np.linspace(0.5, 2.0, 64))
    w32 = w * jnp.asarray(s1, jnp.float32)[None, None, :, None]
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    w_taps = chp._pack_weights(w_q, jnp.int8, "split")
    scale = s_w[None]
    b_arg = jnp.zeros((1, 128), jnp.float32)

    rows = {}
    ref = None
    for b_blk in (1, 2, 4):
        if b % b_blk:
            continue
        for r_blk in ((4,) if check else (8, 16, 28)):
            if q % r_blk:
                continue
            fn = lambda t, bb=b_blk, rb=r_blk: _hpack_bblk(
                t, w_taps, scale, b_arg, bb, rb, interpret=interpret)
            y = fn(xpp)
            _sync(y)
            if ref is None:
                ref = np.asarray(y, np.float32)
            else:
                assert np.array_equal(np.asarray(y, np.float32), ref), \
                    f"b_blk={b_blk} r_blk={r_blk} numerics diverged"
            t0 = time.perf_counter()
            for _ in range(ITERS):
                y = fn(xpp)
            _sync(y)
            rows[f"b{b_blk}_r{r_blk}"] = round(
                (time.perf_counter() - t0) / ITERS * 1e3, 2)
    print(json.dumps({"ms": rows}))


if __name__ == "__main__":
    main()
