"""Probe: NHWC tap-accumulation direct conv for conv1 (224², 64->128).

Fourth (and final candidate) formulation for the conv1 block that has
resisted s2d patch-concat (60.4ms), one-hot pack, and PLANAR
tap-accumulation (33.4ms vs 20.5ms bf16 XLA — tools/exp_tapconv.py). The
planar kernel lost to 9 per-tap [C,R,W]->[R,C,W] sublane transposes; this
variant keeps the tensor in NHWC so NO transpose exists anywhere:

- H is an outer (non-tiled) dim: per-tap row slices are free;
- W tap shifts (dw in {0,1,2}) are static sublane-side slices (the cheap
  relayout class per the r2 Mosaic lessons);
- each tap is a plain [R*W, C] @ [C, O] dot accumulated in i32/f32.

The known structural handicap: C_in=64 half-fills the 128-lane contraction,
capping the dot at ~50% of peak (int8 floor ~5.2ms, bf16 ~10.4ms for the
1.18e12-FLOP conv). Pool stays outside (XLA), same as the planar probe, so
numbers are comparable.

Run CPU check:  EXP_CHECK=1 python tools/exp_nhwc_tap.py
Run on TPU:     python tools/exp_nhwc_tap.py  [BENCH_BATCH=160 BENCH_STEPS=10]
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
H = int(os.environ.get("EXP_H", 224))
CIN = int(os.environ.get("EXP_CIN", 64))
COUT = int(os.environ.get("EXP_COUT", 128))
R_BLK = int(os.environ.get("EXP_RBLK", 8))
# Diagnostic: run only the first EXP_TAPS of the 9 taps (wrong numerics,
# timing only) — separates per-tap cost (slab load + dot + accumulate)
# from fixed per-block cost (store, grid, epilogue).
N_TAPS = int(os.environ.get("EXP_TAPS", 9))


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def _kernel(xp_ref, w_ref, sc_ref, b_ref, out_ref, *, r_blk, w_img, int8):
    """One (sample, row-block): out [R, W, O] from 9 accumulated NHWC dots.

    xp_ref [1, H+2, W+2, C] (whole padded sample resident in VMEM across the
    row-block grid axis); w_ref [9, C, O]; sc_ref/b_ref [1, O]."""
    start = pl.program_id(1) * r_blk
    acc = None
    for a in range(3):
        for bb in range(3):
            if a * 3 + bb >= N_TAPS:
                continue
            slab = xp_ref[0, pl.ds(start + a, r_blk), bb:bb + w_img, :]
            d = jax.lax.dot_general(
                slab, w_ref[a * 3 + bb],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            acc = d if acc is None else acc + d                  # [R, W, O]
    y = acc.astype(jnp.float32) * sc_ref[0][None, None]
    y = jnp.maximum(y + b_ref[0][None, None], 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("int8", "interpret"))
def conv_nhwc_tap(x, w, b, s_x: float = 4.0 / 127.0, int8: bool = True,
                  interpret: bool = False):
    """x [B,H,W,C] bf16 -> relu(conv3x3+b) [B,H,W,O] (pool outside)."""
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    w32 = w.astype(jnp.float32)
    if int8:
        x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                        -127, 127).astype(jnp.int8)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
        w_in = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        scale = (s_x * s_w)[None]
    else:
        x_in = x
        w_in = w32.astype(jnp.bfloat16)
        scale = jnp.ones((1, out_ch), jnp.float32)
    xp = jnp.pad(x_in, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w_taps = w_in.reshape(9, c, out_ch)
    b_arg = b.astype(jnp.float32)[None]

    kernel = functools.partial(_kernel, r_blk=R_BLK, w_img=wd, int8=int8)
    out = pl.pallas_call(
        kernel,
        grid=(batch, h // R_BLK),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_taps.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b_arg.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R_BLK, wd, out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, wd, out_ch), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_taps, scale, b_arg)
    return out


def pool(y):
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def ref_i8(x, w, b, s_x=4.0 / 127.0):
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127, 127).astype(jnp.int8)
    w32 = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return jax.nn.relu(acc.astype(jnp.float32) * (s_x * s_w)
                       + b).astype(x.dtype)


def main():
    import numpy as np
    if os.environ.get("EXP_CHECK"):
        jax.config.update("jax_platforms", "cpu")
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (2, 16, 16, 8)))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
        b = jnp.zeros((16,))
        got = np.asarray(conv_nhwc_tap(x, w, b, interpret=True), np.float32)
        ref = np.asarray(ref_i8(x, w, b), np.float32)
        print("int8 check maxdiff:", np.abs(got - ref).max(),
              "scale:", np.abs(ref).max())
        got = np.asarray(conv_nhwc_tap(x, w, b, int8=False, interpret=True),
                         np.float32)
        ref = np.asarray(jax.nn.relu(jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b), np.float32)
        print("bf16 check maxdiff:", np.abs(got - ref).max(),
              "scale:", np.abs(ref).max())
        return

    print(f"devices: {jax.devices()} B={B} r_blk={R_BLK}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.nn.relu(jax.random.normal(key, (B, H, H, CIN), jnp.bfloat16))
    w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.float32) * 0.05
    b = jnp.zeros((COUT,), jnp.float32)

    def chain_bf16_xla(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
        return pool(jax.nn.relu(y))

    out = {"shape": f"{H}x{H} {CIN}->{COUT}", "r_blk": R_BLK}
    out["bf16_xla_pool_ms"] = round(timeit(jax.jit(chain_bf16_xla), x, w, b), 2)
    for tag, flag in (("i8", True), ("bf16", False)):
        try:
            out[f"tap_{tag}_pool_ms"] = round(timeit(
                jax.jit(lambda x, w, b, f=flag: pool(
                    conv_nhwc_tap(x, w, b, int8=f))), x, w, b), 2)
            out[f"tap_{tag}_nopool_ms"] = round(timeit(
                jax.jit(lambda x, w, b, f=flag: conv_nhwc_tap(
                    x, w, b, int8=f)), x, w, b), 2)
        except Exception as e:  # Mosaic rejections are data, record them
            out[f"tap_{tag}_error"] = str(e)[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
