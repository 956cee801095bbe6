"""Probe: tap-accumulation direct int8 conv for conv1 (224², 64->128).

tools/exp_i8pool.py showed the s2d patch-concat kernel LOSES at C_in>=64
(60.4ms vs 20.5 bf16 XLA on conv1): s2d inflates FLOPs 4x (each output is
computed in all 4 pool phases — only free when C_in=3 starves the MXU),
and the 9x patch materialization moves ~4.6GB per step.

This probes the remaining formulation: planar NON-s2d layout [C, H+2, W+2],
9 accumulated batched dots over statically-shifted slabs (no patch
concat), int8 x int8 -> int32, dequant+bias+relu in the epilogue, pool
left to XLA (fused into the consumer). FLOPs = the true 1.18e12 (floor
2.6ms at the 454 TF/s int8 rate); the open question is Mosaic's cost for
9 slab transposes + accumulation chains.

Run on TPU: python tools/exp_tapconv.py [BENCH_BATCH=160 BENCH_STEPS=10]
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


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def _kernel_tap(xp_ref, w_ref, sc_ref, b_ref, out_ref, *, r_blk, w_img, cin,
                cout):
    """One (sample, row-block): out rows [R, W, O] NHWC from 9 tap dots.

    xp_ref [1, C, H+2, W+2] int8 planar; w_ref [9, O, C] int8 (tap-major);
    sc_ref/b_ref [O, 1] f32. acc is a loop-carried [R, O, W] i32 the Mosaic
    compiler keeps in VMEM across the unrolled tap loop.
    """
    start = pl.program_id(1) * r_blk
    xslab = xp_ref[0, :, pl.ds(start, r_blk + 2), :]      # [C, R+2, W+2]
    acc = None
    for a in range(3):
        for bb in range(3):
            slab = xslab[:, a:a + r_blk, bb:bb + w_img]   # [C, R, W] static
            slab_t = slab.transpose(1, 0, 2)              # [R, C, W] sublane
            w_t = w_ref[a * 3 + bb]                       # [O, C]
            w_b = jnp.broadcast_to(w_t[None], (r_blk,) + w_t.shape)
            d = jax.lax.dot_general(
                w_b, slab_t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)         # [R, O, W]
            acc = d if acc is None else acc + d
    y = acc.astype(jnp.float32) * sc_ref[:][None]
    y = jnp.maximum(y + b_ref[:][None], 0.0)              # [R, O, W]
    out_ref[0, :, :, :] = y.transpose(0, 2, 1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_tap_i8(x, w, b, s_x: float = 4.0 / 127.0, interpret: bool = False):
    """x [B,H,W,C] bf16 -> relu(conv3x3+b) [B,H,W,O] bf16 (pool outside)."""
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127, 127).astype(jnp.int8)
    xp = jnp.pad(x_q.transpose(0, 3, 1, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    w32 = w.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
    w_taps = w_q.reshape(9, c, out_ch).transpose(0, 2, 1)  # [9, O, C]
    scale = (s_x * s_w)[:, None]
    b_arg = b.astype(jnp.float32)[:, None]

    r_blk = 8
    kernel = functools.partial(_kernel_tap, r_blk=r_blk, w_img=wd, cin=c,
                               cout=out_ch)
    out = pl.pallas_call(
        kernel,
        grid=(batch, h // r_blk),
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
        out_specs=pl.BlockSpec((1, r_blk, wd, out_ch),
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
        # CPU correctness check: the axon sitecustomize re-registers the TPU
        # backend even under JAX_PLATFORMS=cpu; force CPU before first use
        jax.config.update("jax_platforms", "cpu")
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (2, 16, 16, 8)))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
        b = jnp.zeros((16,))
        got = np.asarray(conv_tap_i8(x, w, b, interpret=True), np.float32)
        ref = np.asarray(ref_i8(x, w, b), np.float32)
        print("check maxdiff:", np.abs(got - ref).max(),
              "scale:", np.abs(ref).max())
        return

    print(f"devices: {jax.devices()} B={B}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.nn.relu(jax.random.normal(key, (B, H, H, CIN), jnp.bfloat16))
    w = jax.random.normal(key, (3, 3, CIN, COUT), jnp.float32) * 0.05
    b = jnp.zeros((COUT,), jnp.float32)

    def chain_bf16(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16) + b.astype(jnp.bfloat16)
        return pool(jax.nn.relu(y))

    def chain_tap(x, w, b):
        return pool(conv_tap_i8(x, w, b))

    out = {"shape": f"{H}x{H} {CIN}->{COUT}"}
    out["bf16_xla_pool_ms"] = round(timeit(jax.jit(chain_bf16), x, w, b), 2)
    try:
        out["tap_i8_pool_ms"] = round(timeit(jax.jit(chain_tap), x, w, b), 2)
        out["tap_i8_noflush_ms"] = round(timeit(
            lambda *a: conv_tap_i8(*a), x, w, b), 2)
    except Exception as e:
        out["tap_i8_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
