"""Probe: H-pair-packed tap conv for conv1 (224², 64->128) + fused pool.

Fifth formulation for the conv1 block. Every prior attempt (s2d
patch-concat 60.4ms, one-hot pack, planar tap 33.4ms, NHWC tap 27.4-30.5ms
— tools/exp_nhwc_tap.py) lost to bf16 XLA's 20.5ms. The NHWC tap probe
showed int8 == bf16 time, i.e. NOT dot-bound: with C=64 the lane dim is
half-filled and Mosaic pads every slab/dot to 128 lanes.

This formulation fixes the lane fill structurally: pack H row *pairs* onto
the channel dim — x [B,224,224,64] -> P [B,112,224,128] where
P[q, w, 64r+c] = x[2q+r, w, c]. Then for each output phase p (= output row
parity, h = 2q'+p):

  p=0 taps: packed row q'-1 with weights [0; W(dh=-1)],  packed row q'
            with [W(0); W(1)]
  p=1 taps: packed row q' with [W(-1); W(0)], packed row q'+1 with [W(1); 0]

i.e. 2 packed H-taps x 3 W-taps x 2 phases = 12 dots, all K=128 (full
lanes), 1.33x FLOP inflation from the structured zero half-blocks
(1.57e12 vs the true 1.18e12): bf16 floor ~6.9ms, int8 ~3.5ms.

The 2x2 maxpool that follows conv1 fuses for free: its H-reduction is
exactly max(phase0, phase1) over the two accumulators (ReLU+bias commute
with max), and its W-reduction is a sublane-split reshape-max. Output is
the POOLED [B,112,112,128] map — half the store bytes of the unpooled
conv (0.5GB vs 2.1GB at b160).

Run CPU check:  EXP_CHECK=1 python tools/exp_hpack_tap.py
Run on TPU:     python tools/exp_hpack_tap.py  [BENCH_BATCH=160 EXP_RBLK=8]
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


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def _pack_h_pairs(x):
    """[B,H,W,C] -> [B,H/2,W,2C], pair dim minor-adjacent to C."""
    b, h, w, c = x.shape
    return (x.reshape(b, h // 2, 2, w, c)
            .transpose(0, 1, 3, 2, 4)
            .reshape(b, h // 2, w, 2 * c))


def _pack_weights(w, c, out_ch, dtype):
    """[3,3,C,O] -> [9, 2C, 2O]: one [2C, 2O] block per (q'-offset, dw).

    Offset 0 (packed row q'-1) feeds phase 0 only; offset 1 (packed q')
    feeds BOTH phases (its two [2C,O] matrices ride one dot as [2C,2O]);
    offset 2 (packed q'+1) feeds phase 1 only. Unused halves are zeros —
    the structured-zero inflation is 2x here (vs 1.33x in the 12-dot
    layout) but dot count drops 12 -> 9 and slab loads 4 -> 3.
    """
    z = jnp.zeros((c, out_ch), w.dtype)
    zz = jnp.zeros((2 * c, out_ch), w.dtype)
    taps = []
    for off in range(3):
        for dw in range(3):
            if off == 0:      # packed q'-1: p0 gets dh=-1 on r1
                blk = jnp.concatenate(
                    [jnp.concatenate([z, w[0, dw]], 0), zz], axis=1)
            elif off == 1:    # packed q': p0 [w1; w2], p1 [w0; w1]
                blk = jnp.concatenate(
                    [jnp.concatenate([w[1, dw], w[2, dw]], 0),
                     jnp.concatenate([w[0, dw], w[1, dw]], 0)], axis=1)
            else:             # packed q'+1: p1 gets dh=+1 on r0
                blk = jnp.concatenate(
                    [zz, jnp.concatenate([w[2, dw], z], 0)], axis=1)
            taps.append(blk)
    return jnp.stack(taps).astype(dtype)    # [9, 2C, 2O]


def _kernel(xp_ref, w_ref, sc_ref, b_ref, out_ref, *, r_blk, w_img, int8):
    """One (sample, q'-block): pooled out [R, W/2, O].

    xp_ref [1, Q+2, W+2, 2C] (whole padded packed sample in VMEM);
    w_ref [9, 2C, 2O] (see _pack_weights); sc_ref/b_ref [1, O]. The
    accumulator holds both output phases on the lane dim ([R, W, 2O]);
    the pool's H-reduction is the max of its two lane halves.
    """
    start = pl.program_id(1) * r_blk
    out_ch = out_ref.shape[-1]
    acc = None
    for off in range(3):
        slab = xp_ref[0, pl.ds(start + off, r_blk), :, :]     # [R,W+2,2C]
        for dw in range(3):
            d = jax.lax.dot_general(
                slab[:, dw:dw + w_img, :], w_ref[off * 3 + dw],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if int8 else jnp.float32)
            acc = d if acc is None else acc + d               # [R,W,2O]
    m = jnp.maximum(acc[..., :out_ch], acc[..., out_ch:])  # pool over H
    y = m.astype(jnp.float32) * sc_ref[0][None, None]
    y = jnp.maximum(y + b_ref[0][None, None], 0.0)
    # pool over W: [R, W, O] -> [R, W/2, 2, O] -> max over the pair dim
    y = y.reshape(r_blk, w_img // 2, 2, y.shape[-1]).max(axis=2)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("int8", "interpret"))
def conv1_hpack_pool(x, w, b, s_x: float = 4.0 / 127.0, int8: bool = True,
                     interpret: bool = False):
    """x [B,H,W,C] bf16 -> maxpool2x2(relu(conv3x3(x)+b)) [B,H/2,W/2,O]."""
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    w32 = w.astype(jnp.float32)
    if int8:
        x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                        -127, 127).astype(jnp.int8)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        w_taps = _pack_weights(w_q, c, out_ch, jnp.int8)
        scale = (s_x * s_w)[None]
    else:
        x_in = x
        w_taps = _pack_weights(w32, c, out_ch, jnp.bfloat16)
        scale = jnp.ones((1, out_ch), jnp.float32)
    xp = _pack_h_pairs(x_in)                          # [B, H/2, W, 2C]
    # pad: 1 packed row each side (phase taps q'-1..q'+1), 1 col each side
    xp = jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b_arg = b.astype(jnp.float32)[None]

    q = h // 2
    r_blk = R_BLK if q % R_BLK == 0 else q
    kernel = functools.partial(_kernel, r_blk=r_blk, w_img=wd, int8=int8)
    out = pl.pallas_call(
        kernel,
        grid=(batch, q // r_blk),
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
        out_specs=pl.BlockSpec((1, r_blk, wd // 2, out_ch),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, q, wd // 2, out_ch), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_taps, scale, b_arg)
    return out


def ref_chain(x, w, b, int8, s_x=4.0 / 127.0):
    w32 = w.astype(jnp.float32)
    if int8:
        x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                        -127, 127).astype(jnp.int8)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            x_in, w_q, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = jax.nn.relu(acc.astype(jnp.float32) * (s_x * s_w) + b)
    else:
        y = jax.nn.relu(jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w32, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    return jax.lax.reduce_window(y.astype(x.dtype), -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    import numpy as np
    if os.environ.get("EXP_CHECK"):
        jax.config.update("jax_platforms", "cpu")
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(0),
                                          (2, 16, 16, 8)))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
        b = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (16,))
        for tag, flag in (("int8", True), ("bf16", False)):
            got = np.asarray(conv1_hpack_pool(x, w, b, int8=flag,
                                              interpret=True), np.float32)
            ref = np.asarray(ref_chain(x, w, b, int8=flag), np.float32)
            print(f"{tag} check maxdiff:", np.abs(got - ref).max(),
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
        return jax.lax.reduce_window(jax.nn.relu(y), -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    out = {"shape": f"{H}x{H} {CIN}->{COUT}", "r_blk": R_BLK}
    out["bf16_xla_pool_ms"] = round(timeit(jax.jit(chain_bf16_xla), x, w, b), 2)
    for tag, flag in (("i8", True), ("bf16", False)):
        try:
            out[f"hpack_{tag}_pool_ms"] = round(timeit(
                jax.jit(lambda x, w, b, f=flag: conv1_hpack_pool(
                    x, w, b, int8=f)), x, w, b), 2)
        except Exception as e:  # Mosaic rejections are data, record them
            out[f"hpack_{tag}_error"] = str(e)[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
