"""Probe: pool-fused NHWC tap conv for the C>=128 pooled stages (conv3/5/7).

The H-pair-packed kernel (tools/exp_hpack_tap.py) wins only where its
packing fixes lane fill (conv1, C_in=64). At conv3/5/7 the lanes are full
without packing, so its structured-zero FLOP inflation (2x in the merged
[2C,2O] form) just burns MXU time: measured 29.3/23.7/8.4ms vs the
17.5/12.7 int8-XLA chains / 6.1 bf16 conv7.

This formulation keeps the fused pool (the proven lever: pooled store =
4x fewer bytes, dequant+bias+ReLU per pooled element) but drops the
packing: the input reshapes [B, H, W, C] -> [B, H/2, 2, W, C] — a FREE
dim split, no transpose — so the kernel can take stride-2 row slabs off
the outer dims. Per pooled row q, output rows h = 2q+p (p = phase), taps
dh in {0,1,2} read padded input row 2q+p+dh = pair (q + (p+dh)//2,
(p+dh)%2): 18 dots of [R, W, C] @ [C, O] with K=C full lanes and ZERO
FLOP inflation (int8 floor: conv3/5 5.2ms, conv7 1.3ms), 5 distinct
slabs, phase max in registers, W-pool on the sublane dim.

Run CPU check:  EXP_CHECK=1 python tools/exp_ptap.py
Run on TPU:     EXP_H=112 EXP_CIN=256 EXP_COUT=256 python tools/exp_ptap.py
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
H = int(os.environ.get("EXP_H", 112))
CIN = int(os.environ.get("EXP_CIN", 256))
COUT = int(os.environ.get("EXP_COUT", 256))
R_BLK = int(os.environ.get("EXP_RBLK", 8))


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def _kernel(xp_ref, w_ref, sc_ref, b_ref, out_ref, *, r_blk, w_img, int8):
    """One (sample, q-block) -> pooled out [1, R, W/2, O].

    xp_ref [1, Q+2, 2, W+2, C]: padded input rows split into pairs
    (pair dim and Q are outer, untiled dims; row 2q+r sits at [q+1? no —
    padding puts original row i at pair ((i+1)//2, (i+1)%2)). w_ref
    [9, C, O] = taps[p? no — taps by (dh, dw)]. Output row h = 2q+p taps
    padded rows 2q+p+dh, i.e. pair (q + (p+dh)//2, (p+dh)%2) with the
    +1 row padding folded into the pair indexing below.
    """
    start = pl.program_id(1) * r_blk
    out_ch = out_ref.shape[-1]
    accs = [None, None]
    # 5 distinct (pair-offset, parity) slabs cover p+dh in 0..4
    slabs = {}
    for k in range(5):
        slabs[k] = xp_ref[0, pl.ds(start + k // 2, r_blk), k % 2, :, :]
    for p in range(2):
        for dh in range(3):
            slab = slabs[p + dh]                              # [R, W+2, C]
            for dw in range(3):
                d = jax.lax.dot_general(
                    slab[:, dw:dw + w_img, :], w_ref[dh * 3 + dw],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32 if int8 else jnp.float32)
                accs[p] = d if accs[p] is None else accs[p] + d
    m = jnp.maximum(accs[0], accs[1])                 # pool over H (phases)
    y = m.astype(jnp.float32) * sc_ref[0][None, None]
    y = jnp.maximum(y + b_ref[0][None, None], 0.0)
    y = y.reshape(r_blk, w_img // 2, 2, out_ch).max(axis=2)   # pool over W
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("int8", "interpret"))
def conv_ptap_pool(x, w, b, s_x: float = 4.0 / 127.0, int8: bool = True,
                   interpret: bool = False):
    """x [B,H,W,C] -> maxpool2x2(relu(conv3x3(x)+b)) [B,H/2,W/2,O]."""
    batch, h, wd, c = x.shape
    out_ch = w.shape[-1]
    w32 = w.astype(jnp.float32)
    if int8:
        x_in = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                        -127, 127).astype(jnp.int8)
        s_w = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)
        w_in = w_q.reshape(9, c, out_ch)
        scale = (s_x * s_w)[None]
    else:
        x_in = x
        w_in = w32.astype(jnp.bfloat16).reshape(9, c, out_ch)
        scale = jnp.ones((1, out_ch), jnp.float32)
    # pad H by (1, 3) so padded row i maps to pair ((i)//2, i%2) with the
    # conv's zero row at index 0 and Q+2 full pairs; pad W by (1, 1)
    xp = jnp.pad(x_in, ((0, 0), (1, 3), (1, 1), (0, 0)))
    q = h // 2
    xp = xp.reshape(batch, q + 2, 2, wd + 2, c)       # FREE split, no copy
    b_arg = b.astype(jnp.float32)[None]

    r_blk = R_BLK if q % R_BLK == 0 else q
    kernel = functools.partial(_kernel, r_blk=r_blk, w_img=wd, int8=int8)
    out = pl.pallas_call(
        kernel,
        grid=(batch, q // r_blk),
        in_specs=[
            pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_in.shape, lambda i, j: (0, 0, 0),
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
    )(xp, w_in, scale, b_arg)
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
            got = np.asarray(conv_ptap_pool(x, w, b, int8=flag,
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

    def chain_i8_xla(x, w, b):
        return ref_chain(x, w, b, int8=True)

    out = {"shape": f"{H}x{H} {CIN}->{COUT}", "r_blk": R_BLK}
    out["i8_xla_pool_ms"] = round(timeit(jax.jit(chain_i8_xla), x, w, b), 2)
    for tag, flag in (("i8", True), ("bf16", False)):
        try:
            out[f"ptap_{tag}_pool_ms"] = round(timeit(
                jax.jit(lambda x, w, b, f=flag: conv_ptap_pool(
                    x, w, b, int8=f)), x, w, b), 2)
        except Exception as e:  # Mosaic rejections are data, record them
            out[f"ptap_{tag}_error"] = str(e)[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
