"""A/B the fused stage-1 kernel's epilogue/output-layout variants on TPU.

The bdot kernel spends ~6ms of its 18.4ms in the NHWC epilogue transpose
([R, 4O, Wo] -> [R, Wo, O] is a lane-moving relayout). Candidates:

- 'bdot'         : NHWC store in-kernel (the current default)
- 'bdot_planar'  : planar [B, O, Ho, Wo] store (leading-dim transpose only)
                   + XLA transpose back to NHWC outside the kernel
- 'bdot_planar_raw': planar store, NO transpose back — measures the kernel
                   floor if the consumer took planar input directly
- XLA reference  : the original conv+pool for scale

Run: python tools/exp_conv0.py  [BENCH_BATCH=160 BENCH_STEPS=10]
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from vqa_tpu.ops import conv_stage1 as cs

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
DTYPE = jnp.bfloat16


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 448, 448, 3), DTYPE)
    w = jax.random.normal(key, (3, 3, 3, 64), DTYPE) * 0.1
    b = jnp.zeros((64,), DTYPE)

    ref = jax.jit(cs._xla_reference)
    y_ref = ref(x, w, b)
    rows = [("xla_ref", timeit(ref, x, w, b))]

    for variant in ("bdot", "bdot_planar"):
        f = jax.jit(functools.partial(cs._conv0_pallas, variant=variant))
        y = f(x, w, b)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) -
                                    y_ref.astype(jnp.float32))))
        rows.append((variant, timeit(f, x, w, b)))
        print(json.dumps({"variant": variant, "max_err": err}), flush=True)

    # planar floor: skip the final transpose-back (not numerics-comparable
    # shape-wise; measures what a planar-consuming stage 2 would see)
    def planar_no_tb(x, w, b):
        # identical call path but keep planar output
        batch, h, _, c = x.shape
        out_ch = w.shape[-1]
        ho, wo = h // 2, x.shape[2] // 2
        n_seg, r_blk = cs._pick_blocking(ho, wo)
        seg = ho // n_seg
        xp = cs._pack_planar_s2d(x)
        w4 = cs._pack_w4(w).astype(x.dtype)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        kernel = functools.partial(cs._kernel, seg=seg, r_blk=r_blk, wo=wo,
                                   out_ch=out_ch, nhwc_out=False)
        out = pl.pallas_call(
            kernel,
            grid=(batch, n_seg),
            in_specs=[
                pl.BlockSpec((1,) + xp.shape[1:], lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w4.T).shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_ch, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, out_ch, seg, wo),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, out_ch, ho, wo), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, w4.T, b[:, None].astype(x.dtype))
        return out

    f = jax.jit(planar_no_tb)
    rows.append(("bdot_planar_raw", timeit(f, x, w, b)))

    # pack-only and pack+patchless matmul floor for reference
    packf = jax.jit(cs._pack_planar_s2d)
    rows.append(("pack_only", timeit(packf, x)))

    for name, ms in rows:
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
