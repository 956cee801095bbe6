"""Measure: can conv1 consume the stage-1 kernel's planar output directly?

The bdot_planar stage-1 variant stores [B, 64, 224, 224] (no lane-moving
epilogue, 14.5ms vs 19.7 for the NHWC store) but the stack then pays ~4.2ms
to transpose back to NHWC. ``lax.conv_general_dilated`` accepts mixed
dimension numbers — ("NCHW", "HWIO", "NHWC") lets conv1 absorb the layout
change into its input read. This times the three stage-1 -> conv1 handoffs:

  a) NHWC store in kernel            + conv1 NHWC->NHWC   (current default)
  b) planar store + XLA transpose    + conv1 NHWC->NHWC   (bdot_planar today)
  c) planar store (raw)              + conv1 NCHW->NHWC   (fused handoff)

Each is one jit end-to-end: x [B,448,448,3] -> stage1 -> conv1+bias+relu+pool
-> [B,112,112,128]. Run: python tools/exp_planar.py
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


def conv1(y, w1, b1, in_layout: str):
    out = jax.lax.conv_general_dilated(
        y, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=(in_layout, "HWIO", "NHWC"),
        preferred_element_type=DTYPE)
    out = jax.nn.relu(out + b1)
    return jax.lax.reduce_window(out, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 448, 448, 3), DTYPE)
    w = jax.random.normal(key, (3, 3, 3, 64), DTYPE) * 0.1
    b = jnp.zeros((64,), DTYPE)
    w1 = jax.random.normal(key, (3, 3, 64, 128), DTYPE) * 0.05
    b1 = jnp.zeros((128,), DTYPE)

    def a_nhwc(x):
        y = cs._conv0_pallas(x, w, b, variant="bdot")
        return conv1(y, w1, b1, "NHWC")

    def b_planar_tb(x):
        y = cs._conv0_pallas(x, w, b, variant="bdot_planar")
        return conv1(y, w1, b1, "NHWC")

    def c_planar_fused(x):
        y = cs._conv0_pallas(x, w, b, variant="bdot_planar_raw")
        return conv1(y, w1, b1, "NCHW")

    fa = jax.jit(a_nhwc)
    fb = jax.jit(b_planar_tb)
    fc = jax.jit(c_planar_fused)
    ya, yb, yc = fa(x), fb(x), fc(x)
    print(json.dumps({
        "err_b": float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32)))),
        "err_c": float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yc.astype(jnp.float32)))),
    }), flush=True)
    for name, f in (("a_nhwc_store", fa), ("b_planar_transpose", fb),
                    ("c_planar_nchw_conv", fc)):
        print(json.dumps({"variant": name, "ms": round(timeit(f, x), 2)}),
              flush=True)


if __name__ == "__main__":
    main()
