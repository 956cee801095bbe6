"""A/B experiments for VGG conv-stack formulations on the real TPU.

Round-2 follow-up to tools/profile_vgg.py: isolated stage timings showed the
pool-attached stages paying ~6ms over their no-pool twins (s5 17.0ms vs s4
10.8ms at identical FLOPs) and conv1 (64->128 @224^2) running at ~57 TFLOP/s
vs 219 for s4. This script times alternative formulations per stage:

- pool via reduce_window (the baseline)
- pool via 4-slice max (x[:, ::2, ::2] style strided slices + jnp.maximum)
- pool via reshape-max (split H,W into (H/2,2) and reduce)
- conv in NCHW dimension numbers
- the full folded stack in one jit (ground truth vs the sum of stages)

Run: python tools/exp_conv.py  [BENCH_BATCH=160 BENCH_STEPS=10]
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
DTYPE = jnp.bfloat16

STAGES = [  # (H_in, C_in, C_out, pool)
    (224, 64, 128, True),
    (112, 128, 256, False),
    (112, 256, 256, True),
    (56, 256, 512, False),
    (56, 512, 512, True),
    (28, 512, 512, False),
    (28, 512, 512, True),
]


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DTYPE)


def pool_rw(y):
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_slice(y):
    return jnp.maximum(
        jnp.maximum(y[:, 0::2, 0::2], y[:, 0::2, 1::2]),
        jnp.maximum(y[:, 1::2, 0::2], y[:, 1::2, 1::2]))


def pool_reshape(y):
    b, h, w, c = y.shape
    y = y.reshape(b, h // 2, 2, w // 2, 2, c)
    return y.max(axis=(2, 4))


POOLS = {"rw": pool_rw, "slice": pool_slice, "reshape": pool_reshape}


def stage(x, w, b, pool_kind):
    y = jax.nn.relu(conv(x, w) + b)
    if pool_kind:
        y = POOLS[pool_kind](y)
    return y


def stage_nchw(x, w, b, pool_kind):
    """Same stage with NCHW activations (w stays HWIO)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=DTYPE)
    y = jax.nn.relu(y + b[None, :, None, None])
    if pool_kind:
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                  (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return y


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
    for h, cin, cout, pool in STAGES:
        x = jax.random.normal(key, (B, h, h, cin), DTYPE)
        w = jax.random.normal(key, (3, 3, cin, cout), DTYPE) * 0.05
        b = jnp.zeros((cout,), DTYPE)
        row = {"h": h, "cin": cin, "cout": cout}
        kinds = ["rw", "slice", "reshape"] if pool else [None]
        for k in kinds:
            f = jax.jit(functools.partial(stage, pool_kind=k))
            row[f"pool_{k}"] = round(timeit(f, x, w, b), 2)
        # NCHW variant (pool via reduce_window when pooled)
        xc = jnp.transpose(x, (0, 3, 1, 2))
        f = jax.jit(functools.partial(stage_nchw, pool_kind="rw" if pool else None))
        row["nchw"] = round(timeit(f, xc, w, b), 2)
        print(json.dumps(row), flush=True)

    # ground truth: the folded stack stages 2..8 in ONE jit (NHWC, rw pools)
    def stack(x, ws, bs):
        for (hh, ci, co, pl_), wi, bi in zip(STAGES, ws, bs):
            x = stage(x, wi, bi, "rw" if pl_ else None)
        return x

    x = jax.random.normal(key, (B, 224, 224, 64), DTYPE)
    ws = [jax.random.normal(key, (3, 3, ci, co), DTYPE) * 0.05
          for _, ci, co, _ in STAGES]
    bs = [jnp.zeros((co,), DTYPE) for _, _, co, _ in STAGES]
    ms = timeit(jax.jit(stack), x, ws, bs)
    print(json.dumps({"stack_2to8_one_jit_ms": round(ms, 2)}), flush=True)

    def stack_slice(x, ws, bs):
        for (hh, ci, co, pl_), wi, bi in zip(STAGES, ws, bs):
            x = stage(x, wi, bi, "slice" if pl_ else None)
        return x

    ms = timeit(jax.jit(stack_slice), x, ws, bs)
    print(json.dumps({"stack_2to8_slicepool_ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
