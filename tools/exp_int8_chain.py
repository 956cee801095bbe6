"""Realistic int8 stage chains vs bf16: conv + dequant+bias+ReLU (+pool) + requant.

tools/exp_int8.py showed bare int8 convs win 1.35x at 512 channels and lose
below. A usable quantized backbone must pay, per stage: int32 accumulator
dequant (per-out-channel scale) + bias + ReLU (+ 2x2 pool) + requantize the
activation to int8 for the next stage. This times the FULL per-stage chain
both ways at the flagship batch.

Run: python tools/exp_int8_chain.py  [BENCH_BATCH=160 BENCH_STEPS=10]
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))

STAGES = [  # (H, Cin, Cout, pool) — VGG-11 stages 2..8 at 448 input
    (224, 64, 128, True),
    (112, 128, 256, False),
    (112, 256, 256, True),
    (56, 256, 512, False),
    (56, 512, 512, True),
    (28, 512, 512, False),
    (28, 512, 512, True),
]


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def conv(x, w, acc):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def pool(y):
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def stage_bf16(x, w, b, do_pool):
    y = jax.nn.relu(conv(x, w, jnp.bfloat16) + b)
    return pool(y) if do_pool else y


def stage_int8(x_i8, w_i8, scale, b, inv_next, do_pool):
    """int8 in -> int8 out: conv(int32) -> dequant+bias+relu [-> pool] -> requant."""
    acc = conv(x_i8, w_i8, jnp.int32)
    y = jax.nn.relu(acc.astype(jnp.float32) * scale + b).astype(jnp.bfloat16)
    if do_pool:
        y = pool(y)
    q = jnp.clip(jnp.round(y.astype(jnp.float32) * inv_next), -127, 127)
    return q.astype(jnp.int8)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    tot_b = tot_i = 0.0
    for h, cin, cout, do_pool in STAGES:
        xb = jax.random.normal(key, (B, h, h, cin), jnp.bfloat16)
        wb = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        bb = jnp.zeros((cout,), jnp.bfloat16)
        xi = jax.random.randint(key, (B, h, h, cin), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (3, 3, cin, cout), -127, 127, jnp.int8)
        scale = jnp.full((cout,), 1e-4, jnp.float32)
        bf = jnp.zeros((cout,), jnp.float32)
        ms_b = timeit(jax.jit(
            lambda a, w, b: stage_bf16(a, w, b, do_pool)), xb, wb, bb)
        ms_i = timeit(jax.jit(
            lambda a, w, s, b: stage_int8(a, w, s, b, 12.7, do_pool)),
            xi, wi, scale, bf)
        tot_b += ms_b
        tot_i += ms_i
        print(json.dumps({"h": h, "cin": cin, "cout": cout, "pool": do_pool,
                          "bf16_ms": round(ms_b, 2),
                          "int8_chain_ms": round(ms_i, 2),
                          "speedup": round(ms_b / ms_i, 3)}), flush=True)
    print(json.dumps({"total_bf16_ms": round(tot_b, 2),
                      "total_int8_ms": round(tot_i, 2),
                      "total_speedup": round(tot_b / tot_i, 3)}), flush=True)


if __name__ == "__main__":
    main()
