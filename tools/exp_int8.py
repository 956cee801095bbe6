"""Probe: do int8 convs beat bf16 through this chip's XLA emitter?

v5e lists 2x int8 MACs vs bf16. Round 1 recorded "int8 convs — slower or
neutral through this chip's XLA emitter" (BASELINE.md); this re-checks with
per-stage timings: conv in int8 (preferred_element_type=int32) vs bf16,
plus an int8 matmul for the emitter's best case.

Run: python tools/exp_int8.py  [BENCH_BATCH=160 BENCH_STEPS=10]
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))

STAGES = [  # (H, Cin, Cout)
    (224, 64, 128),
    (112, 256, 256),
    (56, 512, 512),
]


def timeit(f, *args):
    y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(*args)
    float(jnp.asarray(y).reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS * 1e3


def conv(x, w, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    for h, cin, cout in STAGES:
        xb = jax.random.normal(key, (B, h, h, cin), jnp.bfloat16)
        wb = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        xi = jax.random.randint(key, (B, h, h, cin), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (3, 3, cin, cout), -127, 127, jnp.int8)
        ms_b = timeit(jax.jit(lambda a, b: conv(a, b, jnp.bfloat16)), xb, wb)
        try:
            ms_i = timeit(jax.jit(lambda a, b: conv(a, b, jnp.int32)), xi, wi)
        except Exception as e:  # unsupported lowering
            ms_i = None
            print(json.dumps({"h": h, "cin": cin, "int8_error": str(e)[:120]}),
                  flush=True)
        print(json.dumps({"h": h, "cin": cin, "cout": cout,
                          "bf16_ms": round(ms_b, 2),
                          "int8_ms": None if ms_i is None else round(ms_i, 2)}),
              flush=True)

    # emitter best case: plain big matmul int8 vs bf16
    m = 8192
    ab = jax.random.normal(key, (m, 2048), jnp.bfloat16)
    bb = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    ai = jax.random.randint(key, (m, 2048), -127, 127, jnp.int8)
    bi = jax.random.randint(key, (2048, 2048), -127, 127, jnp.int8)
    ms_b = timeit(jax.jit(lambda a, b: jnp.dot(a, b)), ab, bb)
    ms_i = timeit(jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), ai, bi)
    tf_b = 2 * m * 2048 * 2048 / ms_b / 1e9
    tf_i = 2 * m * 2048 * 2048 / ms_i / 1e9
    print(json.dumps({"matmul_bf16_ms": round(ms_b, 3),
                      "matmul_int8_ms": round(ms_i, 3),
                      "bf16_tflops": round(tf_b, 1),
                      "int8_tops": round(tf_i, 1)}), flush=True)


if __name__ == "__main__":
    main()
