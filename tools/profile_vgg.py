"""Per-stage timing of the VGG-11 feature stack on the real TPU.

Times each conv stage (conv + bias + BN-affine + ReLU [+ 2x2 maxpool])
independently at the flagship shape (b160 @ 448^2, bf16) to locate where the
83.8 ms measured in round 1 goes. Also times each stage with the BN affine
folded into the conv kernel/bias to quantify the BN-folding lever.

Sync via host value fetch (axon tunnel: block_until_ready returns early).
Run: python tools/profile_vgg.py  [BENCH_BATCH=160]
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

# (H_in, C_in, C_out, pool) for VGG-11 at 448^2
STAGES = [
    (448, 3, 64, True),
    (224, 64, 128, True),
    (112, 128, 256, False),
    (112, 256, 256, True),
    (56, 256, 512, False),
    (56, 512, 512, True),
    (28, 512, 512, False),
    (28, 512, 512, True),
]


def stage_fn(x, w, b, scale, shift, pool: bool, folded: bool):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DTYPE)
    if folded:
        y = y + b  # scale/shift pre-folded into w/b
    else:
        y = (y + b) * scale + shift
    y = jax.nn.relu(y)
    if pool:
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return y


def time_stage(h, cin, cout, pool, folded):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, h, cin), DTYPE)
    w = jax.random.normal(key, (3, 3, cin, cout), DTYPE) * 0.05
    b = jnp.zeros((cout,), DTYPE)
    scale = jnp.ones((cout,), DTYPE)
    shift = jnp.zeros((cout,), DTYPE)
    f = jax.jit(functools.partial(stage_fn, pool=pool, folded=folded))
    y = f(x, w, b, scale, shift)
    float(y.reshape(-1)[0])  # sync (compile + run)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(x, w, b, scale, shift)
    float(y.reshape(-1)[0])  # in-order queue: one fetch syncs all
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rows = []
    total = {True: 0.0, False: 0.0}
    for i, (h, cin, cout, pool) in enumerate(STAGES):
        for folded in (False, True):
            ms = time_stage(h, cin, cout, pool, folded)
            total[folded] += ms
            rows.append({"stage": i, "h": h, "cin": cin, "cout": cout,
                         "pool": pool, "folded": folded, "ms": round(ms, 2)})
            print(json.dumps(rows[-1]), flush=True)
    gflops = sum(2 * 9 * ci * co * h * h * B / 1e9 for h, ci, co, _ in STAGES)
    print(json.dumps({"total_ms_bn": round(total[False], 2),
                      "total_ms_folded": round(total[True], 2),
                      "batch_gflops": round(gflops, 1)}), flush=True)


if __name__ == "__main__":
    main()
