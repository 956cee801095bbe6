"""Generalized fused int8 conv+pool Pallas kernel vs XLA, per pooled stage.

r2 shipped the fused s2d-planar int8 kernel for VGG stage 1 only (C_in=3).
The kernel body (ops/conv_stage1.py:_kernel_i8) is shape-generic; this
experiment asks whether routing the LATER pooled stages through it beats
the shipped paths:

- conv1 (224², 64->128, pool): bf16 XLA today — int8 XLA *loses* here
  (0.84x, tools/exp_int8_chain.py), the biggest single-stage cost left;
- conv3 (112², 256->256, pool): int8 XLA today (1.57x);
- conv5 (56², 512->512, pool): int8 XLA today (1.62x). NOTE: the s2d
  weight inflation is 16x, so the kernel's weight block is 37.7MB VMEM
  and the R-broadcast batched-dot operand grows with 4O*9*4C — expected
  to blow VMEM at C=512; measured to document the boundary.

Chains are timed end-to-end from a bf16 NHWC input (what the previous
stage produces), static activation scale (r3 calibration), including
quantize + pack. Run on TPU: python tools/exp_i8pool.py [BENCH_BATCH=160]
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("BENCH_BATCH", 160))
ITERS = int(os.environ.get("BENCH_STEPS", 10))

STAGES = [  # (name, H, Cin, Cout) — pooled VGG-11 stages at 448 input
    ("conv1", 224, 64, 128),
    ("conv3", 112, 256, 256),
    ("conv5", 56, 512, 512),
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


def stage_bf16(x, w, b):
    return pool(jax.nn.relu(conv(x, w.astype(jnp.bfloat16), jnp.bfloat16)
                            + b.astype(jnp.bfloat16)))


def stage_i8_xla(x, w, b, s_x):
    """bf16 in -> quantize(static) -> int8 conv -> dequant+bias+relu -> pool."""
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127, 127).astype(jnp.int8)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    acc = conv(x_q, w_q, jnp.int32)
    y = jax.nn.relu(acc.astype(jnp.float32) * (s_x * s_w) + b)
    return pool(y).astype(jnp.bfloat16)


def main():
    print(f"devices: {jax.devices()} B={B}", flush=True)
    from vqa_tpu.ops.conv_stage1 import _conv0_pallas_i8

    key = jax.random.PRNGKey(0)
    for name, h, cin, cout in STAGES:
        x = jax.nn.relu(jax.random.normal(key, (B, h, h, cin), jnp.bfloat16))
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
        b = jnp.zeros((cout,), jnp.float32)
        s_x = 4.0 / 127.0
        row = {"stage": name, "h": h, "cin": cin, "cout": cout}
        row["bf16_xla_ms"] = round(timeit(jax.jit(stage_bf16), x, w, b), 2)
        row["i8_xla_ms"] = round(timeit(
            jax.jit(lambda a, ww, bb: stage_i8_xla(a, ww, bb, s_x)),
            x, w, b), 2)
        try:
            row["i8_pallas_ms"] = round(timeit(
                lambda a, ww, bb: _conv0_pallas_i8(a, ww, bb, s_x=s_x),
                x, w, b), 2)
        except Exception as e:  # expected at C=512: VMEM blow-up
            row["i8_pallas_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
