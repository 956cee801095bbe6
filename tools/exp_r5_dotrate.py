"""r5 probe: int8 MXU dot rate vs contraction depth K (and vs bf16).

The hpack conv1 kernel issues 12 int8 dots of [3584,128]x[128,128] per grid
step (K = 2C = 128). The r5 device profile (BASELINE.md) shows the kernel
at 101 TF/s effective while the int8-XLA chains (K = 9C >= 1152) sustain
334-364 TF/s. Hypothesis: shallow-K int8 dots cannot reach the 2x int8
MXU rate, so the kernel's dots run at ~the bf16 rate and the "overhead"
is mostly dot time. This probe measures pure in-graph dot throughput
(lax.scan over iterations, one host fetch; the r2 227 TF/s methodology)
for s8 and bf16 across K, at the kernel's M=3584, N=128 shape and a
batched variant.

Run on the real chip: python tools/exp_r5_dotrate.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vqa_tpu.compile_cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ITERS = 200


def rate(m, k, n, dtype, acc, iters=ITERS, batch=1):
    """In-graph loop of dots; returns TF/s (one compile, one fetch)."""

    def body(carry, _):
        x, w = carry
        d = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=acc)
        # fold the result back into x cheaply so the loop can't be DCE'd
        # (cast + slice keeps dtype/shape; cost is negligible vs the dot)
        if batch > 1:
            upd = d[..., :1].astype(dtype)
        else:
            upd = d[:, :1].astype(dtype)
        x = jax.lax.dynamic_update_slice(x, upd, (0,) * (x.ndim - 1) + (0,))
        return (x, w), ()

    shape_x = (batch, m, k) if batch > 1 else (m, k)
    x = (jnp.ones(shape_x) * 3).astype(dtype)
    w = (jnp.ones((k, n)) * 3).astype(dtype)

    @jax.jit
    def run(x, w):
        (x, _), _ = jax.lax.scan(body, (x, w), None, length=iters)
        return x.astype(jnp.float32).sum()

    float(run(x, w))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(x, w))
    dt = time.perf_counter() - t0
    flops = 2.0 * batch * m * k * n * iters
    return flops / dt / 1e12, v


def main():
    m, n = 3584, 128
    print(f"# in-graph dot rate, M={m} N={n}, {ITERS} iters/fetch", flush=True)
    rows = []
    for dtype, acc, label in ((jnp.int8, jnp.int32, "s8->s32"),
                              (jnp.bfloat16, jnp.float32, "bf16->f32")):
        for k in (128, 256, 384, 512, 1152):
            tf, _ = rate(m, k, n, dtype, acc)
            rows.append((label, k, 1, tf))
            print(f"{label:10} K={k:5} batch=1   {tf:7.1f} TF/s", flush=True)
    # the kernel's exact issue pattern: 12 sequential K=128 dots vs
    # 4 K=384 dots — emulate with batched small dots
    for dtype, acc, label in ((jnp.int8, jnp.int32, "s8->s32"),):
        for k, b in ((128, 12), (384, 4)):
            tf, _ = rate(m, k, n, dtype, acc, batch=b)
            rows.append((label, k, b, tf))
            print(f"{label:10} K={k:5} batch={b:<3} {tf:7.1f} TF/s", flush=True)
    # wider N (the 'merged' variant doubles N instead)
    for k, nn in ((128, 256), (384, 256)):
        tf, _ = rate(m, k, nn, jnp.int8, jnp.int32)
        print(f"{'s8->s32':10} K={k:5} N={nn:5}  {tf:7.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
