"""A/B the stage-1 planar space-to-depth pack: transpose vs one-hot matmuls.

The pack ([B,448,448,3] -> [B,12,226,226]) is a pure relayout; XLA's
transpose emitter moves it at ~54 GB/s (7.3ms isolated, ~4.4ms in-model).
TPU alternative: express the relayout as two chained one-hot contractions
that run on the MXU —

  X  [B, H, W*C]   (the (w, c) merge is a free reshape)
  R  [2, Ho, H]    one-hot row selector   R[r,i,h] = (h == 2i+r)
  S  [2, C, W*C, Wo] one-hot col selector S[s,c,k,j] = (k == (2j+s)*C + c)
  P[b,r,s,c,i,j] = R[r,i,:] @ X[b] @ S[s,c]

~0.35 TFLOP at b160 — ~2ms if the MXU runs it at ~200 TFLOP/s, vs 7.3ms
for the transpose. Numerics are exact (one-hot bf16 matmul).

Run: python tools/exp_pack.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.ops.conv_stage1 import _pack_planar_s2d

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


def matmul_pack(x):
    """[B, H, W, C] -> padded planar s2d [B, 4C, H/2+2, W/2+2] via one-hots."""
    b, h, w, c = x.shape
    ho, wo = h // 2, w // 2
    xr = x.reshape(b, h, w * c)

    # row selector [2*Ho, H]: row (r*Ho + i) picks input row 2i+r
    ridx = (2 * (np.arange(2 * ho) % ho) + np.arange(2 * ho) // ho)
    R = jnp.asarray(np.eye(h, dtype=np.float32)[ridx], DTYPE)     # [2Ho, H]
    # col selector [W*C, 2*C*Wo]: col ((s*C + cc)*Wo + j) picks k=(2j+s)*C+cc
    out_cols = np.arange(2 * c * wo)
    j = out_cols % wo
    cc = (out_cols // wo) % c
    s = out_cols // (c * wo)
    S = np.zeros((w * c, 2 * c * wo), np.float32)
    S[(2 * j + s) * c + cc, out_cols] = 1.0
    S = jnp.asarray(S, DTYPE)

    y = jnp.einsum("ih,bhk,ko->bio", R, xr, S,
                   preferred_element_type=DTYPE)  # [B, 2Ho, 2C*Wo]
    # (r,i),(sc,j) -> (r,sc),(i),(j): minor j never moves (lane layout kept);
    # the i<->sc swap is a sublane-dim transpose only
    y = y.reshape(b, 2, ho, 2 * c, wo)            # [B, r, i, sc, j]
    y = y.transpose(0, 1, 3, 2, 4)                # [B, r, sc, i, j]
    y = y.reshape(b, 4 * c, ho, wo)               # plane = r*2C + s*C + c ✓
    return jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1)))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 448, 448, 3), DTYPE)

    ref = jax.jit(_pack_planar_s2d)
    mm = jax.jit(matmul_pack)
    y0, y1 = ref(x), mm(x)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print(json.dumps({"max_err": err}), flush=True)
    print(json.dumps({"variant": "transpose_pack", "ms": round(timeit(ref, x), 2)}),
          flush=True)
    print(json.dumps({"variant": "matmul_pack", "ms": round(timeit(mm, x), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
