"""A/B the hpack W-pool placement on the real TPU (r4 conv push).

Candidate (r3 VERDICT item 2b/2c family): move the 2x2 maxpool's
W-reduction from the dequantized f32 map onto the int32 accumulator
inside ops/conv_hpack._kernel. Bit-identical by monotonicity (the same
argument that put the H-reduction on the phase accumulators), and it
halves the f32 epilogue's element count — dequant, bias, ReLU, and the
handoff quantize all run per POOLED element.

Times, same session, both orderings (VQA_HPACK_WPOOL=pre|post):
  1. the full VGG stack forward at the flagship shape (b160 @ 448^2,
     production int8 set + fused stem + handoffs), and
  2. the isolated fused-stem chain (conv0 packed -> hpack conv1),
plus a numeric identity check between the two orderings.

Run:       python tools/exp_r4_epi.py            [BENCH_BATCH=160 EXP_H=448]
CPU check: EXP_CHECK=1 JAX_PLATFORMS=cpu python tools/exp_r4_epi.py
"""

from __future__ import annotations

import json
import os
import time

if os.environ.get("EXP_CHECK"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if os.environ.get("EXP_CHECK"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("BENCH_BATCH", 160))
H = int(os.environ.get("EXP_H", 448))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
STAGES = (0, 1, 2, 3, 4, 5, 6, 7)


def _amax():
    widths = {0: 3, 1: 64, 2: 128, 3: 256, 4: 256, 5: 512, 6: 512, 7: 512}
    return tuple(tuple(float(v) for v in np.linspace(1.0, 3.0, widths[s]))
                 for s in STAGES)


def _sync(y):
    return float(jnp.asarray(y).astype(jnp.float32).reshape(-1)[0])


def main():
    from vqa_tpu.models.vgg import VGGFeatures

    check = bool(os.environ.get("EXP_CHECK"))
    b, h = (2, 32) if check else (B, H)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, 3), jnp.float32) \
        .astype(jnp.bfloat16)
    rows, outs = {}, {}
    vs = None
    for wpool in ("post", "pre"):
        os.environ["VQA_HPACK_WPOOL"] = wpool
        feats = VGGFeatures(conv0_pallas=True, hpack_pool=True,
                            fused_stem=True, int8_handoff=True,
                            int8_stages=STAGES, int8_amax=_amax(),
                            dtype=jnp.bfloat16)
        if vs is None:
            vs = feats.init(jax.random.PRNGKey(1), x, True)
        fn = jax.jit(lambda v, t, m=feats, w=wpool: m.apply(v, t, True))
        y = fn(vs, x)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = fn(vs, x)
        _sync(y)
        rows[f"vgg_stack wpool={wpool}"] = round(
            (time.perf_counter() - t0) / ITERS * 1e3, 2)
        outs[wpool] = np.asarray(y, np.float32)

    # isolated fused-stem chain (the only hpack user on the default path)
    from vqa_tpu.ops.conv_stem import fused_stem
    w0 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 64),
                           jnp.float32) * 0.1
    b0 = jnp.zeros((64,), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 64, 128),
                           jnp.float32) * 0.05
    b1 = jnp.zeros((128,), jnp.float32)
    s0 = tuple(float(v) for v in np.linspace(1.0, 3.0, 3))
    s1 = tuple(float(v) for v in np.linspace(0.5, 2.0, 64))
    for wpool in ("post", "pre"):
        os.environ["VQA_HPACK_WPOOL"] = wpool
        fn = jax.jit(lambda t, w=wpool: fused_stem(
            t, w0, b0, w1, b1, s_x0=s0, s_x1=s1))
        y = fn(x)
        _sync(y)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            y = fn(x)
        _sync(y)
        rows[f"stem_chain wpool={wpool}"] = round(
            (time.perf_counter() - t0) / ITERS * 1e3, 2)

    drift = float(np.abs(outs["pre"] - outs["post"]).max())
    print(json.dumps({"ms": rows, "max_abs_pre_vs_post": drift}))
    assert drift == 0.0, "wpool orderings must be bit-identical"


if __name__ == "__main__":
    main()
