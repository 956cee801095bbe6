"""A/B the fused stem and the int8 handoffs on the full VGG stack (real TPU).

Times VGGFeatures.apply at the flagship shape (b160 @ 448^2, bf16, the
default int8 stage set with synthetic per-channel calibration) across the
four combinations of {fused_stem, int8_handoff}, isolating what each new
path contributes before bench.py folds them into the headline.

Sync via host value fetch (axon tunnel: block_until_ready returns early).
Run: python tools/exp_stem_handoff.py  [BENCH_BATCH=160 EXP_H=448]
CPU check (tiny, interpret): EXP_CHECK=1 JAX_PLATFORMS=cpu python tools/exp_stem_handoff.py
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

from vqa_tpu.models.vgg import VGGFeatures

B = int(os.environ.get("BENCH_BATCH", 160))
H = int(os.environ.get("EXP_H", 448))
ITERS = int(os.environ.get("BENCH_STEPS", 10))
STAGES = (0, 1, 2, 3, 4, 5, 6)


def _amax():
    # synthetic per-channel calibration in a realistic range; identical
    # across the four configs so timing differences are purely structural
    widths = {0: 3, 1: 64, 2: 128, 3: 256, 4: 256, 5: 512, 6: 512}
    return tuple(tuple(float(v) for v in np.linspace(1.0, 3.0, widths[s]))
                 for s in STAGES)


def main():
    check = bool(os.environ.get("EXP_CHECK"))
    b, h = (2, 32) if check else (B, H)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, 3), jnp.float32) \
        .astype(jnp.bfloat16)
    rows = {}
    outs = {}
    for fused in (False, True):
        for handoff in (False, True):
            feats = VGGFeatures(conv0_pallas=True, hpack_pool=True,
                                fused_stem=fused, int8_handoff=handoff,
                                int8_stages=STAGES, int8_amax=_amax(),
                                dtype=jnp.bfloat16)
            if fused is False and handoff is False:
                vs = feats.init(jax.random.PRNGKey(1), x, True)
                vs0 = vs
            fn = jax.jit(lambda v, t, m=feats: m.apply(v, t, True))
            y = fn(vs0, x)
            float(jnp.asarray(y).astype(jnp.float32).reshape(-1)[0])  # sync
            t0 = time.perf_counter()
            for _ in range(ITERS):
                y = fn(vs0, x)
            float(jnp.asarray(y).astype(jnp.float32).reshape(-1)[0])
            key = f"fused={int(fused)} handoff={int(handoff)}"
            rows[key] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)
            outs[key] = np.asarray(y, np.float32)
    base = outs["fused=0 handoff=0"]
    drift = {k: round(float(np.abs(v - base).max()), 4)
             for k, v in outs.items()}
    print(json.dumps({"ms": rows, "max_abs_vs_plain": drift}))


if __name__ == "__main__":
    main()
