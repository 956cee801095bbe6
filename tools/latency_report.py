"""Serving latency report: per-request forward latency at small batch sizes.

Completes the serving story next to the throughput benches: bench.py measures
saturated batch-160 throughput, this measures what a single request (or a
small request group) waits for an answer through :class:`vqa_tpu.serve.
VQAPredictor`'s compiled forward.

Two numbers per batch size:

- ``device_ms``: the jitted forward on device-resident inputs, synced by
  fetching the [bs, C] probs (~4 KB — negligible wire). Includes one axon
  tunnel round trip per call, so on a locally attached TPU the real number
  is lower still.
- ``e2e_ms``: the full predict() path — host image decode, uint8 H2D,
  on-device preprocess, forward, fetch. Through this tunnel the H2D leg
  (~47 MB/s measured, BASELINE.md) dominates at 448^2; on a real TPU host
  (PCIe) it would not.

The predictor is built without a checkpoint, so its int8 static scales
auto-calibrate from the first request batch (serve.py's r4 default); the
warm-up ``predict()`` runs BEFORE the device timing so both numbers
measure the calibrated production executable, not the transient
pre-calibration program.

Usage: ``python tools/latency_report.py [bs ...]`` (default 1 8 32).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(bs: int, trials: int = 20):
    import jax.numpy as jnp

    from vqa_tpu.serve import VQAPredictor
    from vqa_tpu.vocab import PAD_TOKEN, UNK_TOKEN, Vocab

    words = {PAD_TOKEN: 0, UNK_TOKEN: 1,
             **{f"w{i}": i + 2 for i in range(998)}}
    labels = {f"ans{i}": i for i in range(100)}
    vocab = Vocab(word2idx=words, idx2word={v: k for k, v in words.items()},
                  label2idx=labels, idx2label={v: k for k, v in labels.items()},
                  max_seq_length=23)
    pred = VQAPredictor("attention", vocab, batch_size=bs, opt_lvl=1,
                        synthetic_images=True)

    # warm through the REAL serving path first: the first predict() bakes
    # the static int8 scales and rebuilds pred._fwd (serve auto-PTQ), so
    # everything timed below is the calibrated production executable
    paths = [f"synthetic_{i}.jpg" for i in range(bs)]
    qs = ["what color is the square"] * bs
    pred.predict(paths, qs)  # warm + auto-calibrate + compile
    assert not pred._needs_calib

    # route through the predictor's own preprocessor (device resize/normalize
    # on a uint8 batch) so device_call times EXACTLY the executable predict()
    # dispatches — if the serve preprocessor's output dtype ever changes,
    # this path follows it instead of silently timing a different program
    raw = np.random.randint(0, 256, (bs, pred.image_size, pred.image_size, 3),
                            dtype=np.uint8)
    img = pred.preprocess(jnp.asarray(raw))
    ids = jnp.ones((bs, vocab.max_seq_length), jnp.int32)
    lens = jnp.full((bs,), 5, jnp.int32)

    def device_call():
        return np.asarray(pred._fwd(pred.variables, img, ids, lens))

    device_call()  # absorb any first-dispatch skew (program already built)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        device_call()
        times.append((time.perf_counter() - t0) * 1e3)
    device_ms = float(np.median(times))
    times = []
    for _ in range(max(trials // 4, 3)):
        t0 = time.perf_counter()
        pred.predict(paths, qs)
        times.append((time.perf_counter() - t0) * 1e3)
    e2e_ms = float(np.median(times))

    rec = {"batch": bs, "device_ms": round(device_ms, 2),
           "device_ms_per_sample": round(device_ms / bs, 2),
           "e2e_ms": round(e2e_ms, 2)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    rows = [measure(bs) for bs in sizes]
    print(f"{'batch':>5}  {'device_ms':>9}  {'per-sample':>10}  {'e2e_ms':>8}",
          file=sys.stderr)
    for r in rows:
        print(f"{r['batch']:>5}  {r['device_ms']:>9}  "
              f"{r['device_ms_per_sample']:>10}  {r['e2e_ms']:>8}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
