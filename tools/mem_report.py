"""HBM footprint report: AOT-compile the train/eval steps and print XLA's
memory analysis per production config.

Production-deployment evidence the throughput benchmarks don't show: how much
of the chip's HBM (v5e: 16 GiB) each config actually needs, and how much
batch headroom is left. Uses ``jit(...).lower(...).compile().memory_analysis()``
— the train/eval step itself is never executed, so the dominant cost is the
compile (1-5 min per config through the axon tunnel at 448^2). Exception:
int8 configs DO run one real device forward of the image tower (b8) during
``collect_amax`` calibration, on random images so the baked static scales
are realistic (the scale values are compile-time constants and do not
change the memory analysis either way).

Peak device need is estimated as ``argument + temp + output - alias`` (donated
TrainState buffers alias their outputs, so they count once). XLA's ``temp`` is
the scheduled working set, which is what actually bounds batch size.

Usage::

    python tools/mem_report.py                  # flagship set on the real TPU
    python tools/mem_report.py attention_bf16   # one config by name

Writes one JSON line per config; the human table goes to stderr.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

GIB = 1024 ** 3

CONFIGS = {
    # name: (model, image_size, batch, int8_backbone, mode)
    "attention_default": ("attention", 448, 160, None, "train"),
    "attention_bf16": ("attention", 448, 160, False, "train"),
    "attention_eval": ("attention", 448, 160, None, "eval"),
    "baseline_default": ("baseline", 224, 160, None, "train"),
}


def analyze(name: str):
    model_name, image_size, batch, int8, mode = CONFIGS[name]
    vocab_size, num_classes, seq_len = 10000, 1001, 23

    from vqa_tpu.config import build_model
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_eval_step, make_train_step

    model, _ = build_model(model_name, vocab_size, num_classes, opt_lvl=1,
                           int8_backbone=int8)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    ques = jnp.zeros((batch, seq_len), jnp.int32)
    lens = jnp.full((batch,), seq_len, jnp.int32)
    labels = jnp.zeros((batch,), jnp.int32)
    init_batch = {"image": img[:1], "question": ques[:1], "ques_len": lens[:1]}
    state = create_train_state(model, rng, init_batch, learning_rate=1e-4)
    if model.int8_stages:
        # static calibrated scales, as the production path bakes them
        from vqa_tpu.train.calibrate import (amax_tuple, collect_amax,
                                             image_tower)
        enc, sub_vars = image_tower(model_name, model, state.variables())
        # random calibration images (not the zeros used for shape probing):
        # zero input would floor every per-channel amax at the 1e-12 epsilon
        calib = jax.random.normal(rng, (8, image_size, image_size, 3),
                                  jnp.float32)
        amax = collect_amax(enc, sub_vars, [calib])
        model = model.clone(int8_amax=amax_tuple(model.int8_stages, amax))
    batch_d = {"image": img, "question": ques, "ques_len": lens, "label": labels}

    if mode == "eval":
        step = make_eval_step(model)
        lowered = step.lower(state.variables(), batch_d)
    else:
        tx = make_optimizer(1e-4, state.params, vgg_trainable=False)
        step = make_train_step(model, tx, donate=True)
        lowered = step.lower(state, batch_d)
    ms = lowered.compile().memory_analysis()
    peak = (ms.argument_size_in_bytes + ms.temp_size_in_bytes
            + ms.output_size_in_bytes - ms.alias_size_in_bytes)
    rec = {
        "config": name,
        "mode": mode,
        "batch": batch,
        "argument_gib": round(ms.argument_size_in_bytes / GIB, 3),
        "temp_gib": round(ms.temp_size_in_bytes / GIB, 3),
        "output_gib": round(ms.output_size_in_bytes / GIB, 3),
        "alias_gib": round(ms.alias_size_in_bytes / GIB, 3),
        "peak_gib": round(peak / GIB, 3),
        "hbm_fraction_v5e": round(peak / (16 * GIB), 3),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    names = sys.argv[1:] or list(CONFIGS)
    rows = [analyze(n) for n in names]
    w = max(len(r["config"]) for r in rows)
    print(f"{'config':<{w}}  {'batch':>5}  {'arg':>7}  {'temp':>7}  "
          f"{'peak':>7}  {'of 16GiB':>8}", file=sys.stderr)
    for r in rows:
        print(f"{r['config']:<{w}}  {r['batch']:>5}  {r['argument_gib']:>7}  "
              f"{r['temp_gib']:>7}  {r['peak_gib']:>7}  "
              f"{r['hbm_fraction_v5e']:>8}", file=sys.stderr)


if __name__ == "__main__":
    main()
