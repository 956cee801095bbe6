"""Benchmark harness: flagship train throughput in QA-pairs/sec on one chip.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "qa_pairs_per_sec", "vs_baseline": N}``

Config mirrors the reference's published training envelope (batch 160,
HieCoAttn at 448x448, mixed precision — /root/reference/README.md:23,95-100).
The reference publishes no throughput numbers and its CUDA/Apex stack cannot
run here, so ``vs_baseline`` is measured against the reference GPU envelope
estimate recorded in BASELINE.md (400 QA-pairs/sec; see there for the
methodology). Override via env:

- ``BENCH_BATCH`` (default 160), ``BENCH_STEPS`` (default 20)
- ``BENCH_MODEL`` ('attention' | 'baseline' | 'bert')
- ``BENCH_MODE`` ('train' | 'eval' — eval measures inference throughput)
- ``BENCH_PALLAS`` ('1' routes co-attention through the fused Pallas kernel)
- ``BENCH_BASELINE_QPS`` (default 400.0)
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_BASELINE_QPS = float(os.environ.get("BENCH_BASELINE_QPS", 400.0))


def main():
    batch = int(os.environ.get("BENCH_BATCH", 160))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    model_name = os.environ.get("BENCH_MODEL", "attention")
    mode = os.environ.get("BENCH_MODE", "train")
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    image_size = 448 if model_name == "attention" else 224
    vocab_size, num_classes, seq_len = 10000, 1001, 23

    from vqa_tpu.config import build_model
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_train_step

    model, _ = build_model(model_name, vocab_size, num_classes, opt_lvl=1,
                           use_pallas=use_pallas)

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, image_size, image_size, 3), jnp.float32)
    ques = jax.random.randint(rng, (batch, seq_len), 1, vocab_size)
    lens = jnp.full((batch,), seq_len, jnp.int32)
    labels = jax.random.randint(rng, (batch,), 0, num_classes)

    init_batch = {"image": img[:1], "question": ques[:1], "ques_len": lens[:1]}
    state = create_train_state(model, rng, init_batch, learning_rate=1e-4)
    device_batch = {"image": img, "question": ques, "ques_len": lens, "label": labels}
    device_batch = jax.device_put(device_batch)

    # sync via host fetch: the axon PJRT tunnel's block_until_ready returns
    # before remote execution completes; a value read is the only barrier
    if mode == "eval":
        from vqa_tpu.train.steps import make_eval_step

        eval_step = make_eval_step(model)
        variables = state.variables()
        for _ in range(3):
            m = eval_step(variables, device_batch)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            m = eval_step(variables, device_batch)
        # device execution is in-order: the last step's loss completes after
        # every queued step, so one fetch is the barrier for all of them
        float(m["loss"])
        dt = time.perf_counter() - t0
    else:
        tx = make_optimizer(1e-4, state.params, vgg_trainable=False)
        train_step = make_train_step(model, tx, donate=True)
        for _ in range(3):
            state, metrics = train_step(state, device_batch)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = train_step(state, device_batch)
        float(metrics["loss"])  # chain: final loss depends on every prior step
        dt = time.perf_counter() - t0

    qps = batch * steps / dt
    print(json.dumps({
        "metric": f"{mode}_qa_pairs_per_sec_{model_name}_b{batch}"
                  f"{'_pallas' if use_pallas else ''}",
        "value": round(qps, 2),
        "unit": "qa_pairs_per_sec",
        "vs_baseline": round(qps / REFERENCE_BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
