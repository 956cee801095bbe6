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
- ``BENCH_WINDOWS`` (default 3): train/eval/cached modes time this many
  back-to-back windows of BENCH_STEPS and report the FASTEST (tunnel/host
  interference only ever subtracts throughput; the max is the
  least-perturbed estimate). All window values are recorded in the JSON
  line as ``windows``. pipeline/decode modes are single-window and emit no
  ``windows`` key. A JSON line is printed (flushed) after EVERY window —
  the driver parses the LAST line, so a run killed mid-benchmark still
  leaves the best-so-far result on stdout.
- ``BENCH_BUDGET_S`` (default 900): wall-clock budget measured from process
  start. Remaining windows are skipped once the budget would be exceeded,
  and if startup (compiles) already ate the budget the single remaining
  window degrades to <=10 steps — the harness prints a line no matter how
  slow the tunnel session is, instead of timing out with no output.
- ``BENCH_CALIB`` ('0' forces live int8 calibration instead of the
  committed ``tools/bench_calib.json`` sidecar; 'save' runs live
  calibration and writes that sidecar). The sidecar replays the production
  load-static-scales path and removes one full 448^2 tower compile from
  the driver's critical path; scale VALUES are compile-time constants, so
  timing is identical either way.
- ``BENCH_MODEL`` ('attention' | 'baseline' | 'bert')
- ``BENCH_MODE``:
  * 'train' (default) / 'eval': device-resident synthetic batches — pure
    step throughput;
  * 'cached': train step over cached frozen-tower features
    (``--cache_features``; vqa_tpu/data/feature_cache.py) — the steady-state
    epoch>1 throughput of frozen-backbone training;
  * 'pipeline': the REAL input path end-to-end (BASELINE.json config 4):
    disk JPEGs -> host decode (DataLoader workers) -> uint8 H2D ->
    jitted device resize+normalize -> train step, with device_prefetch
    overlap; reports QA/s plus the input-stall fraction. Dataset dir from
    ``BENCH_DATA_DIR`` (default /tmp/synthvqa; auto-generated if absent);
  * 'decode': host JPEG decode throughput, native C++ decoder vs PIL
    (vs_baseline = native/PIL speedup).
- ``BENCH_PALLAS`` (RETIRED r5: the fused co-attention kernel moved to
  tools/retired/ per PARITY.md M8; '1' now fails fast with that pointer)
- ``BENCH_CONV0`` ('0' disables the fused Pallas stage-1 VGG conv)
- ``BENCH_INT8`` ('1' enables the int8-PTQ frozen backbone, --int8_backbone)
- ``BENCH_FUSED`` ('0' disables the fused conv0->conv1 stem, --fused_stem,
  for same-session A/B against the two-kernel chain)
- ``BENCH_WORKERS`` (pipeline/decode host decode threads, default 4)
- ``BENCH_GRAD_ACCUM`` (default 1): microbatched gradient accumulation in
  the train step (--grad_accum); e.g. BENCH_BATCH=640 BENCH_GRAD_ACCUM=4
  benches effective-b640 training at b160 activation footprint. Applies to
  train/cached modes only (pipeline/eval/decode ignore it); must divide
  BENCH_BATCH
- ``BENCH_BASELINE_QPS`` (default 400.0)
"""

from __future__ import annotations

import json
import os
import time

_T0 = time.perf_counter()  # budget clock: starts before the jax import cost

# Persistent compilation cache (non-volatile ~/.cache default — /tmp was
# wiped mid-round in r3; see vqa_tpu/compile_cache.py): a bench run primes
# the cache for the driver's end-of-round run on the same host.
from vqa_tpu.compile_cache import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

REFERENCE_BASELINE_QPS = float(os.environ.get("BENCH_BASELINE_QPS", 400.0))
BENCH_CALIB_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools", "bench_calib.json")


def _emit(rec: dict) -> None:
    """Print one JSON result line, flushed (a killed run keeps prior lines)."""
    print(json.dumps(rec), flush=True)


def _budget_left() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", 900)) - (
        time.perf_counter() - _T0)


def _bench_calib_amax(model_name: str, int8_stages: tuple):
    """Committed static-scale sidecar for the synthetic bench config.

    Returns the amax tuple when tools/bench_calib.json matches
    (model, stage set), else None -> caller calibrates live. BENCH_CALIB=0
    forces live calibration (the values are jit-static constants either
    way, so throughput is identical; the sidecar only skips one compile)."""
    if os.environ.get("BENCH_CALIB", "1") in ("0", "save"):
        return None  # force live calibration ('save' must refresh, not no-op)
    try:
        with open(BENCH_CALIB_FILE) as f:
            data = json.load(f)
        entry = data[model_name]
        if tuple(entry["stages"]) != tuple(int8_stages):
            return None
        return tuple(tuple(float(x) for x in v) for v in entry["amax"])
    except (OSError, KeyError, ValueError):
        return None


def _ensure_dataset(data_dir: str, n_pairs: int) -> None:
    train = os.path.join(data_dir, "train.txt")
    if os.path.exists(train):
        with open(train) as f:
            have = sum(1 for _ in f)
        if have >= n_pairs:
            return
        # an existing-but-smaller dataset (e.g. generated for another mode)
        # would leave the b160 loader with zero full batches and the
        # pipeline bench spinning on an empty epoch — regenerate instead
        print(f"# {data_dir} has {have} pairs < required {n_pairs}; "
              f"regenerating", flush=True)
    import subprocess
    import sys
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), "tools",
                                 "make_synth_dataset.py"),
                    "--out_dir", data_dir, "--n_train", str(n_pairs),
                    "--n_val", "64"], check=True)


def bench_decode():
    """Host JPEG decode: native C++ thread-pool decoder vs PIL."""
    import time

    import numpy as np

    from vqa_tpu.data.images import decode_batch

    data_dir = os.environ.get("BENCH_DATA_DIR", "/tmp/synthvqa")
    workers = int(os.environ.get("BENCH_WORKERS", 4))
    _ensure_dataset(data_dir, 2000)
    img_dir = os.path.join(data_dir, "imgs")
    paths = sorted(os.path.join(img_dir, p) for p in os.listdir(img_dir))
    paths = (paths * 3)[:600]

    rates = {}
    for backend in ("pil", "native", "native_mp"):
        decode_batch(paths[:32], 224, backend=backend,
                     native_threads=workers)  # warm
        t0 = time.perf_counter()
        out = decode_batch(paths, 224, backend=backend, native_threads=workers)
        dt = time.perf_counter() - t0
        assert out.shape == (len(paths), 224, 224, 3) and out.dtype == np.uint8
        rates[backend] = len(paths) / dt
    _emit({
        "metric": f"decode_images_per_sec_native_w{workers}",
        "value": round(rates["native"], 2),
        "unit": "images_per_sec",
        "pil_images_per_sec": round(rates["pil"], 2),
        "native_mp_images_per_sec": round(rates["native_mp"], 2),
        "vs_baseline": round(rates["native"] / rates["pil"], 3),
    })


def bench_pipeline(model_name: str, batch: int, steps: int, use_pallas: bool,
                   conv0_pallas):
    """End-to-end real-data train throughput: disk JPEG -> decode -> uint8
    H2D -> device preprocess -> train step (BASELINE.json config 4)."""
    import time

    import numpy as np

    from vqa_tpu.config import build_model
    from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
    from vqa_tpu.data.pipeline import device_prefetch
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_train_step
    from vqa_tpu.vocab import Vocab

    data_dir = os.environ.get("BENCH_DATA_DIR", "/tmp/synthvqa")
    workers = int(os.environ.get("BENCH_WORKERS", 4))
    _ensure_dataset(data_dir, max(batch * (steps + 4), 2000))
    vocab = Vocab.load(os.path.join(data_dir, "vocab.pkl"))
    image_size = 448 if model_name == "attention" else 224

    model, _ = build_model(model_name, vocab.size, vocab.num_labels,
                           opt_lvl=1, use_pallas=use_pallas,
                           conv0_pallas=conv0_pallas,
                           int8_backbone=os.environ.get("BENCH_INT8") == "1")
    preprocess = make_image_preprocessor(image_size, jnp.bfloat16)
    samples = VQASamples(os.path.join(data_dir, "train.txt"),
                         os.path.join(data_dir, "imgs"),
                         vocab.word2idx, vocab.label2idx, vocab.max_seq_length)
    # disk JPEGs are 224^2: host passes them through untouched (uint8 H2D is
    # 4x lighter than f32) and the jitted preprocess resizes on device
    loader = DataLoader(samples, batch, host_size=224, num_workers=workers,
                        seed=0, drop_last=True,
                        decode_backend=os.environ.get("BENCH_DECODE_BACKEND",
                                                      "auto"))
    if len(loader) == 0:
        raise SystemExit(f"pipeline bench: dataset {data_dir} has "
                         f"{len(samples)} pairs < one b{batch} batch — "
                         f"delete the dir to regenerate")

    init = {"image": preprocess(np.zeros((1, 224, 224, 3), np.uint8)),
            "question": jnp.zeros((1, vocab.max_seq_length), jnp.int32),
            "ques_len": jnp.ones((1,), jnp.int32)}
    state = create_train_state(model, jax.random.PRNGKey(0), init, 1e-4)
    if model.int8_stages:
        # static activation scales from one real data batch (production path)
        from vqa_tpu.train.calibrate import calibrate_model
        it = iter(loader)
        first = next(it)
        it.close()
        model = calibrate_model(model_name, model, state.variables(),
                                preprocess, [first["image"]],
                                log=lambda s: None)
    tx = make_optimizer(1e-4, state.params, vgg_trainable=False)
    train_step = make_train_step(model, tx, donate=True)

    def prepare(b):
        return {"image": preprocess(jnp.asarray(b["image"])),
                "question": jnp.asarray(b["question"]),
                "ques_len": jnp.asarray(b["ques_len"]),
                "label": jnp.asarray(b["label"])}

    stall = 0.0
    done = 0
    t0 = None
    it = device_prefetch(iter(loader), prepare, depth=2)
    while done < steps + 3:
        tw = time.perf_counter()
        try:
            db = next(it)
        except StopIteration:
            it = device_prefetch(iter(loader), prepare, depth=2)
            continue
        wait = time.perf_counter() - tw
        state, metrics = train_step(state, db)
        if done == 2:  # warmup/compile done; sync then start the clock
            float(metrics["loss"])
            t0 = time.perf_counter()
            stall = 0.0
        elif done > 2:
            stall += wait
        done += 1
    float(metrics["loss"])  # in-order queue: syncs every timed step
    dt = time.perf_counter() - t0
    qps = batch * steps / dt
    int8 = os.environ.get("BENCH_INT8") == "1"
    _emit({
        "metric": f"pipeline_train_qa_pairs_per_sec_{model_name}_b{batch}"
                  f"_w{workers}{'_int8' if int8 else ''}",
        "value": round(qps, 2),
        "unit": "qa_pairs_per_sec",
        "input_stall_fraction": round(stall / dt, 3),
        "vs_baseline": round(qps / REFERENCE_BASELINE_QPS, 3),
    })


def main():
    batch = int(os.environ.get("BENCH_BATCH", 160))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    model_name = os.environ.get("BENCH_MODEL", "attention")
    mode = os.environ.get("BENCH_MODE", "train")
    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    conv0_pallas = None if "BENCH_CONV0" not in os.environ \
        else os.environ["BENCH_CONV0"] == "1"
    if mode == "decode":
        return bench_decode()
    if mode == "pipeline":
        return bench_pipeline(model_name, batch, steps, use_pallas, conv0_pallas)
    image_size = 448 if model_name == "attention" else 224
    vocab_size, num_classes, seq_len = 10000, 1001, 23

    from vqa_tpu.config import build_model
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_train_step

    # BENCH_INT8 unset -> None = the model's own default policy (so a
    # default-on decision at a given opt_lvl shows up in the headline bench);
    # BENCH_INT8=1/0 forces it either way.
    model, _ = build_model(model_name, vocab_size, num_classes, opt_lvl=1,
                           use_pallas=use_pallas, conv0_pallas=conv0_pallas,
                           int8_backbone=None if "BENCH_INT8" not in os.environ
                           else os.environ["BENCH_INT8"] == "1",
                           fused_stem=os.environ.get("BENCH_FUSED") != "0")

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, image_size, image_size, 3), jnp.float32)
    ques = jax.random.randint(rng, (batch, seq_len), 1, vocab_size)
    lens = jnp.full((batch,), seq_len, jnp.int32)
    labels = jax.random.randint(rng, (batch,), 0, num_classes)

    init_batch = {"image": img[:1], "question": ques[:1], "ques_len": lens[:1]}
    state = create_train_state(model, rng, init_batch, learning_rate=1e-4)
    if model.int8_stages and os.environ.get("BENCH_INT8_DYNAMIC") != "1":
        # static calibrated activation scales (the production int8 path;
        # BENCH_INT8_DYNAMIC=1 keeps the r2 per-batch dynamic scales for A/B)
        amax = _bench_calib_amax(model_name, model.int8_stages)
        if amax is None:
            # live calibration: one tower forward at b8 (small shape keeps
            # the extra compile short; amax values are static constants, so
            # the timed program is identical to the sidecar path)
            from vqa_tpu.train.calibrate import (amax_tuple, collect_amax,
                                                 image_tower)
            enc, sub_vars = image_tower(model_name, model, state.variables())
            raw = collect_amax(enc, sub_vars, [img[: min(batch, 8)]])
            amax = amax_tuple(model.int8_stages, raw)
            if os.environ.get("BENCH_CALIB") == "save":
                data = {}
                if os.path.exists(BENCH_CALIB_FILE):
                    with open(BENCH_CALIB_FILE) as f:
                        data = json.load(f)
                data[model_name] = {"stages": list(model.int8_stages),
                                    "amax": [list(a) for a in amax]}
                # atomic publish (calibrate.save_calib's pattern): a killed
                # run must not leave a truncated committed sidecar behind
                tmp = f"{BENCH_CALIB_FILE}.tmp.{os.getpid()}"
                with open(tmp, "w") as f:
                    json.dump(data, f)
                os.replace(tmp, BENCH_CALIB_FILE)
        model = model.clone(int8_amax=amax)
    device_batch = {"image": img, "question": ques, "ques_len": lens, "label": labels}
    if mode == "cached":
        # frozen-tower feature-cache training (--cache_features): the image
        # entry is the cached conv-stack output; the step skips the conv
        # tower (baseline/bert keep the FC head + its dropout in-step).
        # Shapes derive from the boundary: conv stack downsamples 32x
        # (vqa_tpu/data/feature_cache.py), attention flattens to [S^2/1024, D]
        g = image_size // 32
        feat_shape = (g * g, 512) if model_name == "attention" else (g, g, 512)
        device_batch["image"] = jax.random.normal(
            rng, (batch,) + feat_shape, jnp.bfloat16)
    device_batch = jax.device_put(device_batch)

    # sync via host fetch: the axon PJRT tunnel's block_until_ready returns
    # before remote execution completes; a value read is the only barrier
    n_windows = max(1, int(os.environ.get("BENCH_WINDOWS", 3)))
    if mode == "eval":
        from vqa_tpu.train.steps import make_eval_step

        eval_step = make_eval_step(model)
        variables = state.variables()

        def run_window(n):
            nonlocal variables
            t0 = time.perf_counter()
            for _ in range(n):
                m = eval_step(variables, device_batch)
            # device execution is in-order: the last step's loss completes
            # after every queued step, so one fetch barriers all of them
            float(m["loss"])
            return time.perf_counter() - t0
    else:
        tx = make_optimizer(1e-4, state.params, vgg_trainable=False)
        grad_accum = int(os.environ.get("BENCH_GRAD_ACCUM", 1))
        if batch % max(grad_accum, 1):
            raise SystemExit(f"BENCH_GRAD_ACCUM={grad_accum} must divide "
                             f"BENCH_BATCH={batch}")
        train_step = make_train_step(model, tx, donate=True,
                                     image_is_features=(mode == "cached"),
                                     grad_accum=grad_accum)

        def run_window(n):
            nonlocal state
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics = train_step(state, device_batch)
            float(metrics["loss"])  # final loss depends on every prior step
            return time.perf_counter() - t0

    # Flushed pre-window status: if the driver's budget kills the run during
    # a new-shape compile (the r3 artifact failure mode), the tail says WHAT
    # was compiling instead of showing zero output.
    print(f"# compiling {mode} {model_name} b{batch}@{image_size}"
          f"{' ga' + os.environ['BENCH_GRAD_ACCUM'] if os.environ.get('BENCH_GRAD_ACCUM', '1') != '1' else ''}"
          f" (cache: {os.environ.get('JAX_COMPILATION_CACHE_DIR')}) ...",
          flush=True)
    run_window(2)  # warmup: first call compiles; second runs the real step
    print(f"# compile+warmup done at t+{time.perf_counter() - _T0:.0f}s; "
          f"budget left {_budget_left():.0f}s", flush=True)
    # If startup (compiles, calibration, imports) already blew the budget,
    # shrink the one guaranteed window so a line still prints promptly.
    if _budget_left() <= 0:
        steps = min(steps, 10)
    int8 = os.environ.get("BENCH_INT8") == "1"
    ga = int(os.environ.get("BENCH_GRAD_ACCUM", 1))
    metric = (f"{mode}_qa_pairs_per_sec_{model_name}_b{batch}"
              f"{'_pallas' if use_pallas else ''}{'_int8' if int8 else ''}"
              f"{f'_ga{ga}' if ga > 1 and mode not in ('eval',) else ''}")
    window_qps = []
    for w in range(n_windows):
        # the first window always runs; later ones must fit in the budget
        # (estimated from the previous window, with headroom for the fetch)
        if w > 0 and _budget_left() < 1.5 * (batch * steps / window_qps[-1]):
            break
        window_qps.append(batch * steps / run_window(steps))
        # max over windows: transient tunnel/host interference only ever
        # lowers a window's throughput, so the fastest window is the least-
        # biased estimate of steady-state device rate; one line per window
        # (the driver parses the LAST complete line — a timeout mid-window
        # still leaves the best-so-far result on stdout)
        _emit({
            "metric": metric,
            "value": round(max(window_qps), 2),
            "unit": "qa_pairs_per_sec",
            "windows": [round(q, 2) for q in window_qps],
            "vs_baseline": round(max(window_qps) / REFERENCE_BASELINE_QPS, 3),
        })


if __name__ == "__main__":
    main()
