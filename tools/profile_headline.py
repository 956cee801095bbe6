"""Per-kernel device profile + roofline of the headline train step (r5).

VERDICT r4 item 1: the "at the wall" perf position rested on A/B probe
arithmetic. This tool captures a real ``jax.profiler`` device trace of the
exact bench.py headline config (attention b160@448, int8 stage set, fused
stem, static calibrated scales) through the axon tunnel — which returns a
full XLA-Ops timeline with ``device_duration_ps``, ``bytes_accessed`` and
``model_flops`` per op — and reduces it to:

  (a) a per-kernel table attributing the whole step (ms, GFLOP, MB moved,
      achieved TF/s and GB/s per op group), and
  (b) a roofline verdict per group: time at the MXU floor
      (flops / peak) and at the HBM floor (bytes / bandwidth) vs measured
      — "at floor" or "headroom X ms".

Peaks used (TPU v5e, 1 chip): 197 TFLOP/s bf16, 394 TOP/s int8,
819 GB/s HBM. The step's MFU is reported against both the bf16 peak and
the in-graph demonstrated 227 TF/s batched-dot rate (BASELINE.md r2 —
matmul-shaped peak measured on this very chip through this tunnel).

Usage (real TPU):
    python tools/profile_headline.py            # train step, 5 traced steps
    BENCH_MODE=eval python tools/profile_headline.py
    PROFILE_STEPS=10 PROFILE_OUT=/tmp/prof python tools/profile_headline.py

Writes <out>/profile_table.md (the BASELINE.md-ready table) and
<out>/profile_ops.json (full per-op dump).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.compile_cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

PEAK_BF16 = 197e12          # v5e MXU peak, bf16
PEAK_INT8 = 394e12          # v5e MXU peak, int8
PEAK_DEMONSTRATED = 227e12  # in-graph batched-dot rate measured r2 (BASELINE.md)
HBM_BW = 819e9              # v5e HBM bandwidth


def build_headline_step():
    """The bench.py headline: attention b160@448 int8+fused-stem train step."""
    import jax
    import jax.numpy as jnp

    from vqa_tpu.config import build_model
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_eval_step, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", 160))
    image_size = 448
    vocab_size, num_classes, seq_len = 10000, 1001, 23
    mode = os.environ.get("BENCH_MODE", "train")

    model, _ = build_model("attention", vocab_size, num_classes, opt_lvl=1)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, image_size, image_size, 3), jnp.float32)
    ques = jax.random.randint(rng, (batch, seq_len), 1, vocab_size)
    lens = jnp.full((batch,), seq_len, jnp.int32)
    labels = jax.random.randint(rng, (batch,), 0, num_classes)

    init_batch = {"image": img[:1], "question": ques[:1], "ques_len": lens[:1]}
    state = create_train_state(model, rng, init_batch, learning_rate=1e-4)
    if model.int8_stages:
        # committed static scales (tools/bench_calib.json) — same path as bench
        calib_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "bench_calib.json")
        with open(calib_file) as f:
            entry = json.load(f)["attention"]
        assert tuple(entry["stages"]) == tuple(model.int8_stages), \
            (entry["stages"], model.int8_stages)
        amax = tuple(tuple(float(x) for x in v) for v in entry["amax"])
        model = model.clone(int8_amax=amax)
    batch_d = jax.device_put({"image": img, "question": ques,
                              "ques_len": lens, "label": labels})
    if mode == "eval":
        eval_step = make_eval_step(model)
        variables = state.variables()

        def run_once():
            return eval_step(variables, batch_d)["loss"]
    else:
        tx = make_optimizer(1e-4, state.params, vgg_trainable=False)
        train_step = make_train_step(model, tx, donate=False)

        def run_once():
            _, m = train_step(state, batch_d)
            return m["loss"]

    return run_once, batch, mode


def capture_trace(run_once, out_dir: str, steps: int) -> str:
    import jax

    print("# compiling / warming up ...", flush=True)
    t0 = time.perf_counter()
    float(run_once())
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)
    float(run_once())

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        loss = run_once()
    float(loss)  # tunnel barrier: host fetch, not block_until_ready
    jax.profiler.stop_trace()
    traces = sorted(glob.glob(
        os.path.join(out_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert traces, f"no trace written under {out_dir}"
    return traces[-1]


def _short_group(ev_name: str, args: dict) -> str:
    """Stable-ish grouping key: jax op provenance + operand shape."""
    tf_op = args.get("tf_op", "") or ev_name
    # strip per-instance suffixes like '.123'
    tf_op = re.sub(r"\.\d+$", "", tf_op.strip())
    shape = args.get("shape_with_layout", "")
    m = re.match(r"^[a-z0-9]+\[[^\]]*\]", shape)
    return f"{tf_op} -> {m.group(0) if m else shape[:40]}"


def parse(trace_path: str, steps: int):
    with gzip.open(trace_path) as f:
        data = json.load(f)
    evs = data["traceEvents"]
    # device pid: process whose name starts with /device:
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and str(e.get("args", {}).get("name", "")).startswith("/device:")}
    tid_names = {(e["pid"], e.get("tid")): e["args"]["name"] for e in evs
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}

    modules = []   # whole-executable timings
    ops = []       # XLA Ops track
    async_ops = []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        track = tid_names.get((e["pid"], e.get("tid")), "")
        a = e.get("args", {})
        rec = {
            "name": e.get("name", ""),
            "dur_us": float(a.get("device_duration_ps", 0)) / 1e6
                      or float(e.get("dur", 0)),
            "flops": float(a.get("model_flops", 0) or 0),
            "bytes": float(a.get("raw_bytes_accessed",
                                 a.get("bytes_accessed", 0)) or 0),
            "category": a.get("hlo_category", ""),
            "tf_op": a.get("tf_op", ""),
            "long_name": a.get("long_name", "")[:300],
            "shape": a.get("shape_with_layout", "")[:120],
            "group": _short_group(e.get("name", ""), a),
        }
        if track == "XLA Modules":
            modules.append(rec)
        elif track == "XLA Ops":
            ops.append(rec)
        elif track == "Async XLA Ops":
            async_ops.append(rec)
    return modules, ops, async_ops


def roofline_rows(ops, steps: int):
    groups = defaultdict(lambda: {"us": 0.0, "flops": 0.0, "bytes": 0.0,
                                  "n": 0, "category": "", "example": ""})
    for op in ops:
        g = groups[op["group"]]
        g["us"] += op["dur_us"]
        g["flops"] += op["flops"]
        g["bytes"] += op["bytes"]
        g["n"] += 1
        g["category"] = op["category"]
        g["example"] = g["example"] or op["long_name"]
    rows = []
    for name, g in groups.items():
        ms = g["us"] / 1e3 / steps
        flops = g["flops"] / steps
        nbytes = g["bytes"] / steps
        # int8 ops are recognizable from operand dtypes in the example hlo
        int8 = "s8[" in g["example"] or "s8[" in name
        peak = PEAK_INT8 if int8 else PEAK_BF16
        mxu_floor_ms = flops / peak * 1e3
        hbm_floor_ms = nbytes / HBM_BW * 1e3
        floor_ms = max(mxu_floor_ms, hbm_floor_ms)
        rows.append({
            "group": name, "category": g["category"], "calls": g["n"] // steps,
            "ms": ms, "gflop": flops / 1e9, "mb": nbytes / 1e6,
            "tf_s": flops / (g["us"] / steps) / 1e6 if g["us"] else 0.0,
            "gb_s": nbytes / (g["us"] / steps) / 1e3 if g["us"] else 0.0,
            "mxu_floor_ms": mxu_floor_ms, "hbm_floor_ms": hbm_floor_ms,
            "floor_ms": floor_ms,
            "bound": ("MXU" if mxu_floor_ms >= hbm_floor_ms else "HBM"),
            "headroom_ms": max(0.0, ms - floor_ms),
            "int8": int8,
            "example": g["example"],
        })
    rows.sort(key=lambda r: -r["ms"])
    return rows


def main():
    steps = int(os.environ.get("PROFILE_STEPS", 5))
    out_dir = os.environ.get("PROFILE_OUT", "/tmp/vqa_profile")
    run_once, batch, mode = build_headline_step()
    trace_path = capture_trace(run_once, out_dir, steps)
    print(f"# trace: {trace_path}", flush=True)
    modules, ops, async_ops = parse(trace_path, steps)

    mod_groups = defaultdict(float)
    mod_counts = defaultdict(int)
    for m in modules:
        key = re.sub(r"\(\d+\)$", "", m["name"])
        mod_groups[key] += m["dur_us"]
        mod_counts[key] += 1
    step_ms = sum(mod_groups.values()) / 1e3 / steps

    rows = roofline_rows(ops, steps)
    total_ms = sum(r["ms"] for r in rows)
    total_flops = sum(r["gflop"] for r in rows) * 1e9
    total_bytes = sum(r["mb"] for r in rows) * 1e6
    floor_ms_total = sum(r["floor_ms"] for r in rows)

    lines = []
    lines.append(f"## Headline device profile ({mode} b{batch}@448, "
                 f"{steps} traced steps)")
    lines.append("")
    lines.append(f"- module time/step: **{step_ms:.2f} ms** "
                 f"({', '.join(f'{k}: {v / 1e3 / steps:.2f} ms ({c // steps}x)' for k, v in mod_groups.items() for c in [mod_counts[k]])})")
    lines.append(f"- XLA-op busy time/step: {total_ms:.2f} ms; "
                 f"total {total_flops / 1e12:.2f} TFLOP, "
                 f"{total_bytes / 1e9:.2f} GB moved")
    lines.append(f"- effective: {total_flops / (step_ms / 1e3) / 1e12:.1f} TF/s "
                 f"({total_flops / (step_ms / 1e3) / PEAK_BF16 * 100:.0f}% of "
                 f"bf16 peak, {total_flops / (step_ms / 1e3) / PEAK_DEMONSTRATED * 100:.0f}% of the in-graph 227 TF/s), "
                 f"{total_bytes / (step_ms / 1e3) / 1e9:.0f} GB/s "
                 f"({total_bytes / (step_ms / 1e3) / HBM_BW * 100:.0f}% of HBM BW)")
    lines.append(f"- sum of per-op roofline floors: {floor_ms_total:.2f} ms "
                 f"(perfect-overlap lower bound vs {step_ms:.2f} ms measured)")
    lines.append("")
    lines.append("| op group | cat | ms | GFLOP | MB | TF/s | GB/s | bound | floor ms | headroom ms |")
    lines.append("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows[:40]:
        lines.append(
            f"| {r['group'][:70]} | {r['category'][:16]} | {r['ms']:.3f} | "
            f"{r['gflop']:.1f} | {r['mb']:.1f} | {r['tf_s']:.0f} | "
            f"{r['gb_s']:.0f} | {r['bound']}{'/i8' if r['int8'] else ''} | "
            f"{r['floor_ms']:.3f} | {r['headroom_ms']:.3f} |")
    rest_ms = sum(r["ms"] for r in rows[40:])
    if rest_ms:
        lines.append(f"| (all {len(rows) - 40} remaining groups) |  | "
                     f"{rest_ms:.3f} |  |  |  |  |  |  |  |")
    table = "\n".join(lines)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "profile_table.md"), "w") as f:
        f.write(table + "\n")
    with open(os.path.join(out_dir, "profile_ops.json"), "w") as f:
        json.dump({"steps": steps, "step_ms": step_ms, "rows": rows,
                   "modules": {k: v / 1e3 / steps for k, v in mod_groups.items()},
                   "async_ms": sum(a["dur_us"] for a in async_ops) / 1e3 / steps},
                  f, indent=1)
    print(table)
    print(f"# wrote {out_dir}/profile_table.md and profile_ops.json", flush=True)


if __name__ == "__main__":
    main()
