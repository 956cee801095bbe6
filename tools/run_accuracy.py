"""Cross-framework accuracy experiment runner (BASELINE.md accuracy ladder).

Trains + evaluates ONE configuration on a synthetic dataset directory
(tools/make_synth_dataset.py) and prints a one-line JSON result. Both
frameworks consume the same files, vocab pickle, and random-init
torchvision-keyset VGG weights:

- ``--framework ref``: the UNMODIFIED torch reference
  (/root/reference/main.py) run as a subprocess with the API shims on
  PYTHONPATH (tools/refbench/shims: torchvision/apex/tensorboardX). Final
  val accuracy is parsed from its epoch-end log line.
- ``--framework tpu``: vqa_tpu.main in-process flags; accuracy parsed the
  same way (identical log format by design).

Example (the r3 K=12 grid drift matrix):
  python tools/make_synth_dataset.py --out_dir /tmp/gridvqa --task grid
  python tools/run_accuracy.py --framework ref --data_dir /tmp/gridvqa \
      --num_cls 12 --epochs 2
  python tools/run_accuracy.py --framework tpu --data_dir /tmp/gridvqa \
      --num_cls 12 --epochs 2 --opt_lvl 1
  python tools/run_accuracy.py --framework tpu --data_dir /tmp/gridvqa \
      --num_cls 12 --epochs 2 --opt_lvl 1 --int8 true
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_val_accuracy(text: str):
    """Final 'Validation Accuracy: X %  || Validation Loss: Y' occurrence."""
    hits = re.findall(r"Validation Accuracy: ([0-9.]+) %\s*\|\|\s*"
                      r"Validation Loss: ([0-9.]+)", text)
    return (float(hits[-1][0]), float(hits[-1][1])) if hits else (None, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--framework", choices=["ref", "tpu"], required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--model", default="baseline")
    ap.add_argument("--num_cls", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--opt_lvl", type=int, default=0)
    ap.add_argument("--bn_mode", default="auto",
                    help="tpu only; 'batch' reproduces the reference quirk")
    ap.add_argument("--int8", default="auto", help="tpu only")
    ap.add_argument("--vgg_train", default="false",
                    help="train the backbone end-to-end (both frameworks)")
    ap.add_argument("--vgg_wts", default="vgg11_bn_synth.pth",
                    help="weights file inside data_dir (--vgg_wts_path)")
    ap.add_argument("--save_interval", type=int, default=1000000)
    ap.add_argument("--int8_calib", type=int, default=-1,
                    help="tpu only: calibration batches (0 = r2 dynamic "
                         "per-batch scales, for the static-vs-dynamic row)")
    ap.add_argument("--seed", type=int, default=0,
                    help="tpu only: init/shuffle seed (seed-noise control "
                         "rows for the drift ladder)")
    ap.add_argument("--image_size", type=int, default=0,
                    help="model input size override (--image_size; both "
                         "frameworks; 224 keeps the 12-ep gate matrix at "
                         "the r3 ladder's footprint on the 448 attention "
                         "default)")
    ap.add_argument("--host_size", type=int, default=0,
                    help="tpu only: host decode size (device resizes to the "
                         "model size); 224 avoids 4x decode cost + H2D for "
                         "the 448-input attention model on 224 source JPEGs")
    ap.add_argument("--run_name", default=None)
    ap.add_argument("--expt_dir", default=None)
    args = ap.parse_args()

    d = args.data_dir
    run = args.run_name or f"{args.framework}_o{args.opt_lvl}_i{args.int8}" \
        f"_bn{args.bn_mode}_e{args.epochs}" \
        + ("_vt" if args.vgg_train == "true" else "") \
        + (f"_s{args.seed}" if args.seed else "") \
        + (f"_im{args.image_size}" if args.image_size else "")
    expt = args.expt_dir or os.path.join(d, "expts")
    n_val = sum(1 for _ in open(os.path.join(d, "val.txt")))
    common = [
        "--mode", "train", "--model", args.model,
        "--expt_dir", expt, "--expt_name", "acc", "--run_name", run,
        "--train_img", os.path.join(d, "imgs"),
        "--train_file", os.path.join(d, "train.txt"),
        "--val_img", os.path.join(d, "imgs"),
        "--val_file", os.path.join(d, "val.txt"),
        "--vocab_file", os.path.join(d, "vocab.pkl"),
        "--num_cls", str(args.num_cls),
        "--batch_size", str(args.batch_size),
        "--num_epochs", str(args.epochs),
        "--learning_rate", str(args.lr),
        "--opt_lvl", str(args.opt_lvl),
        # epoch-end full-val only: log_interval beyond any step count
        "--log_interval", "100000", "--save_interval", str(args.save_interval),
        "--val_size", str(n_val), "--vgg_train", args.vgg_train,
        "--vgg_wts_path", os.path.join(d, args.vgg_wts),
    ]
    if args.image_size:
        common += ["--image_size", str(args.image_size)]
    t0 = time.time()
    if args.framework == "ref":
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.join(REPO, "tools", "refbench", "shims")
        env.setdefault("OMP_NUM_THREADS", "4")
        proc = subprocess.run(
            [sys.executable, "/root/reference/main.py"] + common
            + ["--num_workers", "2"],
            env=env, cwd="/root/reference", capture_output=True, text=True)
        out = proc.stdout + proc.stderr
        if proc.returncode != 0:
            sys.stderr.write(out[-4000:])
            raise SystemExit(f"reference run failed ({proc.returncode})")
    else:
        cmd = [sys.executable, "-m", "vqa_tpu.main"] + common + [
            "--num_workers", "4", "--decode_backend", "native_mp",
            "--bn_mode", args.bn_mode, "--int8_backbone", args.int8]
        if args.host_size:
            cmd += ["--host_size", str(args.host_size)]
        if args.seed:
            cmd += ["--seed", str(args.seed)]
        if args.int8_calib >= 0:
            cmd += ["--int8_calib", str(args.int8_calib)]
        # matrix runs share compilations via vqa_tpu.main's own persistent
        # cache default (~/.cache/vqa_tpu; vqa_tpu/compile_cache.py)
        env = dict(os.environ)
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                              env=env)
        out = proc.stdout + proc.stderr
        if proc.returncode != 0:
            sys.stderr.write(out[-4000:])
            raise SystemExit(f"vqa_tpu run failed ({proc.returncode})")
    log_path = os.path.join(expt, "acc", run, "train_log.txt")
    text = open(log_path).read() if os.path.exists(log_path) else out
    acc, loss = last_val_accuracy(text)
    print(json.dumps({
        "framework": args.framework, "model": args.model,
        "opt_lvl": args.opt_lvl, "int8": args.int8, "bn_mode": args.bn_mode,
        "epochs": args.epochs, "batch_size": args.batch_size,
        "val_accuracy": acc, "val_loss": loss,
        "wall_min": round((time.time() - t0) / 60, 1), "run": run,
    }), flush=True)


if __name__ == "__main__":
    main()
