"""One-command real-data dress rehearsal (r4 VERDICT item 6).

Chains the full production sequence a real VQA-v2/COCO drop would run —
each stage through the real CLI surface, not test shims:

  1. ``vqa_tpu.prepare_data`` on VQA-v2-schema annotation+question JSON
     (real files via --ann/--ques, or a generated real-schema pair)
  2. real JPEG files on disk under the COCO names the ETL emitted
     (--img_dir, or synthesized 64x64 JPEGs for the rehearsal)
  3. ``vqa_tpu.main --mode train`` with the real decode path
     (``--decode native_mp``, no --synthetic_images)
  4. ``vqa_tpu.main --mode test --test_out_format vqa`` -> official
     results JSON (one record per val line, question_id = line index,
     main.py:880-889)
  5. ``datahelper.VQA.loadRes`` round-trip on that JSON (+ accuracy when
     the annotation question_ids align with line order, as VQA-v2's do
     after prepare_data preserves annotation order)
  6. ``vqa_tpu.serve`` smoke on the trained checkpoint

Rehearsal (synthetic data, CPU):
    python tools/dress_rehearsal.py

Real drop (the run book — paths to the real artifacts, real TPU):
    python tools/dress_rehearsal.py --ann v2_mscoco_train2014_annotations.json \
        --ques v2_OpenEnded_mscoco_train2014_questions.json \
        --img_dir train2014/ --platform '' --epochs 12 --batch_size 160 \
        --image_size 448 --model attention --num_cls 1000

Reference contract: /root/reference/prepare_data.py:84-98 (ETL),
/root/reference/datahelper.py:149-183 (loadRes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(f"[rehearsal] {msg}", flush=True)


def run_cli(argv: list[str], env_extra: dict | None = None) -> None:
    env = dict(os.environ)
    env.update(env_extra or {})
    log("$ " + " ".join(argv))
    t0 = time.perf_counter()
    subprocess.run(argv, check=True, env=env, cwd=REPO)
    log(f"  done in {time.perf_counter() - t0:.1f}s")


def make_synthetic_vqa_json(work: str, n_images: int = 8,
                            per_image: int = 3) -> tuple[str, str]:
    """A VQA-v2-schema annotation/question pair (the tests' fixture shape,
    tests/test_prepare_data.py) with question_id = emit order, matching
    the real files' property that loadRes scoring relies on."""
    templates = [
        ("what is", "What is on the {}?", ["cat", "dog", "book"]),
        ("is the", "Is the {} asleep?", ["yes", "no"]),
        ("what color", "What color is the {}?", ["black", "brown", "white"]),
    ]
    nouns = ["bed", "cat", "table", "dog", "chair", "sofa", "desk", "car"]
    annotations, questions = [], []
    qid = 0
    for img in range(n_images):
        image_id = 1000 + img * 37  # non-contiguous, like real COCO ids
        for k in range(per_image):
            qtype, qtmpl, answers = templates[k % len(templates)]
            ans = answers[(img + k) % len(answers)]
            annotations.append({
                "image_id": image_id, "question_id": qid,
                "question_type": qtype,
                "answer_type": "yes/no" if ans in ("yes", "no") else "other",
                "multiple_choice_answer": ans,
                "answers": [{"answer": ans, "answer_id": 1,
                             "answer_confidence": "yes"}]})
            questions.append({"question_id": qid, "image_id": image_id,
                              "question": qtmpl.format(nouns[img])})
            qid += 1
    ann = os.path.join(work, "annotations.json")
    ques = os.path.join(work, "questions.json")
    # real VQA-v2 files carry these header keys; loadRes copies them
    header = {"info": {"version": "2.0"}, "task_type": "Open-Ended",
              "data_type": "mscoco", "data_subtype": "train2014",
              "license": {}}
    with open(ann, "w") as f:
        json.dump(dict(header, annotations=annotations), f)
    with open(ques, "w") as f:
        json.dump(dict(header, questions=questions), f)
    return ann, ques


def synthesize_images(img_dir: str, names: set, size: int = 64) -> int:
    import numpy as np
    from PIL import Image

    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    made = 0
    for name in sorted(names):
        p = os.path.join(img_dir, name)
        if not os.path.exists(p):
            Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                         dtype=np.uint8), "RGB").save(p)
            made += 1
    return made


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ann", default=None, help="VQA-v2 annotation JSON "
                   "(default: generate a synthetic real-schema pair)")
    p.add_argument("--ques", default=None, help="VQA-v2 question JSON")
    p.add_argument("--img_dir", default=None,
                   help="dir of COCO-named JPEGs (default: synthesize)")
    p.add_argument("--work_dir", default="/tmp/vqa_dress_rehearsal")
    p.add_argument("--model", default="baseline")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--num_cls", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--platform", default="cpu",
                   help="JAX_PLATFORMS for the child CLIs ('' = machine "
                        "default, i.e. the real TPU)")
    args = p.parse_args(argv)

    work = args.work_dir
    os.makedirs(work, exist_ok=True)
    env = {"JAX_PLATFORMS": args.platform} if args.platform else {}
    t_start = time.perf_counter()

    # -- 1. ETL ------------------------------------------------------------
    ann, ques = (args.ann, args.ques)
    if ann is None or ques is None:
        ann, ques = make_synthetic_vqa_json(work)
        log(f"generated synthetic VQA-v2-schema JSON: {ann}, {ques}")
    train_txt = os.path.join(work, "train.txt")
    vocab_pkl = os.path.join(work, "vocab.pkl")
    run_cli([sys.executable, "-m", "vqa_tpu.prepare_data",
             "--balanced_real_images", "-s", "train", "-a", ann, "-q", ques,
             "-o", train_txt, "-v", vocab_pkl, "-c", "1",
             "-K", str(args.num_cls)], env)
    lines = open(train_txt).read().strip().split("\n")
    names = {ln.split("\t")[0] for ln in lines}
    log(f"ETL emitted {len(lines)} QA pairs over {len(names)} images")

    # -- 2. images ----------------------------------------------------------
    img_dir = args.img_dir or os.path.join(work, "imgs")
    if args.img_dir is None:
        made = synthesize_images(img_dir, names)
        log(f"synthesized {made} JPEGs under COCO names in {img_dir}")
    missing = [n for n in names if not os.path.exists(os.path.join(img_dir, n))]
    if missing:
        raise SystemExit(f"{len(missing)} referenced images missing from "
                         f"{img_dir}, e.g. {missing[:3]}")

    # -- 3. train (real decode path: JPEG -> native_mp workers) -------------
    expt = os.path.join(work, "expt")
    common = ["--model", args.model, "--vocab_file", vocab_pkl,
              "--expt_dir", expt, "--expt_name", "rehearsal", "--run_name",
              "r", "--batch_size", str(args.batch_size),
              "--num_cls", str(args.num_cls),
              "--num_workers", str(args.num_workers),
              "--image_size", str(args.image_size), "--opt_lvl",
              "0" if args.platform == "cpu" else "1",
              "--decode", "native_mp"]
    run_cli([sys.executable, "-m", "vqa_tpu.main", "--mode", "train",
             "--train_img", img_dir, "--train_file", train_txt,
             "--num_epochs", str(args.epochs), "--save_interval", "1",
             "--log_interval", "5"] + common, env)
    run_dir = os.path.join(expt, "rehearsal", "r")
    ckpts = sorted((f for f in os.listdir(run_dir) if f.startswith("model_")),
                   key=lambda f: int(f.split("_")[1].split(".")[0]))
    assert ckpts, f"no checkpoint written under {run_dir}"
    log(f"trained; latest checkpoint {ckpts[-1]}")

    # -- 4. test mode -> official results JSON -------------------------------
    results = os.path.join(work, "results_vqa.json")
    run_cli([sys.executable, "-m", "vqa_tpu.main", "--mode", "test",
             "--val_img", img_dir, "--val_file", train_txt,
             "--model_ckpt", ckpts[-1], "--test_out", results,
             "--test_out_format", "vqa"] + common, env)

    # -- 5. loadRes round-trip ------------------------------------------------
    sys.path.insert(0, REPO)
    from vqa_tpu.datahelper import VQA

    helper = VQA(ann, ques)
    res = VQA.loadRes(helper, results, ques)
    recs = json.load(open(results))
    assert len(recs) == len(lines), (len(recs), len(lines))
    emitted_qids = [r["question_id"] for r in recs]
    ann_qids = [a["question_id"] for a in json.load(open(ann))["annotations"]]
    if emitted_qids == ann_qids:
        gt = {a["question_id"]: a["multiple_choice_answer"]
              for a in json.load(open(ann))["annotations"]}
        acc = 100.0 * sum(res.qa[q]["answer"] == gt[q]
                          for q in emitted_qids) / len(emitted_qids)
        log(f"loadRes round-trip OK; accuracy vs GT: {acc:.2f}% "
            f"({len(emitted_qids)} questions)")
    else:
        log("loadRes round-trip OK (format validated); question_ids are "
            "line indices — remap to annotation ids before official scoring")

    # -- 6. serve smoke ---------------------------------------------------------
    preds = os.path.join(work, "serve_preds.jsonl")
    run_cli([sys.executable, "-m", "vqa_tpu.serve", "--model", args.model,
             "--vocab_file", vocab_pkl,
             "--model_ckpt", os.path.join(run_dir, ckpts[-1]),
             "--img_dir", img_dir, "--input", train_txt, "--output", preds,
             "--batch_size", str(args.batch_size),
             "--image_size", str(args.image_size), "--opt_lvl", "0"], env)
    served = [json.loads(ln) for ln in open(preds)]
    assert len(served) == len(lines)
    assert all({"image", "question", "answer", "prob"} <= set(r) for r in served)
    log(f"serve smoke OK ({len(served)} predictions)")

    log(f"DRESS REHEARSAL PASS in {time.perf_counter() - t_start:.1f}s "
        f"(work dir: {work})")


if __name__ == "__main__":
    main()
