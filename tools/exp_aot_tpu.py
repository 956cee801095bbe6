"""AOT export validation on the real TPU (r5).

Exports the int8-default attention serving path — including the Pallas
conv0 kernel's Mosaic custom call and the int8-XLA chains — as a
serialized StableHLO artifact ON the TPU backend, deserializes it, and
compares served probabilities against the live predictor on identical
inputs. This is the real-Mosaic leg of tests/test_export.py (which runs
the XLA-fallback kernel set on CPU): it proves the deployment artifact
round-trips the production kernel set through serialize/deserialize with
bit-identical numerics.

    python tools/exp_aot_tpu.py            # ~3-6 min incl. compile
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    t0 = time.time()
    from vqa_tpu.serve import VQAPredictor
    from vqa_tpu.export import ExportedPredictor, export_predictor
    from vqa_tpu.vocab import Vocab, save_vocab
    import jax

    backend = jax.default_backend()
    print(f"# backend: {backend}", flush=True)

    work = "/tmp/aot_tpu"
    os.makedirs(work, exist_ok=True)
    data = os.path.join(work, "data.txt")
    with open(data, "w") as f:
        f.write("a.jpg\tis,the,cat,black\tyes\n"
                "b.jpg\twhat,color,is,the,dog\tbrown\n"
                "c.jpg\tis,this,a,cat\tno\n")
    vocab_pkl = os.path.join(work, "vocab.pkl")
    save_vocab(data, vocab_pkl, 1, 3)
    vocab = Vocab.load(vocab_pkl)

    # the committed bench calibration sidecar carries the attention model's
    # static int8 scales for the full default stage set
    calib_all = json.load(open(os.path.join(REPO, "tools/bench_calib.json")))
    calib_file = os.path.join(work, "calib_attention.json")
    with open(calib_file, "w") as f:
        json.dump(calib_all["attention"], f)

    size = int(os.environ.get("AOT_SIZE", 0)) or None  # CPU-smoke shrink
    predictor = VQAPredictor("attention", vocab, batch_size=16,
                             synthetic_images=True, opt_lvl=1,
                             calib_file=calib_file, image_size=size)
    stages = tuple(getattr(predictor.model, "int8_stages", ()) or ())
    print(f"# int8 stages: {stages}; image_size {predictor.image_size}",
          flush=True)

    paths = [f"{c}.jpg" for c in "abc"] * 5 + ["a.jpg"]
    qs = (["is,the,cat,black", "what,color,is,the,dog", "is,this,a,cat"] * 5
          + ["is,the,cat,black"])
    live = predictor.predict(paths, qs, top_k=3)
    print(f"# live predict done at t+{time.time()-t0:.0f}s", flush=True)

    art = os.path.join(work, "artifact")
    manifest = export_predictor(predictor, art, vocab_path=vocab_pkl)
    print(f"# exported {manifest['artifact_bytes']/1e6:.1f} MB for "
          f"{manifest['platforms']} at t+{time.time()-t0:.0f}s", flush=True)

    aot = ExportedPredictor(art, vocab, vocab_path=vocab_pkl,
                            synthetic_images=True).predict(paths, qs, top_k=3)
    max_dp = max(abs(a["prob"] - b["prob"]) for a, b in zip(live, aot))
    agree = all(a["answer"] == b["answer"] for a, b in zip(live, aot))
    print(json.dumps({
        "exp": "aot_tpu", "backend": backend, "int8_stages": list(stages),
        "artifact_mb": round(manifest["artifact_bytes"] / 1e6, 1),
        "n": len(live), "answers_agree": agree,
        "max_prob_delta": float(max_dp),
        "wall_s": round(time.time() - t0, 1)}), flush=True)
    # fp32 exports round-trip bit-exactly (tests/test_export.py); at the
    # bf16/int8 production policy the serialized module can fuse/fold
    # differently on recompile, so allow bf16-scale prob deltas
    assert agree and max_dp < 2e-3, (agree, max_dp)


if __name__ == "__main__":
    main()
