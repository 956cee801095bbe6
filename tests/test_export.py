"""AOT serving-artifact export/load tests (vqa_tpu.export, CPU).

The exported StableHLO module must reproduce the live predictor's
numerics exactly (same weights baked as constants, same preprocess +
forward + softmax graph), and the manifest must protect the deployment
contract (vocab fingerprint, platform set, format version).
"""

import json
import os

import numpy as np
import pytest

from vqa_tpu.export import (ARTIFACT, MANIFEST, ExportedPredictor,
                            export_predictor)
from vqa_tpu.serve import VQAPredictor, main as serve_main
from vqa_tpu.vocab import Vocab, save_vocab


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("export")
    lines = ["a.jpg\tis,the,cat,black\tyes",
             "b.jpg\twhat,color,is,the,dog\tbrown",
             "c.jpg\tis,this,a,cat\tno"]
    data = root / "data.txt"
    data.write_text("\n".join(lines) + "\n")
    vocab_file = root / "vocab.pkl"
    save_vocab(str(data), str(vocab_file), 1, 3)
    return {"root": str(root), "data": str(data), "vocab": str(vocab_file)}


@pytest.fixture(scope="module")
def exported(setup, tmp_path_factory):
    """One attention-model predictor + its exported artifact, shared."""
    art = str(tmp_path_factory.mktemp("art"))
    vocab = Vocab.load(setup["vocab"])
    predictor = VQAPredictor("attention", vocab, batch_size=2,
                             synthetic_images=True, image_size=32,
                             opt_lvl=0)
    manifest = export_predictor(predictor, art, vocab_path=setup["vocab"])
    return {"predictor": predictor, "art": art, "manifest": manifest,
            "vocab": vocab}


class TestExportRoundTrip:
    def test_manifest_contract(self, exported, setup):
        m = exported["manifest"]
        assert m["format"] == "vqa_tpu.export.v1"
        assert m["model"] == "attention"
        assert (m["batch_size"], m["image_size"]) == (2, 32)
        assert m["num_classes"] == exported["predictor"].num_classes
        assert "cpu" in m["platforms"]
        assert m["artifact_bytes"] > 0
        on_disk = json.load(open(os.path.join(exported["art"], MANIFEST)))
        assert on_disk == m
        assert os.path.getsize(os.path.join(exported["art"], ARTIFACT)) \
            == m["artifact_bytes"]

    def test_numerics_identical_to_live_predictor(self, exported, setup):
        ep = ExportedPredictor(exported["art"], exported["vocab"],
                               vocab_path=setup["vocab"],
                               synthetic_images=True)
        paths = [os.path.join(setup["root"], n)
                 for n in ("a.jpg", "b.jpg", "c.jpg")]
        qs = ["is,the,cat,black", "what,color,is,the,dog", "is,this,a,cat"]
        live = exported["predictor"].predict(paths, qs, top_k=3)
        aot = ep.predict(paths, qs, top_k=3)
        assert len(live) == len(aot) == 3
        for a, b in zip(live, aot):
            assert a["answer"] == b["answer"]
            np.testing.assert_allclose(a["prob"], b["prob"], atol=1e-6)
            for (la, pa), (lb, pb) in zip(a["topk"], b["topk"]):
                assert la == lb
                np.testing.assert_allclose(pa, pb, atol=1e-6)

    def test_vocab_fingerprint_mismatch_raises(self, exported, tmp_path):
        other = tmp_path / "other.txt"
        other.write_text("x.jpg\tsome,other,words\tmaybe\n")
        other_vocab = tmp_path / "other_vocab.pkl"
        save_vocab(str(other), str(other_vocab), 1, 2)
        with pytest.raises(ValueError, match="fingerprint"):
            ExportedPredictor(exported["art"], Vocab.load(str(other_vocab)),
                              vocab_path=str(other_vocab))

    def test_wrong_platform_raises(self, exported, setup, tmp_path):
        art2 = tmp_path / "art_tpu_only"
        art2.mkdir()
        os.link(os.path.join(exported["art"], ARTIFACT),
                str(art2 / ARTIFACT))
        m = dict(exported["manifest"], platforms=["tpu"])
        (art2 / MANIFEST).write_text(json.dumps(m))
        with pytest.raises(ValueError, match="platform"):
            ExportedPredictor(str(art2), exported["vocab"],
                              vocab_path=setup["vocab"])

    def test_unknown_format_raises(self, exported, setup, tmp_path):
        art3 = tmp_path / "art_badfmt"
        art3.mkdir()
        (art3 / MANIFEST).write_text(json.dumps({"format": "v999"}))
        with pytest.raises(ValueError, match="format"):
            ExportedPredictor(str(art3), exported["vocab"])

    def test_uncalibrated_int8_refuses_export(self, setup, tmp_path):
        vocab = Vocab.load(setup["vocab"])
        p = VQAPredictor("attention", vocab, batch_size=2,
                         synthetic_images=True, image_size=32,
                         opt_lvl=1, int8_backbone=True)
        if not p._needs_calib:
            pytest.skip("int8 scales resolved on this config")
        with pytest.raises(ValueError, match="calib"):
            export_predictor(p, str(tmp_path / "art"))


class TestServeCLIExport:
    def test_export_to_then_from_export(self, setup, tmp_path):
        art = str(tmp_path / "cli_art")
        # 1. export-only invocation (no --input required)
        serve_main(["--model", "attention", "--vocab_file", setup["vocab"],
                    "--export_to", art, "--batch_size", "2",
                    "--image_size", "32", "--opt_lvl", "0",
                    "--synthetic_images"])
        assert os.path.exists(os.path.join(art, ARTIFACT))
        # 2. serve from the artifact — no --model, no --model_ckpt
        out_aot = tmp_path / "aot.jsonl"
        serve_main(["--from_export", art, "--vocab_file", setup["vocab"],
                    "--img_dir", setup["root"], "--input", setup["data"],
                    "--output", str(out_aot), "--synthetic_images",
                    "--top_k", "2"])
        # 3. the live path on the same (deterministic PRNGKey(0)) init
        out_live = tmp_path / "live.jsonl"
        serve_main(["--model", "attention", "--vocab_file", setup["vocab"],
                    "--img_dir", setup["root"], "--input", setup["data"],
                    "--output", str(out_live), "--batch_size", "2",
                    "--image_size", "32", "--opt_lvl", "0",
                    "--synthetic_images", "--top_k", "2"])
        aot = [json.loads(l) for l in open(out_aot)]
        live = [json.loads(l) for l in open(out_live)]
        assert len(aot) == len(live) == 3
        for a, b in zip(aot, live):
            assert (a["image"], a["question"], a["answer"]) \
                == (b["image"], b["question"], b["answer"])
            np.testing.assert_allclose(a["prob"], b["prob"], atol=1e-6)

    def test_cli_flag_validation(self, setup, tmp_path, capsys):
        with pytest.raises(SystemExit):
            serve_main(["--vocab_file", setup["vocab"],
                        "--input", setup["data"]])   # no --model, no export
        with pytest.raises(SystemExit):
            serve_main(["--model", "baseline",
                        "--vocab_file", setup["vocab"]])  # no --input/--export_to
