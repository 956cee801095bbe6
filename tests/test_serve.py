"""Inference/serving engine tests (CPU)."""

import json
import os

import numpy as np
import pytest

from vqa_tpu.serve import VQAPredictor, main as serve_main
from vqa_tpu.vocab import Vocab, save_vocab


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    lines = ["a.jpg\tis,the,cat,black\tyes",
             "b.jpg\twhat,color,is,the,dog\tbrown",
             "c.jpg\tis,this,a,cat\tno"]
    data = root / "data.txt"
    data.write_text("\n".join(lines) + "\n")
    vocab_file = root / "vocab.pkl"
    save_vocab(str(data), str(vocab_file), 1, 3)
    return {"root": str(root), "data": str(data), "vocab": str(vocab_file)}


class TestPredictor:
    @pytest.fixture(scope="class")
    def predictor(self, setup):
        vocab = Vocab.load(setup["vocab"])
        return VQAPredictor("baseline", vocab, batch_size=2,
                            synthetic_images=True, image_size=32, opt_lvl=0)

    def test_predict_shapes_and_labels(self, predictor, setup):
        paths = [os.path.join(setup["root"], n) for n in ("a.jpg", "b.jpg", "c.jpg")]
        qs = ["is,the,cat,black", "what,color,is,the,dog", "is,this,a,cat"]
        results = predictor.predict(paths, qs, top_k=2)
        assert len(results) == 3  # 2 full + 1 padded partial batch, same program
        for r in results:
            assert r["answer"] in predictor.vocab.label2idx
            assert 0.0 <= r["prob"] <= 1.0
            assert len(r["topk"]) == 2

    def test_padding_does_not_change_results(self, predictor, setup):
        paths = [os.path.join(setup["root"], "a.jpg")]
        qs = ["is,the,cat,black"]
        single = predictor.predict(paths, qs)[0]
        batch = predictor.predict(paths * 2, qs * 2)[0]
        assert single["answer"] == batch["answer"]
        np.testing.assert_allclose(single["prob"], batch["prob"], atol=1e-5)

    def test_unknown_words_handled(self, predictor, setup):
        r = predictor.predict([os.path.join(setup["root"], "a.jpg")],
                              ["completely,unseen,words,here"])[0]
        assert r["answer"] in predictor.vocab.label2idx


class TestServeCLI:
    def test_end_to_end_jsonl(self, setup, tmp_path):
        out = tmp_path / "preds.jsonl"
        serve_main(["--model", "baseline", "--vocab_file", setup["vocab"],
                    "--img_dir", setup["root"], "--input", setup["data"],
                    "--output", str(out), "--batch_size", "2", "--image_size", "32",
                    "--synthetic_images", "--opt_lvl", "0", "--top_k", "2"])
        lines = out.read_text().strip().split("\n")
        assert len(lines) == 3
        rec = json.loads(lines[0])
        assert set(rec) >= {"image", "question", "answer", "prob", "topk"}


class TestAttentionPredictor:
    def test_attention_ckpt_head_inference_and_predict(self, setup, tmp_path):
        """Serving the attention model: head size inferred from mlp_classify
        (serve.py:_infer_num_classes), co-attention path compiles + predicts."""
        import jax
        import jax.numpy as jnp

        from vqa_tpu.config import build_model
        from vqa_tpu.train.checkpoint import save_checkpoint
        from vqa_tpu.train.state import create_train_state

        vocab = Vocab.load(setup["vocab"])
        model, _ = build_model("attention", vocab.size, vocab.num_labels,
                               opt_lvl=0)
        init = {"image": jnp.zeros((1, 32, 32, 3)),
                "question": jnp.zeros((1, vocab.max_seq_length), jnp.int32),
                "ques_len": jnp.ones((1,), jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(0), init, 1e-3)
        ckpt = save_checkpoint(state, str(tmp_path), 1)

        predictor = VQAPredictor("attention", vocab, ckpt, batch_size=2,
                                 synthetic_images=True, image_size=32,
                                 opt_lvl=0)
        assert predictor.num_classes == vocab.num_labels
        r = predictor.predict([os.path.join(setup["root"], "a.jpg")],
                              ["is,the,cat,black"])[0]
        assert r["answer"] in vocab.label2idx
        assert 0.0 <= r["prob"] <= 1.0


class TestServeFromTrainedCheckpoint:
    @pytest.mark.slow
    def test_train_then_serve(self, setup, tmp_path):
        """The train CLI's checkpoint loads into the serving engine."""
        from vqa_tpu.main import main as train_main

        expt = str(tmp_path / "expt")
        train_main(["--mode", "train", "--model", "baseline",
                    "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
                    "--train_img", setup["root"], "--train_file", setup["data"],
                    "--vocab_file", setup["vocab"], "--batch_size", "2",
                    "--num_epochs", "2", "--num_cls", "3", "--num_workers", "1",
                    "--synthetic_images", "true", "--image_size", "32",
                    "--opt_lvl", "0", "--save_interval", "2",
                    "--log_interval", "100"])
        ckpt = os.path.join(expt, "e", "r", "model_2.ckpt")
        assert os.path.exists(ckpt)

        vocab = Vocab.load(setup["vocab"])
        predictor = VQAPredictor("baseline", vocab, ckpt, num_cls=3,
                                 batch_size=2, synthetic_images=True,
                                 image_size=32, opt_lvl=0)
        r = predictor.predict([os.path.join(setup["root"], "a.jpg")],
                              ["is,the,cat,black"])[0]
        assert r["answer"] in vocab.label2idx


class TestInt8Sidecar:
    """Serving with --int8_backbone: static scales load from the
    checkpoint's int8_calib.json sidecar (serve.py:VQAPredictor.__init__);
    without one they auto-calibrate from the first request batch (or an
    explicit --calib_file); dynamic per-batch scales only behind
    --int8_dynamic (batch-dependent predictions, BASELINE.md r3)."""

    def _ckpt(self, setup, run_dir):
        import jax
        import jax.numpy as jnp

        from vqa_tpu.config import build_model
        from vqa_tpu.train.checkpoint import save_checkpoint
        from vqa_tpu.train.state import create_train_state

        vocab = Vocab.load(setup["vocab"])
        model, _ = build_model("baseline", vocab.size, vocab.num_labels,
                               opt_lvl=0)
        init = {"image": jnp.zeros((1, 32, 32, 3)),
                "question": jnp.zeros((1, vocab.max_seq_length), jnp.int32),
                "ques_len": jnp.ones((1,), jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(0), init, 1e-3)
        return vocab, save_checkpoint(state, run_dir, 1)

    def test_dynamic_fallback_behind_explicit_flag(self, setup, tmp_path,
                                                   capsys):
        vocab, ckpt = self._ckpt(setup, str(tmp_path))
        p = VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True, int8_dynamic=True)
        assert p.model.int8_stages == (0, 1, 2, 3, 4, 5, 6, 7)
        assert not p.model.int8_amax  # dynamic per-batch scales
        assert not p._needs_calib
        assert "dynamic per-batch" in capsys.readouterr().out

    def test_auto_calib_predictions_batch_invariant(self, setup, tmp_path,
                                                    capsys):
        """No sidecar + int8 on: static scales bake from the FIRST request
        batch, so a sample's prediction no longer depends on its batchmates
        (the r3 VERDICT serve gap)."""
        vocab, ckpt = self._ckpt(setup, str(tmp_path))
        p = VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True)
        assert p._needs_calib
        assert "calibrated from the first request batch" in \
            capsys.readouterr().out
        a, b, c = (os.path.join(setup["root"], n)
                   for n in ("a.jpg", "b.jpg", "c.jpg"))
        q = "is,the,cat,black"
        r_ab = p.predict([a, b], [q, q])[0]
        assert p.model.int8_amax and not p._needs_calib
        # same sample, different batchmate: identical output post-calibration
        r_ac = p.predict([a, c], [q, q])[0]
        assert r_ab["answer"] == r_ac["answer"]
        np.testing.assert_allclose(r_ab["prob"], r_ac["prob"], atol=1e-6)

    def test_explicit_calib_file(self, setup, tmp_path):
        from vqa_tpu.train.calibrate import save_calib

        run_dir = tmp_path / "run"
        run_dir.mkdir()
        vocab, ckpt = self._ckpt(setup, str(run_dir))
        amax = tuple(tuple(1.0 + i / 10.0 for _ in range(ch))
                     for i, ch in enumerate((3, 64, 128, 256, 256, 512, 512,
                                             512)))
        side = save_calib(str(tmp_path), (0, 1, 2, 3, 4, 5, 6, 7), amax)
        p = VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True, calib_file=side)
        assert p.model.int8_amax == amax
        assert not p._needs_calib

    def test_explicit_calib_file_stage_mismatch_raises(self, setup, tmp_path):
        """An explicit --calib_file with the wrong stage set must fail
        loudly (unlike the checkpoint sidecar, which silently falls back)."""
        from vqa_tpu.train.calibrate import save_calib

        vocab, ckpt = self._ckpt(setup, str(tmp_path))
        side = save_calib(str(tmp_path), (2, 3),
                          ((1.0,) * 128, (1.0,) * 256))
        with pytest.raises(ValueError, match="calibrated for int8 stages"):
            VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True, calib_file=side)

    def test_sidecar_scales_load(self, setup, tmp_path):
        from vqa_tpu.train.calibrate import save_calib

        vocab, ckpt = self._ckpt(setup, str(tmp_path))
        # per-input-channel amax for the default stage set (0..7):
        # VGG-11 stage input widths 3,64,128,256,256,512,512,512
        amax = tuple(tuple(1.0 + i / 10.0 for _ in range(c))
                     for i, c in enumerate((3, 64, 128, 256, 256, 512, 512,
                                            512)))
        save_calib(str(tmp_path), (0, 1, 2, 3, 4, 5, 6, 7), amax)
        p = VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True)
        assert p.model.int8_amax == amax

    def test_stale_stage_set_ignored(self, setup, tmp_path, capsys):
        """A sidecar for a different stage set must not load (wrong scales
        are worse than dynamic ones)."""
        from vqa_tpu.train.calibrate import save_calib

        vocab, ckpt = self._ckpt(setup, str(tmp_path))
        save_calib(str(tmp_path), (2, 3), ((1.0,) * 128, (1.0,) * 256))
        p = VQAPredictor("baseline", vocab, ckpt, batch_size=2,
                         synthetic_images=True, image_size=32,
                         int8_backbone=True)
        assert not p.model.int8_amax
        assert p._needs_calib  # stale sidecar -> first-batch auto-calib
        assert "no int8_calib.json" in capsys.readouterr().out
