"""End-to-end training-driver tests (CPU, tiny shapes, synthetic images).

The integration contract from SURVEY.md §4.5: training smoke (loss finite &
decreasing on a learnable toy problem), checkpoint save/restore resumes the
step counter exactly, eval metrics computed, log artifacts written.
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    """A learnable toy dataset: the answer is predictable from the question."""
    root = tmp_path_factory.mktemp("toy")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(24):
        kind = rng.integers(0, 2)
        if kind == 0:
            q, a = "is,the,cat,black", "yes"
        else:
            q, a = "what,color,is,the,dog", "brown"
        lines.append(f"img{i}.jpg\t{q}\t{a}")
    data_file = root / "train.txt"
    data_file.write_text("\n".join(lines) + "\n")

    from vqa_tpu.vocab import save_vocab
    vocab_file = root / "vocab.pkl"
    save_vocab(str(data_file), str(vocab_file), min_word_count=1, K=3)
    return {"root": str(root), "data": str(data_file), "vocab": str(vocab_file)}


def run_main(argv):
    from vqa_tpu.main import main
    main(argv)


BASE_ARGS = [
    "--mode", "train", "--model", "baseline",
    "--batch_size", "4", "--num_cls", "3", "--num_workers", "2",
    "--synthetic_images", "true", "--image_size", "32", "--opt_lvl", "0",
    "--log_interval", "6", "--val_size", "8", "--seed", "1",
]


class TestTrainDriver:
    @pytest.mark.slow
    def test_train_smoke_and_artifacts(self, toy_data):
        expt = os.path.join(toy_data["root"], "expt")
        run_main(BASE_ARGS + [
            "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
            "--train_img", toy_data["root"], "--train_file", toy_data["data"],
            "--val_img", toy_data["root"], "--val_file", toy_data["data"],
            "--vocab_file", toy_data["vocab"],
            "--num_epochs", "2", "--save_interval", "4"])

        log_dir = os.path.join(expt, "e", "r")
        files = os.listdir(log_dir)
        assert "train_log.txt" in files
        assert "model_4.ckpt" in files and "model_12.ckpt" in files
        assert any(f.startswith("events.out.tfevents") for f in files)
        log = open(os.path.join(log_dir, "train_log.txt")).read()
        assert "--mode train" in log and "Validation Accuracy" in log

    @pytest.mark.slow
    def test_resume_restores_step(self, toy_data):
        expt = os.path.join(toy_data["root"], "expt2")
        args = BASE_ARGS + [
            "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
            "--train_img", toy_data["root"], "--train_file", toy_data["data"],
            "--vocab_file", toy_data["vocab"], "--save_interval", "4"]
        run_main(args + ["--num_epochs", "1"])
        log_dir = os.path.join(expt, "e", "r")
        assert "model_4.ckpt" in os.listdir(log_dir)

        # resume from the MID-epoch checkpoint (step 4 of a 6-step epoch):
        # the step counter continues from 4 (exact restore; the reference
        # would restart at 0) and the first resumed epoch yields only the
        # 2 remaining batches (exact intra-epoch resume, r4) — so the first
        # `--num_epochs 1` leg ends at step 6, exactly where the
        # uninterrupted run ended, and a second full epoch crosses step 8
        run_main(args + ["--num_epochs", "2", "--model_ckpt", "model_4.ckpt"])
        files = os.listdir(log_dir)
        assert "model_8.ckpt" in files and "model_12.ckpt" in files
        assert "model_16.ckpt" not in files  # 2+6 steps, not 12

    @pytest.mark.slow
    def test_force_mesh_of_one_matches_no_mesh(self, toy_data):
        """--force_mesh runs the GSPMD sharded program at --num_devices 1;
        the logged losses must match the plain single-device path exactly
        (the on-chip validation lever from the r3 VERDICT, item 6)."""
        def run(tag, extra):
            expt = os.path.join(toy_data["root"], f"expt_{tag}")
            run_main(BASE_ARGS + [
                "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
                "--train_img", toy_data["root"], "--train_file",
                toy_data["data"], "--vocab_file", toy_data["vocab"],
                "--num_epochs", "1", "--save_interval", "100",
                "--log_interval", "2"] + extra)
            log = open(os.path.join(expt, "e", "r", "train_log.txt")).read()
            import re
            return re.findall(r"Loss: ([0-9.]+)", log)

        plain = run("nomesh", [])
        mesh = run("mesh1", ["--force_mesh", "true"])
        assert plain and plain == mesh

    @pytest.mark.slow
    def test_model_parallel_fsdp_matches_dp(self, toy_data):
        """--model_parallel 2 --fsdp on an 8-device mesh: the CLI's TP+FSDP
        training run reproduces the DP-8 loss trajectory (to log precision;
        GSPMD collective order perturbs the last digit) and still writes
        restorable checkpoints from the sharded TrainState."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 simulated devices")

        def run(tag, extra):
            expt = os.path.join(toy_data["root"], f"expt_mp_{tag}")
            run_main(BASE_ARGS + [
                "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
                "--train_img", toy_data["root"], "--train_file",
                toy_data["data"], "--vocab_file", toy_data["vocab"],
                "--num_epochs", "1", "--save_interval", "3",
                "--num_devices", "8", "--batch_size", "8",
                "--log_interval", "2"] + extra)
            log_dir = os.path.join(expt, "e", "r")
            import re
            losses = re.findall(r"Loss: ([0-9.]+)",
                                open(os.path.join(log_dir, "train_log.txt")).read())
            return [float(x) for x in losses], log_dir

        dp, _ = run("dp", [])
        tp, log_dir = run("tp", ["--model_parallel", "2", "--fsdp", "true"])
        assert dp and len(dp) == len(tp)
        np.testing.assert_allclose(tp, dp, atol=2e-3)
        ckpts = [f for f in os.listdir(log_dir) if f.startswith("model_")]
        assert "model_3.ckpt" in ckpts
        import flax.serialization
        with open(os.path.join(log_dir, "model_3.ckpt"), "rb") as f:
            restored = flax.serialization.msgpack_restore(f.read())
        assert int(np.asarray(restored["step"])) == 3
        # sharded params were gathered to full host arrays at save time
        kernel = restored["params"]["image_encoder"]["embedding_fc"]["kernel"]
        assert kernel.shape == (4096, 1024)

    def test_grad_accum_matches_monolithic_step(self):
        """--grad_accum k: the lax.scan-accumulated step reproduces the
        monolithic full-batch step on a dropout-free model (HieCoAttn) —
        same loss and near-identical params (mean-of-means == global mean
        for equal microbatches; fp32 summation order is the only delta)."""
        from vqa_tpu.models import HierarchicalCoAttentionNet
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step

        model = HierarchicalCoAttentionNet(vocab_size=32, K=4, word_emb_dim=512,
                                           hidden_dim=512, mlp_dim=128)
        rng = jax.random.PRNGKey(0)
        B, L = 8, 6
        img = jax.random.normal(rng, (B, 32, 32, 3))
        ques = jax.random.randint(rng, (B, L), 1, 32)
        lens = jnp.full((B,), L, jnp.int32)
        labels = jax.random.randint(rng, (B,), 0, 4)
        batch = {"image": img, "question": ques, "ques_len": lens,
                 "label": labels}
        init_batch = {k: v[:1] for k, v in batch.items() if k != "label"}

        def run(k):
            state = create_train_state(model, jax.random.PRNGKey(1),
                                       init_batch, 1e-3)
            tx = make_optimizer(1e-3, state.params, False)
            step = make_train_step(model, tx, donate=False, grad_accum=k)
            losses = []
            for _ in range(2):
                state, m = step(state, batch)
                losses.append(float(m["loss"]))
            return losses, state

        l1, s1 = run(1)
        l4, s4 = run(4)
        np.testing.assert_allclose(l4, l1, rtol=1e-6, atol=1e-7)
        deltas = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            s1.params, s4.params)
        assert max(jax.tree_util.tree_leaves(deltas)) < 1e-3

    @pytest.mark.slow
    def test_grad_accum_composes_with_mesh_cli(self, toy_data):
        """--grad_accum 2 on an 8-device DP mesh reproduces the plain DP
        trajectory through the CLI (attention model: no dropout, so the
        accumulated step is exactly the monolithic one)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 simulated devices")

        def run(tag, extra):
            expt = os.path.join(toy_data["root"], f"expt_ga_{tag}")
            run_main([
                "--mode", "train", "--model", "attention",
                "--batch_size", "8", "--num_cls", "3", "--num_workers", "2",
                "--synthetic_images", "true", "--image_size", "32",
                "--opt_lvl", "0", "--log_interval", "1", "--val_size", "0",
                "--seed", "1", "--num_devices", "8", "--num_epochs", "1",
                "--save_interval", "100",
                "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
                "--train_img", toy_data["root"], "--train_file",
                toy_data["data"], "--vocab_file", toy_data["vocab"]] + extra)
            import re
            log = open(os.path.join(expt, "e", "r", "train_log.txt")).read()
            return [float(x) for x in re.findall(r"Loss: ([0-9.]+)", log)]

        plain = run("dp", [])
        accum = run("ga", ["--grad_accum", "2"])
        assert plain and len(plain) == len(accum)
        np.testing.assert_allclose(accum, plain, atol=2e-4)

    def test_grad_accum_rejects_batch_stats_bn(self):
        from vqa_tpu.models import HierarchicalCoAttentionNet
        from vqa_tpu.train.steps import make_train_step

        model = HierarchicalCoAttentionNet(vocab_size=32, K=4)
        with pytest.raises(ValueError, match="running-stats"):
            make_train_step(model, None, grad_accum=2, bn_batch_stats=True)

    def test_cli_guards_fail_fast(self, toy_data):
        """The new flag combinations fail at startup with clear messages,
        never silently no-op (code-review findings)."""
        args = BASE_ARGS + [
            "--expt_dir", os.path.join(toy_data["root"], "expt_guard"),
            "--expt_name", "e", "--run_name", "r",
            "--train_img", toy_data["root"], "--train_file", toy_data["data"],
            "--vocab_file", toy_data["vocab"], "--num_epochs", "1"]
        with pytest.raises(SystemExit, match="need a device mesh"):
            run_main(args + ["--model_parallel", "2"])
        with pytest.raises(SystemExit, match="model_parallel > 1"):
            run_main(args + ["--num_devices", "8", "--seq_parallel", "true"])
        with pytest.raises(SystemExit, match="attention-family"):
            run_main(args + ["--num_devices", "8", "--model_parallel", "2",
                             "--seq_parallel", "true"])  # baseline model
        with pytest.raises(SystemExit, match="not divisible"):
            # attention at image 32 -> S=1; 1 % 2 != 0
            run_main([a if a != "baseline" else "attention" for a in args]
                     + ["--num_devices", "8", "--model_parallel", "2",
                        "--seq_parallel", "true"])
        with pytest.raises(SystemExit, match="must divide"):
            run_main(args + ["--grad_accum", "3"])  # batch_size 4

    @pytest.mark.slow
    def test_midepoch_resume_reproduces_trajectory(self, toy_data, tmp_path):
        """Kill at a mid-epoch step, resume from the checkpoint, and the
        remaining losses match the uninterrupted run bit-for-bit: the full
        TrainState restore (params/opt/step/rng) plus the loader's
        set_epoch(epoch, skip_batches) fast-forward reproduce the exact
        data order (r3 VERDICT item 4; beats the reference's weights-only
        resume, /root/reference/main.py:168-176)."""
        from vqa_tpu.config import build_model
        from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
        from vqa_tpu.train.checkpoint import (restore_checkpoint,
                                              save_checkpoint)
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels, opt_lvl=0)
        samples = VQASamples(toy_data["data"], toy_data["root"], v.word2idx,
                             v.label2idx, v.max_seq_length)
        pre = make_image_preprocessor(32)

        def fresh_loader():
            # 24 samples / batch 4 = 6 steps per epoch
            return DataLoader(samples, 4, host_size=32, num_workers=1,
                              synthetic_images=True, seed=9)

        def prepare(b):
            return {"image": pre(b["image"]),
                    "question": jnp.asarray(b["question"]),
                    "ques_len": jnp.asarray(b["ques_len"]),
                    "label": jnp.asarray(b["label"])}

        def fresh_state():
            init = {"image": pre(np.zeros((1, 32, 32, 3), np.uint8)),
                    "question": jnp.zeros((1, v.max_seq_length), jnp.int32),
                    "ques_len": jnp.ones((1,), jnp.int32)}
            return create_train_state(model, jax.random.PRNGKey(3), init,
                                      1e-2)

        state0 = fresh_state()
        tx = make_optimizer(1e-2, state0.params, vgg_trainable=False)
        train_step = make_train_step(model, tx)

        def run_steps(state, loader, n):
            losses = []
            while len(losses) < n:
                for b in loader:
                    state, m = train_step(state, prepare(b))
                    losses.append(float(m["loss"]))
                    if len(losses) >= n:
                        break
            return state, losses

        _, uninterrupted = run_steps(state0, fresh_loader(), 10)

        # interrupted run: 7 steps (one into epoch 1), checkpoint, "crash"
        state, first7 = run_steps(fresh_state(), fresh_loader(), 7)
        assert first7 == uninterrupted[:7]
        ckpt = save_checkpoint(state, str(tmp_path), 7)

        # resume: full-state restore + exact data-order fast-forward
        resumed = restore_checkpoint(ckpt, fresh_state())
        assert int(resumed.step) == 7
        loader = fresh_loader()
        steps_per_epoch = len(loader)
        loader.set_epoch(7 // steps_per_epoch,
                         skip_batches=7 % steps_per_epoch)
        _, tail = run_steps(resumed, loader, 3)
        assert tail == uninterrupted[7:10]

    @pytest.mark.slow
    def test_loss_decreases_on_learnable_toy(self, toy_data):
        """Question-only signal: loss should drop substantially in 30 steps."""
        from vqa_tpu.config import build_model
        from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels, opt_lvl=0)
        s = VQASamples(toy_data["data"], toy_data["root"], v.word2idx,
                       v.label2idx, v.max_seq_length)
        dl = DataLoader(s, 8, host_size=32, synthetic_images=True,
                        num_workers=2, seed=0)
        pre = make_image_preprocessor(32)

        b0 = next(iter(dl))
        init_batch = {"image": pre(b0["image"][:1]),
                      "question": jnp.asarray(b0["question"][:1]),
                      "ques_len": jnp.asarray(b0["ques_len"][:1])}
        state = create_train_state(model, jax.random.PRNGKey(0), init_batch,
                                   learning_rate=3e-4)
        tx = make_optimizer(3e-4, state.params, False)
        step = make_train_step(model, tx)

        losses = []
        for _ in range(7):
            for batch in dl:
                db = {"image": pre(batch["image"]),
                      "question": jnp.asarray(batch["question"]),
                      "ques_len": jnp.asarray(batch["ques_len"]),
                      "label": jnp.asarray(batch["label"])}
                state, m = step(state, db)
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[:3]} -> {losses[-3:]}"

    def test_num_cls_vocab_mismatch_fails_loudly(self, toy_data):
        # a vocab with 9 answer labels + UNKNOWN, but --num_cls 2 -> labels
        # out of range for a 3-way classifier: must fail loudly, not NaN
        big = {"word2idx": {"<PAD>": 0, "<UNKNOWN>": 1, "a": 2},
               "idx2word": {0: "<PAD>", 1: "<UNKNOWN>", 2: "a"},
               "label2idx": {**{"UNKNOWN": 0}, **{f"ans{i}": i for i in range(1, 10)}},
               "idx2label": {**{0: "UNKNOWN"}, **{i: f"ans{i}" for i in range(1, 10)}},
               "max_seq_length": 5}
        vocab_path = os.path.join(toy_data["root"], "big_vocab.pkl")
        with open(vocab_path, "wb") as f:
            pickle.dump(big, f)
        with pytest.raises(SystemExit, match="num_cls"):
            run_main([
                "--mode", "train", "--model", "baseline",
                "--batch_size", "4", "--num_cls", "2", "--num_workers", "1",
                "--synthetic_images", "true", "--image_size", "32",
                "--expt_dir", toy_data["root"], "--expt_name", "x", "--run_name", "y",
                "--train_img", toy_data["root"], "--train_file", toy_data["data"],
                "--vocab_file", vocab_path, "--num_epochs", "1"])


class TestTrainableVGG:
    def test_vgg_train_true_updates_backbone(self, toy_data):
        """--vgg_train true: backbone params receive updates, batch_stats move,
        remat path is active, loss stays finite."""
        import flax.traverse_util as tu
        from vqa_tpu.config import build_model
        from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels,
                               vgg_trainable=True, opt_lvl=0)
        assert model.remat  # trainable VGG engages rematerialization
        s = VQASamples(toy_data["data"], toy_data["root"], v.word2idx,
                       v.label2idx, v.max_seq_length)
        dl = DataLoader(s, 4, host_size=32, synthetic_images=True,
                        num_workers=1, seed=0)
        pre = make_image_preprocessor(32)
        b = next(iter(dl))
        init_batch = {"image": pre(b["image"][:1]),
                      "question": jnp.asarray(b["question"][:1]),
                      "ques_len": jnp.asarray(b["ques_len"][:1])}
        state = create_train_state(model, jax.random.PRNGKey(0), init_batch,
                                   1e-3, vgg_trainable=True)
        tx = make_optimizer(1e-3, state.params, vgg_trainable=True)
        step = make_train_step(model, tx, vgg_trainable=True)

        conv0_before = np.asarray(tu.flatten_dict(state.params)[
            ("image_encoder", "vgg11_encoder", "features", "conv0", "kernel")])
        stats_before = np.asarray(tu.flatten_dict(state.batch_stats)[
            ("image_encoder", "vgg11_encoder", "features", "bn0", "mean")])

        db = {"image": pre(b["image"]), "question": jnp.asarray(b["question"]),
              "ques_len": jnp.asarray(b["ques_len"]),
              "label": jnp.asarray(b["label"])}
        state, m = step(state, db)
        assert np.isfinite(float(m["loss"]))

        conv0_after = np.asarray(tu.flatten_dict(state.params)[
            ("image_encoder", "vgg11_encoder", "features", "conv0", "kernel")])
        stats_after = np.asarray(tu.flatten_dict(state.batch_stats)[
            ("image_encoder", "vgg11_encoder", "features", "bn0", "mean")])
        assert np.abs(conv0_after - conv0_before).max() > 0, "VGG not updated"
        assert np.abs(stats_after - stats_before).max() > 0, "BN stats frozen"

    def test_vgg_frozen_keeps_backbone_fixed(self, toy_data):
        import flax.traverse_util as tu
        from vqa_tpu.config import build_model
        from vqa_tpu.data import make_image_preprocessor
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels,
                               vgg_trainable=False, opt_lvl=0)
        pre = make_image_preprocessor(32)
        img = np.zeros((4, 32, 32, 3), np.uint8)
        ques = np.tile(np.array([[2, 3, 0]], np.int32), (4, 1))
        init_batch = {"image": pre(img[:1]), "question": jnp.asarray(ques[:1]),
                      "ques_len": jnp.array([2], jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(0), init_batch, 1e-2)
        tx = make_optimizer(1e-2, state.params, vgg_trainable=False)
        step = make_train_step(model, tx, vgg_trainable=False)
        before = np.asarray(tu.flatten_dict(state.params)[
            ("image_encoder", "vgg11_encoder", "features", "conv0", "kernel")])
        db = {"image": pre(img), "question": jnp.asarray(ques),
              "ques_len": jnp.full((4,), 2, jnp.int32),
              "label": jnp.zeros((4,), jnp.int32)}
        for _ in range(2):
            state, _ = step(state, db)
        after = np.asarray(tu.flatten_dict(state.params)[
            ("image_encoder", "vgg11_encoder", "features", "conv0", "kernel")])
        np.testing.assert_array_equal(before, after)


class TestTestMode:
    @pytest.mark.slow
    def test_cli_test_mode_with_vgg_trained_ckpt(self, toy_data):
        """test mode restores a checkpoint trained with --vgg_train true
        (different optimizer pytree than the inference default)."""
        expt = os.path.join(toy_data["root"], "expt_tm")
        common = [
            "--model", "baseline", "--expt_dir", expt, "--expt_name", "e",
            "--run_name", "r", "--vocab_file", toy_data["vocab"],
            "--num_cls", "3", "--num_workers", "1",
            "--synthetic_images", "true", "--image_size", "32", "--opt_lvl", "0",
            "--batch_size", "8"]
        run_main(["--mode", "train", "--vgg_train", "true",
                  "--train_img", toy_data["root"], "--train_file", toy_data["data"],
                  "--num_epochs", "1", "--save_interval", "3",
                  "--log_interval", "100"] + common)
        log_dir = os.path.join(expt, "e", "r")
        assert "model_3.ckpt" in os.listdir(log_dir)

        out = os.path.join(toy_data["root"], "tm_preds.txt")
        run_main(["--mode", "test", "--model_ckpt", "model_3.ckpt",
                  "--val_img", toy_data["root"], "--val_file", toy_data["data"],
                  "--test_out", out] + common)
        preds = open(out).read().strip().split("\n")
        assert len(preds) == 24  # 3 batches of 8

    @pytest.mark.slow
    def test_latest_ckpt_and_partial_final_batch(self, toy_data, capsys):
        """--model_ckpt latest resolves the highest-step checkpoint, and a
        drop_last=False tail batch contributes exactly its real samples."""
        expt = os.path.join(toy_data["root"], "expt_latest")
        common = [
            "--model", "baseline", "--expt_dir", expt, "--expt_name", "e",
            "--run_name", "r", "--vocab_file", toy_data["vocab"],
            "--num_cls", "3", "--num_workers", "1",
            "--synthetic_images", "true", "--image_size", "32", "--opt_lvl", "0",
            "--batch_size", "4"]
        run_main(["--mode", "train",
                  "--train_img", toy_data["root"], "--train_file", toy_data["data"],
                  "--num_epochs", "1", "--save_interval", "2",
                  "--log_interval", "100"] + common)
        log_dir = os.path.join(expt, "e", "r")
        assert {"model_4.ckpt", "model_6.ckpt"} <= set(os.listdir(log_dir))

        # 13-line val slice -> batches of 4 + a tail of 1 (partial kept)
        lines = open(toy_data["data"]).read().strip().split("\n")[:13]
        val13 = os.path.join(toy_data["root"], "val13.txt")
        with open(val13, "w") as f:
            f.write("\n".join(lines) + "\n")

        out = os.path.join(toy_data["root"], "latest_preds.txt")
        run_main(["--mode", "test", "--model_ckpt", "latest",
                  "--val_img", toy_data["root"], "--val_file", val13,
                  "--test_out", out] + common)
        stdout = capsys.readouterr().out
        assert "model_6.ckpt" in stdout  # latest resolved to the higher step
        assert "(13 samples)" in stdout
        assert len(open(out).read().strip().split("\n")) == 13

    @pytest.mark.slow
    def test_int8_calibration_train_then_test(self, toy_data, capsys):
        """--int8_backbone + --int8_calib: training writes int8_calib.json
        (static scales), and test mode reuses it (quantization identical to
        training, batch-composition-independent)."""
        import json
        expt = os.path.join(toy_data["root"], "expt_i8c")
        common = [
            "--model", "baseline", "--expt_dir", expt, "--expt_name", "e",
            "--run_name", "r", "--vocab_file", toy_data["vocab"],
            "--num_cls", "3", "--num_workers", "1",
            "--synthetic_images", "true", "--image_size", "32",
            "--batch_size", "4", "--int8_backbone", "true",
            "--int8_calib", "2"]
        run_main(["--mode", "train",
                  "--train_img", toy_data["root"],
                  "--train_file", toy_data["data"],
                  "--num_epochs", "1", "--save_interval", "6",
                  "--log_interval", "100"] + common)
        log_dir = os.path.join(expt, "e", "r")
        calib = json.load(open(os.path.join(log_dir, "int8_calib.json")))
        assert calib["stages"] == [0, 1, 2, 3, 4, 5, 6, 7]
        assert len(calib["amax"]) == 8
        # per-channel lists; individual channels may be dead (amax 0)
        assert all(isinstance(a, list) and min(a) >= 0 and max(a) > 0
                   for a in calib["amax"])

        run_main(["--mode", "test", "--model_ckpt", "latest",
                  "--val_img", toy_data["root"],
                  "--val_file", toy_data["data"]] + common)
        out = capsys.readouterr().out
        assert "int8 calibration: loaded static scales" in out

    @pytest.mark.slow
    def test_ptq_of_bf16_checkpoint(self, toy_data, capsys):
        """Post-training quantization: a checkpoint trained WITHOUT int8 can
        be evaluated WITH --int8_backbone — test mode calibrates static
        per-channel scales on the eval batches (no sidecar in the run dir,
        the standard PTQ deployment recipe)."""
        expt = os.path.join(toy_data["root"], "expt_ptq")
        common = [
            "--model", "baseline", "--expt_dir", expt, "--expt_name", "e",
            "--run_name", "r", "--vocab_file", toy_data["vocab"],
            "--num_cls", "3", "--num_workers", "1",
            "--synthetic_images", "true", "--image_size", "32",
            "--batch_size", "4"]
        run_main(["--mode", "train",
                  "--train_img", toy_data["root"],
                  "--train_file", toy_data["data"],
                  "--num_epochs", "1", "--save_interval", "6",
                  "--log_interval", "100"] + common)
        assert not os.path.exists(
            os.path.join(expt, "e", "r", "int8_calib.json"))
        run_main(["--mode", "test", "--model_ckpt", "latest",
                  "--val_img", toy_data["root"],
                  "--val_file", toy_data["data"],
                  "--int8_backbone", "true", "--int8_calib", "2"] + common)
        out = capsys.readouterr().out
        assert "int8 calibration: stages" in out  # eval-batch calibration ran
        assert "Test Accuracy" in out
        # PTQ must not write a sidecar into the training run's dir
        assert not os.path.exists(
            os.path.join(expt, "e", "r", "int8_calib.json"))

    @pytest.mark.slow
    def test_test_mode_loss_is_sample_weighted(self, toy_data, capsys):
        """The reported test loss must not change with batching: 13 samples
        as 3 full batches + a 1-row tail (b=4) vs one batch of 13 give the
        same sample-weighted mean (the r2 batch-weighted bug)."""
        import re
        lines = open(toy_data["data"]).read().strip().split("\n")[:13]
        val13 = os.path.join(toy_data["root"], "val13w.txt")
        with open(val13, "w") as f:
            f.write("\n".join(lines) + "\n")

        def run(batch_size):
            run_main(["--mode", "test", "--model", "baseline",
                      "--expt_dir", toy_data["root"], "--expt_name", "e",
                      "--run_name", f"lw{batch_size}",
                      "--vocab_file", toy_data["vocab"], "--num_cls", "3",
                      "--val_img", toy_data["root"], "--val_file", val13,
                      "--synthetic_images", "true", "--image_size", "32",
                      "--opt_lvl", "0", "--seed", "3",
                      "--batch_size", str(batch_size)])
            out = capsys.readouterr().out
            m = re.search(r"Test Loss: ([0-9.]+)", out)
            return float(m.group(1))

        assert abs(run(4) - run(13)) < 2e-4

    @pytest.mark.slow
    def test_vqa_results_format_roundtrip(self, toy_data, tmp_path):
        """--test_out_format vqa emits the official results JSON that
        datahelper.VQA.loadRes validates and indexes (the one reference API
        that previously had no producing path)."""
        import json
        lines = open(toy_data["data"]).read().strip().split("\n")[:9]
        val9 = os.path.join(toy_data["root"], "val9.txt")
        with open(val9, "w") as f:
            f.write("\n".join(lines) + "\n")
        res_file = str(tmp_path / "results.json")
        run_main(["--mode", "test", "--model", "baseline",
                  "--expt_dir", toy_data["root"], "--expt_name", "e",
                  "--run_name", "vqafmt", "--vocab_file", toy_data["vocab"],
                  "--num_cls", "3", "--val_img", toy_data["root"],
                  "--val_file", val9, "--synthetic_images", "true",
                  "--image_size", "32", "--opt_lvl", "0", "--batch_size", "4",
                  "--test_out", res_file, "--test_out_format", "vqa"])

        res = json.load(open(res_file))
        assert [r["question_id"] for r in res] == list(range(9))
        assert all(isinstance(r["answer"], str) for r in res)

        # synthetic annotations/questions with matching ids -> loadRes
        # validates and indexes the produced file
        ann_file = str(tmp_path / "ann.json")
        ques_file = str(tmp_path / "ques.json")
        anns = {"info": {}, "task_type": "Open-Ended", "data_type": "toy",
                "data_subtype": "val", "license": {},
                "annotations": [
                    {"question_id": i, "image_id": i % 3,
                     "question_type": "what", "answer_type": "other",
                     "multiple_choice_answer": line.split("\t")[2],
                     "answers": [{"answer": line.split("\t")[2],
                                  "answer_id": 1,
                                  "answer_confidence": "yes"}]}
                    for i, line in enumerate(lines)]}
        ques = {"info": {}, "task_type": "Open-Ended", "data_type": "toy",
                "data_subtype": "val", "license": {},
                "questions": [{"question_id": i, "image_id": i % 3,
                               "question": line.split("\t")[1]}
                              for i, line in enumerate(lines)]}
        json.dump(anns, open(ann_file, "w"))
        json.dump(ques, open(ques_file, "w"))

        from vqa_tpu.datahelper import VQA
        vqa = VQA(ann_file, ques_file)
        res_index = vqa.loadRes(res_file, ques_file)
        assert set(res_index.qa) == set(range(9))
        # the round-trip supports accuracy computation against GT
        acc = sum(res_index.qa[i]["answer"]
                  == vqa.qa[i]["multiple_choice_answer"]
                  for i in range(9)) / 9.0
        assert 0.0 <= acc <= 1.0

    def test_latest_without_checkpoints_fails_loudly(self, toy_data, tmp_path):
        with pytest.raises(SystemExit, match="no model_<step>.ckpt"):
            run_main(["--mode", "test", "--model", "baseline",
                      "--expt_dir", str(tmp_path), "--expt_name", "e",
                      "--run_name", "empty", "--vocab_file", toy_data["vocab"],
                      "--num_cls", "3", "--model_ckpt", "latest",
                      "--val_img", toy_data["root"],
                      "--val_file", toy_data["data"],
                      "--synthetic_images", "true", "--image_size", "32"])


class TestBNMode:
    def test_reference_quirk_mode_updates_stats_with_frozen_vgg(self, toy_data):
        """--bn_mode batch: frozen VGG still moves BN running stats (the
        reference's model.train() behavior); params stay fixed."""
        import flax.traverse_util as tu
        from vqa_tpu.config import build_model
        from vqa_tpu.data import make_image_preprocessor
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels,
                               vgg_trainable=False, opt_lvl=0)
        pre = make_image_preprocessor(32)
        img = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), np.uint8)
        ques = np.tile(np.array([[2, 3, 0]], np.int32), (4, 1))
        init_batch = {"image": pre(img[:1]), "question": jnp.asarray(ques[:1]),
                      "ques_len": jnp.array([2], jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(0), init_batch, 1e-3)
        tx = make_optimizer(1e-3, state.params, vgg_trainable=False)
        step = make_train_step(model, tx, vgg_trainable=False, bn_batch_stats=True)

        key = ("image_encoder", "vgg11_encoder", "features", "bn0", "mean")
        stats_before = np.asarray(tu.flatten_dict(state.batch_stats)[key])
        conv_key = ("image_encoder", "vgg11_encoder", "features", "conv0", "kernel")
        conv_before = np.asarray(tu.flatten_dict(state.params)[conv_key])

        db = {"image": pre(img), "question": jnp.asarray(ques),
              "ques_len": jnp.full((4,), 2, jnp.int32),
              "label": jnp.zeros((4,), jnp.int32)}
        state, m = step(state, db)
        assert np.isfinite(float(m["loss"]))
        stats_after = np.asarray(tu.flatten_dict(state.batch_stats)[key])
        conv_after = np.asarray(tu.flatten_dict(state.params)[conv_key])
        assert np.abs(stats_after - stats_before).max() > 0  # BN stats moved
        np.testing.assert_array_equal(conv_before, conv_after)  # still frozen


class TestDeterminism:
    """SURVEY §5.2: input-pipeline + train-step determinism stands in for the
    (nonexistent) race-detection story — same seed must give identical losses."""

    def _run(self, toy_data, seed):
        from vqa_tpu.config import build_model
        from vqa_tpu.data import DataLoader, VQASamples, make_image_preprocessor
        from vqa_tpu.train.state import create_train_state, make_optimizer
        from vqa_tpu.train.steps import make_train_step
        from vqa_tpu.vocab import Vocab

        v = Vocab.load(toy_data["vocab"])
        model, _ = build_model("baseline", v.size, v.num_labels, opt_lvl=0)
        s = VQASamples(toy_data["data"], toy_data["root"], v.word2idx,
                       v.label2idx, v.max_seq_length)
        dl = DataLoader(s, 8, host_size=32, synthetic_images=True,
                        num_workers=2, seed=seed)
        pre = make_image_preprocessor(32)
        init = {"image": pre(np.zeros((1, 32, 32, 3), np.uint8)),
                "question": jnp.zeros((1, v.max_seq_length), jnp.int32),
                "ques_len": jnp.ones((1,), jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(seed), init, 1e-3)
        tx = make_optimizer(1e-3, state.params, False)
        step = make_train_step(model, tx)
        losses = []
        for batch in dl:
            db = {"image": pre(batch["image"]),
                  "question": jnp.asarray(batch["question"]),
                  "ques_len": jnp.asarray(batch["ques_len"]),
                  "label": jnp.asarray(batch["label"])}
            state, m = step(state, db)
            losses.append(float(m["loss"]))
        return losses

    @pytest.mark.slow
    def test_same_seed_identical_losses(self, toy_data):
        a = self._run(toy_data, seed=11)
        b = self._run(toy_data, seed=11)
        assert a == b, f"non-deterministic training: {a} vs {b}"

    @pytest.mark.slow
    def test_different_seed_differs(self, toy_data):
        a = self._run(toy_data, seed=11)
        c = self._run(toy_data, seed=12)
        assert a != c
