"""Preemption-safe training: SIGTERM → checkpoint at the next step boundary.

The reference has no preemption story (a kill loses everything since the
last ``save_interval`` save, /root/reference/main.py:178-185). Here the
driver installs a PreemptionGuard (--preempt_save, default on): the first
SIGTERM makes the train loop persist a full TrainState checkpoint and exit
cleanly, so ``--model_ckpt latest`` resumes bit-exactly via the exact
intra-epoch resume. Verified end-to-end with a real subprocess + real
signal, then resumed in-process.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(32):
        q, a = (("is,the,cat,black", "yes") if rng.integers(0, 2) == 0
                else ("what,color,is,the,dog", "brown"))
        lines.append(f"img{i}.jpg\t{q}\t{a}")
    data_file = root / "train.txt"
    data_file.write_text("\n".join(lines) + "\n")
    from vqa_tpu.vocab import save_vocab
    vocab_file = root / "vocab.pkl"
    save_vocab(str(data_file), str(vocab_file), min_word_count=1, K=3)
    return {"root": str(root), "data": str(data_file), "vocab": str(vocab_file)}


def _train_args(toy, expt, extra):
    return [
        "--mode", "train", "--model", "baseline",
        "--expt_dir", expt, "--expt_name", "e", "--run_name", "r",
        "--train_img", toy["root"], "--train_file", toy["data"],
        "--vocab_file", toy["vocab"],
        "--batch_size", "4", "--num_cls", "3", "--num_workers", "2",
        "--synthetic_images", "true", "--image_size", "32", "--opt_lvl", "0",
        "--log_interval", "2", "--seed", "1",
        "--save_interval", "1000",  # no periodic saves: only SIGTERM saves
    ] + extra


class TestPreemptionGuard:
    def test_first_sigterm_sets_flag_only(self):
        from vqa_tpu.train.preemption import PreemptionGuard
        guard = PreemptionGuard().install()
        try:
            assert not guard.triggered
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.triggered  # survived: handler only set the flag
        finally:
            guard.uninstall()

    def test_uninstall_restores_previous_handler(self):
        from vqa_tpu.train.preemption import PreemptionGuard
        hits = []
        prev = signal.signal(signal.SIGTERM, lambda *a: hits.append(1))
        try:
            guard = PreemptionGuard().install()
            guard.uninstall()
            os.kill(os.getpid(), signal.SIGTERM)
            assert hits == [1]
        finally:
            signal.signal(signal.SIGTERM, prev)


@pytest.mark.slow
class TestPreemptionEndToEnd:
    def test_sigterm_saves_checkpoint_and_resumes(self, toy):
        expt = os.path.join(toy["root"], "expt")
        log_dir = os.path.join(expt, "e", "r")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # single-device child; no simulated mesh
        proc = subprocess.Popen(
            [sys.executable, "-m", "vqa_tpu.main"]
            + _train_args(toy, expt, ["--num_epochs", "200"]),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT)
        try:
            # wait until training demonstrably progresses (a logged step),
            # then deliver the preemption signal
            log_path = os.path.join(log_dir, "train_log.txt")
            deadline = time.time() + 300
            while time.time() < deadline:
                if os.path.exists(log_path) and "Step [" in open(log_path).read():
                    break
                time.sleep(0.5)
            else:
                pytest.fail("training subprocess never logged a step")
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 0  # clean exit, not a signal death

        ckpts = [f for f in os.listdir(log_dir) if f.startswith("model_")]
        assert ckpts, "SIGTERM did not produce a checkpoint"
        steps = [int(f.split("_")[1].split(".")[0]) for f in ckpts]
        assert all(s % 1000 != 0 for s in steps)  # not a periodic save
        log = open(os.path.join(log_dir, "train_log.txt")).read()
        assert "SIGTERM received" in log and "--model_ckpt latest" in log

        # resume from the preemption checkpoint: step counter continues
        from vqa_tpu.main import main
        resumed_epochs = max(steps) // 8 + 1  # 8 steps/epoch (32 samples, b4)
        main(_train_args(toy, expt, [
            "--num_epochs", str(resumed_epochs),
            "--model_ckpt", "latest", "--save_interval", "4"]))
        after = {int(f.split("_")[1].split(".")[0])
                 for f in os.listdir(log_dir) if f.startswith("model_")}
        assert max(after) > max(steps)  # training continued past the preempt

    def test_group_sigterm_with_decode_workers_still_saves(self, toy):
        """SLURM-style group delivery (kill -- -PGID) must not lose the save.

        The native_mp decode workers are plain subprocesses in the trainer's
        process group, so a group SIGTERM hits them too; they ignore it
        (_decode_worker.serve installs SIG_IGN) and keep serving the
        in-flight batch so the parent reaches its step-boundary checkpoint.
        Uses real JPEGs so the native_mp pool actually spawns.
        """
        from PIL import Image
        rng = np.random.default_rng(3)
        img_dir = os.path.join(toy["root"], "jpegs")
        os.makedirs(img_dir, exist_ok=True)
        for i in range(32):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, f"img{i}.jpg"))

        expt = os.path.join(toy["root"], "expt_group")
        log_dir = os.path.join(expt, "e", "r")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        args = _train_args(toy, expt, ["--num_epochs", "200",
                                       "--decode", "native_mp"])
        args[args.index("--train_img") + 1] = img_dir
        args[args.index("--synthetic_images") + 1] = "false"
        proc = subprocess.Popen(
            [sys.executable, "-m", "vqa_tpu.main"] + args,
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
            start_new_session=True)  # own PGID so killpg targets this tree
        try:
            log_path = os.path.join(log_dir, "train_log.txt")
            deadline = time.time() + 300
            while time.time() < deadline:
                if os.path.exists(log_path) and "Step [" in open(log_path).read():
                    break
                time.sleep(0.5)
            else:
                pytest.fail("training subprocess never logged a step")
            os.killpg(proc.pid, signal.SIGTERM)  # the supervisor's group kill
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                os.killpg(proc.pid, signal.SIGKILL)
        assert rc == 0, "group SIGTERM crashed the trainer instead of saving"
        ckpts = [f for f in os.listdir(log_dir) if f.startswith("model_")]
        assert ckpts, "group SIGTERM did not produce a checkpoint"
        log = open(os.path.join(log_dir, "train_log.txt")).read()
        assert "SIGTERM received" in log
