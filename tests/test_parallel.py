"""Data-parallel mesh tests on the simulated 8-device CPU mesh.

The jit-under-GSPMD DP design (SURVEY.md §5.8): batch sharded on the leading
axis, TrainState replicated, XLA inserts the gradient psum. These tests
assert (a) the sharded step runs across all 8 devices, (b) DP results match
single-device results bit-for-close, (c) the driver's dryrun path works.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.parallel.mesh import (DATA_AXIS, batch_sharding, get_mesh,
                                   replicate_to_mesh, shard_batch)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices (conftest sets XLA flag)")
    return jax.devices()[:8]


@pytest.fixture(scope="module")
def tiny_problem():
    from vqa_tpu.models import HierarchicalCoAttentionNet
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_train_step

    # hidden_dim must equal the VGG feature depth (512), as in the reference
    model = HierarchicalCoAttentionNet(vocab_size=30, K=4, word_emb_dim=512,
                                       hidden_dim=512, mlp_dim=128)
    rng = jax.random.PRNGKey(0)
    B, L = 16, 6
    img = jax.random.normal(rng, (B, 32, 32, 3))
    ques = jax.random.randint(rng, (B, L), 1, 30)
    lens = jnp.full((B,), L, jnp.int32)
    labels = jax.random.randint(rng, (B,), 0, 4)
    batch = {"image": img, "question": ques, "ques_len": lens, "label": labels}

    init_batch = {"image": img[:1], "question": ques[:1], "ques_len": lens[:1]}
    state = create_train_state(model, rng, init_batch, 1e-3)
    tx = make_optimizer(1e-3, state.params, False)
    step = make_train_step(model, tx, donate=False)
    return model, state, step, batch


class TestMesh:
    def test_mesh_shapes(self, eight_devices):
        mesh = get_mesh(8)
        assert mesh.size == 8
        assert mesh.axis_names == (DATA_AXIS,)

    def test_batch_sharded_across_devices(self, eight_devices):
        mesh = get_mesh(8)
        batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding == batch_sharding(mesh)
        assert len(sharded["x"].addressable_shards) == 8
        # each device holds 2 rows
        assert sharded["x"].addressable_shards[0].data.shape == (2, 4)

    def test_mesh_too_big_raises(self):
        with pytest.raises(ValueError):
            get_mesh(10 ** 6)


class TestDataParallelStep:
    @pytest.mark.slow
    def test_dp_matches_single_device(self, eight_devices, tiny_problem):
        model, state, step, batch = tiny_problem
        # single device
        s1, m1 = step(state, batch)
        # 8-way DP
        mesh = get_mesh(8)
        state_r = replicate_to_mesh(state, mesh)
        batch_s = shard_batch(batch, mesh)
        s8, m8 = step(state_r, batch_s)

        assert np.allclose(float(m1["loss"]), float(m8["loss"]), atol=1e-5)

        # The DP invariant: psum of per-shard grad means == full-batch grad
        # mean, up to fp32 reduction reassociation. Compare the *gradients*
        # tightly — post-Adam params can't be compared tightly because the
        # first-step update lr*g/(|g|+eps) amplifies reassociation noise
        # unboundedly as |g| -> 0 (a near-zero-grad scalar moves by up to lr
        # either way), so params only get an update-scale (lr=1e-3) bound.
        from vqa_tpu.train.steps import cross_entropy_loss

        def loss_fn(params, batch_stats, batch):
            # mirrors make_train_step's loss with dropout off (deterministic)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(
                variables, batch["image"], batch["question"],
                batch["ques_len"], train=False, use_running_stats=True)
            return cross_entropy_loss(logits, batch["label"])

        g1 = jax.jit(jax.grad(loss_fn))(state.params, state.batch_stats, batch)
        g8 = jax.jit(jax.grad(loss_fn))(state_r.params, state_r.batch_stats,
                                        batch_s)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g8)):
            a, b = np.asarray(a), np.asarray(b)
            # the 1e-8 floor absorbs pure-cancellation leaves whose true
            # gradient is ~0 (reassociation noise dominates their value)
            scale = np.max(np.abs(a))
            np.testing.assert_allclose(a, b, rtol=1e-4,
                                       atol=1e-5 * scale + 1e-8)

        for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=3e-4)

    def test_multi_step_dp(self, eight_devices, tiny_problem):
        model, state, step, batch = tiny_problem
        mesh = get_mesh(8)
        state_r = replicate_to_mesh(state, mesh)
        batch_s = shard_batch(batch, mesh)
        losses = []
        for _ in range(3):
            state_r, m = step(state_r, batch_s)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert int(state_r.step) == 3


class TestDryrunEntry:
    def test_dryrun_multichip(self, eight_devices, capsys):
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(4)
        assert "OK" in capsys.readouterr().out

    def test_dryrun_mesh_of_one_runs_2d_rules(self, eight_devices, capsys):
        """n=1 builds the degenerate (1,1) two-axis mesh so the TP/SP/FSDP
        sharding rules compile on a single chip (on the real TPU this is
        the run that pushes the 2-D rules through real Mosaic)."""
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(1)
        out = capsys.readouterr().out
        assert "OK" in out and "tp+sp+fsdp 2-D mesh (1x1)" in out

    def test_dryrun_odd_n_skips_2d_leg_loudly(self, eight_devices, capsys):
        """An odd-n driver call must say the tp+sp+fsdp leg was skipped
        instead of reporting an OK that looks like a 2-D pass."""
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(3)
        out = capsys.readouterr().out
        assert "OK" in out and "SKIPPED (odd n)" in out

    def test_entry_compiles(self):
        from __graft_entry__ import entry
        fn, args = entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == args[1].shape[0]


class TestDataParallelCLI:
    @pytest.mark.slow
    def test_train_cli_with_num_devices(self, eight_devices, tmp_path):
        """Full CLI run sharded over 2 devices, incl. sharded validation."""
        from vqa_tpu.vocab import save_vocab

        lines = [f"img{i}.jpg\tis,the,cat,black\tyes" if i % 2 == 0
                 else f"img{i}.jpg\twhat,color,is,it\tred" for i in range(32)]
        data = tmp_path / "d.txt"
        data.write_text("\n".join(lines) + "\n")
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 3)

        from vqa_tpu.main import main
        main(["--mode", "train", "--model", "baseline",
              "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
              "--run_name", "y", "--train_img", str(tmp_path),
              "--train_file", str(data), "--val_img", str(tmp_path),
              "--val_file", str(data), "--vocab_file", str(vocab),
              "--batch_size", "8", "--num_epochs", "1", "--num_cls", "2",
              "--log_interval", "2", "--save_interval", "100",
              "--val_size", "8", "--num_workers", "1",
              "--synthetic_images", "true", "--image_size", "32",
              "--opt_lvl", "0", "--num_devices", "2"])
        log = (tmp_path / "e" / "x" / "y" / "train_log.txt").read_text()
        assert "Validation Accuracy" in log

    @pytest.mark.slow
    def test_int8_pallas_conv_in_mesh_train_graph(self, eight_devices,
                                                  tmp_path, monkeypatch):
        """The custom-partitioned fused conv (interpret mode) + int8 stages
        execute inside the sharded train step — the production graph, not a
        vanilla one (r2 verdict: the multi-chip artifact must cover it)."""
        from vqa_tpu.vocab import save_vocab

        monkeypatch.setenv("VQA_CONV0_FORCE", "pallas")
        lines = [f"img{i}.jpg\tis,the,cat,black\tyes" if i % 2 == 0
                 else f"img{i}.jpg\twhat,color,is,it\tred" for i in range(16)]
        data = tmp_path / "d.txt"
        data.write_text("\n".join(lines) + "\n")
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 3)

        from vqa_tpu.main import main
        main(["--mode", "train", "--model", "baseline",
              "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
              "--run_name", "y", "--train_img", str(tmp_path),
              "--train_file", str(data), "--vocab_file", str(vocab),
              "--batch_size", "8", "--num_epochs", "1", "--num_cls", "2",
              "--log_interval", "1", "--save_interval", "100",
              "--num_workers", "1", "--synthetic_images", "true",
              "--image_size", "32", "--num_devices", "2",
              "--int8_backbone", "true", "--int8_calib", "1"])
        log = (tmp_path / "e" / "x" / "y" / "train_log.txt").read_text()
        assert "int8 calibration" in log
        assert "Loss" in log

    @pytest.mark.slow
    def test_test_mode_partial_tail_batch_on_mesh(self, eight_devices, tmp_path,
                                                  capsys):
        """drop_last=False eval on a mesh: the final partial batch (size not a
        mesh multiple) is padded for sharding and weighted by real count."""
        from vqa_tpu.vocab import save_vocab

        lines = [f"img{i}.jpg\tis,the,cat,black\tyes" for i in range(13)]
        data = tmp_path / "d.txt"
        data.write_text("\n".join(lines) + "\n")
        vocab = tmp_path / "v.pkl"
        save_vocab(str(data), str(vocab), 1, 2)

        from vqa_tpu.main import main
        # batch 8 over 13 samples -> tail of 5, indivisible by the 2-dev mesh
        main(["--mode", "test", "--model", "baseline",
              "--expt_dir", str(tmp_path / "e"), "--expt_name", "x",
              "--run_name", "y", "--val_img", str(tmp_path),
              "--val_file", str(data), "--vocab_file", str(vocab),
              "--batch_size", "8", "--num_cls", "2",
              "--synthetic_images", "true", "--image_size", "32",
              "--opt_lvl", "0", "--num_devices", "2",
              "--test_out", str(tmp_path / "preds.txt")])
        out = capsys.readouterr().out
        assert "(13 samples)" in out
        assert len((tmp_path / "preds.txt").read_text().strip().split("\n")) == 13
