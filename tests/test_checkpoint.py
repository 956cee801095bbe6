"""Checkpoint-layer unit tests: atomicity, latest-lookup, async writer,
.pth interop through load_any."""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.train.checkpoint import (AsyncCheckpointer, checkpoint_path,
                                      latest_checkpoint, load_any,
                                      restore_checkpoint, save_checkpoint)
from vqa_tpu.train.state import TrainState, create_train_state, make_optimizer


@pytest.fixture(scope="module")
def small_state():
    from vqa_tpu.models.bert import VQABertNet

    model = VQABertNet(vocab_size=20, K=3, hidden_dim=16, num_layers=1, num_heads=2)
    batch = {"image": jnp.zeros((1, 32, 32, 3)),
             "question": jnp.ones((1, 4), jnp.int32),
             "ques_len": jnp.array([3], jnp.int32)}
    return create_train_state(model, jax.random.PRNGKey(0), batch, 1e-3)


class TestSaveRestore:
    @pytest.mark.slow
    def test_roundtrip_full_state(self, small_state, tmp_path):
        state = small_state.replace(step=jnp.asarray(7, jnp.int32))
        path = save_checkpoint(state, str(tmp_path))
        assert path.endswith("model_7.ckpt")
        restored = restore_checkpoint(path, small_state)
        assert int(restored.step) == 7
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored too (the reference loses it)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_no_tmp_leftover(self, small_state, tmp_path):
        save_checkpoint(small_state, str(tmp_path), step=1)
        assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))

    @pytest.mark.slow
    def test_latest_checkpoint(self, small_state, tmp_path):
        assert latest_checkpoint(str(tmp_path)) is None
        for s in (3, 10, 5):
            save_checkpoint(small_state, str(tmp_path), step=s)
        assert latest_checkpoint(str(tmp_path)) == checkpoint_path(str(tmp_path), 10)


class TestAsyncCheckpointer:
    def test_async_write_completes(self, small_state, tmp_path):
        ck = AsyncCheckpointer()
        ck.save(small_state, str(tmp_path), step=42)
        ck.wait()
        restored = restore_checkpoint(checkpoint_path(str(tmp_path), 42), small_state)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(small_state.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]))

    def test_serialized_writes(self, small_state, tmp_path):
        ck = AsyncCheckpointer()
        for s in range(3):
            ck.save(small_state, str(tmp_path), step=s)
        ck.wait()
        names = sorted(os.listdir(tmp_path))
        assert {"model_0.ckpt", "model_1.ckpt", "model_2.ckpt"} <= set(names)


class TestPthInterop:
    @pytest.mark.slow
    def test_load_any_pth(self, tmp_path):
        torch = pytest.importorskip("torch")
        from vqa_tpu.models import VQABaselineNet
        from vqa_tpu.models.convert import save_pth

        model = VQABaselineNet(vocab_size=15, K=3)
        batch = {"image": jnp.zeros((1, 32, 32, 3)),
                 "question": jnp.ones((1, 4), jnp.int32),
                 "ques_len": jnp.array([3], jnp.int32)}
        state = create_train_state(model, jax.random.PRNGKey(0), batch, 1e-3)

        pth = str(tmp_path / "model_5.pth")
        save_pth(pth, "baseline", state.params, state.batch_stats)

        # a "fresh" state with different weights, without paying a second
        # jitted init (the template tree is all load_any needs)
        fresh = state.replace(params=jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, 0.5), state.params))
        loaded = load_any(pth, fresh, "baseline")
        # params replaced by the .pth weights...
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(loaded.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]), atol=1e-6)
        # ...but step stays fresh (weights-only semantics, like the reference)
        assert int(loaded.step) == 0


class TestOrbaxBackend:
    """--ckpt_backend orbax: async sharded directories (checkpoint.py)."""

    def test_roundtrip_and_latest(self, small_state, tmp_path):
        state = small_state.replace(step=jnp.asarray(4, jnp.int32))
        path = save_checkpoint(state, str(tmp_path), backend="orbax")
        assert path.endswith("model_4.orbax") and os.path.isdir(path)
        restored = restore_checkpoint(path, small_state)
        assert int(restored.step) == 4
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # latest-lookup sees both formats and picks the highest step
        save_checkpoint(small_state, str(tmp_path), step=2)  # flax .ckpt
        assert latest_checkpoint(str(tmp_path)).endswith("model_4.orbax")

    def test_load_params_only(self, small_state, tmp_path):
        from vqa_tpu.train.checkpoint import load_params_only

        path = save_checkpoint(small_state, str(tmp_path), step=1,
                               backend="orbax")
        params, batch_stats = load_params_only(path)
        for a, b in zip(jax.tree_util.tree_leaves(small_state.params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_checkpointer_orbax(self, small_state, tmp_path):
        ck = AsyncCheckpointer(backend="orbax")
        ck.save(small_state, str(tmp_path), step=9)
        ck.wait()
        assert os.path.isdir(os.path.join(tmp_path, "model_9.orbax"))
        restored = restore_checkpoint(
            os.path.join(str(tmp_path), "model_9.orbax"), small_state)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(small_state.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]))

    @pytest.mark.slow
    def test_sharded_restore_lands_sharded(self, small_state, tmp_path):
        """An FSDP/TP-sharded template restores each leaf directly into its
        NamedSharding — the no-host-gather scale path."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 simulated devices")
        from vqa_tpu.parallel.mesh import get_mesh
        from vqa_tpu.parallel.sharding import shard_state_to_mesh

        mesh = get_mesh(8, model_parallel=2)
        sharded = shard_state_to_mesh(small_state, mesh, tp=True, fsdp=True)
        path = save_checkpoint(sharded, str(tmp_path), step=11,
                               backend="orbax")
        restored = restore_checkpoint(path, sharded)
        leaf_in = jax.tree_util.tree_leaves(sharded.params)
        leaf_out = jax.tree_util.tree_leaves(restored.params)
        shardings_match = [a.sharding == b.sharding
                           for a, b in zip(leaf_in, leaf_out)]
        assert all(shardings_match)
        assert any(len(a.sharding.spec) > 0 for a in leaf_out)  # really sharded
        for a, b in zip(leaf_in, leaf_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
