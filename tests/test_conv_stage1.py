"""Fused stage-1 conv kernel (ops/conv_stage1): numerics, fallbacks, folding.

The Pallas kernel is validated in interpreter mode against the XLA oracle
(the real-TPU validation + timing lives in BASELINE.md); the surrounding
model integration (BN folding, conv0_pallas plumbing) runs on the CPU
fallback, which is the *identical* XLA expression.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.ops.conv_stage1 import (_pick_blocking, _xla_reference,
                                     conv0_bn_relu_pool)


class TestKernelNumerics:
    @pytest.mark.parametrize("shape", [(2, 32, 32, 64), (1, 16, 48, 8)])
    def test_interpret_matches_xla(self, shape):
        b, h, w_, o = shape
        rng = jax.random.PRNGKey(0)
        kx, kw, kb = jax.random.split(rng, 3)
        x = jax.random.normal(kx, (b, h, w_, 3), jnp.float32)
        w = jax.random.normal(kw, (3, 3, 3, o), jnp.float32) * 0.1
        bias = jax.random.normal(kb, (o,), jnp.float32) * 0.1
        ref = _xla_reference(x, w, bias)
        out = conv0_bn_relu_pool(x, w, bias, force="pallas")
        assert out.shape == (b, h // 2, w_ // 2, o)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_cpu_default_uses_xla_path(self):
        # off-TPU the default path must be the XLA expression (exact equality)
        x = jnp.ones((1, 16, 16, 3))
        w = jnp.ones((3, 3, 3, 8)) * 0.1
        b = jnp.zeros((8,))
        np.testing.assert_array_equal(np.asarray(conv0_bn_relu_pool(x, w, b)),
                                      np.asarray(_xla_reference(x, w, b)))

    def test_unsupported_shape_falls_back(self):
        # odd height: auto mode silently falls back, force='pallas' raises
        x = jnp.ones((1, 18, 18, 3))  # ho=9: no r_blk in {16, 8} divides it
        w = jnp.ones((3, 3, 3, 8)) * 0.1
        b = jnp.zeros((8,))
        out = conv0_bn_relu_pool(x, w, b)
        assert out.shape == (1, 9, 9, 8)
        with pytest.raises(ValueError, match="unsupported stage-1"):
            conv0_bn_relu_pool(x, w, b, force="pallas")


class TestMeshPartitioning:
    def test_batch_sharded_pallas_stays_sharded(self):
        """custom_partitioning: under a DP mesh the kernel runs per-shard
        (no all-gather) and the output keeps the batch sharding."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 8:
            pytest.skip("needs the simulated 8-device mesh")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (16, 32, 32, 3), jnp.float32)
        w = jax.random.normal(rng, (3, 3, 3, 64), jnp.float32) * 0.1
        b = jnp.zeros((64,), jnp.float32)
        ref = _xla_reference(x, w, b)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda x, w, b: conv0_bn_relu_pool(
            x, w, b, force="pallas"))(xs, w, b)
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestBlocking:
    def test_row_blocks_are_multiples_of_eight(self):
        for ho, wo in [(224, 224), (112, 112), (16, 16), (8, 8), (48, 64)]:
            n_seg, r_blk = _pick_blocking(ho, wo)
            assert r_blk % 8 == 0
            assert ho % (n_seg * r_blk) == 0 or (ho // n_seg) % r_blk == 0
            seg = ho // n_seg
            assert seg % r_blk == 0

    def test_unsupported_height(self):
        assert _pick_blocking(9, 9) is None


class TestBNFoldingModel:
    """The frozen path folds BN into the conv weights; results must match an
    unfolded BN to fp32 tolerance (randomized stats, not identity)."""

    def test_folded_matches_reference_bn(self):
        from vqa_tpu.models.vgg import VGGFeatures

        rng = np.random.default_rng(0)
        feats = VGGFeatures()
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        vs = feats.init(jax.random.PRNGKey(0), x, True)
        # randomize BN stats/affine so folding is non-trivial
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
            vs["batch_stats"])
        params = vs["params"]
        for i in range(8):
            params[f"bn{i}"]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, params[f"bn{i}"]["scale"].shape), jnp.float32)
            params[f"bn{i}"]["bias"] = jnp.asarray(
                rng.standard_normal(params[f"bn{i}"]["bias"].shape), jnp.float32)

        out = feats.apply({"params": params, "batch_stats": stats}, x, True)

        # unfolded oracle: explicit conv + running-stats BN + relu + pool
        def oracle(x):
            for i, (v, pool) in enumerate([(64, True), (128, True), (256, False),
                                           (256, True), (512, False), (512, True),
                                           (512, False), (512, True)]):
                k = params[f"conv{i}"]["kernel"]
                b = params[f"conv{i}"]["bias"]
                y = jax.lax.conv_general_dilated(
                    x, k, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                bn_p, bn_s = params[f"bn{i}"], stats[f"bn{i}"]
                y = (y - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5) \
                    * bn_p["scale"] + bn_p["bias"]
                x = jax.nn.relu(y)
                if pool:
                    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            return x

        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle(x)),
                                   atol=2e-5, rtol=1e-4)

    def test_conv0_pallas_plumbing(self):
        """build_model default: conv0_pallas on iff the backbone is frozen."""
        from vqa_tpu.config import build_model

        m, _ = build_model("attention", 30, 4, vgg_trainable=False, opt_lvl=0)
        assert m.conv0_pallas
        m, _ = build_model("attention", 30, 4, vgg_trainable=True, opt_lvl=0)
        assert not m.conv0_pallas
        m, _ = build_model("baseline", 30, 4, s2d_first=True, opt_lvl=0)
        assert not m.conv0_pallas  # s2d A/B flag wins
