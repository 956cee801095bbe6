"""H-pair-packed pooled conv stage (ops/conv_hpack): numerics, fallbacks.

The Pallas kernel is validated in interpreter mode against the XLA oracle
(real-TPU timing lives in BASELINE.md "Round 3"). The int8 comparison is
near-exact: the kernel accumulates the same int32 values the XLA int8
stage computes, and the f32 dequant is monotone, so pooling before vs
after dequant picks the same winner — the only residual is 1-ulp f32
noise from compiler FMA contraction in the final ``acc*scale + bias``
(measured: max 2.4e-7 relative). That is what lets the kernel replace
the int8 XLA stages with no accuracy risk.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.ops.conv_hpack import (_pick_r_blk, _xla_reference,
                                    _xla_reference_i8, conv_bn_relu_pool)


def _case(shape, cin, cout, seed=0):
    b, h, w_ = shape
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.nn.relu(jax.random.normal(kx, (b, h, w_, cin), jnp.float32))
    w = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(kb, (cout,), jnp.float32) * 0.1
    return x, w, bias


class TestKernelNumerics:
    @pytest.mark.parametrize("shape,cin,cout",
                             [((2, 16, 16), 8, 16),    # tiny conv1-like
                              ((1, 8, 24), 16, 8),     # rectangular
                              ((2, 28, 28), 8, 8)])    # q=14: r_blk=14
    def test_interpret_matches_xla_bf16(self, shape, cin, cout):
        x, w, bias = _case(shape, cin, cout)
        ref = _xla_reference(x, w, bias)
        out = conv_bn_relu_pool(x, w, bias, force="pallas")
        assert out.shape == (shape[0], shape[1] // 2, shape[2] // 2, cout)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("variant", ["split", "merged"])
    @pytest.mark.parametrize("s_x_kind", ["dynamic", "tensor", "channel"])
    def test_interpret_int8_near_exact(self, s_x_kind, variant, monkeypatch):
        monkeypatch.setenv("VQA_HPACK_VARIANT", variant)
        x, w, bias = _case((2, 16, 16), 8, 16, seed=1)
        s_x = {"dynamic": None, "tensor": 3.0 / 127.0,
               "channel": tuple(float(v) / 127.0
                                for v in np.linspace(1.0, 4.0, 8))}[s_x_kind]
        ref = _xla_reference_i8(x, w, bias, s_x=s_x)
        out = conv_bn_relu_pool(x, w, bias, force="pallas", int8=True, s_x=s_x)
        # int32 accumulation is exact; the final affine may differ by 1 ulp
        # of f32 (FMA contraction is a compiler choice, Mosaic vs XLA)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-7, atol=3e-7)

    def test_wpool_orderings_bit_identical(self, monkeypatch):
        """The VQA_HPACK_WPOOL A/B knob (r4 probe, rejected-on-perf 'pre'
        ordering kept for reruns) must not change a single bit: pooling the
        accumulator before or after the monotone dequant+bias+ReLU picks
        the same winner."""
        x, w, bias = _case((2, 16, 16), 8, 16, seed=3)
        s_x = tuple(float(v) / 127.0 for v in np.linspace(1.0, 4.0, 8))
        outs = {}
        for wpool in ("post", "pre"):
            monkeypatch.setenv("VQA_HPACK_WPOOL", wpool)
            outs[wpool] = np.asarray(conv_bn_relu_pool(
                x, w, bias, force="pallas", int8=True, s_x=s_x))
        np.testing.assert_array_equal(outs["post"], outs["pre"])

    def test_interpret_int8_quant_out_handoff(self):
        # s_next: the epilogue quantizes the pooled output with the next
        # stage's per-channel scales and the store is int8
        x, w, bias = _case((2, 16, 16), 8, 16, seed=2)
        s_x = tuple(float(v) / 127.0 for v in np.linspace(1.0, 4.0, 8))
        s_next = tuple(float(v) / 127.0 for v in np.linspace(0.5, 2.0, 16))
        ref = _xla_reference_i8(x, w, bias, s_x=s_x, s_next=s_next)
        out = conv_bn_relu_pool(x, w, bias, force="pallas", int8=True,
                                s_x=s_x, s_next=s_next)
        assert out.dtype == jnp.int8 and ref.dtype == jnp.int8
        # int8 grids: FMA-contraction noise at a round() boundary may move
        # a value one step; require near-total agreement
        mismatch = (np.asarray(out) != np.asarray(ref))
        assert mismatch.mean() < 1e-3
        assert np.abs(np.asarray(out, np.int32)
                      - np.asarray(ref, np.int32)).max() <= 1

    def test_cpu_default_uses_xla_path(self):
        x, w, bias = _case((1, 8, 8), 8, 8)
        np.testing.assert_array_equal(
            np.asarray(conv_bn_relu_pool(x, w, bias)),
            np.asarray(_xla_reference(x, w, bias)))

    def test_unsupported_shape_falls_back(self):
        # odd width: auto mode silently falls back, force='pallas' raises
        x, w, bias = _case((1, 8, 9), 8, 8)
        out = conv_bn_relu_pool(x, w, bias)
        assert out.shape == (1, 4, 4, 8)
        with pytest.raises(ValueError, match="unsupported pooled-stage"):
            conv_bn_relu_pool(x, w, bias, force="pallas")

    def test_pick_r_blk(self):
        assert _pick_r_blk(112) == 16
        assert _pick_r_blk(56) == 14
        assert _pick_r_blk(28) == 14
        assert _pick_r_blk(14) == 14
        assert _pick_r_blk(3) == 3


class TestMeshPartitioning:
    def test_batch_sharded_pallas_stays_sharded(self):
        """custom_partitioning: under a DP mesh the kernel runs per-shard
        (no all-gather) and the output keeps the batch sharding."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 8:
            pytest.skip("needs the simulated 8-device mesh")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        x, w, bias = _case((16, 16, 16), 8, 16)
        ref = _xla_reference_i8(x, w, bias, s_x=2.0 / 127.0)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda x, w, b: conv_bn_relu_pool(
            x, w, b, force="pallas", int8=True, s_x=2.0 / 127.0))(xs, w, bias)
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=3e-7, atol=3e-7)


class TestModelIntegration:
    """hpack_pool wiring in VGGFeatures: same values as the XLA int8 stages."""

    def _features(self, hpack, force_pallas=False):
        import os
        from vqa_tpu.models.vgg import VGGFeatures

        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 32, 32, 3), jnp.float32)
        # stage 1 included: the hpack branch is gated to C_in <= 64, so
        # conv1 is the one stage that exercises the kernel routing
        feats = VGGFeatures(int8_stages=(1, 2, 3, 4, 5, 6), hpack_pool=hpack,
                            int8_amax=((1.0,) * 64, (1.0,) * 128,
                                       (2.0,) * 256, (2.0,) * 256,
                                       (3.0,) * 512, (3.0,) * 512))
        vs = feats.init(jax.random.PRNGKey(1), x, True)
        if force_pallas:
            os.environ["VQA_CONVP_FORCE"] = "pallas"
        try:
            return np.asarray(feats.apply(vs, x, True))
        finally:
            os.environ.pop("VQA_CONVP_FORCE", None)

    def test_cpu_fallback_is_exact(self):
        # off-TPU the hpack branch falls back to the identical XLA int8
        # expression: pooling the int32 accumulator before the (monotone)
        # dequant picks the same winners, so values are bit-equal
        np.testing.assert_array_equal(self._features(True),
                                      self._features(False))

    def test_interpret_kernel_matches_model(self):
        got = self._features(True, force_pallas=True)
        ref = self._features(False)
        np.testing.assert_allclose(got, ref, rtol=3e-6, atol=3e-6)

    def test_config_plumbs_hpack(self):
        from vqa_tpu.config import build_model

        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True)
        assert m.hpack_pool
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True,
                           hpack_pool=False)
        assert not m.hpack_pool
        # inert without int8 stages
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=False)
        assert not m.hpack_pool
