"""Inter-stage int8 handoff (models/vgg.py ``int8_handoff``).

With static per-channel calibration, consecutive int8-XLA stages exchange
an int8 map quantized with the consumer's own scales instead of a bf16
store + re-quantize. Pure XLA: the values are platform-independent by
construction, so these CPU tests pin the exact semantics the TPU runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.models.vgg import VGGFeatures

STAGES = (0, 1, 2, 3, 4, 5, 6)


def _amax():
    return ((1.0, 1.0, 1.0), (2.0,) * 64, (1.0,) * 128, (2.0,) * 256,
            (2.0,) * 256, (3.0,) * 512, (3.0,) * 512)


def _features(handoff, *, int8_amax="default", dtype=jnp.bfloat16):
    feats = VGGFeatures(
        conv0_pallas=True, hpack_pool=True, fused_stem=False,
        int8_handoff=handoff, int8_stages=STAGES, dtype=dtype,
        int8_amax=_amax() if int8_amax == "default" else int8_amax)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    vs = feats.init(jax.random.PRNGKey(1), x, True)
    return feats, vs, x


class TestHandoffNumerics:
    def test_close_to_unfused_chain(self):
        f1, vs, x = _features(True)
        f2, _, _ = _features(False)
        a = np.asarray(f1.apply(vs, x, True), np.float32)
        b = np.asarray(f2.apply(vs, x, True), np.float32)
        assert a.shape == b.shape
        # each handoff replaces a bf16 round-trip with an f32-quantize:
        # differences are bounded by requant steps through stages 3..6
        assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(b).max())
        assert np.mean(np.abs(a - b)) < 0.02 * max(1.0, np.abs(b).max())

    def test_fp32_compute_handoff_pool_commutes(self):
        # in fp32 compute there is no bf16 rounding on the unfused chain's
        # inter-stage stores, so handoff-vs-unfused differ ONLY by where
        # the quantize happens relative to the pool — which commutes
        # exactly (monotone) — and by FMA contraction freedom. Require
        # near-bit equality.
        f1, vs, x = _features(True, dtype=jnp.float32)
        f2, _, _ = _features(False, dtype=jnp.float32)
        a = np.asarray(f1.apply(vs, x, True), np.float32)
        b = np.asarray(f2.apply(vs, x, True), np.float32)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_full_chain_with_fused_stem(self):
        # fused stem + conv1->conv2 quantizing epilogue + XLA handoffs:
        # every inter-stage map from conv1's output to conv6's is int8
        feats = VGGFeatures(conv0_pallas=True, hpack_pool=True,
                            fused_stem=True, int8_handoff=True,
                            int8_stages=STAGES, int8_amax=_amax(),
                            dtype=jnp.bfloat16)
        plain = VGGFeatures(conv0_pallas=True, hpack_pool=True,
                            fused_stem=False, int8_handoff=False,
                            int8_stages=STAGES, int8_amax=_amax(),
                            dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3),
                              jnp.float32)
        vs = feats.init(jax.random.PRNGKey(1), x, True)
        a = np.asarray(feats.apply(vs, x, True), np.float32)
        b = np.asarray(plain.apply(vs, x, True), np.float32)
        assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(b).max())
        assert np.mean(np.abs(a - b)) < 0.02 * max(1.0, np.abs(b).max())

    def test_inert_without_amax(self):
        f1, vs, x = _features(True, int8_amax=())
        f2, _, _ = _features(False, int8_amax=())
        np.testing.assert_array_equal(np.asarray(f1.apply(vs, x, True)),
                                      np.asarray(f2.apply(vs, x, True)))

    def test_calibration_pass_still_records_all_stages(self):
        f1, vs, x = _features(True)
        _, upd = f1.apply(vs, x, True, mutable=["quant_stats"])
        got = sorted(int(k[len("amax"):]) for k in upd["quant_stats"])
        assert got == list(STAGES)

    def test_param_tree_unchanged(self):
        f1, v1, _ = _features(True)
        f2, v2, _ = _features(False)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v2)

    def test_handoff_scales_gate(self):
        f1, vs, x = _features(True)
        bound = f1.bind(vs)
        assert bound._handoff_scales(3, 256) is not None
        assert bound._handoff_scales(7, 512) is None      # conv7 not int8
        assert bound._handoff_scales(3, 999) is None      # channel mismatch
        f0, vs0, _ = _features(False)
        assert f0.bind(vs0)._handoff_scales(3, 256) is None

    def test_config_plumbs_handoff(self):
        from vqa_tpu.config import build_model

        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True)
        assert m.int8_handoff
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True,
                           int8_handoff=False)
        assert not m.int8_handoff
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=False)
        assert not m.int8_handoff
