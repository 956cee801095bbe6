"""int8 PTQ backbone (--int8_backbone): numerics, wiring, and guards.

The quantized stages (per-output-channel weight scales, dynamic per-batch
activation scale, int32 accumulation — vqa_tpu/models/vgg.py) approximate
the bf16/fp32 path; these tests bound the approximation on the conv-stack
output and check the flag plumbing. Throughput claims live in BASELINE.md
(tools/exp_int8_chain.py — CPU timings are meaningless here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.config import build_model
from vqa_tpu.models.vgg import VGG11Encoder


def _randomize_bn_stats(variables, seed=3):
    """Non-trivial running mean/var so the BN fold actually scales weights
    (init stats are mean 0 / var 1 -> s ~= 1, which would mask a bug where
    quantization scales came from the raw instead of the folded kernel)."""
    import flax.traverse_util as tu

    key = jax.random.PRNGKey(seed)
    flat = tu.flatten_dict(variables)
    for k, v in flat.items():
        if k[0] != "batch_stats":
            continue
        key, sub = jax.random.split(key)
        if k[-1] == "mean":
            flat[k] = jax.random.normal(sub, v.shape) * 0.2
        elif k[-1] == "var":
            flat[k] = jax.random.uniform(sub, v.shape, minval=0.3, maxval=2.0)
    return tu.unflatten_dict(flat)


def _features(int8_stages, x, seed=0):
    enc = VGG11Encoder(include_head=False, int8_stages=int8_stages)
    variables = _randomize_bn_stats(
        enc.init({"params": jax.random.PRNGKey(seed)}, x))
    return enc.apply(variables, x, False, True), variables, enc


class TestNumerics:
    def test_quantized_features_close_to_fp32(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        ref, variables, enc = _features((), x)
        q_enc = VGG11Encoder(include_head=False, int8_stages=(2, 3, 4, 5, 6))
        quant = q_enc.apply(variables, x, False, True)
        ref, quant = np.asarray(ref, np.float32), np.asarray(quant, np.float32)
        # relative error of the feature map, guarded against near-zero scale
        denom = max(np.abs(ref).max(), 1e-6)
        rel = np.abs(ref - quant).max() / denom
        assert rel < 0.05, f"int8 backbone features drifted: rel={rel:.4f}"
        # correlation stays essentially 1: the representation is preserved
        c = np.corrcoef(ref.ravel(), quant.ravel())[0, 1]
        assert c > 0.999, c

    def test_int8_conv0_kernel_close_to_xla(self):
        """The fused int8 stage-1 kernel (interpret mode) vs the fp32 oracle."""
        from vqa_tpu.ops.conv_stage1 import _conv0_pallas_i8, _xla_reference

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 64, 64, 3))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 64)) * 0.2
        b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
        ref = np.asarray(_xla_reference(x, w, b), np.float32)
        got = np.asarray(_conv0_pallas_i8(x, w, b, interpret=True), np.float32)
        rel = np.abs(ref - got).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 0.03, rel
        c = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
        assert c > 0.999, c

    def test_static_calibrated_scales_are_batch_invariant(self):
        """Calibrated static scales (r3): an image's quantized features no
        longer depend on its batchmates; dynamic scales (the r2 behavior)
        do — the difference the calibration exists to remove."""
        from vqa_tpu.train.calibrate import amax_tuple, collect_amax

        enc = VGG11Encoder(include_head=False, int8_stages=(2, 3))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = enc.init({"params": jax.random.PRNGKey(1)}, x)
        amax = collect_amax(enc, variables, [x, x * 2.0])
        assert set(amax) == {2, 3}
        # per-channel vectors, one entry per input channel of each stage;
        # individual channels may be 0 (dead-ReLU at calibration: their
        # folded weights vanish, which is the correct contribution)
        assert all(v.ndim == 1 and (v >= 0).all() and v.max() > 0
                   for v in amax.values())
        enc_static = enc.clone(int8_amax=amax_tuple((2, 3), amax))

        xa = x[:1]
        xb = jnp.concatenate([xa, x[1:] * 3.0])  # extreme batchmate
        fa = enc_static.apply(variables, xa, False, True)
        fb = enc_static.apply(variables, xb, False, True)[:1]
        assert jnp.all(fa == fb), "static-scale features depend on batchmates"
        fa_d = enc.apply(variables, xa, False, True)
        fb_d = enc.apply(variables, xb, False, True)[:1]
        assert jnp.any(fa_d != fb_d), \
            "dynamic scales unexpectedly batch-invariant (test is vacuous)"

    def test_calibrate_model_sidecar_roundtrip(self, tmp_path):
        """calibrate_model writes int8_calib.json; load_calib round-trips it
        and rejects a different stage set."""
        from vqa_tpu.config import build_model
        from vqa_tpu.train.calibrate import calibrate_model, load_calib

        model, _ = build_model("baseline", 30, 4, int8_backbone=True,
                               conv0_pallas=False)
        assert model.int8_stages == (2, 3, 4, 5, 6, 7)
        x = np.random.default_rng(0).integers(
            0, 255, (2, 32, 32, 3), np.uint8)
        img = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0)}, img,
            jnp.zeros((1, 5), jnp.int32), jnp.ones((1,), jnp.int32))

        def preprocess(u8):
            return jnp.asarray(u8, jnp.float32) / 255.0

        calibrated = calibrate_model("baseline", model, variables, preprocess,
                                     [x], log_dir=str(tmp_path), log=lambda s: None)
        assert len(calibrated.int8_amax) == 6
        # per-channel tuples; VGG stage input widths for stages 2-7
        assert [len(a) for a in calibrated.int8_amax] == [128, 256, 256, 512,
                                                          512, 512]
        assert all(min(a) >= 0 and max(a) > 0 for a in calibrated.int8_amax)
        assert load_calib(str(tmp_path), model.int8_stages) \
            == calibrated.int8_amax
        assert load_calib(str(tmp_path), (2, 3)) is None  # stale stage set

    def test_int8_fallback_is_int8_on_every_platform(self):
        """int8=True off-TPU falls back to the int8 XLA reference — NOT the
        bf16 oracle — so one --int8_backbone config computes one set of
        values regardless of platform (ADVICE r2)."""
        from vqa_tpu.ops.conv_stage1 import (_conv0_pallas_i8, _xla_reference,
                                             _xla_reference_i8,
                                             conv0_bn_relu_pool)

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 64)) * 0.2
        b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
        got = np.asarray(conv0_bn_relu_pool(x, w, b, int8=True), np.float32)
        i8_ref = np.asarray(_xla_reference_i8(x, w, b), np.float32)
        np.testing.assert_allclose(got, i8_ref, rtol=0, atol=1e-5)
        # and the int8 XLA reference agrees with the int8 Pallas kernel
        kern = np.asarray(_conv0_pallas_i8(x, w, b, interpret=True), np.float32)
        np.testing.assert_allclose(kern, i8_ref, rtol=1e-4, atol=1e-4)
        # sanity: it is NOT the bf16 fallback
        bf16 = np.asarray(_xla_reference(x, w, b), np.float32)
        assert np.abs(got - bf16).max() > 1e-6

    def test_int8_only_in_running_stats_mode(self):
        """batch-stats mode (trainable/bn quirk) ignores int8_stages."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        enc = VGG11Encoder(include_head=False, int8_stages=(2, 3))
        variables = enc.init({"params": jax.random.PRNGKey(0)}, x)
        ref = VGG11Encoder(include_head=False).apply(
            variables, x, False, False, mutable=["batch_stats"])[0]
        got = enc.apply(variables, x, False, False, mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


class TestWiring:
    def test_build_model_flag(self):
        model, _ = build_model("attention", 30, 4, int8_backbone=True)
        # conv0 included via the fused Pallas int8 kernel (default-on);
        # conv1 joined in late r3 via the hpack kernel (PTQ drift gate
        # passed, BASELINE.md r3 cont.)
        assert model.int8_stages == (0, 1, 2, 3, 4, 5, 6, 7)
        model, _ = build_model("attention", 30, 4, int8_backbone=True,
                               hpack_pool=False)
        # without the hpack kernel conv1 reverts to bf16 XLA (the int8-XLA
        # chain loses at 64ch)
        assert model.int8_stages == (0, 2, 3, 4, 5, 6, 7)
        model, _ = build_model("attention", 30, 4, int8_backbone=True,
                               conv0_pallas=False)
        assert model.int8_stages == (2, 3, 4, 5, 6, 7)
        model, _ = build_model("baseline", 30, 4)
        assert model.int8_stages == ()

    def test_opt_lvl_auto_mapping(self):
        """O1+ auto-enables int8 on TPU only (r3 default decision,
        BASELINE.md; tests run on CPU: stays off); explicit False wins at
        any level; O0 never auto-enables."""
        for lvl in (1, 2, 3):
            model, _ = build_model("baseline", 30, 4, opt_lvl=lvl)
            assert model.int8_stages == ()  # CPU backend -> auto off
        model, _ = build_model("baseline", 30, 4, opt_lvl=3,
                               int8_backbone=False)
        assert model.int8_stages == ()
        model, _ = build_model("baseline", 30, 4, opt_lvl=0,
                               int8_backbone=True)
        assert model.int8_stages == (0, 1, 2, 3, 4, 5, 6, 7)

    def test_rejects_trainable_vgg(self):
        with pytest.raises(ValueError, match="frozen"):
            build_model("baseline", 30, 4, vgg_trainable=True,
                        int8_backbone=True)

    def test_full_model_jit(self):
        model, _ = build_model("baseline", 30, 4, int8_backbone=True,
                               opt_lvl=0)
        rng = jax.random.PRNGKey(0)
        img = jax.random.normal(rng, (2, 32, 32, 3))
        ques = jax.random.randint(rng, (2, 5), 1, 30)
        lens = jnp.full((2,), 5, jnp.int32)
        variables = model.init({"params": rng}, img, ques, lens)
        logits = jax.jit(lambda v, a, q, l: model.apply(v, a, q, l))(
            variables, img, ques, lens)
        assert logits.shape == (2, 4)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
