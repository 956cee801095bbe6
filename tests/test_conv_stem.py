"""Fused conv0+conv1 stem (ops/conv_stem): numerics, routing, partitioning.

The packed-int8 handoff quantizes conv1's input from stage 0's f32
epilogue value (ops/conv_stem.py module docstring), so the fused chain is
compared against ITS OWN XLA expression (`_xla_reference`, the off-TPU
fallback) — near-exact, with a small fraction of elements allowed to land
one requant step away when FMA-contraction noise crosses a round(x/s)
boundary — and against the unfused two-kernel chain only loosely (they
legitimately differ by requant steps; the r3 PTQ ladder bounds the
accuracy impact, BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.ops import conv_stem
from vqa_tpu.ops.conv_stem import _xla_reference, fused_stem, stem_supported


def _case(b=2, h=16, w=16, cin=3, seed=0):
    kx, k0, kb0, k1, kb1 = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(kx, (b, h, w, cin), jnp.float32)
    w0 = jax.random.normal(k0, (3, 3, cin, 64), jnp.float32) * 0.2
    b0 = jax.random.normal(kb0, (64,), jnp.float32) * 0.1
    w1 = jax.random.normal(k1, (3, 3, 64, 128), jnp.float32) * 0.05
    b1 = jax.random.normal(kb1, (128,), jnp.float32) * 0.1
    s_x0 = tuple(float(v) for v in
                 np.abs(np.asarray(x)).reshape(-1, cin).max(0) / 127.0)
    # conv1 scales from the f32 stage-0 output (what calibration records)
    from vqa_tpu.ops.conv_stage1 import _xla_reference as conv0_ref
    y0 = np.asarray(conv0_ref(x, w0, b0), np.float32)
    s_x1 = tuple(max(float(v), 1e-12) / 127.0
                 for v in y0.reshape(-1, 64).max(0))
    return x, w0, b0, w1, b1, s_x0, s_x1


class TestKernelNumerics:
    def test_interpret_matches_fallback(self):
        x, w0, b0, w1, b1, s_x0, s_x1 = _case()
        ref = np.asarray(_xla_reference(x, w0, b0, w1, b1, s_x0, s_x1,
                                        jnp.float32), np.float32)
        out = np.asarray(fused_stem(x, w0, b0, w1, b1, s_x0=s_x0,
                                    s_x1=s_x1, force="pallas"), np.float32)
        assert out.shape == (2, 4, 4, 128)
        diff = np.abs(out - ref)
        # FMA contraction can push a quantize across a rounding boundary:
        # allow a <0.5% sliver of elements one requant step off (the probe
        # measured 7.5e-4 on the packed handoff, tools/exp_fuse01.py)
        tight = diff < 3e-6 * max(1.0, np.abs(ref).max())
        assert tight.mean() > 0.995, f"only {tight.mean():.4f} tight"
        step = 127.0 * max(s_x1) * np.abs(w1).max() * 9  # 1 requant step bound
        assert diff.max() < step

    def test_xla_phase_conv1_matches_hpack_kernel_exactly(self):
        """The r5 phase-conv conv1 (two XLA int8 convs on the packed input,
        phase-max = pool-H) must equal the hpack Pallas kernel bit-for-bit
        — every post-accumulator op is monotone so max/quant/pool commute
        (conv_stem._conv1_xla_phases docstring)."""
        from vqa_tpu.ops.conv_stem import (_conv1_xla_phases,
                                           _hpack_from_packed)

        rng = jax.random.PRNGKey(0)
        xp = jax.random.randint(rng, (2, 8, 16, 128), -127, 128,
                                jnp.int32).astype(jnp.int8)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 128),
                              jnp.float32) * 0.05
        b = jax.random.normal(jax.random.PRNGKey(2), (128,),
                              jnp.float32) * 0.1
        s1 = tuple([0.02] * 64)
        for s_next in (tuple([0.03] * 128), None):
            ref = _hpack_from_packed(xp, w, b, s1, jnp.bfloat16,
                                     interpret=True, s_next=s_next)
            out = _conv1_xla_phases(xp, w, b, s1, jnp.bfloat16,
                                    s_next=s_next)
            assert out.dtype == ref.dtype
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_fused_stem_conv1_impl_env_same_values(self, monkeypatch):
        """fused_stem computes the same values under either conv1
        implementation (VQA_STEM_CONV1), so the A/B knob carries no
        accuracy risk."""
        x, w0, b0, w1, b1, s_x0, s_x1 = _case()
        outs = {}
        for impl in ("pallas", "xla_phase"):
            monkeypatch.setenv("VQA_STEM_CONV1", impl)
            outs[impl] = np.asarray(
                fused_stem(x, w0, b0, w1, b1, s_x0=s_x0, s_x1=s_x1,
                           force="pallas"), np.float32)
        np.testing.assert_array_equal(outs["pallas"], outs["xla_phase"])

    def test_fused_close_to_unfused_chain(self):
        # the shipped two-kernel chain (bf16 intermediate) and the fused
        # chain agree to within a few requant steps of conv1's quantizer
        from vqa_tpu.ops.conv_hpack import _xla_reference_i8 as hpack_ref
        from vqa_tpu.ops.conv_stage1 import _xla_reference_i8 as conv0_ref

        x, w0, b0, w1, b1, s_x0, s_x1 = _case(seed=3)
        xb = x.astype(jnp.bfloat16)
        y0 = conv0_ref(xb, w0, b0, s_x=s_x0)              # bf16 store
        unfused = np.asarray(hpack_ref(y0, w1, b1, s_x=s_x1), np.float32)
        fused = np.asarray(fused_stem(xb, w0, b0, w1, b1, s_x0=s_x0,
                                      s_x1=s_x1), np.float32)
        assert np.abs(fused - unfused).max() < 24 * max(s_x1)

    def test_quant_out_handoff_matches_fallback(self):
        # s_next: conv1's pooled output stores int8, quantized with
        # conv2's scales — compare the kernels against the XLA fallback
        x, w0, b0, w1, b1, s_x0, s_x1 = _case(seed=5)
        s_next = tuple(float(v) / 127.0 for v in np.linspace(0.5, 2.0, 128))
        ref = _xla_reference(x, w0, b0, w1, b1, s_x0, s_x1, jnp.float32,
                             s_next=s_next)
        out = fused_stem(x, w0, b0, w1, b1, s_x0=s_x0, s_x1=s_x1,
                         s_next=s_next, force="pallas")
        assert out.dtype == jnp.int8 and ref.dtype == jnp.int8
        mismatch = (np.asarray(out) != np.asarray(ref))
        assert mismatch.mean() < 2e-3
        assert np.abs(np.asarray(out, np.int32)
                      - np.asarray(ref, np.int32)).max() <= 1

    def test_requires_per_channel_scales(self):
        x, w0, b0, w1, b1, s_x0, _ = _case()
        with pytest.raises(ValueError, match="static per-channel"):
            fused_stem(x, w0, b0, w1, b1, s_x0=s_x0, s_x1=0.1)

    def test_stem_supported(self):
        assert stem_supported((2, 16, 16, 3), (3, 3, 3, 64), (3, 3, 64, 128))
        # odd spatial dims, wrong stem widths
        assert not stem_supported((2, 18, 16, 3), (3, 3, 3, 64),
                                  (3, 3, 64, 128))
        assert not stem_supported((2, 16, 16, 3), (3, 3, 3, 32),
                                  (3, 3, 32, 128))
        # production shape
        assert stem_supported((160, 448, 448, 3), (3, 3, 3, 64),
                              (3, 3, 64, 128))


class TestMeshPartitioning:
    def test_batch_sharded_stays_sharded(self):
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        if len(jax.devices()) < 8:
            pytest.skip("needs the simulated 8-device mesh")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        x, w0, b0, w1, b1, s_x0, s_x1 = _case(b=16)
        ref = np.asarray(fused_stem(x, w0, b0, w1, b1, s_x0=s_x0,
                                    s_x1=s_x1, force="pallas"), np.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda *a: fused_stem(*a, s_x0=s_x0, s_x1=s_x1,
                                            force="pallas"))(
            xs, w0, b0, w1, b1)
        assert out.sharding.spec == P("data")
        np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                                   rtol=3e-6, atol=3e-6)


class TestModelIntegration:
    """fused_stem wiring in VGGFeatures: routing gates and param layout."""

    def _amax(self):
        return ((1.0, 1.0, 1.0), (2.0,) * 64, (1.0,) * 128, (2.0,) * 256,
                (2.0,) * 256, (3.0,) * 512, (3.0,) * 512)

    def _features(self, fused, x=None, int8_amax="default"):
        from vqa_tpu.models.vgg import VGGFeatures

        if x is None:
            x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                                  jnp.float32)
        feats = VGGFeatures(
            conv0_pallas=True, hpack_pool=True, fused_stem=fused,
            int8_stages=(0, 1, 2, 3, 4, 5, 6),
            int8_amax=self._amax() if int8_amax == "default" else int8_amax)
        vs = feats.init(jax.random.PRNGKey(1), x, True)
        return feats, vs, x

    def test_param_tree_identical(self):
        f1, v1, _ = self._features(True)
        f2, v2, _ = self._features(False)
        t1 = jax.tree_util.tree_structure(v1)
        t2 = jax.tree_util.tree_structure(v2)
        assert t1 == t2
        for (p1, a), (p2, b) in zip(
                jax.tree_util.tree_flatten_with_path(v1)[0],
                jax.tree_util.tree_flatten_with_path(v2)[0]):
            assert p1 == p2 and a.shape == b.shape

    def test_fused_model_close_to_unfused(self):
        f1, v1, x = self._features(True)
        f2, v2, _ = self._features(False)
        a = np.asarray(f1.apply(v1, x, True), np.float32)
        b = np.asarray(f2.apply(v2, x, True), np.float32)
        assert a.shape == b.shape
        # the handoff changes conv1's input by <=1 requant step; stages 2+
        # requantize, so the difference stays bounded, not bit-zero
        assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(b).max())
        assert np.mean(np.abs(a - b)) < 0.02 * max(1.0, np.abs(b).max())

    def test_not_taken_without_amax(self):
        # without calibration the fused branch must not engage: outputs are
        # bit-equal to the unfused dynamic-scale chain
        f1, v1, x = self._features(True, int8_amax=())
        f2, v2, _ = self._features(False, int8_amax=())
        np.testing.assert_array_equal(
            np.asarray(f1.apply(v1, x, True)),
            np.asarray(f2.apply(v2, x, True)))

    def test_calibration_pass_still_records(self):
        # quant_stats mutable => the unfused branches run and record every
        # stage's amax (the fused branch would skip stages 0/1 recording)
        f1, v1, x = self._features(True)
        _, upd = f1.apply(v1, x, True, mutable=["quant_stats"])
        got = sorted(int(k[len("amax"):]) for k in upd["quant_stats"])
        assert got == [0, 1, 2, 3, 4, 5, 6]

    def test_config_plumbs_fused_stem(self):
        from vqa_tpu.config import build_model

        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True)
        assert m.fused_stem
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True,
                           fused_stem=False)
        assert not m.fused_stem
        # fused_stem rides hpack_pool/conv0_pallas
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True,
                           hpack_pool=False)
        assert not m.fused_stem
        m, _ = build_model("attention", 30, 4, opt_lvl=1, int8_backbone=True,
                           conv0_pallas=False)
        assert not m.fused_stem
