"""VGG-11 with BatchNorm, NHWC, as a flax module.

TPU-native re-implementation of the torchvision ``vgg11_bn`` backbone the
reference uses as its image encoder (/root/reference/model.py:86-105,
229-243). Differences from the torch original, by design:

- NHWC data layout (TPU-preferred); converted ``.pth`` weights are permuted
  accordingly (see ``vqa_tpu.models.convert``), including the first classifier
  Linear whose 25088-dim input ordering changes from CHW to HWC;
- BatchNorm runs in running-average mode whenever the backbone is frozen
  (the reference keeps frozen VGG in batch-stats mode during training because
  ``model.train()`` flips BN even on requires_grad=False layers — a quirk we
  deliberately fix; ``bn_use_batch_stats=True`` restores it);
- compute dtype is configurable (bf16 on TPU), parameters stay fp32.

Init parity: conv kernels kaiming_normal(fan_out, relu), BN scale=1/bias=0,
classifier Linear N(0, 0.01)/bias 0 — the torchvision ``_initialize_weights``
scheme — so training-from-scratch dynamics match when no pretrained weights
are supplied.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# torchvision configuration "A": channels per conv, 'M' = 2x2/2 max-pool
VGG11_CFG = (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M")


def conv_kaiming_normal_init(key, shape, dtype=jnp.float32):
    """kaiming_normal(mode=fan_out, nonlinearity=relu) for HWIO conv kernels."""
    kh, kw, _, out_ch = shape
    fan_out = kh * kw * out_ch
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def classifier_init(key, shape, dtype=jnp.float32):
    """torchvision VGG classifier init: N(0, 0.01)."""
    return jax.random.normal(key, shape, dtype) * 0.01


def adaptive_avg_pool(x, out_hw: tuple[int, int]):
    """torch AdaptiveAvgPool2d semantics on NHWC input (static shapes).

    Window i spans [floor(i*H/out), ceil((i+1)*H/out)). Identity when the
    input already has the target spatial shape (the 224->7x7 baseline path,
    reference model.py:96-97).
    """
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    rows = []
    for i in range(oh):
        h0, h1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, oh, ow, C]


def _space_to_depth_kernel(w):
    """Rewrite a 3x3 stride-1 conv kernel for a 2x2 space-to-depth input.

    ``w`` [3, 3, C, O] -> [3, 3, 4C, 4O]: output-channel group P = 2p+q holds
    pool phase (p, q), i.e. the original conv evaluated at output position
    (2i+p, 2j+q). Combined with a 2x2-phase max-reduce this is *exactly*
    conv -> maxpool(2x2), but with a 4Cx9 contraction instead of Cx9 — the
    fix for the first VGG conv whose C_in=3 leaves the 128-wide MXU 98% idle.
    """
    _, _, c, o = w.shape
    w4 = jnp.zeros((3, 3, 4 * c, 4 * o), w.dtype)
    for p in range(2):
        for q in range(2):
            for a in range(3):       # tap offsets -1..1 as 0..2
                for b in range(3):
                    ta, tb = p + a - 1, q + b - 1
                    r, s_ = ta % 2, tb % 2
                    av, bv = (ta - r) // 2 + 1, (tb - s_) // 2 + 1
                    w4 = w4.at[av, bv, (r * 2 + s_) * c:(r * 2 + s_ + 1) * c,
                               (p * 2 + q) * o:(p * 2 + q + 1) * o].set(w[a, b])
    return w4


def _space_to_depth_2x2(x):
    """NHWC [B, H, W, C] -> [B, H/2, W/2, 4C]; channel group = (r*2+s)*C+c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)                 # [B, H/2, W/2, 2, 2, C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


class _ConvParams(nn.Module):
    """Bare conv kernel+bias with the same param-tree layout as ``nn.Conv``."""

    features: int
    in_channels: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kaiming_normal_init,
                            (3, 3, self.in_channels, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _BNParams(nn.Module):
    """Bare BatchNorm params/stats with ``nn.BatchNorm``'s exact tree layout.

    Exposing the raw arrays (instead of calling the module) lets the frozen
    path fold the affine into the conv weights — see VGGFeatures.
    """

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class VGGFeatures(nn.Module):
    """The conv stack (torch ``vgg11_bn().features``): 5 pool stages.

    224x224 -> [B, 7, 7, 512]; 448x448 -> [B, 14, 14, 512].
    Module names ``conv{i}`` / ``bn{i}`` index convs 0..7 for the converter.

    BN folding: in running-stats mode (frozen backbone and all eval), BN is an
    affine constant, so its scale/shift are folded into the conv kernel/bias
    in fp32 at apply time — the conv epilogue is just bias+ReLU, no separate
    normalize (measured ~5-7ms/step on the b160@448 stack, BASELINE.md). The
    fold is algebraically exact; the stored param/stat tree is identical to
    the ``nn.BatchNorm`` layout, so checkpoints and converters are unaffected.
    In batch-stats mode (``--vgg_train`` or ``--bn_mode batch``) BN runs
    unfolded with fp32 statistics and momentum-0.9 running updates.

    ``conv0_pallas``: run stage 1 (conv 3->64 + BN + ReLU + maxpool2x2) as one
    fused Pallas kernel over a space-to-depth input packing (C_in=3 leaves the
    128-deep MXU ~97% idle through XLA's conv emitter: 36ms of the 84ms
    b160@448 stack, tools/profile_vgg.py). Only taken in running-stats mode;
    its inputs are stop_gradient'ed (the frozen backbone needs no conv0
    gradients — config.build_model disables it when the VGG is trainable).

    ``s2d_first``: the earlier XLA-level space-to-depth variant of the same
    idea (kept for A/B: the XLA layout shuffle made it a net loss, BASELINE.md).
    """

    dtype: Dtype = jnp.float32
    s2d_first: bool = False
    conv0_pallas: bool = False
    # conv indices to run as int8 PTQ stages (running-stats/frozen mode only;
    # see the branch below). () = full bf16/fp32. The measured-win set on
    # v5e is (2, 3, 4, 5, 6) — conv1 loses (layout overhead at 64ch) and
    # conv7 is a wash (tools/exp_int8_chain.py, BASELINE.md).
    int8_stages: tuple = ()
    # calibrated per-stage activation amax, aligned with int8_stages: each
    # entry a per-input-channel tuple of floats (or a legacy per-tensor
    # float). Non-empty => STATIC activation scales: s_x is an XLA
    # compile-time constant, so quantized features are independent of batch
    # composition and the per-step global-amax reduction (a DP collective
    # under a mesh) disappears. Empty => dynamic per-batch scales (the r2
    # behavior; still used during calibration itself). Produced by
    # vqa_tpu.train.calibrate and persisted as int8_calib.json per run.
    int8_amax: tuple = ()
    # run pooled int8 stages (conv3/conv5 with the default int8 set; conv1/
    # conv7 too if they ever join int8_stages) through the fused H-pair-
    # packed Pallas kernel (ops/conv_hpack.py): conv + bias + ReLU + maxpool
    # in one pass, same quantization semantics as the XLA int8 stage to
    # within 1 ulp of f32. Falls back to the identical XLA expression
    # off-TPU. No effect on stages outside int8_stages or without a pool.
    hpack_pool: bool = False
    # join conv0 and conv1 with a packed-int8 handoff (ops/conv_stem.py):
    # conv0's epilogue quantizes with conv1's calibrated scales and stores
    # the H-pair-packed int8 map directly — no full-resolution bf16
    # intermediate, no hpack prologue. Engages only when conv0_pallas,
    # hpack_pool, {0, 1} in int8_stages, and static per-channel calibration
    # for both stages are all present (otherwise the unfused branches below
    # run). Numerics: conv1's input quantizes from the f32 epilogue instead
    # of a bf16 store — tighter than, but not bit-equal to, the unfused
    # chain; the off-TPU fallback reproduces the *fused* numerics, so the
    # flag (not the platform) decides the values.
    fused_stem: bool = False
    # int8 handoff between CONSECUTIVE int8-XLA stages (conv2->3->4->5->6
    # with the default set): quantize each stage's output with the NEXT
    # stage's calibrated per-channel scales inside the fused conv epilogue
    # and store int8 — the inter-stage map (and any 2x2 maxpool riding it,
    # which commutes with the monotone quantize) moves through HBM at half
    # the bytes, and the next stage skips its quantize read. Same numerics
    # family as fused_stem: the handoff quantizes from f32 instead of a
    # bf16-rounded store (tighter, not bit-equal to the unfused chain);
    # pure XLA, so values are platform-independent by construction.
    # Requires static per-channel calibration for both stages of each pair.
    int8_handoff: bool = False

    @nn.compact
    def __call__(self, x, use_running_stats: bool = True):
        x = x.astype(self.dtype)
        cfg = list(VGG11_CFG)
        conv_idx = 0
        idx = 0
        xq_in = None   # int8 input pre-quantized by the previous handoff
        while idx < len(cfg):
            v = cfg[idx]
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                idx += 1
                continue
            if idx == 0 and self._take_fused_stem(x, use_running_stats):
                # conv0 + pool + conv1 + pool as two Pallas kernels joined
                # by a packed-int8 handoff (see the fused_stem field note).
                # Params are created with the exact names/layout the
                # unfused branches would create, so checkpoints, the
                # converter, and calibration are all unaffected.
                x = self._fused_stem(x)
                if x.dtype == jnp.int8:
                    xq_in = x             # handoff continues into conv2
                idx += 4                  # conv0, 'M', conv1, 'M'
                conv_idx += 2
                continue
            kernel, bias = _ConvParams(v, x.shape[-1], name=f"conv{conv_idx}")()
            scale, bn_bias, ra_mean, ra_var = _BNParams(v, name=f"bn{conv_idx}")()
            pool_next = idx + 1 < len(cfg) and cfg[idx + 1] == "M"
            first_stage_2x2 = (conv_idx == 0 and pool_next
                               and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)

            def conv(inp, w):
                return jax.lax.conv_general_dilated(
                    inp, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=self.dtype)

            if use_running_stats:
                # fold the affine-constant BN into the conv weights (fp32)
                s = scale * jax.lax.rsqrt(ra_var.value + 1e-5)
                w_f = (kernel * s).astype(self.dtype)
                b_f = ((bias - ra_mean.value) * s + bn_bias).astype(self.dtype)
                # calibration pass (mutable "quant_stats"): record the
                # running max|input| of every int8 stage; consumed by
                # vqa_tpu.train.calibrate into static int8_amax constants
                if conv_idx in self.int8_stages \
                        and self.is_mutable_collection("quant_stats") \
                        and not self.is_initializing():
                    ci = x.shape[-1]
                    qa = self.variable("quant_stats", f"amax{conv_idx}",
                                       lambda: jnp.zeros((ci,), jnp.float32))
                    qa.value = jnp.maximum(
                        qa.value,
                        jnp.max(jnp.abs(x), axis=(0, 1, 2))
                        .astype(jnp.float32))
                s_x_static = None
                if conv_idx in self.int8_stages and self.int8_amax:
                    a = self.int8_amax[self.int8_stages.index(conv_idx)]
                    if isinstance(a, (tuple, list)):
                        # per-input-channel quant scales (see the int8 stage
                        # below for how they fold into the weights)
                        s_x_static = tuple(
                            max(float(v), 1e-12) / 127.0 for v in a)
                    else:  # legacy per-tensor calibration (r3 early files)
                        s_x_static = max(float(a), 1e-12) / 127.0
                if first_stage_2x2 and self.conv0_pallas:
                    from ..ops.conv_stage1 import conv0_bn_relu_pool
                    x = conv0_bn_relu_pool(x, jax.lax.stop_gradient(w_f),
                                           jax.lax.stop_gradient(b_f),
                                           int8=0 in self.int8_stages,
                                           s_x=s_x_static)
                    idx += 2                                  # conv + its 'M'
                elif first_stage_2x2 and self.s2d_first:
                    w4 = _space_to_depth_kernel(w_f)          # [3,3,4C,4*64]
                    y = conv(_space_to_depth_2x2(x), w4)
                    b_, h_, w_, _ = y.shape
                    y = y.reshape(b_, h_, w_, 4, v) + b_f
                    x = jnp.max(nn.relu(y), axis=3)           # phase max == pool
                    idx += 2
                elif (conv_idx in self.int8_stages and self.hpack_pool
                      and pool_next and x.shape[-1] <= 64
                      and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                    # pooled int8 stage through the fused H-pair-packed
                    # kernel (ops/conv_hpack.py): one pass for conv + bias +
                    # ReLU + maxpool2x2, identical quantization to the XLA
                    # int8 branch below (within 1 ulp f32 — FMA contraction).
                    # C_in <= 64 ONLY: the packing pays for itself exactly
                    # where the lane dim would otherwise be half-filled
                    # (conv1); at C_in >= 128 the int8-XLA chain below wins
                    # every measured formulation (BASELINE.md r3 tables:
                    # hpack 29.3/23.7ms vs XLA 15.0/11.7 at conv3/conv5).
                    # stop_gradient everywhere: int8 stages exist only on
                    # the frozen backbone, and pallas_call has no vjp.
                    from ..ops.conv_hpack import conv_bn_relu_pool
                    s_next = self._handoff_scales(conv_idx + 1, v)
                    x = conv_bn_relu_pool(
                        jax.lax.stop_gradient(x),
                        jax.lax.stop_gradient(kernel * s),
                        jax.lax.stop_gradient(
                            (bias - ra_mean.value) * s + bn_bias),
                        int8=True, s_x=s_x_static, s_next=s_next)
                    if s_next is not None:
                        xq_in = x         # int8 handoff into the next stage
                    idx += 2                                  # conv + its 'M'
                elif conv_idx in self.int8_stages:
                    # int8 PTQ stage (tools/exp_int8_chain.py: 1.4-1.6x over
                    # bf16 at >=128 channels through XLA, chain cost incl.):
                    # per-output-channel symmetric weight scales from the
                    # BN-folded fp32 weights; static calibrated (or dynamic
                    # per-batch) activation scale; int32 accumulate -> fp32
                    # dequant + bias + ReLU.
                    #
                    # Per-input-channel activation scales are FREE given
                    # static calibration: with x_q[c] = round(x[c]/s_c) and
                    # w'[c,o] = w[c,o]*s_c quantized per-output-channel,
                    #   acc*s_w = sum_c (x[c]/s_c)(w[c,o]*s_c) ~= sum x w
                    # — the channel scales fold into the weights BEFORE
                    # weight quantization (one extra vector multiply on the
                    # activation path, FLOP-neutral), and quantization error
                    # becomes relative to each channel's own range instead
                    # of the tensor-wide max. (The r3 PTQ eval ladder
                    # measured both schemes within 0.6pp of fp32 on a
                    # converged model — BASELINE.md; per-channel is kept
                    # because it is numerically tighter at zero cost, not
                    # because per-tensor measurably fails.)
                    w32 = kernel * s                          # fp32 [3,3,ci,co]
                    if xq_in is not None:
                        # input already quantized (and pooled) by the
                        # previous stage's handoff epilogue with THIS
                        # stage's s_c — skip the quantize, keep the fold
                        s_c = jnp.asarray(s_x_static, jnp.float32)  # [ci]
                        x_q, xq_in = xq_in, None
                        w32 = w32 * s_c[None, None, :, None]
                        s_out = 1.0
                    elif isinstance(s_x_static, tuple):
                        s_c = jnp.asarray(s_x_static, jnp.float32)  # [ci]
                        x_q = jnp.clip(
                            jnp.round(x.astype(jnp.float32) / s_c),
                            -127, 127).astype(jnp.int8)
                        w32 = w32 * s_c[None, None, :, None]
                        s_out = 1.0
                    else:
                        s_x = s_x_static if s_x_static is not None else \
                            jnp.maximum(
                                jnp.max(jnp.abs(x)).astype(jnp.float32),
                                1e-12) / 127.0
                        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                                       -127, 127).astype(jnp.int8)
                        s_out = s_x
                    s_w = jnp.maximum(
                        jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-12) / 127.0
                    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127) \
                        .astype(jnp.int8)
                    acc = jax.lax.conv_general_dilated(
                        x_q, w_q, (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                    b32 = (bias - ra_mean.value) * s + bn_bias  # fp32
                    y = acc.astype(jnp.float32) * (s_out * s_w) + b32
                    s_next = self._handoff_scales(conv_idx + 1, v) \
                        if isinstance(s_x_static, tuple) else None
                    if s_next is not None:
                        # int8 handoff (see the int8_handoff field note):
                        # quantize for the next stage inside this epilogue;
                        # the 2x2 maxpool (if any) then runs on int8 — the
                        # same winner as pooling the f32 values, at half
                        # the window-read bytes
                        q = jnp.clip(
                            jnp.round(nn.relu(y) /
                                      jnp.asarray(s_next, jnp.float32)),
                            -127, 127).astype(jnp.int8)
                        if pool_next:
                            q = jax.lax.reduce_window(
                                q, jnp.array(-128, jnp.int8), jax.lax.max,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                            idx += 2                          # conv + its 'M'
                        else:
                            idx += 1
                        xq_in = x = q
                    else:
                        x = nn.relu(y).astype(self.dtype)
                        idx += 1
                else:
                    x = nn.relu(conv(x, w_f) + b_f)
                    idx += 1
                conv_idx += 1
                continue

            # batch-stats mode: conv, then BatchNorm with batch statistics
            # (fp32 stats, biased variance, momentum-0.9 running update — the
            # nn.BatchNorm semantics this replaces)
            if first_stage_2x2 and self.s2d_first:
                w4 = _space_to_depth_kernel(kernel)
                y = conv(_space_to_depth_2x2(x), w4.astype(self.dtype))
                b_, h_, w_, _ = y.shape
                y = y.reshape(b_, h_, w_, 4, v) + bias.astype(self.dtype)
                idx += 2
                phase_max = True
            else:
                y = conv(x, kernel.astype(self.dtype)) + bias.astype(self.dtype)
                idx += 1
                phase_max = False
            yf = y.astype(jnp.float32)
            axes = tuple(range(yf.ndim - 1))
            batch_mean = yf.mean(axes)
            batch_var = yf.var(axes)
            if self.is_mutable_collection("batch_stats") \
                    and not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * batch_mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * batch_var
            yn = (yf - batch_mean) * jax.lax.rsqrt(batch_var + 1e-5) \
                * scale + bn_bias
            x = nn.relu(yn.astype(self.dtype))
            if phase_max:
                x = jnp.max(x, axis=3)
            conv_idx += 1
        return x

    def _handoff_scales(self, next_idx: int, out_ch: int):
        """Next stage's per-channel quant scales, or None if the int8
        handoff cannot engage (flag off, next stage not int8, no per-
        channel calibration, or a calibration pass is recording amax —
        the recorder must see f32 stage inputs, not int8)."""
        if not (self.int8_handoff and next_idx in self.int8_stages
                and self.int8_amax):
            return None
        if self.is_mutable_collection("quant_stats") \
                and not self.is_initializing():
            return None
        a = self.int8_amax[self.int8_stages.index(next_idx)]
        if not (isinstance(a, (tuple, list)) and len(a) == out_ch):
            return None
        return tuple(max(float(t), 1e-12) / 127.0 for t in a)

    def _take_fused_stem(self, x, use_running_stats: bool) -> bool:
        """Static routing decision for the fused conv0+conv1 stem.

        All conditions are compile-time (flags, calibration presence,
        shapes), so the same config routes the same way on every platform
        — the values then differ only by the documented f32-vs-bf16
        handoff, which ops/conv_stem.py's fallback reproduces off-TPU.
        """
        if not (use_running_stats and self.fused_stem and self.conv0_pallas
                and self.hpack_pool and 0 in self.int8_stages
                and 1 in self.int8_stages and self.int8_amax):
            return False
        if self.is_mutable_collection("quant_stats") \
                and not self.is_initializing():
            return False    # calibration needs the per-stage amax recording
        a0 = self.int8_amax[self.int8_stages.index(0)]
        a1 = self.int8_amax[self.int8_stages.index(1)]
        if not (isinstance(a0, (tuple, list))
                and isinstance(a1, (tuple, list)) and len(a1) == 64):
            return False    # the handoff needs per-channel static scales
        from ..ops.conv_stem import stem_supported
        return stem_supported(x.shape, (3, 3, x.shape[-1], 64),
                              (3, 3, 64, 128))

    def _fused_stem(self, x):
        """conv0+pool+conv1+pool via the packed-int8 handoff.

        Creates conv0/bn0/conv1/bn1 with the exact names and layouts the
        unfused branches use, folds BN in fp32, and derives both stages'
        static quant scales from the calibration table. stop_gradient
        everywhere: int8 stages exist only on the frozen backbone, and
        pallas_call has no vjp.
        """
        from ..ops.conv_stem import fused_stem
        k0, b0 = _ConvParams(64, x.shape[-1], name="conv0")()
        s0, bb0, m0, v0 = _BNParams(64, name="bn0")()
        k1, b1 = _ConvParams(128, 64, name="conv1")()
        s1, bb1, m1, v1 = _BNParams(128, name="bn1")()
        f0 = s0 * jax.lax.rsqrt(v0.value + 1e-5)
        f1 = s1 * jax.lax.rsqrt(v1.value + 1e-5)
        a0 = self.int8_amax[self.int8_stages.index(0)]
        a1 = self.int8_amax[self.int8_stages.index(1)]
        sx0 = tuple(max(float(t), 1e-12) / 127.0 for t in a0)
        sx1 = tuple(max(float(t), 1e-12) / 127.0 for t in a1)
        sg = jax.lax.stop_gradient
        return fused_stem(
            sg(x), sg(k0 * f0), sg((b0 - m0.value) * f0 + bb0),
            sg(k1 * f1), sg((b1 - m1.value) * f1 + bb1),
            s_x0=sx0, s_x1=sx1,
            # continue the int8 handoff into conv2 when eligible: conv1's
            # pooled output stores as int8 quantized with conv2's scales
            s_next=self._handoff_scales(2, 128))


class VGGClassifierHead(nn.Module):
    """torch ``vgg11_bn().classifier[:-1]``: FC-4096 x2 with ReLU+Dropout.

    Input is the flattened NHWC 7x7x512 map; the final FC-1000 of torchvision
    is dropped exactly as the reference does (model.py:93).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, -1)  # [B, 7*7*512] in HWC order
        x = nn.Dense(4096, kernel_init=classifier_init, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(4096, kernel_init=classifier_init, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x  # [B, 4096]


class VGG11Encoder(nn.Module):
    """features (+ avgpool + FC head) — the reference's two VGG uses.

    ``include_head=True``: 224 images -> 4096-d vector (baseline encoder,
    model.py:93-98). ``include_head=False``: feature map only (co-attention
    encoder, model.py:236).
    """

    include_head: bool = True
    s2d_first: bool = False
    conv0_pallas: bool = False
    int8_stages: tuple = ()
    int8_amax: tuple = ()
    hpack_pool: bool = False
    fused_stem: bool = False
    int8_handoff: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, use_running_stats: bool = True,
                 skip_features: bool = False):
        """``skip_features``: ``x`` is already the conv-stack output (the
        feature-cache boundary, vqa_tpu.data.feature_cache) — run only the
        avgpool + FC head, so the head's Dropout stays live in-step and
        cached training remains exactly equivalent to uncached training."""
        if skip_features:
            x = x.astype(self.dtype)
        else:
            features_cls = VGGFeatures
            if self.remat:
                # trainable-VGG configs: rematerialize the conv stack in
                # backward instead of keeping every 448^2 activation live
                # (HBM headroom for the reference's batch-160 config when
                # --vgg_train true)
                features_cls = nn.remat(VGGFeatures, static_argnums=(2,))
            x = features_cls(dtype=self.dtype, s2d_first=self.s2d_first,
                             conv0_pallas=self.conv0_pallas,
                             int8_stages=self.int8_stages,
                             int8_amax=self.int8_amax,
                             hpack_pool=self.hpack_pool,
                             fused_stem=self.fused_stem,
                             int8_handoff=self.int8_handoff,
                             name="features")(x, use_running_stats)
        if self.include_head:
            x = adaptive_avg_pool(x, (7, 7))
            x = VGGClassifierHead(dtype=self.dtype, name="classifier")(x, train)
        return x
