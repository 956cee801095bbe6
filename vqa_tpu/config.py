"""Model-config registry + flag coercers.

Typed replacement for the reference's hardcoded config dict
(/root/reference/main.py:388-418) and flag helpers (utils.py:294-303), with
the same architecture hyperparameters per model name:

- ``baseline``: 224x224 images, word_emb 300, hidden 1024;
- ``attention``: 448x448 images, word_emb 512, hidden 512, mlp_dim 1024;
- ``bert``: accepted by the reference CLI but missing from its registry
  (KeyError; README "TO-DO") — implemented here for real with a
  transformer question encoder (SURVEY.md §7.8).

The reference's Apex ``--opt_lvl`` O0-O3 maps onto a TPU precision policy:
O0 = pure fp32; O1+ = bf16 compute with fp32 params (bf16 needs no loss
scaling on TPU) plus the int8-PTQ frozen backbone on TPU (r3 default
decision: eval drift <=0.4pp on a task with resolution, training outcomes
within seed noise, 6.6x throughput — BASELINE.md "Round 3: accuracy
ladder"). ``--int8_backbone true|false`` overrides the O-level default
either way.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp


def str2bool(v: str) -> bool:
    v = v.lower()
    assert v in ("true", "false")
    return v == "true"


def int_min_two(k) -> int:
    k = int(k)
    assert k >= 2, "Ensure k >= 2"
    return k


@dataclass(frozen=True)
class ModelConfig:
    name: str
    image_size: int
    question_params: dict = field(default_factory=dict)
    mlp_dim: int | None = None


MODEL_CONFIGS = {
    "baseline": ModelConfig(
        name="baseline", image_size=224,
        question_params=dict(word_emb_dim=300, hidden_dim=1024)),
    "attention": ModelConfig(
        name="attention", image_size=448,
        question_params=dict(word_emb_dim=512, hidden_dim=512), mlp_dim=1024),
    "bert": ModelConfig(
        name="bert", image_size=224,
        question_params=dict(hidden_dim=768, num_layers=6, num_heads=12)),
}


def compute_dtype_for_opt_lvl(opt_lvl: int):
    """Apex O0-O3 -> TPU precision policy (fp32 vs bf16 compute)."""
    return jnp.float32 if opt_lvl == 0 else jnp.bfloat16


def build_model(model_name: str, vocab_size: int, num_classes: int, *,
                vgg_trainable: bool = False, opt_lvl: int = 1,
                use_pallas: bool = False, s2d_first: bool = False,
                conv0_pallas: bool | None = None,
                int8_backbone: bool | None = None,
                hpack_pool: bool = True,
                fused_stem: bool = True,
                int8_handoff: bool = True,
                int8_stages_override: tuple | None = None,
                max_seq_length: int | None = None):
    """Instantiate a model by registry name (reference main.py:162-165).

    ``conv0_pallas`` (default: on iff the VGG is frozen) runs the first VGG
    stage as the fused Pallas conv+BN+ReLU+pool kernel
    (vqa_tpu.ops.conv_stage1) — XLA's emitter leaves the MXU ~97% idle on the
    C_in=3 conv. Disabled when the backbone trains: the kernel's inputs are
    stop_gradient'ed (no backward needed/defined).

    ``s2d_first`` keeps the earlier XLA-level space-to-depth variant
    available for A/B (measured net-slower: the XLA layout shuffle outweighs
    the conv win, BASELINE.md).
    """
    cfg = MODEL_CONFIGS[model_name]
    dtype = compute_dtype_for_opt_lvl(opt_lvl)
    # trainable VGG rematerializes the conv stack in backward (HBM headroom)
    remat = vgg_trainable
    if conv0_pallas is None:
        conv0_pallas = not vgg_trainable
    conv0_pallas = conv0_pallas and not s2d_first and not vgg_trainable
    # int8 PTQ of the frozen conv stack: the measured-win stage set on v5e
    # (conv1 loses at 64ch through XLA, conv7 is a wash —
    # tools/exp_int8_chain.py). Stage 0 is int8 only through the fused
    # Pallas kernel (the XLA emitter's C_in=3 layout penalty applies to
    # int8 too). Frozen-only: quantized stages have no meaningful gradient.
    # Default (None): ON at every mixed-precision level (opt_lvl >= 1) —
    # r3 decision, BASELINE.md "Round 3: accuracy ladder": PTQ eval drift
    # <=0.4pp on a converged mid-band model, 12-epoch training outcomes
    # within seed noise (bf16 {90.5, 85.4} vs int8 {85.3, 87.1}), +25%
    # train throughput. OFF at O0 (pure-fp32 parity level)
    if int8_backbone and vgg_trainable:
        raise ValueError("--int8_backbone requires a frozen VGG "
                         "(--vgg_train false)")
    if int8_backbone is None:
        int8_backbone = opt_lvl >= 1 and not vgg_trainable
        if int8_backbone:
            # auto engages on TPU only: XLA's CPU int8 conv path is a scalar
            # reference implementation (orders of magnitude slower); explicit
            # int8_backbone=True is honored on any backend. The platform
            # check runs only when O1+ actually asks for it (jax.devices()
            # can block on a wedged tunnel).
            from .ops.conv_stage1 import _on_tpu
            int8_backbone = _on_tpu()
            if int8_backbone:
                print("NOTE: --opt_lvl >= 1 enables the int8-PTQ frozen "
                      "backbone (drift <=0.4pp measured with resolution, "
                      "BASELINE.md r3); pass --int8_backbone false for "
                      "pure bf16")
    # conv1 joined the default set in late r3: its int8 path runs through
    # the fused H-pair-packed kernel (hpack below; the XLA int8 chain loses
    # at 64ch, 28.3ms vs 20.5 bf16, but the kernel wins at 19.1ms), and the
    # PTQ drift gate passed — converged K=12 checkpoint evals 90.55% with
    # conv1 quantized vs 90.50 bf16 / 90.35 with the old set (BASELINE.md
    # r3 cont.). Falls back to bf16 XLA when hpack is disabled (see the
    # stage-set adjustment below) so --hpack_pool false never routes conv1
    # through the losing int8-XLA chain.
    # conv7 joined in late r3: the int8-XLA conv7 chain measures 4.82ms
    # vs 6.14 bf16 with static per-channel scales (the r2 "conv7 is a
    # wash" verdict was pre-static-calibration), and its PTQ drift gate
    # passed — the converged K=12 checkpoint evals 90.50% with stages
    # (0..7), identical to bf16's 90.50 (BASELINE.md r3 cont.).
    int8_stages = () if not int8_backbone else (
        (0, 1, 2, 3, 4, 5, 6, 7) if conv0_pallas else (2, 3, 4, 5, 6, 7))
    if not hpack_pool:
        # conv1 is int8-profitable ONLY through the hpack kernel; with the
        # kernel opted out, the default set reverts to the r3-early set so
        # conv1 stays bf16-XLA rather than the losing int8-XLA chain
        int8_stages = tuple(i for i in int8_stages if i != 1)
    if int8_stages_override is not None and int8_backbone:
        # explicit stage-set override (--int8_stages): production tuning and
        # the PTQ drift experiments that gate default-set changes. Stage 0
        # quantizes only through the fused conv0 kernel.
        int8_stages = tuple(sorted(set(int8_stages_override)
                                   - (set() if conv0_pallas else {0})))
    # pooled int8 stages with C_in <= 64 (i.e. conv1, if int8-quantized)
    # run through the fused H-pair-packed Pallas kernel (ops/conv_hpack.py)
    # — same quantization to within 1 ulp f32, conv+bias+ReLU+pool in one
    # pass; the packing fixes the half-filled lane dim that makes both the
    # XLA int8 chain (31ms) and every unpacked Pallas formulation lose to
    # bf16 XLA (20.5ms) at conv1 (BASELINE.md r3). At C_in >= 128 the
    # int8-XLA chain wins instead, so conv3/conv5 stay on it. Inert when
    # int8_stages is empty; identical-XLA fallback off-TPU.
    hpack_pool = bool(hpack_pool) and bool(int8_stages)
    # join conv0/conv1 with a packed-int8 handoff (ops/conv_stem.py) once
    # static calibration exists: conv0 stops storing a full-resolution bf16
    # map for the hpack prologue to immediately requantize. Engages at
    # apply time only when {0, 1} are int8 stages with per-channel scales
    # (models/vgg.py _take_fused_stem); inert otherwise, so the flag can
    # default on alongside hpack_pool.
    fused_stem = bool(fused_stem) and hpack_pool and conv0_pallas
    # quantize each int8-XLA stage's output for the next one inside the
    # epilogue (models/vgg.py int8_handoff note): halves inter-stage HBM
    # traffic for conv2..6 once static calibration exists; inert otherwise
    int8_handoff = bool(int8_handoff) and bool(int8_stages)
    if model_name == "baseline":
        from .models import VQABaselineNet
        return VQABaselineNet(vocab_size=vocab_size, K=num_classes,
                              vgg_trainable=vgg_trainable, s2d_first=s2d_first,
                              conv0_pallas=conv0_pallas,
                              int8_stages=int8_stages,
                              hpack_pool=hpack_pool,
                              fused_stem=fused_stem,
                              int8_handoff=int8_handoff,
                              remat=remat, dtype=dtype,
                              **cfg.question_params), cfg
    if model_name == "attention":
        from .models import HierarchicalCoAttentionNet
        return HierarchicalCoAttentionNet(
            vocab_size=vocab_size, K=num_classes, mlp_dim=cfg.mlp_dim,
            vgg_trainable=vgg_trainable, s2d_first=s2d_first, remat=remat,
            conv0_pallas=conv0_pallas, int8_stages=int8_stages,
            hpack_pool=hpack_pool, fused_stem=fused_stem,
            int8_handoff=int8_handoff,
            use_pallas=use_pallas, dtype=dtype,
            **cfg.question_params), cfg
    if model_name == "bert":
        from .models.bert import VQABertNet
        max_len = max(64, max_seq_length or 0)
        return VQABertNet(vocab_size=vocab_size, K=num_classes, max_len=max_len,
                          vgg_trainable=vgg_trainable, conv0_pallas=conv0_pallas,
                          int8_stages=int8_stages, hpack_pool=hpack_pool,
                          fused_stem=fused_stem,
                          int8_handoff=int8_handoff,
                          dtype=dtype,
                          **cfg.question_params), cfg
    raise KeyError(model_name)
