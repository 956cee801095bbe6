"""Baseline VQA model: VGG-11 image tower x GRU question tower -> MLP head.

Functional re-design of the reference's ``VQABaselineNet``
(/root/reference/model.py:10-151) with identical math:

- image: VGG-11-bn features+avgpool+FC -> 4096 -> L2-normalize -> FC-1024 ->
  tanh (model.py:53-54,61-76);
- question: Embedding(300)+tanh -> GRU(1024) last valid hidden ->
  FC-1024 -> tanh (model.py:119-151) — pack_padded_sequence replaced by the
  masked scan in ``layers.GRU`` (no batch sorting needed);
- fusion: element-wise product -> FC-1000 -> Dropout(0.5) -> tanh ->
  FC-K logits (model.py:20-36; dropout *before* tanh, as in the reference).

VGG freezing: the torch reference flags requires_grad=False
(model.py:57-59,100-103); here the train step takes an optimizer mask and a
``stop_vgg_gradient`` switch so the frozen backbone also skips its backward
pass entirely (cheaper than the reference, same result).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Embedding, GRU, Linear
from .vgg import VGG11Encoder

Dtype = Any


class ImageBaselineEncoder(nn.Module):
    """224x224 image -> 1024-d embedding (reference model.py:41-105)."""

    vgg_trainable: bool = False
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
    def __call__(self, x_img, train: bool = False, use_running_stats: bool = True,
                 image_is_features: bool = False):
        # image_is_features: x_img is the frozen conv stack's cached
        # [B, S/32, S/32, 512] map (7x7 at the default 224 input;
        # vqa_tpu.data.feature_cache). The boundary is the conv-stack output
        # — NOT the 4096-d head output — so the head's Dropout(0.5) layers
        # still run in-step with the same module paths (=> identical dropout
        # masks) and cached training is bit-identical to uncached training.
        x = VGG11Encoder(include_head=True, s2d_first=self.s2d_first,
                         conv0_pallas=self.conv0_pallas,
                         int8_stages=self.int8_stages,
                         int8_amax=self.int8_amax,
                         hpack_pool=self.hpack_pool,
                         fused_stem=self.fused_stem,
                         int8_handoff=self.int8_handoff,
                         remat=self.remat, dtype=self.dtype,
                         name="vgg11_encoder")(x_img, train, use_running_stats,
                                               skip_features=image_is_features)
        if not self.vgg_trainable:
            # frozen backbone (reference model.py:57-59): also skip its
            # backward pass entirely — grads would be discarded anyway
            x = jax.lax.stop_gradient(x)
        # L2-normalize the 4096-d vector (model.py:71); fp32 for stability
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        x = (x / jnp.maximum(norm, 1e-12)).astype(self.dtype)
        x = Linear(1024, dtype=self.dtype, name="embedding_fc")(x)
        return jnp.tanh(x)


class QuestionBaselineEncoder(nn.Module):
    """Question ids -> 1024-d embedding via GRU (reference model.py:108-151)."""

    vocab_size: int
    word_emb_dim: int = 300
    hidden_dim: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_ques, ques_len):
        x = Embedding(self.vocab_size, self.word_emb_dim, dtype=self.dtype,
                      name="word_embedding")(x_ques)
        x = jnp.tanh(x)                                       # model.py:119
        h = GRU(self.hidden_dim, dtype=self.dtype, name="gru")(x, ques_len)
        x = Linear(1024, dtype=self.dtype, name="embedding_fc")(h)
        return jnp.tanh(x)


class VQABaselineNet(nn.Module):
    """logits = FC_K(tanh(dropout(FC_1000(img_emb * ques_emb))))."""

    vocab_size: int
    K: int
    word_emb_dim: int = 300
    hidden_dim: int = 1024
    vgg_trainable: bool = False
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
    def __call__(self, x_img, x_ques, x_ques_len, train: bool = False,
                 use_running_stats: bool = True, image_is_features: bool = False):
        img_emb = ImageBaselineEncoder(vgg_trainable=self.vgg_trainable,
                                       s2d_first=self.s2d_first,
                                       conv0_pallas=self.conv0_pallas,
                                       int8_stages=self.int8_stages,
                                       int8_amax=self.int8_amax,
                                       hpack_pool=self.hpack_pool,
                                       fused_stem=self.fused_stem,
                                       int8_handoff=self.int8_handoff,
                                       remat=self.remat,
                                       dtype=self.dtype, name="image_encoder")(
            x_img, train, use_running_stats, image_is_features)
        ques_emb = QuestionBaselineEncoder(
            self.vocab_size, self.word_emb_dim, self.hidden_dim,
            dtype=self.dtype, name="question_encoder")(x_ques, x_ques_len)

        x = img_emb * ques_emb                                # model.py:32
        x = Linear(1000, dtype=self.dtype, name="mlp_fc")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = jnp.tanh(x)
        return Linear(self.K, dtype=self.dtype, name="fc_final")(x)
