"""Hierarchical Co-Attention VQA model (HieCoAttn, Lu et al. 2016).

TPU-first re-design of the reference's attention model
(/root/reference/model.py:157-434). Reference quirks reproduced exactly (they
are load-bearing for logit parity — SURVEY.md M7/M8):

1. PhraseConvPool's max-pool groups *adjacent channels of the n-gram
   concatenation* — output channel e = max(cat[3e], cat[3e+1], cat[3e+2]),
   NOT max over {uni[e], bi[e], tri[e]} (model.py:324-332);
2. ParallelCoAttention's bilinear ``W_b`` is created but never applied in
   forward — the affinity is plain ``tanh(Q V^T)`` (model.py:347,377). The
   parameter is kept for checkpoint-shape parity;
3. the question-side softmax has no padding mask: padded positions (whose
   features are exactly zero thanks to padding_idx=0 embeddings and the
   pack/pad zeroing reproduced by ``layers.LSTM``) contribute tanh(bias)
   rows to the softmax (model.py:387-388).

The co-attention block runs as plain XLA — measured at ~2% of the train
step with XLA fusing the whole block (r5 device profile). The experimental
fused Pallas kernel was retired in r5 (PARITY.md M8 criterion) to
``tools/retired/coattention_kernel.py``; ``use_pallas=True`` fails fast
with that pointer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Embedding, LSTM, Linear, uniform_fan_init as _uniform_fan_init
from .vgg import VGG11Encoder

Dtype = Any


def _seq_shard(x, mesh):
    """Sequence-parallel constraint on [B, S, D] image features.

    With a 2-D ("data", "model") mesh (parallel.sharding), pins the spatial
    sequence dim S onto the model axis — the co-attention affinity, its
    softmax over S and the attention pooling then run sequence-parallel,
    with GSPMD inserting the cross-shard reductions. New capability (the
    reference is single-GPU); a no-op when the mesh has no model axis or S
    is not divisible (e.g. tiny test images).
    """
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    mp = mesh.shape.get("model", 1)
    if mp <= 1:
        return x
    if x.shape[1] % mp:
        # CLI runs are guarded at startup (main.py); programmatic users
        # (build_model + act_mesh directly) must not silently lose SP
        import logging
        logging.getLogger(__name__).warning(
            "seq_parallel: S=%d not divisible by model axis %d — replicating "
            "the sequence dim (sequence parallelism is OFF for this shape)",
            x.shape[1], mp)
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "model", None)))


class ImageCoAttentionEncoder(nn.Module):
    """448x448 image -> [B, 196, 512] spatial features (model.py:190-243).

    Spatial order matches the torch flatten of [B,512,14,14] over (H,W):
    location s = h*14 + w — NHWC reshape yields the same order.
    """

    vgg_trainable: bool = False
    s2d_first: bool = False
    conv0_pallas: bool = False
    int8_stages: tuple = ()
    int8_amax: tuple = ()
    hpack_pool: bool = False
    fused_stem: bool = False
    int8_handoff: bool = False
    remat: bool = False
    act_mesh: Any = None  # sequence-parallel mesh (see _seq_shard)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, train: bool = False, use_running_stats: bool = True):
        x = VGG11Encoder(include_head=False, s2d_first=self.s2d_first,
                         conv0_pallas=self.conv0_pallas,
                         int8_stages=self.int8_stages,
                         int8_amax=self.int8_amax,
                         hpack_pool=self.hpack_pool,
                         fused_stem=self.fused_stem,
                         int8_handoff=self.int8_handoff,
                         remat=self.remat, dtype=self.dtype,
                         name="vgg11_encoder")(x_img, train, use_running_stats)
        if not self.vgg_trainable:
            # frozen backbone (model.py:238-241): skip its backward too
            x = jax.lax.stop_gradient(x)
        b, h, w, c = x.shape
        return _seq_shard(x.reshape(b, h * w, c), self.act_mesh)  # [B, S, 512]


class PhraseConvPool(nn.Module):
    """Uni/bi/tri-gram conv1d + tanh, then the quirky channel-group max-pool.

    Convs (model.py:306-308): k=1 no pad; k=2 left-pad 1 (causal); k=3 pad
    (1,1). All length-preserving. Kernels stored [k, C_in, C_out] (NWC/WIO).
    """

    emb_dim: int
    dtype: Dtype = jnp.float32

    def _conv(self, x, kernel_size, padding, name):
        # torch Conv1d default init: U(+-1/sqrt(C_in * k))
        init = _uniform_fan_init(self.emb_dim * kernel_size)
        k = self.param(f"{name}_kernel", init,
                       (kernel_size, self.emb_dim, self.emb_dim))
        b = self.param(f"{name}_bias", init, (self.emb_dim,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1,), padding=[padding],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=self.dtype)
        return jnp.tanh(y + b.astype(self.dtype))

    @nn.compact
    def __call__(self, x):                                    # [B, L, E]
        x_uni = self._conv(x, 1, (0, 0), "conv_unigram")
        x_bi = self._conv(x, 2, (1, 0), "conv_bigram")
        x_tri = self._conv(x, 3, (1, 1), "conv_trigram")
        # concat on channels then regroup adjacent triples (quirk #1):
        cat = jnp.concatenate([x_uni, x_bi, x_tri], axis=-1)  # [B, L, 3E]
        b, l, _ = cat.shape
        grouped = cat.reshape(b, l, self.emb_dim, 3)
        return jnp.max(grouped, axis=-1)                      # [B, L, E]


class QuestionCoAttentionEncoder(nn.Module):
    """Question ids -> (word, phrase, sentence) features, 3x[B, L, 512].

    model.py:246-298: Embedding(padding_idx=0) -> PhraseConvPool ->
    LSTM over the phrase sequence. The reference's pack/pad dance zeroes
    phrase & sentence features beyond each sequence's length; the masked-scan
    LSTM does the sentence side, and we mask the phrase features explicitly.
    """

    vocab_size: int
    word_emb_dim: int = 512
    hidden_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lens):
        seq_len = x.shape[1]
        x_word = Embedding(self.vocab_size, self.word_emb_dim, zero_pad_idx=True,
                           dtype=self.dtype, name="word_embedding")(x)
        x_phrase = PhraseConvPool(self.word_emb_dim, dtype=self.dtype,
                                  name="phrase_conv_pool")(x_word)
        # pack/pad zeroing of phrase features beyond length (model.py:292-294)
        valid = (jnp.arange(seq_len)[None, :] < x_lens[:, None])
        x_phrase = x_phrase * valid[..., None].astype(x_phrase.dtype)
        x_sentence = LSTM(self.hidden_dim, dtype=self.dtype,
                          name="sentence_lstm")(x_phrase, x_lens)
        return x_word, x_phrase, x_sentence


class ParallelCoAttention(nn.Module):
    """Parallel co-attention over the 3 question levels (model.py:337-397).

    Raw parameters (shared across levels), torch-Linear layout transposed to
    [in, out]: ``W_v``/``W_q`` [D, D] + biases, score vectors ``w_v``/``w_q``
    [D, 1] + biases. The reference also creates a bilinear ``W_b`` it never
    applies in forward (quirk #2) — we do not materialize it; the ``.pth``
    converter drops it on import and re-synthesizes it on export.

    ``use_pallas=True`` raises: the fused kernel was retired in r5
    (PARITY.md M8) to tools/retired/. Softmaxes run in fp32.
    """

    hidden_dim: int
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, x_ques_hierarchy):
        # x_img: [B, S, D]; each level: [B, L, D]
        d = self.hidden_dim
        init = _uniform_fan_init(d)
        W_v = self.param("W_v_kernel", init, (d, d))
        b_v = self.param("W_v_bias", init, (d,))
        W_q = self.param("W_q_kernel", init, (d, d))
        b_q = self.param("W_q_bias", init, (d,))
        w_v = self.param("w_v_kernel", init, (d, 1))
        c_v = self.param("w_v_bias", init, (1,))
        w_q = self.param("w_q_kernel", init, (d, 1))
        c_q = self.param("w_q_bias", init, (1,))

        cd = self.dtype
        params = tuple(p.astype(cd) for p in (W_v, b_v, W_q, b_q, w_v, c_v, w_q, c_q))

        if self.use_pallas:
            # retired r5 (PARITY.md M8): XLA fuses the whole block in
            # ~1.7 ms (< 2% of the step, r5 device profile) and beat the
            # kernel at every production shape for three rounds
            raise NotImplementedError(
                "the fused co-attention Pallas kernel was retired in r5 "
                "(PARITY.md M8 criterion); the code lives in "
                "tools/retired/coattention_kernel.py — restore it there if "
                "a 10x S*L workload or an int8 co-attention path appears")
        return coattention_xla(params, x_img, x_ques_hierarchy)


def coattention_xla(params, x_img, x_ques_hierarchy):
    """Plain-XLA co-attention — the numerics oracle for the Pallas kernel."""
    W_v, b_v, W_q, b_q, w_v, c_v, w_q, c_q = params
    V = x_img
    WvV = jnp.einsum("bsd,de->bse", V, W_v) + b_v             # [B, S, D]
    img_feats, ques_feats = [], []
    for Q in x_ques_hierarchy:
        C = jnp.tanh(jnp.einsum("bld,bsd->bls", Q, V))        # [B, L, S]
        WqQ = jnp.einsum("bld,de->ble", Q, W_q) + b_q         # [B, L, D]
        H_v = jnp.tanh(WvV + jnp.einsum("bls,bld->bsd", C, WqQ))
        H_q = jnp.tanh(WqQ + jnp.einsum("bls,bsd->bld", C, WvV))
        s_v = jnp.einsum("bsd,do->bso", H_v, w_v) + c_v       # [B, S, 1]
        s_q = jnp.einsum("bld,do->blo", H_q, w_q) + c_q       # [B, L, 1]
        a_v = jax.nn.softmax(s_v.astype(jnp.float32), axis=1)
        a_q = jax.nn.softmax(s_q.astype(jnp.float32), axis=1)
        v = jnp.sum(a_v.astype(V.dtype) * V, axis=1)          # [B, D]
        q = jnp.sum(a_q.astype(Q.dtype) * Q, axis=1)          # [B, D]
        img_feats.append(v)
        ques_feats.append(q)
    return img_feats, ques_feats


class MLPClassifier(nn.Module):
    """Recursive 3-level fusion head (model.py:400-434)."""

    hidden_dim: int
    mlp_dim: int = 1024
    K: int = 1001
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img_feats, x_ques_feats):
        v_w, v_p, v_s = x_img_feats
        q_w, q_p, q_s = x_ques_feats
        h_w = jnp.tanh(Linear(self.hidden_dim, dtype=self.dtype, name="W_w")(q_w + v_w))
        h_p = jnp.tanh(Linear(self.hidden_dim, dtype=self.dtype, name="W_p")(
            jnp.concatenate([q_p + v_p, h_w], axis=1)))
        h_s = jnp.tanh(Linear(self.mlp_dim, dtype=self.dtype, name="W_s")(
            jnp.concatenate([q_s + v_s, h_p], axis=1)))
        return Linear(self.K, dtype=self.dtype, name="W_h")(h_s)


class HierarchicalCoAttentionNet(nn.Module):
    """Top-level attention model (model.py:157-187)."""

    vocab_size: int
    K: int
    word_emb_dim: int = 512
    hidden_dim: int = 512
    mlp_dim: int = 1024
    vgg_trainable: bool = False
    s2d_first: bool = False
    conv0_pallas: bool = False
    int8_stages: tuple = ()
    int8_amax: tuple = ()
    hpack_pool: bool = False
    fused_stem: bool = False
    int8_handoff: bool = False
    remat: bool = False
    use_pallas: bool = False
    act_mesh: Any = None  # sequence-parallel mesh (see _seq_shard)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, x_ques, x_ques_lens, train: bool = False,
                 use_running_stats: bool = True, image_is_features: bool = False):
        x_word, x_phrase, x_sentence = QuestionCoAttentionEncoder(
            self.vocab_size, self.word_emb_dim, self.hidden_dim,
            dtype=self.dtype, name="question_encoder")(x_ques, x_ques_lens)

        if image_is_features:
            # x_img is the frozen image tower's cached [B, S, D] output
            # (vqa_tpu.data.feature_cache) — skip the VGG entirely
            x_img_features = _seq_shard(
                jax.lax.stop_gradient(x_img.astype(self.dtype)), self.act_mesh)
        else:
            x_img_features = ImageCoAttentionEncoder(
                vgg_trainable=self.vgg_trainable, s2d_first=self.s2d_first,
                conv0_pallas=self.conv0_pallas,
                int8_stages=self.int8_stages,
                int8_amax=self.int8_amax,
                hpack_pool=self.hpack_pool,
                fused_stem=self.fused_stem,
                int8_handoff=self.int8_handoff,
                remat=self.remat, act_mesh=self.act_mesh, dtype=self.dtype,
                name="image_encoder")(x_img, train, use_running_stats)

        x_img_attn, x_ques_attn = ParallelCoAttention(
            self.hidden_dim, use_pallas=self.use_pallas, dtype=self.dtype,
            name="co_attention")(x_img_features, [x_word, x_phrase, x_sentence])

        return MLPClassifier(self.hidden_dim, self.mlp_dim, self.K,
                             dtype=self.dtype, name="mlp_classify")(
            x_img_attn, x_ques_attn)
