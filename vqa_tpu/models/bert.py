"""BERT-style transformer question encoder + VQA fusion net.

The reference CLI accepts ``--model bert`` but its registry omits it, so it
KeyErrors (reference main.py:41,403-416; README "TO-DO", README.md:137).
This module completes that declared capability (SURVEY.md §7.8): a
transformer question tower swapped in for the GRU, fused with the VGG image
embedding exactly like the baseline.

Architecture (BERT-base conventions at configurable scale): learned token +
position embeddings -> N post-LN encoder blocks (MHA + GELU FFN) with a
padding mask from ``ques_len`` -> masked mean pooling -> FC-1024 + tanh.
Attention runs as batched MXU matmuls (flax MultiHeadDotProductAttention);
padded positions are masked out of both attention and pooling, so results
are invariant to pad content.

Pretrained HF ``bert-base-uncased`` weights can be grafted with
``bert_from_hf_state_dict`` when a local weights file is available (this
environment has no network egress, so random init is the default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .baseline import ImageBaselineEncoder
from .layers import Embedding, Linear

Dtype = Any


class TransformerBlock(nn.Module):
    hidden_dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # post-LN (BERT): sublayer -> residual add -> LayerNorm
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attention")(
            x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_attn")(x + attn)
        h = nn.Dense(self.hidden_dim * self.mlp_ratio, dtype=self.dtype,
                     name="mlp_in")(x)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mlp_out")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln_mlp")(x + h)


class BertQuestionEncoder(nn.Module):
    """Question ids -> 1024-d embedding via a transformer encoder."""

    vocab_size: int
    hidden_dim: int = 768
    num_layers: int = 6
    num_heads: int = 12
    max_len: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_ques, ques_len):
        b, seq_len = x_ques.shape
        if seq_len > self.max_len:
            raise ValueError(
                f"question length {seq_len} exceeds the position table "
                f"(max_len={self.max_len}); build the model with a larger "
                f"max_len (e.g. the vocab's max_seq_length)")
        pos = jnp.arange(seq_len)
        tok = Embedding(self.vocab_size, self.hidden_dim, zero_pad_idx=True,
                        dtype=self.dtype, name="token_embedding")(x_ques)
        pos_table = self.param("position_embedding",
                               nn.initializers.normal(0.02),
                               (self.max_len, self.hidden_dim))
        h = tok + pos_table[pos].astype(self.dtype)[None]
        h = nn.LayerNorm(dtype=self.dtype, name="ln_emb")(h)

        valid = pos[None, :] < ques_len[:, None]              # [B, L]
        # attention mask [B, 1, Lq, Lk]: queries may attend only to valid keys
        attn_mask = valid[:, None, None, :]
        for i in range(self.num_layers):
            h = TransformerBlock(self.hidden_dim, self.num_heads,
                                 dtype=self.dtype, name=f"block{i}")(h, attn_mask)

        # masked mean pooling over valid positions
        vmask = valid[..., None].astype(h.dtype)
        pooled = (h * vmask).sum(axis=1) / jnp.maximum(
            vmask.sum(axis=1), 1).astype(h.dtype)
        out = Linear(1024, dtype=self.dtype, name="embedding_fc")(pooled)
        return jnp.tanh(out)


class VQABertNet(nn.Module):
    """VGG image tower x BERT question tower -> baseline-style fusion head."""

    vocab_size: int
    K: int
    hidden_dim: int = 768
    num_layers: int = 6
    num_heads: int = 12
    max_len: int = 64
    vgg_trainable: bool = False
    s2d_first: bool = False
    conv0_pallas: bool = False
    int8_stages: tuple = ()
    int8_amax: tuple = ()
    hpack_pool: bool = False
    fused_stem: bool = False
    int8_handoff: bool = False
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
                                       dtype=self.dtype, name="image_encoder")(
            x_img, train, use_running_stats, image_is_features)
        ques_emb = BertQuestionEncoder(
            self.vocab_size, self.hidden_dim, self.num_layers, self.num_heads,
            max_len=self.max_len, dtype=self.dtype,
            name="question_encoder")(x_ques, x_ques_len)

        x = img_emb * ques_emb
        x = Linear(1000, dtype=self.dtype, name="mlp_fc")(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = jnp.tanh(x)
        return Linear(self.K, dtype=self.dtype, name="fc_final")(x)


def bert_from_hf_state_dict(sd: dict, num_layers: int, vocab_map=None,
                            num_heads: int = 12):
    """Graft HuggingFace ``bert-base-uncased`` weights onto BertQuestionEncoder.

    ``sd``: {name: np.ndarray} from a local HF checkpoint (torch format).
    ``vocab_map``: optional [our_vocab_size] -> HF-id array to re-index the
    token embedding through the framework's own vocabulary. ``num_heads``
    must match the target module's head count (the HF state_dict stores QKV
    as fused [D, D] matrices and does not record it). Returns a params
    subtree for the ``question_encoder`` scope (embedding_fc left at init).
    """
    import numpy as np

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
                "bias": sd[f"{prefix}.bias"].copy()}

    p: dict = {}
    tok = sd["bert.embeddings.word_embeddings.weight"]
    if vocab_map is not None:
        tok = tok[vocab_map]
    p["token_embedding"] = {"embedding": tok.copy()}
    p["position_embedding"] = sd["bert.embeddings.position_embeddings.weight"].copy()
    p["ln_emb"] = {"scale": sd["bert.embeddings.LayerNorm.weight"].copy(),
                   "bias": sd["bert.embeddings.LayerNorm.bias"].copy()}

    for i in range(num_layers):
        hf = f"bert.encoder.layer.{i}"
        hidden = sd[f"{hf}.attention.self.query.weight"].shape[0]
        heads = num_heads
        if hidden % heads:
            raise ValueError(f"hidden dim {hidden} not divisible by "
                             f"num_heads={heads}")
        head_dim = hidden // heads

        def qkv(name):
            w = sd[f"{hf}.attention.self.{name}.weight"].T  # [D, D]
            b = sd[f"{hf}.attention.self.{name}.bias"]
            return {"kernel": w.reshape(hidden, heads, head_dim).copy(),
                    "bias": b.reshape(heads, head_dim).copy()}

        out_w = sd[f"{hf}.attention.output.dense.weight"].T  # [D, D]
        p[f"block{i}"] = {
            "attention": {
                "query": qkv("query"), "key": qkv("key"), "value": qkv("value"),
                "out": {"kernel": out_w.reshape(heads, head_dim, hidden).copy(),
                        "bias": sd[f"{hf}.attention.output.dense.bias"].copy()},
            },
            "ln_attn": {"scale": sd[f"{hf}.attention.output.LayerNorm.weight"].copy(),
                        "bias": sd[f"{hf}.attention.output.LayerNorm.bias"].copy()},
            "mlp_in": lin(f"{hf}.intermediate.dense"),
            "mlp_out": lin(f"{hf}.output.dense"),
            "ln_mlp": {"scale": sd[f"{hf}.output.LayerNorm.weight"].copy(),
                       "bias": sd[f"{hf}.output.LayerNorm.bias"].copy()},
        }
    return p
