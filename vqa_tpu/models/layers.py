"""Shared flax building blocks with PyTorch-parity numerics.

The reference leans on cuDNN RNNs + ``pack_padded_sequence`` to handle padded
batches (/root/reference/model.py:141-146, 287-296). TPU-first replacement:
recurrences are ``jax.lax.scan`` over time with *length masking* — the input
projection for all timesteps is one large MXU matmul hoisted out of the scan,
and the carry is frozen once ``t >= length``. This reproduces PackedSequence's
"last valid hidden state" / "zero-padded outputs" semantics exactly, with no
batch sorting (the reference's ``sort_batch``, utils.py:33-45, is unnecessary
here and intentionally absent).

Gate conventions and initializers match torch so converted ``.pth`` weights
are bit-compatible:
- GRU gates ordered (r, z, n), new-gate bias applied *inside* the reset gate
  product (torch ``nn.GRU`` semantics);
- LSTM gates ordered (i, f, g, o);
- RNN weights ~ U(-1/sqrt(H), 1/sqrt(H)); Linear kernel/bias
  ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch defaults);
- Embedding ~ N(0, 1) (torch default).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    Works for both kernels ([fan_in, fan_out]) and biases when wrapped by
    :func:`torch_bias_init`.
    """
    fan_in = shape[0]
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fan_init(fan_in: int):
    """U(+-1/sqrt(fan_in)) — torch's default for Linear biases, RNN weights,
    and Conv kernels/biases (with fan_in = C_in * kernel_size)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# aliases with the semantic names used at call sites
torch_bias_init = uniform_fan_init
rnn_uniform_init = uniform_fan_init


class Linear(nn.Module):
    """Dense layer with torch-default init (kernel stored [in, out])."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class Embedding(nn.Module):
    """Token embedding, torch-default N(0,1) init.

    ``zero_pad_idx``: emulate torch ``padding_idx=0`` (reference model.py:263)
    by masking id-0 rows to zero on lookup — same forward values, and the
    row receives no gradient because the output never depends on it.
    """

    vocab_size: int
    features: int
    zero_pad_idx: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.vocab_size, self.features))
        out = jnp.take(table, ids, axis=0).astype(self.dtype)
        if self.zero_pad_idx:
            out = out * (ids != 0)[..., None].astype(self.dtype)
        return out


class GRU(nn.Module):
    """Single-layer GRU returning the last *valid* hidden state per sequence.

    Torch ``nn.GRU`` parity (reference model.py:122,144-146): weights
    ``w_ih [E, 3H]``, ``w_hh [H, 3H]`` with gate columns ordered (r, z, n),
    separate ``b_ih``/``b_hh``, and
    ``n = tanh(x W_in + b_in + r * (h W_hn + b_hn))``.

    The input projection runs as one [B*L, E] x [E, 3H] MXU matmul before the
    scan; only the [B, H] x [H, 3H] hidden projection is sequential.
    """

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        # x: [B, L, E]; lengths: [B] -> h_last: [B, H]
        b, seq_len, emb = x.shape
        h = self.hidden_dim
        init = rnn_uniform_init(h)
        w_ih = self.param("w_ih", init, (emb, 3 * h))
        w_hh = self.param("w_hh", init, (h, 3 * h))
        b_ih = self.param("b_ih", init, (3 * h,))
        b_hh = self.param("b_hh", init, (3 * h,))

        cd = self.dtype
        x_proj = (jnp.einsum("ble,eh->blh", x.astype(cd), w_ih.astype(cd))
                  + b_ih.astype(cd))                          # [B, L, 3H]

        def step(h_prev, inputs):
            xp, t = inputs                                    # xp: [B, 3H]
            hp = jnp.dot(h_prev, w_hh.astype(cd), preferred_element_type=cd)
            hp = hp + b_hh.astype(cd)
            x_r, x_z, x_n = jnp.split(xp, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(x_r + h_r)
            z = jax.nn.sigmoid(x_z + h_z)
            n = jnp.tanh(x_n + r * h_n)
            h_new = (1.0 - z) * n + z * h_prev
            # freeze carry at padded steps -> carry ends as last valid hidden
            valid = (t < lengths)[:, None].astype(cd)
            h_next = valid * h_new + (1.0 - valid) * h_prev
            return h_next, None

        h0 = jnp.zeros((b, h), cd)
        ts = jnp.arange(seq_len)
        h_last, _ = jax.lax.scan(step, h0, (jnp.swapaxes(x_proj, 0, 1), ts))
        return h_last


class LSTM(nn.Module):
    """Single-layer LSTM returning the padded output sequence.

    Torch ``nn.LSTM`` parity (reference model.py:269,287-296): gate columns
    ordered (i, f, g, o). Matches ``pack_padded_sequence`` -> lstm ->
    ``pad_packed_sequence``: outputs at t >= length are exactly zero, and the
    carry freezes at padded steps.
    """

    hidden_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        # x: [B, L, E]; lengths: [B] -> outputs: [B, L, H]
        b, seq_len, emb = x.shape
        h = self.hidden_dim
        init = rnn_uniform_init(h)
        w_ih = self.param("w_ih", init, (emb, 4 * h))
        w_hh = self.param("w_hh", init, (h, 4 * h))
        b_ih = self.param("b_ih", init, (4 * h,))
        b_hh = self.param("b_hh", init, (4 * h,))

        cd = self.dtype
        x_proj = (jnp.einsum("ble,eh->blh", x.astype(cd), w_ih.astype(cd))
                  + b_ih.astype(cd))                          # [B, L, 4H]

        def step(carry, inputs):
            h_prev, c_prev = carry
            xp, t = inputs
            hp = jnp.dot(h_prev, w_hh.astype(cd), preferred_element_type=cd)
            gates = xp + hp + b_hh.astype(cd)
            g_i, g_f, g_g, g_o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(g_i)
            f = jax.nn.sigmoid(g_f)
            g = jnp.tanh(g_g)
            o = jax.nn.sigmoid(g_o)
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            valid = (t < lengths)[:, None].astype(cd)
            h_next = valid * h_new + (1.0 - valid) * h_prev
            c_next = valid * c_new + (1.0 - valid) * c_prev
            out = valid * h_new                               # pad_packed zeros
            return (h_next, c_next), out

        h0 = jnp.zeros((b, h), cd)
        c0 = jnp.zeros((b, h), cd)
        ts = jnp.arange(seq_len)
        _, outs = jax.lax.scan(step, (h0, c0), (jnp.swapaxes(x_proj, 0, 1), ts))
        return jnp.swapaxes(outs, 0, 1)                       # [B, L, H]
