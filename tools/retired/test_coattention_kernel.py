"""Fused co-attention kernel vs the XLA oracle (interpret mode on CPU).

The kernel itself runs compiled on TPU; these tests exercise the same kernel
body through the Pallas interpreter so correctness is covered in CI without
hardware. TPU-compiled validation happens in the bench/verify flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqa_tpu.models.coattention import coattention_xla
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from coattention_kernel import coattention_fused  # noqa: E402 (retired, lives beside this file)


@pytest.fixture(scope="module")
def problem():
    B, S, D, L = 8, 196, 512, 11
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    params = tuple(jax.random.normal(ks[i], shp, jnp.float32) * 0.05
                   for i, shp in enumerate(
                       [(D, D), (D,), (D, D), (D,), (D, 1), (1,), (D, 1), (1,)]))
    V = jax.random.normal(ks[8], (B, S, D), jnp.float32)
    Q = [jax.random.normal(ks[9 + i], (B, L, D), jnp.float32) for i in range(3)]
    return params, V, Q


class TestCoAttentionKernel:
    def test_forward_matches_xla(self, problem):
        params, V, Q = problem
        ref_v, ref_q = coattention_xla(params, V, Q)
        out_v, out_q = coattention_fused(params, V, Q)
        for i in range(3):
            np.testing.assert_allclose(out_v[i], ref_v[i], rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(out_q[i], ref_q[i], rtol=1e-5, atol=1e-5)

    def test_grads_match_xla(self, problem):
        """The custom_vjp backward (autodiff through the XLA expression) must
        match differentiating the oracle directly."""
        params, V, Q = problem

        def loss(fn, p, v, q):
            ov, oq = fn(p, v, q)
            return sum(jnp.sum(x ** 2) for x in ov + oq)

        g_pallas = jax.grad(lambda p: loss(coattention_fused, p, V, Q))(params)
        g_xla = jax.grad(lambda p: loss(coattention_xla, p, V, Q))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_pallas),
                        jax.tree_util.tree_leaves(g_xla)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)
        # input grads too
        gv_p = jax.grad(lambda v: loss(coattention_fused, params, v, Q))(V)
        gv_x = jax.grad(lambda v: loss(coattention_xla, params, v, Q))(V)
        np.testing.assert_allclose(gv_p, gv_x, rtol=2e-3, atol=1e-3)

    def test_score_bias_grads_near_zero(self, problem):
        """softmax shift-invariance: the c_v/c_q score biases cancel in the
        attention softmax, so their gradients are zero up to fp32 noise."""
        params, V, Q = problem

        def loss(p):
            ov, oq = coattention_fused(p, V, Q)
            return sum(jnp.sum(x ** 2) for x in ov + oq)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g[5]).max()) < 1e-3  # c_v
        assert float(jnp.abs(g[7]).max()) < 1e-3  # c_q
        g_x = jax.grad(lambda p: sum(jnp.sum(x ** 2) for x in
                                     sum(coattention_xla(p, V, Q), [])))(params)
        assert float(jnp.abs(g_x[5]).max()) < 1e-3
        assert float(jnp.abs(g_x[7]).max()) < 1e-3

    def test_batch_not_multiple_of_block(self, problem):
        params, V, Q = problem
        # B=6: block size falls back to a divisor
        V6, Q6 = V[:6], [q[:6] for q in Q]
        ref_v, _ = coattention_xla(params, V6, Q6)
        out_v, _ = coattention_fused(params, V6, Q6)
        np.testing.assert_allclose(out_v[0], ref_v[0], rtol=1e-5, atol=1e-5)

    def test_inside_model_is_retired(self, problem):
        """use_pallas=True now fails fast with the retirement pointer
        (PARITY.md M8) instead of silently running something else."""
        from vqa_tpu.models import HierarchicalCoAttentionNet

        B, L, Vo, K = 4, 7, 40, 5
        img = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 3))
        ques = jax.random.randint(jax.random.PRNGKey(2), (B, L), 1, Vo)
        lens = jnp.full((B,), L, jnp.int32)

        with pytest.raises(NotImplementedError, match="retired"):
            HierarchicalCoAttentionNet(vocab_size=Vo, K=K, use_pallas=True).init(
                {"params": jax.random.PRNGKey(3)}, img, ques, lens)
