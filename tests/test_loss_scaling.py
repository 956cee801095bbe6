"""Dynamic loss scaling (train/scaling.py): Apex-style fp16 semantics."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vqa_tpu.train.scaling import DynamicLossScale


def test_scale_roundtrip_is_exact():
    s = DynamicLossScale.create(init_scale=1024.0)
    grads = {"w": jnp.array([1.5, -2.0]), "b": jnp.array(0.25)}

    def loss_fn(g):
        return s.scale(g["w"].sum() + g["b"])

    scaled_grads = jax.grad(loss_fn)(grads)
    unscaled, finite, s2 = s.unscale_and_check(scaled_grads)
    assert bool(finite)
    np.testing.assert_array_equal(np.asarray(unscaled["w"]), [1024.0 / 1024.0] * 2)
    assert float(s2.scale_value) == 1024.0  # unchanged before growth_interval


def test_nonfinite_halves_scale_and_skips_update():
    s = DynamicLossScale.create(init_scale=8.0)
    grads = {"w": jnp.array([jnp.inf, 1.0])}
    _, finite, s2 = s.unscale_and_check(grads)
    assert not bool(finite)
    assert float(s2.scale_value) == 4.0
    assert int(s2.good_steps) == 0

    params = {"w": jnp.array([1.0, 1.0])}
    updated = {"w": jnp.array([0.0, 0.0])}
    out = DynamicLossScale.select(finite, updated, params)
    np.testing.assert_array_equal(np.asarray(out["w"]), [1.0, 1.0])


def test_growth_after_interval():
    s = DynamicLossScale.create(init_scale=2.0, growth_interval=3)
    grads = {"w": jnp.ones(2)}
    for _ in range(2):
        _, _, s = s.unscale_and_check(grads)
        assert float(s.scale_value) == 2.0
    _, _, s = s.unscale_and_check(grads)  # third finite step -> grow
    assert float(s.scale_value) == 4.0
    assert int(s.good_steps) == 0


def test_min_max_clamps():
    s = DynamicLossScale.create(init_scale=1.0, min_scale=1.0)
    _, _, s2 = s.unscale_and_check({"w": jnp.array([jnp.nan])})
    assert float(s2.scale_value) == 1.0  # clamped at min
    s = DynamicLossScale.create(init_scale=2.0 ** 24, growth_interval=1)
    _, _, s2 = s.unscale_and_check({"w": jnp.ones(1)})
    assert float(s2.scale_value) == 2.0 ** 24  # clamped at max


def test_fp16_training_step_end_to_end():
    """An fp16 toy model trains through scale -> grad -> unscale -> select,
    and an injected overflow skips exactly that step."""
    params = {"w": jnp.zeros((4,), jnp.float32)}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 4)), jnp.float16)
    y = jnp.asarray((np.asarray(x).sum(1) > 0).astype(np.int32))
    tx = optax.sgd(0.1)
    opt_state = tx.init(params)
    scaler = DynamicLossScale.create(init_scale=64.0)

    @jax.jit
    def step(params, opt_state, scaler, x, y):
        def loss_fn(p):
            logits = (x * p["w"].astype(jnp.float16)).sum(-1)
            loss = optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), y).mean()
            return scaler.scale(loss)

        grads = jax.grad(loss_fn)(params)
        grads, finite, scaler = scaler.unscale_and_check(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = DynamicLossScale.select(
            finite, optax.apply_updates(params, updates), params)
        new_opt = DynamicLossScale.select(finite, new_opt, opt_state)
        return new_params, new_opt, scaler, finite

    for _ in range(5):
        params, opt_state, scaler, finite = step(params, opt_state, scaler, x, y)
        assert bool(finite)
    w_before = np.asarray(params["w"]).copy()
    # inject an overflow via an extreme input: fp16 max ~65504
    x_bad = x.at[0, 0].set(jnp.float16(60000.0) * 2)
    params, opt_state, scaler, finite = step(params, opt_state, scaler, x_bad, y)
    assert not bool(finite)
    np.testing.assert_array_equal(np.asarray(params["w"]), w_before)
    assert float(scaler.scale_value) == 32.0
