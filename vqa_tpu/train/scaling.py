"""Dynamic loss scaling for fp16 parity experiments (SURVEY.md §2c N2).

bf16 is the TPU-native mixed-precision policy and needs no scaling (same
exponent range as fp32), so this is NOT on the default path; it exists so
the reference's Apex fp16 semantics (O2/O3 with dynamic loss scale,
/root/reference/main.py:185,219-220) can be reproduced for apples-to-apples
experiments, and as the building block if fp8 ever lands.

Semantics follow Apex/torch.cuda.amp dynamic scaling: multiply the loss by
``scale`` before differentiation, divide the grads by it after; if any grad
is non-finite, skip the optimizer step and halve the scale; after
``growth_interval`` consecutive finite steps, double it. All control flow is
traced (``jnp.where`` on the update pytree), so the step stays a single XLA
program.

Usage::

    scaler = DynamicLossScale.create()
    def loss_fn(params):
        return scaler.scale(loss), aux
    grads = ...
    grads, finite, scaler = scaler.unscale_and_check(grads)
    new_params = scaler.select(finite, optax.apply_updates(params, updates),
                               params)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DynamicLossScale(NamedTuple):
    """Loss-scale state (a pytree: checkpoints with the TrainState)."""

    scale_value: jnp.ndarray     # f32 scalar
    good_steps: jnp.ndarray      # int32 consecutive finite steps
    growth_interval: int = 2000
    growth_factor: float = 2.0
    shrink_factor: float = 0.5
    min_scale: float = 1.0
    max_scale: float = 2.0 ** 24

    @classmethod
    def create(cls, init_scale: float = 2.0 ** 15, **kwargs):
        return cls(jnp.float32(init_scale), jnp.int32(0), **kwargs)

    def scale(self, loss):
        return loss * self.scale_value.astype(loss.dtype)

    def unscale_and_check(self, grads):
        """(grads / scale, all_finite, next_state)."""
        inv = (1.0 / self.scale_value).astype(jnp.float32)
        grads = jax.tree_util.tree_map(
            lambda g: (g.astype(jnp.float32) * inv).astype(g.dtype), grads)
        finite = jnp.array(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite &= jnp.isfinite(g).all()

        grown = self.good_steps + 1 >= self.growth_interval
        next_scale = jnp.where(
            finite,
            jnp.where(grown,
                      jnp.minimum(self.scale_value * self.growth_factor,
                                  self.max_scale),
                      self.scale_value),
            jnp.maximum(self.scale_value * self.shrink_factor, self.min_scale))
        next_good = jnp.where(finite & ~grown, self.good_steps + 1, 0)
        return grads, finite, self._replace(scale_value=next_scale,
                                            good_steps=next_good)

    @staticmethod
    def select(finite, updated_tree, old_tree):
        """Per-leaf ``where``: take the update only when grads were finite."""
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b), updated_tree, old_tree)
