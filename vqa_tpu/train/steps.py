"""Jitted train/eval steps.

The reference's per-step Python loop (forward -> CE loss -> AMP backward ->
Adam, /root/reference/main.py:193-222) becomes a single donated, jitted
function: one XLA program per step, no host round-trips except metric
fetches at log intervals. Loss is softmax cross-entropy with integer labels
== ``nn.CrossEntropyLoss`` (main.py:179,214), computed in fp32.

BatchNorm policy: when the VGG backbone is trainable, train steps run BN in
batch-stats mode and update the running stats (torch ``model.train()``
semantics); when frozen (the default), BN uses running averages — see
``vqa_tpu.models.vgg`` for why this deliberate fix of the reference quirk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy_loss(logits, labels):
    """Mean softmax CE in fp32 (matches torch CrossEntropyLoss reduction)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()


def make_train_step(model, tx, vgg_trainable: bool = False, donate: bool = True,
                    bn_batch_stats: bool | None = None,
                    image_is_features: bool = False,
                    shardings=None, grad_accum: int = 1):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    ``bn_batch_stats``: force BN mode during training. Default (None) follows
    the policy in the module docstring (batch stats iff the VGG is
    trainable); True reproduces the reference's exact behavior where
    ``model.train()`` keeps even the frozen backbone's BN in batch-stats
    mode (main.py:231 + model.py:57-59) — useful for strict training-parity
    experiments.

    ``image_is_features``: ``batch["image"]`` holds cached frozen-tower
    features (vqa_tpu.data.feature_cache), not pixels — the image encoder
    is skipped.

    ``shardings``: optional ``(state_shardings, batch_sharding)`` pair
    (parallel.sharding.state_shardings + parallel.mesh.batch_sharding).
    Pins the TrainState placement through the step — in and out specs match,
    so donation aliases buffers and no step-boundary reshard ever happens
    under TP/FSDP. Default (None) keeps GSPMD inference from the operands,
    which is exact for the replicated-state DP path.

    ``grad_accum``: split the batch into this many microbatches, run the
    forward/backward as a ``lax.scan`` accumulating the mean gradient, then
    apply ONE optimizer update — activation memory scales with the
    microbatch, enabling effective batch sizes far past HBM. Requires
    running-stats BN (the frozen-backbone default; per-microbatch stat
    updates would change semantics) and a batch size divisible by
    ``grad_accum``. Each microbatch draws its own dropout rng, so on models
    with dropout the accumulated step is statistically — not bitwise —
    equivalent to the monolithic one (HieCoAttn has no dropout: exact).
    """
    use_batch_stats_bn = vgg_trainable if bn_batch_stats is None else bn_batch_stats

    def loss_fn(params, batch_stats, batch, dropout_rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = dict(train=True, use_running_stats=not use_batch_stats_bn,
                      rngs={"dropout": dropout_rng},
                      image_is_features=image_is_features)
        if use_batch_stats_bn:
            logits, updates = model.apply(
                variables, batch["image"], batch["question"], batch["ques_len"],
                mutable=["batch_stats"], **kwargs)
            new_stats = updates["batch_stats"]
        else:
            logits = model.apply(variables, batch["image"], batch["question"],
                                 batch["ques_len"], **kwargs)
            new_stats = batch_stats
        loss = cross_entropy_loss(logits, batch["label"])
        return loss, (logits, new_stats)

    if grad_accum > 1 and use_batch_stats_bn:
        raise ValueError("grad_accum requires running-stats BN "
                         "(per-microbatch stat updates change semantics)")

    def train_step(state, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (loss, (logits, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, dropout_rng)
            accuracy = jnp.mean((jnp.argmax(logits, axis=-1)
                                 == batch["label"]).astype(jnp.float32))
        else:
            n = batch["label"].shape[0]
            if n % grad_accum:
                raise ValueError(f"grad_accum={grad_accum} must divide the "
                                 f"batch size {n}")
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, x.shape[0] // grad_accum)
                                    + x.shape[1:]), batch)
            mb_rngs = jax.random.split(dropout_rng, grad_accum)
            new_stats = state.batch_stats  # running-stats mode: unchanged

            def body(carry, xs):
                g_acc, loss_acc, acc_acc = carry
                mb, r = xs
                (mb_loss, (mb_logits, _)), g = grad_fn(
                    state.params, state.batch_stats, mb, r)
                mb_acc = jnp.mean((jnp.argmax(mb_logits, axis=-1)
                                   == mb["label"]).astype(jnp.float32))
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + mb_loss, acc_acc + mb_acc), None

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g_sum, loss_sum, acc_sum), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.float32)), (micro, mb_rngs))
            # equal microbatch sizes: mean of means == global mean
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, g_sum)
            loss = loss_sum / grad_accum
            accuracy = acc_sum / grad_accum
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt_state,
                                  rng=rng)
        return new_state, {"loss": loss, "accuracy": accuracy}

    donate_argnums = (0,) if donate else ()
    if shardings is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)
    state_sh, batch_sh = shardings
    from jax.sharding import NamedSharding, PartitionSpec
    metric_sh = NamedSharding(next(iter(jax.tree_util.tree_leaves(state_sh))).mesh,
                              PartitionSpec())
    return jax.jit(train_step, donate_argnums=donate_argnums,
                   in_shardings=(state_sh, batch_sh),
                   out_shardings=(state_sh, {"loss": metric_sh,
                                             "accuracy": metric_sh}))


def make_eval_step(model, image_is_features: bool = False):
    """Build the jitted eval step: (variables, batch) -> per-batch metrics.

    Mirrors ``compute_validation_metrics``'s inner loop (reference
    main.py:301-335): eval mode (no dropout, BN running stats), argmax
    correctness count + mean CE per batch.
    """

    def eval_step(variables, batch):
        logits = model.apply(variables, batch["image"], batch["question"],
                             batch["ques_len"], train=False, use_running_stats=True,
                             image_is_features=image_is_features)
        pred = jnp.argmax(logits, axis=-1)
        correct = jnp.sum((pred == batch["label"]).astype(jnp.int32))
        loss_per = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), batch["label"])
        # per-sample losses let callers weight out padding rows (test mode
        # pads the final partial batch to a mesh multiple)
        return {"num_correct": correct, "loss": loss_per.mean(),
                "loss_per": loss_per, "pred": pred}

    return jax.jit(eval_step)


def compute_validation_metrics(eval_step, variables, val_iter, prepare_batch,
                               batch_size: int, size: int) -> dict:
    """Accuracy + loss over ``size`` validation samples.

    ``prepare_batch``: host batch -> device batch (preprocess + optional mesh
    sharding), so DP evaluation shards exactly like training.

    Reproduces the reference metric definition exactly (main.py:290-351),
    including its off-by-one: the loop breaks *after* processing batch
    ``n_iters``, so ``n_iters + 1`` batches contribute while totals divide by
    ``n_iters`` (SURVEY.md §3.5 — mirrored for metric parity).
    """
    n_iters = size // batch_size
    loss = 0.0
    num_correct = 0
    for i, batch in enumerate(val_iter):
        m = eval_step(variables, prepare_batch(batch))
        num_correct += int(m["num_correct"])
        loss += float(m["loss"])
        if i >= n_iters:
            break
    total = n_iters * batch_size
    return {"accuracy": 100.0 * num_correct / max(total, 1),
            "loss": loss / max(n_iters, 1)}
