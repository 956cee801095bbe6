"""TrainState pytree + optimizer construction.

The reference trains with ``torch.optim.Adam(model.parameters(), lr)``
(/root/reference/main.py:180) and checkpoints *weights only* — losing
optimizer/step state on resume (main.py:168-176; SURVEY.md §5.3-5.4). Here
the full training state is one pytree (params, batch_stats, opt_state, step,
rng) so checkpoints resume exactly, and the whole state threads through the
jitted train step with donation.

Frozen-VGG handling: parameters under ``*/vgg11_encoder`` get
``optax.set_to_zero`` updates via ``optax.multi_transform`` (the torch
``requires_grad=False`` equivalent), and the model itself stop-gradients the
backbone output so the backward pass never touches VGG.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def _vgg_label_tree(params, frozen: bool):
    """Label pytree: 'frozen' under any vgg11_encoder subtree, else 'train'."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {k: ("frozen" if frozen and "vgg11_encoder" in k else "train")
              for k in flat}
    return flax.traverse_util.unflatten_dict(labels)


def make_optimizer(learning_rate: float, params, vgg_trainable: bool):
    """Adam with torch-default hyperparams; zero updates for frozen VGG."""
    adam = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if vgg_trainable:
        return adam
    return optax.multi_transform(
        {"train": adam, "frozen": optax.set_to_zero()},
        _vgg_label_tree(params, frozen=True))


def create_train_state(model, rng, sample_batch, learning_rate: float,
                       vgg_trainable: bool = False,
                       pretrained_vgg: tuple | None = None) -> TrainState:
    """Initialize params (+ optional pretrained VGG graft) and optimizer.

    ``pretrained_vgg``: (params, batch_stats) for the VGG11Encoder subtree,
    e.g. from ``convert.vgg11_encoder_from_torchvision`` — the reference's
    ``--vgg_wts_path`` (main.py:395-398).
    """
    init_rng, state_rng = jax.random.split(rng)
    # jitted init: one compiled program instead of eager per-op dispatch
    # (eager init of the VGG stack costs minutes on CPU)
    init_fn = jax.jit(model.init)
    variables = init_fn({"params": init_rng}, sample_batch["image"],
                        sample_batch["question"], sample_batch["ques_len"])
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if pretrained_vgg is not None:
        vgg_params, vgg_stats = pretrained_vgg
        params = _graft_vgg(params, vgg_params)
        batch_stats = _graft_vgg(batch_stats, vgg_stats)

    tx = make_optimizer(learning_rate, params, vgg_trainable)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )


def _graft_vgg(tree, vgg_subtree):
    """Replace the ``image_encoder/vgg11_encoder`` subtree with loaded weights.

    Only keys present in the model are grafted (the co-attention encoder has
    no classifier head, so torchvision head weights are skipped for it).
    """
    import numpy as np

    flat = flax.traverse_util.flatten_dict(tree)
    vgg_flat = flax.traverse_util.flatten_dict(vgg_subtree)
    for k, v in vgg_flat.items():
        full = ("image_encoder", "vgg11_encoder") + k
        if full in flat:
            expect = flat[full].shape
            if tuple(np.shape(v)) != tuple(expect):
                raise ValueError(f"vgg weight {full} shape {np.shape(v)} != {expect}")
            flat[full] = jax.numpy.asarray(v)
    return flax.traverse_util.unflatten_dict(flat)
