"""2-D (data x model) mesh sharding: tensor parallelism + FSDP over GSPMD.

The reference is single-GPU (multi-GPU is a commented-out TODO,
/root/reference/main.py:102-106); every parallel mode here is new capability
(SURVEY.md SS5.8). ``parallel.mesh`` ships the 1-D data-parallel path; this
module adds the model-parallel dimensions on top, TPU-style: no manual
collectives anywhere — parameters get ``PartitionSpec`` placements and the
jitted train step compiles under GSPMD, which inserts the all-gathers /
reduce-scatters / psums over ICI.

Three composable modes on a ``("data", "model")`` mesh:

- **DP** (always): the batch is sharded over ``data`` (parallel.mesh).
- **TP** (``tp=True``): trainable-head weights are Megatron-paired —
  column-parallel producers feed row-parallel consumers so the contraction
  psum is the only collective on the pair (co-attention ``W_q``/``W_v``
  [D,D] column -> ``w_q``/``w_v`` [D,1] row; classifier ``W_s`` column ->
  ``W_h`` row); embedding + phrase convs shard their output/feature dim.
- **FSDP** (``fsdp=True``): every param (and its Adam ``mu``/``nu``, which
  mirror the param tree inside the optax state) is additionally sharded over
  ``data`` on its first still-unsharded divisible axis — ZeRO-3 style; GSPMD
  all-gathers weights for compute and reduce-scatters gradients.

The frozen VGG tower is deliberately **replicated**: it holds no optimizer
state (``optax.set_to_zero``), and the fused Pallas conv kernels
(ops/conv_stage1.py, conv_hpack.py, conv_stem.py) declare batch-partitioned
GSPMD rules that expect replicated weight operands. At ~9M conv params the
replication cost is ~18 MB bf16 per device — noise next to the activation
maps.

Axis names are load-bearing: ``parallel.mesh.batch_sharding`` specs
``P("data")``, which is valid on both the 1-D and 2-D meshes, so the whole
existing DP surface (main.py, bench.py, tests) runs unchanged on a 2-D mesh.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"

# (path regex, spec template) — first match wins; searched against the
# "/"-joined path of the leaf inside the TrainState pytree, so optimizer
# ``mu``/``nu`` leaves (whose paths embed the param path) inherit the same
# placement as their parameter. Templates name mesh axes per tensor dim;
# a dim whose size is not divisible by its axis size falls back to None
# (replicated on that dim) — never an error.
_TP_RULES: tuple[tuple[str, tuple[str | None, ...]], ...] = (
    # frozen backbone: replicated (see module docstring)
    (r"vgg11_encoder", ()),
    # question tower: embedding + phrase convs shard the feature dim
    (r"word_embedding/embedding$", (None, MODEL_AXIS)),
    (r"phrase_conv_pool/conv_\w+_kernel$", (None, None, MODEL_AXIS)),
    (r"phrase_conv_pool/conv_\w+_bias$", (MODEL_AXIS,)),
    # LSTM: column-parallel gate blocks; the scan carry resharding this
    # induces is GSPMD-inserted and correct (parity-tested), if not free
    (r"sentence_lstm/w_[ih]h$", (None, MODEL_AXIS)),
    (r"sentence_lstm/b_[ih]h$", (MODEL_AXIS,)),
    # co-attention: Megatron pair — W_* column-parallel, w_* row-parallel
    (r"co_attention/W_[qv]_kernel$", (None, MODEL_AXIS)),
    (r"co_attention/W_[qv]_bias$", (MODEL_AXIS,)),
    (r"co_attention/w_[qv]_kernel$", (MODEL_AXIS, None)),
    (r"co_attention/w_[qv]_bias$", ()),
    # classifier: W_w/W_p column-parallel into the W_s column / W_h row pair
    (r"mlp_classify/W_[wp]/kernel$", (None, MODEL_AXIS)),
    (r"mlp_classify/W_[wp]/bias$", (MODEL_AXIS,)),
    (r"mlp_classify/W_s/kernel$", (None, MODEL_AXIS)),
    (r"mlp_classify/W_s/bias$", (MODEL_AXIS,)),
    (r"mlp_classify/W_h/kernel$", (MODEL_AXIS, None)),
    (r"mlp_classify/W_h/bias$", ()),
    # baseline family: embedding_fc column-parallel -> mlp_fc/fc_final row
    (r"(image_encoder|question_encoder)/embedding_fc/kernel$", (None, MODEL_AXIS)),
    (r"(image_encoder|question_encoder)/embedding_fc/bias$", (MODEL_AXIS,)),
    (r"question_encoder/gru/w_[ih]h$", (None, MODEL_AXIS)),
    (r"question_encoder/gru/b_[ih]h$", (MODEL_AXIS,)),
    (r"mlp_fc/kernel$", (MODEL_AXIS, None)),
    (r"mlp_fc/bias$", ()),
    (r"fc_final/kernel$", (MODEL_AXIS, None)),
    (r"fc_final/bias$", ()),
    # bert question tower: head-parallel attention, Megatron MLP pair
    (r"attention/(query|key|value)/kernel$", (None, MODEL_AXIS, None)),
    (r"attention/(query|key|value)/bias$", (MODEL_AXIS, None)),
    (r"attention/out/kernel$", (MODEL_AXIS, None, None)),
    (r"attention/out/bias$", ()),
    (r"mlp_in/kernel$", (None, MODEL_AXIS)),
    (r"mlp_in/bias$", (MODEL_AXIS,)),
    (r"mlp_out/kernel$", (MODEL_AXIS, None)),
    (r"mlp_out/bias$", ()),
    (r"(token_embedding/embedding|position_embedding)$", (None, MODEL_AXIS)),
)


def _axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape.get(axis, 1)


def _path_str(path) -> str:
    parts = []
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            name = getattr(k, "name", None)
        if name is None:
            idx = getattr(k, "idx", None)
            name = str(idx) if idx is not None else str(k)
        parts.append(str(name))
    return "/".join(parts)


def param_spec(path: str, shape: tuple[int, ...], mesh: Mesh,
               tp: bool = True, fsdp: bool = True) -> P:
    """PartitionSpec for one leaf: TP rule first, then FSDP fill-in.

    ``path`` is the "/"-joined pytree path; ``shape`` the leaf shape.
    Scalars and leaves matching no rule replicate (then FSDP may still
    shard dim 0). Divisibility is checked per dim — a non-divisible dim
    silently stays replicated, so odd vocab/class sizes never error.
    """
    if not shape:
        return P()
    dims: list[str | None] = [None] * len(shape)
    if tp and _axis_size(mesh, MODEL_AXIS) > 1:
        for pat, template in _TP_RULES:
            if re.search(pat, path):
                for i, ax in enumerate(template[:len(shape)]):
                    if ax is not None and shape[i] % _axis_size(mesh, ax) == 0:
                        dims[i] = ax
                break
    if fsdp and _axis_size(mesh, DATA_AXIS) > 1 and "vgg11_encoder" not in path:
        for i, d in enumerate(shape):
            if dims[i] is None and d % _axis_size(mesh, DATA_AXIS) == 0 and d > 1:
                dims[i] = DATA_AXIS
                break
    while dims and dims[-1] is None:
        dims.pop()
    return P(*dims)


def state_shardings(state, mesh: Mesh, tp: bool = True, fsdp: bool = True):
    """NamedSharding pytree matching ``state`` (TrainState or any pytree).

    Works on concrete arrays or ``jax.eval_shape`` results — only ``.shape``
    is read. Optax ``MaskedNode`` / ``EmptyState`` flatten to no leaves, so
    the frozen-VGG ``set_to_zero`` branch contributes nothing here.
    """
    def _leaf(path, x):
        shape = tuple(getattr(x, "shape", ()) or ())
        return NamedSharding(mesh, param_spec(_path_str(path), shape, mesh,
                                              tp=tp, fsdp=fsdp))
    return jax.tree_util.tree_map_with_path(_leaf, state)


def shard_state_to_mesh(state, mesh: Mesh, tp: bool = True, fsdp: bool = True,
                        shardings=None):
    """Place a TrainState on a 2-D mesh under the TP/FSDP rules.

    The model-parallel analogue of ``parallel.mesh.replicate_to_mesh``; on a
    mesh without a real ``model`` axis and with ``fsdp=False`` it degrades to
    exact replication. Multi-host: every process holds the identical full
    value (same init seed / restored checkpoint), so ``global_shape`` is the
    host array's own shape — each process then contributes just its
    addressable shards (without it, jax would infer a concatenated global
    shape and build a wrong-shaped array for process-spanning specs).

    ``shardings``: optional precomputed ``state_shardings(...)`` tree, so a
    caller that also pins the step's in/out shardings walks the tree once.
    """
    if shardings is None:
        shardings = state_shardings(state, mesh, tp=tp, fsdp=fsdp)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, state, shardings)
    import numpy as np

    def _place(x, s):
        h = np.asarray(x)
        return jax.make_array_from_process_local_data(s, h, global_shape=h.shape)
    return jax.tree_util.tree_map(_place, state, shardings)
