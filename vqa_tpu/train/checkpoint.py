"""Full-TrainState checkpointing with ``model_<step>`` naming.

The reference saves ``torch.save(model.state_dict(), model_<step>.pth)`` —
weights only, so resume restarts the optimizer, step counter, and RNG
(/root/reference/main.py:168-176,260-263; SURVEY.md §5.4). Here a checkpoint
is the complete TrainState (params + batch_stats + opt_state + step + rng)
serialized with flax msgpack, so ``--model_ckpt`` resume is exact.

Interop: ``load_any`` also accepts a reference-format ``.pth`` (weights-only;
converted via ``vqa_tpu.models.convert``), so torch-trained weights can seed
TPU training and parity tests.

Backends: the default ``flax`` backend is a single msgpack file (gathers
sharded arrays to host — exact, simple, single-host). The ``orbax`` backend
(``--ckpt_backend orbax``) writes a ``model_<step>.orbax`` directory via
orbax's async checkpointer: every host writes only its own shards and
restore places arrays DIRECTLY into the template's shardings, so TP/FSDP
states (parallel.sharding) checkpoint without ever materializing the full
tree on one host — the scale path. Both backends restore through the same
``restore_checkpoint``/``load_any``/``load_params_only`` calls (dispatch on
the path), and ``latest`` resolution sees both formats.
"""

from __future__ import annotations

import os

import flax.serialization
import jax

from .state import TrainState

CKPT_PREFIX = "model_"
CKPT_SUFFIX = ".ckpt"
ORBAX_SUFFIX = ".orbax"


def checkpoint_path(log_dir: str, step: int, backend: str = "flax") -> str:
    suffix = ORBAX_SUFFIX if backend == "orbax" else CKPT_SUFFIX
    return os.path.join(log_dir, f"{CKPT_PREFIX}{step}{suffix}")


def _is_orbax(path: str) -> bool:
    return path.endswith(ORBAX_SUFFIX) or os.path.isdir(path)


def _abstract_like(template):
    """ShapeDtypeStruct tree carrying the template's shardings (if placed)."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                       sharding=getattr(a, "sharding", None)),
        template)


def save_checkpoint(state: TrainState, log_dir: str, step: int | None = None,
                    backend: str = "flax") -> str:
    step = int(state.step) if step is None else step
    path = checkpoint_path(log_dir, step, backend)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)  # orbax finalizes atomically
        ckptr.wait_until_finished()
        return path
    data = flax.serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a full TrainState from either backend's checkpoint.

    orbax directories restore each array straight into the template leaf's
    sharding (sharded template => sharded restore, no host gather).
    """
    if _is_orbax(path):
        import orbax.checkpoint as ocp
        return ocp.StandardCheckpointer().restore(
            os.path.abspath(path), _abstract_like(template))
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def load_any(path: str, template: TrainState, model_name: str) -> TrainState:
    """Load either a full .ckpt (exact resume) or a reference .pth (weights only).

    .pth restores params + batch_stats and keeps the fresh optimizer/step —
    the same observable behavior as the reference's weights-only resume.
    """
    if path.endswith(".pth"):
        from ..models.convert import from_torch, load_torch_state_dict

        sd = load_torch_state_dict(path)
        params, batch_stats = from_torch(model_name, sd)
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        batch_stats = jax.tree_util.tree_map(jax.numpy.asarray, batch_stats)
        return template.replace(params=params, batch_stats=batch_stats)
    return restore_checkpoint(path, template)


def latest_checkpoint(log_dir: str) -> str | None:
    """Highest-step model_<step>.{ckpt,orbax} in a run directory, if any."""
    best = None
    best_step = -1
    for name in os.listdir(log_dir):
        for suffix in (CKPT_SUFFIX, ORBAX_SUFFIX):
            if name.startswith(CKPT_PREFIX) and name.endswith(suffix):
                try:
                    step = int(name[len(CKPT_PREFIX):-len(suffix)])
                except ValueError:
                    continue
                if step > best_step:
                    best, best_step = os.path.join(log_dir, name), step
    return best


class AsyncCheckpointer:
    """Background checkpoint writer (flax thread or orbax async).

    flax backend: ``save`` snapshots the state to host memory synchronously
    (the device transfer must be ordered with the training step) and hands
    serialization + disk IO to a worker thread, so the train loop only pays
    the D2H copy. orbax backend: delegates to orbax's own AsyncCheckpointer,
    which copies shards off-device and writes them in the background —
    per-host shard writes, no full-tree gather. One in-flight write at a
    time either way; ``wait`` joins the last write (call before process
    exit).
    """

    def __init__(self, backend: str = "flax"):
        import threading
        self.backend = backend
        self._thread = None
        self._lock = threading.Lock()
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp
            self._orbax = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, state: TrainState, log_dir: str, step: int | None = None) -> None:
        import threading

        import jax

        if self.backend == "orbax":
            import orbax.checkpoint as ocp
            step = int(state.step) if step is None else step
            path = os.path.abspath(checkpoint_path(log_dir, step, "orbax"))
            self.wait()
            self._orbax.save(path, args=ocp.args.StandardSave(state),
                             force=True)
            return

        host_state = jax.device_get(state)
        step = int(host_state.step) if step is None else step
        self.wait()

        def write():
            save_checkpoint(host_state, log_dir, step)

        with self._lock:
            self._thread = threading.Thread(target=write, daemon=True)
            self._thread.start()

    def wait(self) -> None:
        if self._orbax is not None:
            self._orbax.wait_until_finished()
            return
        with self._lock:
            t = self._thread
        if t is not None:
            t.join()


def load_params_only(path: str, model_name: str | None = None):
    """(params, batch_stats) from a .ckpt or reference .pth — no templates.

    Inference paths (serving, test mode) need only weights; restoring through
    a full TrainState template couples them to the *optimizer structure* the
    checkpoint was trained with (frozen-VGG multi_transform vs plain adam).
    msgpack_restore reads the raw field dict instead, so any .ckpt loads
    regardless of its training configuration.
    """
    if path.endswith(".pth"):
        from ..models.convert import from_torch, load_torch_state_dict

        sd = load_torch_state_dict(path)
        return from_torch(model_name, sd)
    if _is_orbax(path):
        import orbax.checkpoint as ocp
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return raw["params"], raw.get("batch_stats") or {}
    import flax.serialization

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    return raw["params"], raw.get("batch_stats", {})
