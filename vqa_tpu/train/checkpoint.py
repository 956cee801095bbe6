"""Full-TrainState checkpointing with ``model_<step>`` naming.

The reference saves ``torch.save(model.state_dict(), model_<step>.pth)`` —
weights only, so resume restarts the optimizer, step counter, and RNG
(/root/reference/main.py:168-176,260-263; SURVEY.md §5.4). Here a checkpoint
is the complete TrainState (params + batch_stats + opt_state + step + rng)
serialized with flax msgpack, so ``--model_ckpt`` resume is exact.

Interop: ``load_any`` also accepts a reference-format ``.pth`` (weights-only;
converted via ``vqa_tpu.models.convert``), so torch-trained weights can seed
TPU training and parity tests.
"""

from __future__ import annotations

import os

import flax.serialization
import jax

from .state import TrainState

CKPT_PREFIX = "model_"
CKPT_SUFFIX = ".ckpt"


def checkpoint_path(log_dir: str, step: int) -> str:
    return os.path.join(log_dir, f"{CKPT_PREFIX}{step}{CKPT_SUFFIX}")


def save_checkpoint(state: TrainState, log_dir: str, step: int | None = None) -> str:
    step = int(state.step) if step is None else step
    path = checkpoint_path(log_dir, step)
    data = flax.serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash
    return path


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a full TrainState from a .ckpt written by save_checkpoint."""
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
    """Highest-step model_<step>.ckpt in a run directory, if any."""
    best = None
    best_step = -1
    for name in os.listdir(log_dir):
        if name.startswith(CKPT_PREFIX) and name.endswith(CKPT_SUFFIX):
            try:
                step = int(name[len(CKPT_PREFIX):-len(CKPT_SUFFIX)])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(log_dir, name), step
    return best


class AsyncCheckpointer:
    """Background-thread checkpoint writer.

    ``save`` snapshots the state to host memory synchronously (the device
    transfer must be ordered with the training step) and hands serialization
    + disk IO to a worker thread, so the train loop only pays the D2H copy.
    One in-flight write at a time; ``wait`` joins the last write (call before
    process exit).
    """

    def __init__(self):
        import threading
        self._thread = None
        self._lock = threading.Lock()

    def save(self, state: TrainState, log_dir: str, step: int | None = None) -> None:
        import threading

        import jax

        host_state = jax.device_get(state)
        step = int(host_state.step) if step is None else step
        self.wait()

        def write():
            save_checkpoint(host_state, log_dir, step)

        with self._lock:
            self._thread = threading.Thread(target=write, daemon=True)
            self._thread.start()

    def wait(self) -> None:
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
    import flax.serialization

    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    return raw["params"], raw.get("batch_stats", {})
