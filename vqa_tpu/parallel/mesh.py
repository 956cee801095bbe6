"""Device mesh + batch-parallel sharding over ICI.

The reference is single-GPU (multi-GPU is a commented-out TODO,
/root/reference/main.py:102-106); distributed execution is new capability
here (SURVEY.md §5.8). Design: a 1-D ``data`` mesh; batches are sharded on
their leading axis, the TrainState is replicated, and the jitted train step
compiles under GSPMD — the global-mean loss makes XLA insert the gradient
``psum`` over ICI automatically. No NCCL/MPI translation, no manual
collectives.

The same code path runs single-chip (mesh of 1), on a real TPU slice, or on
the simulated 8-device CPU mesh used by tests and the driver's multi-chip
dry-run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: int | None = None, devices=None,
             model_parallel: int = 1) -> Mesh:
    """Device mesh over the first ``num_devices`` local devices.

    ``model_parallel=1`` (default): the 1-D ``("data",)`` mesh every DP
    surface uses. ``model_parallel=m``: a 2-D ``("data", "model")`` mesh of
    shape ``(num_devices // m, m)`` for tensor-parallel / FSDP placements
    (parallel.sharding). ``P("data")`` batch shardings are valid on both,
    so the DP code path runs unchanged on a 2-D mesh.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    if model_parallel > 1:
        n = len(devices)
        if n % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} must divide the device count {n}")
        grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(grid, (DATA_AXIS, "model"))
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh, split along the leading (batch) axis.

    Requires batch size divisible by the mesh size (the loader's
    ``drop_last`` plus a mesh-multiple batch size guarantee this).

    Multi-host: each process passes its *local* shard (the rows its
    DataLoader produced via ``host_shard``); the global array is assembled
    across processes, so the global batch is ``process_count x`` the local
    batch. Single-host: the batch is simply split across local devices.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (e.g. TrainState) onto every device of the mesh.

    Multi-host: every process must hold identical host values (same init
    seed / same restored checkpoint — both true by construction here).
    """
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree)
