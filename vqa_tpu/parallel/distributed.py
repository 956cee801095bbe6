"""Multi-host initialization + per-host data sharding helpers.

The reference has no distributed story at all (SURVEY.md §5.8). Multi-host
TPU slices need (a) ``jax.distributed.initialize`` before first device use
and (b) each host feeding a disjoint data shard; the DataLoader's
``shard_index/num_shards`` hooks consume :func:`host_shard`.
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Initialize multi-host JAX when launched across hosts.

    No-op on a single process with no coordinator configured (the TPU-pod
    environment variables JAX respects are picked up automatically when
    arguments are omitted).
    """
    import os

    # explicit coordinator envs only: infra like the axon tunnel sets
    # TPU_WORKER_HOSTNAMES on single-host setups, so it must not trigger init
    cluster_envs = ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                    "COORDINATOR_ADDRESS")
    if (coordinator_address is None and num_processes is None
            and not any(os.environ.get(e) for e in cluster_envs)):
        return  # single-host: nothing to initialize
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        # backend already initialized (e.g. library use after device calls):
        # proceed single-process rather than crashing the entry point
        print(f"WARNING: jax.distributed.initialize skipped: {e}")


def host_shard() -> tuple[int, int]:
    """(shard_index, num_shards) for this host's data pipeline."""
    return jax.process_index(), jax.process_count()
