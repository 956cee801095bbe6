"""Persistent XLA compilation cache shared by every vqa_tpu entry point.

New-shape 448² train-step compiles take 3-25+ minutes through the axon
tunnel, and the cache previously defaulted to ``/tmp`` — which was wiped
mid-round at least once and is empty after every reboot, so each session
paid the full compile again (this nearly cost rounds 3 AND 4 their bench
artifacts: a pre-first-window compile overran the driver's timeout before
any output was printed). Every entry point (``vqa_tpu.main``,
``vqa_tpu.serve``, ``bench.py``, ``__graft_entry__``) now routes through
:func:`setup_compilation_cache`, which defaults the cache to a
non-volatile per-user directory. ``JAX_COMPILATION_CACHE_DIR`` still
overrides, so shared-fleet deployments can point it at a warm NFS cache.

The reference has no equivalent concern (torch eager pays no compile), so
this is tpu-native operational surface, not a parity item.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "vqa_tpu",
                           "jax_cache")


def setup_compilation_cache() -> str:
    """Point JAX's persistent compilation cache at a non-volatile dir.

    Idempotent; safe before or after ``import jax`` (the config API wins
    over the env var either way). Returns the directory in use.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return path  # unwritable override: leave jax's own handling to it
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: through the tunnel a "1 s" local compile
    # can be minutes remote, and cache writes here are cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
