"""Test config: force JAX onto a simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the standard JAX substitute is
the host-platform device-count flag, which gives pjit/shard_map tests 8 real
XLA CPU devices (SURVEY.md §4.4). Must run before the first jax import.
"""

import os

# force-set (the machine presets JAX_PLATFORMS=axon for the TPU tunnel;
# tests must run on the simulated CPU mesh regardless)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# pytest plugins (jaxtyping) import jax before this conftest runs, and jax
# snapshots JAX_PLATFORMS at import — override via config as well (the backend
# itself is not initialized until first use, so this still takes effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The suite is compile-dominated on this 1-core host (VGG/model jits are
# re-traced per test); the persistent compilation cache makes repeat runs
# compile-free. Keyed by HLO hash — stale entries are impossible by design.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VQA_JAX_CACHE", "/tmp/vqa_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
