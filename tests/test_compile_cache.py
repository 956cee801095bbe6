"""Persistent compilation cache wiring (vqa_tpu/compile_cache.py).

448² compiles cost 3-25+ min through the TPU tunnel; the cache must land
somewhere that survives reboots and /tmp sweeps, and the env override must
keep working for shared-fleet deployments.
"""

import os

import jax
import pytest

from vqa_tpu.compile_cache import DEFAULT_DIR, setup_compilation_cache


@pytest.fixture
def restore_cache_env():
    prev_env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    prev_cfg = jax.config.jax_compilation_cache_dir
    yield
    if prev_env is None:
        os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    else:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = prev_env
    jax.config.update("jax_compilation_cache_dir", prev_cfg)


def test_default_is_nonvolatile_and_applied(restore_cache_env):
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    path = setup_compilation_cache()
    assert path == DEFAULT_DIR
    assert "/tmp" not in path.split(os.sep)[1:2]  # not rooted in volatile /tmp
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path
    assert os.environ["JAX_COMPILATION_CACHE_DIR"] == path


def test_env_override_wins(restore_cache_env, tmp_path):
    override = str(tmp_path / "warm_cache")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = override
    path = setup_compilation_cache()
    assert path == override
    assert os.path.isdir(override)
    assert jax.config.jax_compilation_cache_dir == override


def test_unwritable_override_does_not_raise(restore_cache_env):
    os.environ["JAX_COMPILATION_CACHE_DIR"] = "/proc/definitely/not/writable"
    path = setup_compilation_cache()  # must not raise at import time
    assert path == "/proc/definitely/not/writable"


def test_entry_points_route_through_helper():
    # every entry point must set the cache up at import/startup
    import inspect

    import __graft_entry__
    import vqa_tpu.main
    import vqa_tpu.serve

    for mod in (vqa_tpu.main, vqa_tpu.serve, __graft_entry__):
        assert "setup_compilation_cache" in inspect.getsource(mod)
    bench_src = open(os.path.join(os.path.dirname(vqa_tpu.main.__file__),
                                  "..", "bench.py")).read()
    assert "setup_compilation_cache" in bench_src
