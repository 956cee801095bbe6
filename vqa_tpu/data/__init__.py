"""Data layer: dataset indexing, image decode, host->device pipeline.

Lazy re-exports (PEP 562): ``native_mp`` decode workers are *spawned*
processes that import ``vqa_tpu.data.images`` — keeping this package init
lazy means those workers load only numpy/PIL/ctypes, never jax (whose
import would race the axon TPU tunnel in every worker).
"""

from __future__ import annotations

_EXPORTS = {
    "VQASamples": ("dataset", "VQASamples"),
    "DataLoader": ("pipeline", "DataLoader"),
    "make_image_preprocessor": ("pipeline", "make_image_preprocessor"),
}

__all__ = list(_EXPORTS)


def __getattr__(name: str):
    try:
        mod, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f".{mod}", __name__), attr)
