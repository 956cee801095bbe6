"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use: the shared library compiles with g++ -O3 against the
system libjpeg(-turbo) the first time it's requested and is cached next to
the source. Falls back cleanly (returns None) when a toolchain or libjpeg is
unavailable — callers then use the PIL path.
"""

from .jpeg import decode_batch_native, native_available

__all__ = ["decode_batch_native", "native_available"]
