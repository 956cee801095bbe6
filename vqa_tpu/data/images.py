"""Host-side image decode for the input pipeline.

The reference decodes + resizes + normalizes per-sample in DataLoader worker
processes on the host (/root/reference/dataloader.py:48-51, main.py:126-127).
TPU-first split of that work:

- host (this module): JPEG/PNG decode to uint8 RGB, optionally using libjpeg
  "draft" scaled decode (decode directly at 1/2, 1/4, 1/8 scale — much cheaper
  than full decode + resize) and a PIL resize to the fixed host-side shape;
- device (pipeline.make_image_preprocessor): uint8 -> float conversion, final
  resize and ImageNet mean/std normalization, fused by XLA and overlapped with
  the train step via the prefetch queue.

Missing image files can optionally fall back to a deterministic synthetic
image (hash-seeded), so smoke tests and benchmarks run without the COCO
archive present.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

try:
    from PIL import Image
    HAVE_PIL = True
except ImportError:  # pragma: no cover - PIL is in the base image
    HAVE_PIL = False


def synthetic_image(name: str, size: int) -> np.ndarray:
    """Deterministic pseudo-image for a filename (tests/bench without COCO)."""
    seed = int.from_bytes(hashlib.sha1(name.encode()).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def decode_image(path: str, host_size: int, synthetic_fallback: bool = False) -> np.ndarray:
    """Decode one image to uint8 RGB [host_size, host_size, 3].

    Uses PIL ``draft`` mode so libjpeg decodes at a reduced scale when the
    target is much smaller than the source (the host-side hot loop of the
    reference's pipeline, done ~2-8x cheaper here).
    """
    if not os.path.exists(path):
        if synthetic_fallback:
            return synthetic_image(os.path.basename(path), host_size)
        raise FileNotFoundError(path)
    if not HAVE_PIL:
        raise RuntimeError("PIL unavailable and image decode requested")
    with Image.open(path) as im:
        im.draft("RGB", (host_size, host_size))
        im = im.convert("RGB")
        if im.size != (host_size, host_size):
            im = im.resize((host_size, host_size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


_MP_POOL = None       # lazy fork pool for backend='native_mp'
_MP_POOL_SIZE = 0


def _mp_decode_chunk(args):
    """Process-pool worker: decode a path chunk with the native decoder
    (single in-process thread; parallelism comes from the pool)."""
    paths, host_size, synthetic_fallback = args
    return decode_batch(paths, host_size, synthetic_fallback=synthetic_fallback,
                        backend="auto", native_threads=1)


def decode_batch(paths: list[str], host_size: int, pool=None,
                 synthetic_fallback: bool = False,
                 backend: str = "auto", native_threads: int = 8) -> np.ndarray:
    """Decode a batch of images to uint8 [N, S, S, 3].

    ``backend``: 'native' (C++ thread-pool decoder, vqa_tpu.native), 'pil',
    'native_mp' (a fork process pool of single-threaded native decoders —
    the torch-DataLoader-style worker model, kept for the thread-vs-process
    A/B; threads won on the measured host, BASELINE.md r3), or 'auto'
    (native when built + all paths are .jpg, else PIL). Failed native
    decodes fall back per-image to PIL/synthetic.
    """
    if backend == "native_mp":
        global _MP_POOL, _MP_POOL_SIZE
        import multiprocessing as mp
        n = max(native_threads, 1)
        if _MP_POOL is None or _MP_POOL_SIZE != n:
            if _MP_POOL is not None:
                _MP_POOL.terminate()
            _MP_POOL = mp.get_context("fork").Pool(n)
            _MP_POOL_SIZE = n
        chunk = -(-len(paths) // n)
        chunks = [(paths[i:i + chunk], host_size, synthetic_fallback)
                  for i in range(0, len(paths), chunk)]
        return np.concatenate(_MP_POOL.map(_mp_decode_chunk, chunks))
    if backend in ("auto", "native"):
        from ..native import decode_batch_native, native_available

        use_native = native_available() and all(
            p.lower().endswith((".jpg", ".jpeg")) for p in paths)
        if backend == "native" and not use_native:
            raise RuntimeError("native decoder unavailable or non-JPEG inputs")
        if use_native:
            out, ok = decode_batch_native(paths, host_size, threads=native_threads)
            for i in np.nonzero(~ok)[0]:
                out[i] = decode_image(paths[i], host_size, synthetic_fallback)
            return out
    if pool is None:
        imgs = [decode_image(p, host_size, synthetic_fallback) for p in paths]
    else:
        imgs = list(pool.map(lambda p: decode_image(p, host_size, synthetic_fallback), paths))
    return np.stack(imgs)
