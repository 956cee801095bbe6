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


_MP_POOL = None       # lazy subprocess pool for backend='native_mp'
_MP_POOL_SIZE = 0


class _SubprocPool:
    """Persistent decode-worker subprocesses (see data/_decode_worker.py).

    Replaces a ``multiprocessing`` pool on purpose: fork inherits the
    parent's (jax/axon) locks mid-flight and can deadlock; spawn/forkserver
    re-execute the parent's ``__main__`` per worker. Plain subprocesses
    running a known entrypoint have neither failure mode.
    """

    _CMD = "from vqa_tpu.data._decode_worker import serve; serve()"

    def __init__(self, n: int):
        import subprocess
        import sys

        self.procs = [
            subprocess.Popen([sys.executable, "-c", self._CMD],
                             stdin=subprocess.PIPE, stdout=subprocess.PIPE)
            for _ in range(n)
        ]

    def decode(self, chunks, host_size: int, synth: bool) -> np.ndarray:
        # write all (small) requests first, then read the (large) replies:
        # workers fully read a request before replying, so this cannot
        # pipe-deadlock (see the protocol note in _decode_worker.py)
        sent = []
        for proc, paths in zip(self.procs, chunks):
            req = b"REQ %d %d %d\n" % (len(paths), host_size, int(synth))
            req += b"".join(p.encode() + b"\n" for p in paths)
            proc.stdin.write(req)
            proc.stdin.flush()
            sent.append(proc)
        outs = []
        for proc in sent:
            hdr = proc.stdout.readline()
            if hdr.startswith(b"OK"):
                _, n_imgs, size = hdr.split()
                n_imgs, size = int(n_imgs), int(size)
                buf = proc.stdout.read(n_imgs * size * size * 3)
                outs.append(np.frombuffer(buf, np.uint8)
                            .reshape(n_imgs, size, size, 3))
            elif hdr.startswith(b"ERR"):
                msg = proc.stdout.read(int(hdr.split()[1])).decode()
                raise RuntimeError(f"decode worker error: {msg}")
            else:
                raise RuntimeError("decode worker died (empty reply)")
        return np.concatenate(outs)

    def terminate(self) -> None:
        for proc in self.procs:
            try:
                proc.stdin.close()
                proc.terminate()
            except Exception:
                pass


def decode_batch(paths: list[str], host_size: int, pool=None,
                 synthetic_fallback: bool = False,
                 backend: str = "auto", native_threads: int = 8) -> np.ndarray:
    """Decode a batch of images to uint8 [N, S, S, 3].

    ``backend``: 'native' (C++ thread-pool decoder, vqa_tpu.native), 'pil',
    'native_mp' (a spawned process pool of single-threaded native decoders —
    the torch-DataLoader-style worker model; won the thread-vs-process A/B
    on the measured bursty-quota host, BASELINE.md r3), or 'auto'
    (native when built + all paths are .jpg, else PIL). Failed native
    decodes fall back per-image to PIL/synthetic.
    """
    if backend == "native_mp":
        global _MP_POOL, _MP_POOL_SIZE
        n = max(native_threads, 1)
        if _MP_POOL is None or _MP_POOL_SIZE != n:
            if _MP_POOL is not None:
                _MP_POOL.terminate()
            _MP_POOL = _SubprocPool(n)
            _MP_POOL_SIZE = n
        chunk = -(-len(paths) // n)
        chunks = [paths[i:i + chunk] for i in range(0, len(paths), chunk)]
        try:
            return _MP_POOL.decode(chunks, host_size, synthetic_fallback)
        except Exception:
            # a dead/poisoned pool is not reusable: drop it so the next
            # call restarts fresh workers, then surface the error
            _MP_POOL.terminate()
            _MP_POOL = None
            raise
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
