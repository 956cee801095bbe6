"""Input pipeline: host decode workers + device-side preprocess + prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=...)``
(/root/reference/main.py:129-130,146-147) with a TPU-native design:

- a background thread assembles batches: gathers pre-tokenized question
  arrays (``VQASamples``) and decodes images via a thread pool
  (libjpeg releases the GIL, so threads scale without process overhead);
- batches are pushed onto a bounded queue as uint8 + int32 host arrays;
- the consumer transfers uint8 to device and runs a jitted
  resize+normalize, overlapping H2D + preprocess with the train step
  (the north-star "fused on-device image pipeline");
- ``shuffle`` / ``drop_last`` / deterministic seeding match the reference
  loader's observable behavior; sharding hooks support per-host slicing
  for multi-host data parallelism.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import VQASamples
from .images import decode_batch

IMAGENET_MEAN = (0.485, 0.456, 0.406)  # reference main.py:126-127
IMAGENET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("image_size", "compute_dtype"))
def preprocess_images(raw_uint8, image_size: int, compute_dtype=jnp.float32):
    """uint8 [B,H,W,3] -> normalized float [B,image_size,image_size,3] on device.

    Equivalent of the reference's host-side ToTensor+Resize+Normalize
    (main.py:126-127) as one XLA-fused device computation.
    """
    x = raw_uint8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (image_size, image_size):
        x = jax.image.resize(x, (b, image_size, image_size, c), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(compute_dtype)


def make_image_preprocessor(image_size: int, compute_dtype=jnp.float32):
    """Bind static args of :func:`preprocess_images`."""
    def fn(raw_uint8):
        return preprocess_images(raw_uint8, image_size=image_size, compute_dtype=compute_dtype)
    return fn


class DataLoader:
    """Shuffling, prefetching batch loader over :class:`VQASamples`.

    Yields dicts ``{image: uint8 [B,S,S,3], question: int32 [B,L],
    ques_len: int32 [B], label: int32 [B]}`` as host numpy arrays; device
    transfer + final preprocess happen in the training driver so the loader
    stays device-agnostic (and shardable).
    """

    def __init__(self, samples: VQASamples, batch_size: int, *, host_size: int,
                 shuffle: bool = True, drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, synthetic_images: bool = False, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1,
                 decode_backend: str = "auto", feature_cache=None):
        self.samples = samples
        # frozen-tower feature mode: batches carry cached feature rows
        # (vqa_tpu.data.feature_cache.FeatureCache) instead of decoded pixels
        self.feature_cache = feature_cache
        if feature_cache is not None:
            self._feature_rows = np.fromiter(
                (feature_cache.row_of[n] for n in samples.image_names),
                np.int64, count=len(samples.image_names))
        self.batch_size = batch_size
        self.host_size = host_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.synthetic_images = synthetic_images
        self.prefetch = max(1, prefetch)
        self.shard_index = shard_index
        self.num_shards = num_shards
        if (decode_backend == "auto" and feature_cache is None
                and not synthetic_images and num_workers > 1):
            # real-data loaders resolve 'auto' to the process-pool decoder:
            # it beat both thread-pool engines consistently in the r3
            # measurements (BASELINE.md "decode engine scale-out" — the
            # torch-DataLoader worker model, one single-threaded native
            # decoder per process). One-shot decode_batch callers (serving)
            # keep the lighter in-process thread pool.
            from ..native import native_available
            if native_available():
                decode_backend = "native_mp"
        self.decode_backend = decode_backend
        self.num_workers = num_workers
        self._epoch = 0
        self._skip_batches = 0
        # feature mode gathers memmap rows, and the native_mp backend owns
        # its own subprocess pool — neither needs a decode thread pool
        self._pool = ThreadPoolExecutor(num_workers) \
            if (num_workers > 0 and feature_cache is None
                and self.decode_backend != "native_mp") else None

    def __len__(self) -> int:
        n = len(self.samples) // self.num_shards
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int, skip_batches: int = 0) -> None:
        """Position the shuffle sequence at ``epoch`` (resume support).

        The per-epoch order is a pure function of ``(seed, epoch)``
        (``_epoch_order``), so a resumed run that sets the epoch derived
        from the restored step (``step // steps_per_epoch``) sees the same
        epoch orders an uninterrupted run would — instead of silently
        replaying epoch 0.

        ``skip_batches`` restores the intra-epoch position: the NEXT
        iteration (only) fast-forwards past the first ``skip_batches``
        batches of the deterministic epoch order — the batches the
        interrupted run already trained on (``step % steps_per_epoch``) —
        making a mid-epoch resume bit-exact instead of silently replaying
        the epoch prefix. Subsequent epochs iterate in full. The skip is a
        cheap index slice: skipped images are never decoded.
        """
        self._epoch = int(epoch)
        self._skip_batches = int(skip_batches)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.samples))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(order)
        # per-host shard: truncate to a multiple of num_shards first so every
        # host sees a disjoint subset of *exactly* equal size — unequal shards
        # would desynchronize the per-host step counts (a grad-psum hang in
        # multi-host DP)
        n_even = (len(order) // self.num_shards) * self.num_shards
        return order[:n_even][self.shard_index::self.num_shards]

    def _make_batch(self, idx: np.ndarray) -> dict:
        if self.feature_cache is not None:
            # memmap fancy-index materializes a fresh in-memory ndarray
            images = self.feature_cache.features[self._feature_rows[idx]]
        else:
            paths = [self.samples.image_path(i) for i in idx]
            images = decode_batch(paths, self.host_size, pool=self._pool,
                                  synthetic_fallback=self.synthetic_images,
                                  backend=self.decode_backend,
                                  native_threads=max(self.num_workers, 1))
        return {
            "image": images,
            "question": self.samples.questions[idx],
            "ques_len": self.samples.ques_len[idx],
            "label": self.samples.labels[idx],
        }

    def __iter__(self):
        order = self._epoch_order()
        self._epoch += 1
        bs = self.batch_size
        n_full = len(order) // bs
        starts = [i * bs for i in range(n_full)]
        if not self.drop_last and n_full * bs < len(order):
            starts.append(n_full * bs)
        if self._skip_batches:
            # one-shot mid-epoch fast-forward (set_epoch's skip_batches):
            # drop the batches the interrupted run already consumed; the
            # following epochs iterate in full
            starts = starts[self._skip_batches:]
            self._skip_batches = 0

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that gives up when the consumer is gone, so an
            # abandoned iterator never leaves this thread blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for s in starts:
                    if not put_or_stop(self._make_batch(order[s:s + bs])):
                        return
            except BaseException as e:  # propagate to the consumer, don't
                put_or_stop(e)          # masquerade as a clean end-of-epoch
                return
            put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def device_prefetch(batch_iter, prepare_batch, depth: int = 2):
    """Overlap H2D transfer + device preprocess with compute.

    Eagerly maps ``prepare_batch`` (host batch -> device batch; e.g.
    ``_device_batch`` in the training driver) over the iterator ``depth``
    batches ahead. JAX dispatch is asynchronous, so the transfers and the
    jitted preprocess of batch N+1 execute while the train step for batch N
    is still running — the jit-mesh analog of ``prefetch_to_device``.

    Each in-flight batch stays resident on device, so ``depth`` trades HBM
    for overlap; ``depth <= 1`` degrades to a plain unprefetched map.
    """
    it = iter(batch_iter)
    if depth <= 1:
        for batch in it:
            yield prepare_batch(batch)
        return

    queue_ = deque()

    def fill():
        while len(queue_) < depth:
            try:
                queue_.append(prepare_batch(next(it)))
            except StopIteration:
                return

    fill()
    while queue_:
        out = queue_.popleft()
        fill()
        yield out
