"""Frozen-backbone image-feature cache: compute the VGG tower once per image.

With ``--vgg_train false`` (the reference's published config and this
framework's default), the image tower is a *constant function* of each image,
yet the reference recomputes its ~30 GFLOPs/image forward on every one of the
~50 epochs x N steps (/root/reference/model.py:229-243 + main.py:193-211).
The original HieCoAttn workflow — and every production system with a frozen
encoder — extracts features once and trains the small head against them.

``--cache_features true`` enables exactly that, TPU-style:

- a one-off build pass streams every *unique* image through host decode ->
  device preprocess -> the frozen image tower (bf16 on TPU) and writes the
  features into a disk-backed memory map (``features.bin`` + ``meta.json``);
- training batches then gather feature rows (a host memmap fancy-index) and
  ship ~200 KB/image-equivalents instead of running 30 GFLOPs of conv — the
  per-step device work drops to the co-attention block + RNNs + head;
- the cache key fingerprints the VGG parameters, BN statistics, image size
  and dtype, so a stale cache (different weights/resolution/precision) is
  rebuilt automatically, never silently reused.

Feature boundaries (must be *frozen, deterministic* subgraphs — the build
refuses anything behind batch-stats BN or a trainable VGG):

- attention: ``ImageCoAttentionEncoder`` output ``[196, 512]``
  (reference model.py:205-218);
- baseline / bert: the conv-stack output ``[S/32, S/32, 512]`` (7x7 at the
  default 224) — NOT the 4096-d head: the FC head contains Dropout(0.5)
  layers that are live during training (reference ``model.train()``
  semantics), so the head stays in the step, with unchanged module paths.

Values are bit-identical to the uncached path — including train-mode
dropout masks, because every dropout module keeps its path and therefore
its folded rng (asserted by tests/test_feature_cache.py).
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np

_META = "meta.json"
_BIN = "features.bin"


def variables_fingerprint(variables) -> str:
    """Stable digest of a variable pytree (params + stats), order-insensitive.

    Leaves are hashed as (path, shape, dtype, raw bytes) so any weight edit,
    BN-stat update, or structural change invalidates dependent caches.
    """
    h = hashlib.blake2b(digest_size=16)
    flat = sorted(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        key=lambda kv: jax.tree_util.keystr(kv[0]))
    for path, leaf in flat:
        arr = np.asarray(leaf)
        h.update(jax.tree_util.keystr(path).encode())
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


class FeatureCache:
    """Read view over a built cache: name -> feature row (zero-copy memmap)."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, _META)) as f:
            self.meta = json.load(f)
        names = self.meta["names"]
        self.row_of = {n: i for i, n in enumerate(names)}
        import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)
        dtype = np.dtype(self.meta["dtype"])
        self.features = np.memmap(
            os.path.join(cache_dir, _BIN), dtype=dtype, mode="r",
            shape=tuple([len(names)] + self.meta["feature_shape"]))

    def rows(self, names: list[str]) -> np.ndarray:
        """Gather feature rows for a batch of image names."""
        idx = np.fromiter((self.row_of[n] for n in names), np.int64,
                          count=len(names))
        return self.features[idx]  # fancy-index: already a fresh ndarray

    @property
    def feature_shape(self) -> tuple:
        return tuple(self.meta["feature_shape"])


def cache_key(fingerprint: str, image_size: int, dtype, boundary: str,
              names_digest: str, pipeline_tag: str) -> str:
    """Cache-directory key: everything that changes the stored values.

    ``names_digest`` separates datasets (train/val must never share a dir);
    ``pipeline_tag`` captures input-path knobs (host decode size, synthetic
    fallback, decode backend) that alter the pixels fed to the encoder.
    """
    h = hashlib.blake2b(digest_size=8)
    h.update(f"{fingerprint}|{image_size}|{np.dtype(dtype)}|{boundary}"
             f"|{names_digest}|{pipeline_tag}".encode())
    return h.hexdigest()


def build_or_open(cache_root: str, samples, encode_fn, *, fingerprint: str,
                  image_size: int, dtype, boundary: str, batch_size: int,
                  host_size: int, num_workers: int = 4,
                  synthetic_images: bool = False,
                  decode_backend: str = "auto", log=print) -> FeatureCache:
    """Open a valid cache for (samples x encoder), building it if needed.

    ``encode_fn``: host uint8 [B, S, S, 3] -> device features [B, ...]
    (decode -> preprocess -> frozen tower, jitted by the caller).
    """
    from concurrent.futures import ThreadPoolExecutor

    from .images import decode_batch

    names = sorted(set(samples.image_names))
    if not names:
        raise ValueError("feature cache: dataset has no images to cache")
    nh = hashlib.blake2b(digest_size=8)
    nh.update("\n".join(names).encode())
    pipeline_tag = f"h{host_size}|syn{int(synthetic_images)}|{decode_backend}"
    cache_dir = os.path.join(
        cache_root, cache_key(fingerprint, image_size, dtype, boundary,
                              nh.hexdigest(), pipeline_tag))
    meta_path = os.path.join(cache_dir, _META)
    if os.path.exists(meta_path):
        cache = FeatureCache(cache_dir)
        if cache.meta["fingerprint"] == fingerprint \
                and cache.meta["names"] == names:
            log(f"feature cache: reusing {cache_dir} "
                f"({len(names)} images, {cache.meta['dtype']})")
            return cache
        # unreachable short of a digest collision or hand-edited files —
        # treat as corruption and rebuild
        log("feature cache: integrity mismatch at keyed dir — rebuilding")

    os.makedirs(cache_dir, exist_ok=True)
    # GC tmp orphans from builds killed mid-way (multi-GB files otherwise
    # accumulate forever). Age-gated so a *live* concurrent builder's tmp is
    # never unlinked out from under its memmap (that would fail its final
    # os.replace): anything older than a day is a corpse.
    import glob
    import time
    for stale in glob.glob(os.path.join(cache_dir, "*.tmp.*")):
        try:
            if time.time() - os.path.getmtime(stale) > 86400:
                os.remove(stale)
        except OSError:
            pass
    img_dir = samples.img_dir
    pool = ThreadPoolExecutor(num_workers) if num_workers > 0 else None
    np_dtype = np.dtype(dtype)  # handles ml_dtypes bf16 for np.memmap

    # pid-unique tmp so concurrent builders (e.g. multiple hosts on a shared
    # filesystem) can never interleave writes into one file
    tmp_bin = os.path.join(cache_dir, f"{_BIN}.tmp.{os.getpid()}")
    mm = None
    n = len(names)
    for start in range(0, n, batch_size):
        batch_names = names[start:start + batch_size]
        # pad the tail to a full batch: one encode compilation total
        paths = [os.path.join(img_dir, b) for b in batch_names]
        paths += [paths[-1]] * (batch_size - len(paths))
        images = decode_batch(paths, host_size, pool=pool,
                              synthetic_fallback=synthetic_images,
                              backend=decode_backend,
                              native_threads=max(num_workers, 1))
        feats = np.asarray(encode_fn(images)).astype(np_dtype, copy=False)
        if mm is None:
            mm = np.memmap(tmp_bin, dtype=np_dtype, mode="w+",
                           shape=tuple([n] + list(feats.shape[1:])))
        mm[start:start + len(batch_names)] = feats[:len(batch_names)]
        if start // batch_size % 50 == 0:
            log(f"feature cache: {min(start + batch_size, n)}/{n} images")
    feat_shape = list(mm.shape[1:])
    mm.flush()
    del mm
    if pool is not None:
        pool.shutdown()

    # atomic publish: bin first, then meta (meta's presence marks validity)
    os.replace(tmp_bin, os.path.join(cache_dir, _BIN))
    tmp_meta = f"{meta_path}.tmp.{os.getpid()}"
    with open(tmp_meta, "w") as f:
        json.dump({"names": names, "feature_shape": feat_shape,
                   "dtype": np_dtype.name,
                   "fingerprint": fingerprint, "boundary": boundary,
                   "image_size": image_size}, f)
    os.replace(tmp_meta, meta_path)
    log(f"feature cache: built {cache_dir} ({n} images, "
        f"{os.path.getsize(os.path.join(cache_dir, _BIN)) / 1e6:.1f} MB)")
    return FeatureCache(cache_dir)
