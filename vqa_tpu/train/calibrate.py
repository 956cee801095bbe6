"""Static int8 activation calibration (--int8_backbone).

The r2 int8 path used a *dynamic per-batch* activation scale (global amax of
each stage input, models/vgg.py): an image's quantized features depended on
its batchmates, eval results on batch packing, and every step paid a global
reduction per quantized conv (a cross-device collective under a DP mesh).

This module replaces that with **calibrated static scales**, the standard
PTQ recipe: one short pass over N training batches records each int8
stage's input amax (a running max, collected through a mutable
``quant_stats`` flax collection), and the resulting per-stage values are
baked into the model as ``int8_amax`` attributes — XLA compile-time
constants. Quantization becomes batch-invariant, the per-step reductions
disappear, and int8 feature caches are exact (the amax values join the
cache boundary tag).

The amax is recorded **per input channel** (a length-C vector per stage):
static scales make per-channel activation quantization free — the channel
scales fold into the conv weights before weight quantization
(models/vgg.py has the derivation). The r3 PTQ eval ladder measured both
schemes within 0.6pp of fp32 on a converged model (BASELINE.md);
per-channel is kept as the numerically tighter free option. Legacy
per-tensor sidecars (scalar amax) still load.

The scales persist as a tiny JSON sidecar (``int8_calib.json``) in the run
log directory, keyed by the stage set and weights fingerprint, so test
mode / serving / resumed runs reuse the training-time calibration instead
of depending on their own input data.

No reference counterpart (/root/reference runs fp32/AMP only); the API is a
TPU-native extension behind ``--int8_backbone`` (auto-on at O1+ on TPU).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

CALIB_FILE = "int8_calib.json"


def image_tower(model_name: str, model, variables):
    """(encoder_module, sub_variables) for the model's frozen conv tower.

    The tower is the subgraph whose int8 stages need calibration — identical
    to the feature-cache boundary encoder (main._make_feature_encoder), so
    the two stay structurally in sync.
    """
    if model_name == "attention":
        from ..models.coattention import ImageCoAttentionEncoder
        enc = ImageCoAttentionEncoder(
            vgg_trainable=False, s2d_first=model.s2d_first,
            conv0_pallas=model.conv0_pallas,
            int8_stages=model.int8_stages, int8_amax=model.int8_amax,
            hpack_pool=model.hpack_pool, fused_stem=model.fused_stem,
            int8_handoff=model.int8_handoff,
            remat=model.remat, dtype=model.dtype)
        sub_params = variables["params"]["image_encoder"]
        sub_stats = variables.get("batch_stats", {}).get("image_encoder", {})
    else:  # baseline / bert share the VGG conv stack (head not needed here)
        from ..models.vgg import VGG11Encoder
        enc = VGG11Encoder(include_head=False, s2d_first=model.s2d_first,
                           conv0_pallas=model.conv0_pallas,
                           int8_stages=model.int8_stages,
                           int8_amax=model.int8_amax,
                           hpack_pool=model.hpack_pool,
                           fused_stem=model.fused_stem,
                           int8_handoff=model.int8_handoff,
                           remat=getattr(model, "remat", False),
                           dtype=model.dtype)
        vgg = variables["params"]["image_encoder"]["vgg11_encoder"]
        sub_params = {"features": vgg["features"]}
        vgg_stats = (variables.get("batch_stats", {})
                     .get("image_encoder", {}).get("vgg11_encoder", {}))
        sub_stats = {"features": vgg_stats["features"]} if vgg_stats else {}
    sub_vars = {"params": sub_params}
    if sub_stats:
        sub_vars["batch_stats"] = sub_stats
    return enc, sub_vars


def collect_amax(enc, sub_vars, image_batches) -> dict[int, "np.ndarray"]:
    """Per-stage per-input-channel amax over preprocessed image batches.

    ``image_batches``: iterable of device-ready float image batches (already
    resized/normalized). Returns {conv_idx: amax[C]} for every int8 stage
    the encoder declares. The encoder itself runs with its current scale mode
    (dynamic during a fresh calibration), and the recording is a running max
    across batches, accumulated in the ``quant_stats`` collection.
    """
    @jax.jit
    def step(qs, x):
        v = dict(sub_vars)
        if qs is not None:
            v["quant_stats"] = qs
        _, upd = enc.apply(v, x, False, True, mutable=["quant_stats"])
        return upd["quant_stats"]

    qs = None
    n = 0
    for x in image_batches:
        qs = step(qs, x)
        n += 1
    if qs is None:
        raise ValueError("int8 calibration: no batches provided")
    flat = jax.tree_util.tree_flatten_with_path(qs)[0]
    out = {}
    for path, leaf in flat:
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        assert name.startswith("amax"), name
        out[int(name[len("amax"):])] = np.asarray(leaf, np.float32)
    return out


def amax_tuple(int8_stages: tuple, amax_by_stage: dict) -> tuple:
    """Order the collected amax values along the model's stage tuple.

    Each entry becomes a per-channel tuple of floats (hashable: model
    attributes are jit-static), matching models/vgg.py's ``int8_amax``
    contract."""
    missing = [s for s in int8_stages if s not in amax_by_stage]
    if missing:
        raise ValueError(f"int8 calibration missed stages {missing} "
                         f"(collected {sorted(amax_by_stage)})")
    return tuple(tuple(float(v) for v in np.ravel(amax_by_stage[s]))
                 for s in int8_stages)


def save_calib(log_dir: str, int8_stages: tuple, int8_amax: tuple) -> str:
    path = os.path.join(log_dir, CALIB_FILE)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"stages": list(int8_stages),
                   "amax": [list(a) if isinstance(a, tuple) else a
                            for a in int8_amax]}, f)
    os.replace(tmp, path)
    return path


def load_calib(log_dir: str, int8_stages: tuple) -> tuple | None:
    """Stored amax tuple for this stage set, or None (absent / stale set)."""
    path = os.path.join(log_dir, CALIB_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    if tuple(data.get("stages", ())) != tuple(int8_stages):
        return None
    return tuple(tuple(float(x) for x in v) if isinstance(v, list)
                 else float(v) for v in data["amax"])


def calibrate_model(model_name: str, model, variables, preprocess,
                    host_batches, log_dir: str | None = None, log=print):
    """Calibrate ``model``'s int8 stages and return the static-scale clone.

    ``host_batches``: iterable of host uint8 image arrays [B, S, S, 3].
    Writes the sidecar when ``log_dir`` is given. No-op (returns ``model``)
    when the model has no int8 stages.
    """
    if not model.int8_stages:
        return model
    enc, sub_vars = image_tower(model_name, model, variables)
    batches = (preprocess(b) for b in host_batches)
    amax = amax_tuple(model.int8_stages,
                      collect_amax(enc, sub_vars, batches))
    log(f"int8 calibration: stages {model.int8_stages} -> per-channel amax "
        f"(max) {tuple(round(max(a), 4) for a in amax)}")
    if log_dir is not None:
        save_calib(log_dir, model.int8_stages, amax)
    return model.clone(int8_amax=amax)
