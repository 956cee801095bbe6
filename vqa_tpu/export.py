"""AOT serving artifacts: serialized StableHLO export of the compiled
serving function (``jax.export``).

The reference framework has no deployment story at all (inference is
``NotImplementedError``, /root/reference/main.py:286-287); vqa_tpu's
:mod:`vqa_tpu.serve` engine closes that gap in-process, and this module
closes it **across** processes: the entire serving computation — device
image preprocess (uint8 -> normalized float), model forward at the active
precision policy (bf16 / int8-PTQ with the resolved static calibration
scales), softmax — is exported as ONE StableHLO module with the trained
weights baked in as constants, serialized to a single self-contained
artifact directory:

    <out_dir>/serving_fn.jaxexport   # jax.export.Exported.serialize() bytes
    <out_dir>/manifest.json          # shapes + vocab fingerprint contract

A server deserializes and calls it with NO model code, checkpoint
plumbing, or calibration logic (:class:`ExportedPredictor`): the artifact
pins the exact numerics that were exported, and XLA recompiles the
StableHLO natively for whatever backend loads it. This is the
TPU-idiomatic deployment path — StableHLO is XLA's stable interchange
dialect, so the artifact survives framework-version drift on the serving
fleet (jax guarantees ~6 months of backward compatibility for serialized
artifacts, longer for pure-StableHLO modules with no custom calls).

By default the artifact is lowered for the platform doing the exporting;
pass ``platforms=("cpu", "tpu")`` (CLI ``--platforms cpu,tpu``) for a
multi-platform artifact — note the TPU Pallas kernels (fused stem, hpack
conv) lower to Mosaic custom calls that only exist on the TPU lowering
path, so multi-platform export of an int8-TPU predictor requires the
XLA-fallback kernel set (the CPU configs use it automatically).

CLI:
    python -m vqa_tpu.export --model attention --vocab_file vocab.pkl \
        --model_ckpt run/model_3744.ckpt --out run/export/
    python -m vqa_tpu.serve --from_export run/export/ --vocab_file \
        vocab.pkl --input val.txt --img_dir imgs/
"""

from __future__ import annotations

import hashlib
import json
import os

import jax

# honor an explicitly-set JAX_PLATFORMS before first device use (the axon
# sitecustomize clobbers the env var's platform choice; same contract
# restoration as serve.py / main.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from .serve import VQAPredictor, _ServingEngine
from .vocab import Vocab

ARTIFACT = "serving_fn.jaxexport"
MANIFEST = "manifest.json"
FORMAT = "vqa_tpu.export.v1"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def export_predictor(predictor: VQAPredictor, out_dir: str, *,
                     platforms: tuple[str, ...] | None = None,
                     vocab_path: str | None = None) -> dict:
    """Export ``predictor``'s serving function + weights to ``out_dir``.

    Returns the manifest dict. The exported callable's signature is
    ``(image_u8 [B,S,S,3], question [B,L] i32, ques_len [B] i32) ->
    probs [B,K] f32`` at the predictor's compiled batch shape.
    """
    if getattr(predictor, "_needs_calib", False):
        raise ValueError(
            "int8 activation scales are unresolved; export would bake "
            "uncalibrated numerics. Pass calib_file= (or put an "
            "int8_calib.json sidecar next to the checkpoint), or run one "
            "predict() batch first to auto-calibrate, then export.")

    bs = predictor.batch_size
    S = predictor.image_size
    L = predictor.vocab.max_seq_length

    def serve_fn(image_u8, question, ques_len):
        x = predictor.preprocess(image_u8)
        logits = predictor.model.apply(predictor.variables, x, question,
                                       ques_len, train=False,
                                       use_running_stats=True)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    args = (jax.ShapeDtypeStruct((bs, S, S, 3), jnp.uint8),
            jax.ShapeDtypeStruct((bs, L), jnp.int32),
            jax.ShapeDtypeStruct((bs,), jnp.int32))
    exported = jax.export.export(
        jax.jit(serve_fn),
        platforms=tuple(platforms) if platforms else None)(*args)
    blob = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(blob)
    manifest = {
        "format": FORMAT,
        "model": predictor.model_name,
        "batch_size": bs,
        "image_size": S,
        "max_seq_length": L,
        "num_classes": predictor.num_classes,
        "platforms": list(exported.platforms),
        "artifact_bytes": len(blob),
        "int8_stages": list(getattr(predictor.model, "int8_stages", ()) or ()),
        "vocab_sha256": _sha256(vocab_path) if vocab_path else None,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedPredictor(_ServingEngine):
    """Serve from an exported artifact — no model code, no checkpoint.

    Shares the full host-side engine (question encoding, decode, batch
    padding, top-k mapping) with :class:`vqa_tpu.serve.VQAPredictor`; the
    device forward is the deserialized StableHLO module. The vocab is
    still required host-side (token encode / answer-string decode) and is
    fingerprint-checked against the one the artifact was exported with.
    """

    def __init__(self, artifact_dir: str, vocab: Vocab, *,
                 vocab_path: str | None = None,
                 synthetic_images: bool = False):
        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != FORMAT:
            raise ValueError(
                f"{artifact_dir}: unknown artifact format "
                f"{self.manifest.get('format')!r} (expected {FORMAT})")
        want = self.manifest.get("vocab_sha256")
        if want and vocab_path and _sha256(vocab_path) != want:
            raise ValueError(
                f"vocab fingerprint mismatch: {vocab_path} is not the vocab "
                f"this artifact was exported with (token ids / label order "
                f"would silently disagree); expected sha256 {want[:16]}...")
        if vocab.max_seq_length != self.manifest["max_seq_length"]:
            raise ValueError(
                f"vocab max_seq_length {vocab.max_seq_length} != exported "
                f"{self.manifest['max_seq_length']}")

        backend = jax.default_backend()
        if backend not in self.manifest["platforms"]:
            raise ValueError(
                f"artifact was exported for platforms "
                f"{self.manifest['platforms']}, but the current backend is "
                f"{backend!r}; re-export with --platforms {backend} (or a "
                f"multi-platform list)")

        with open(os.path.join(artifact_dir, ARTIFACT), "rb") as f:
            self._exported = jax.export.deserialize(f.read())
        self.vocab = vocab
        self.model_name = self.manifest["model"]
        self.batch_size = int(self.manifest["batch_size"])
        self.image_size = int(self.manifest["image_size"])
        self.num_classes = int(self.manifest["num_classes"])
        self.synthetic_images = synthetic_images
        self._call = jax.jit(self._exported.call)

    def _probs(self, images_u8, ids, lens) -> np.ndarray:
        return np.asarray(self._call(jnp.asarray(images_u8),
                                     jnp.asarray(ids), jnp.asarray(lens)))


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a trained checkpoint as a self-contained "
                    "StableHLO serving artifact")
    ap.add_argument("--model", required=True,
                    choices=["baseline", "attention", "bert"])
    ap.add_argument("--vocab_file", required=True)
    ap.add_argument("--model_ckpt", help=".ckpt or reference .pth")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_cls", type=int)
    ap.add_argument("--opt_lvl", type=int, default=1, choices=[0, 1, 2, 3])
    ap.add_argument("--int8_backbone", type=str, default="auto",
                    choices=["auto", "true", "false"])
    ap.add_argument("--calib_file", type=str,
                    help="explicit int8 calibration sidecar when the "
                         "checkpoint dir has none")
    ap.add_argument("--image_size", type=int)
    ap.add_argument("--platforms", type=str,
                    help="comma-separated lowering platforms (e.g. "
                         "'cpu,tpu'); default: the current backend only")
    args = ap.parse_args(argv)

    vocab = Vocab.load(args.vocab_file)
    predictor = VQAPredictor(
        args.model, vocab, args.model_ckpt, num_cls=args.num_cls,
        batch_size=args.batch_size, opt_lvl=args.opt_lvl,
        int8_backbone={"auto": None, "true": True,
                       "false": False}[args.int8_backbone],
        calib_file=args.calib_file, image_size=args.image_size)
    manifest = export_predictor(
        predictor, args.out,
        platforms=(tuple(p for p in args.platforms.split(",") if p)
                   if args.platforms else None),
        vocab_path=args.vocab_file)
    print(f"exported {manifest['model']} b{manifest['batch_size']}@"
          f"{manifest['image_size']} K={manifest['num_classes']} for "
          f"{manifest['platforms']} -> {args.out} "
          f"({manifest['artifact_bytes'] / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
