"""Batched inference engine + serving CLI.

The reference has no inference story at all (``--mode test`` raises
NotImplementedError, main.py:286-287; README "Inference ..TO-DO..").
This module provides the production path:

- :class:`VQAPredictor`: checkpoint -> compiled fixed-shape predict function
  (partial batches are padded, so one XLA program serves every request size
  up to ``batch_size``), host image decode -> device preprocess -> logits ->
  top-k answer strings with probabilities;
- a CLI over dataset ``.txt`` files or explicit (image, question) pairs
  emitting JSON lines.

Static shapes are the serving contract: question ids pad to the vocab's
``max_seq_length`` and batches pad to ``batch_size``; ragged inputs never
trigger a recompile.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

# honor an explicitly-set JAX_PLATFORMS (the axon sitecustomize clobbers the
# env var's platform choice; same contract restoration as main.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from .compile_cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import numpy as np

from .config import build_model
from .data.images import decode_batch
from .data.pipeline import make_image_preprocessor
from .text import pad_sequences, preprocess_text
from .vocab import UNK_TOKEN, Vocab


def _infer_num_classes(model_name: str, params) -> int:
    """Classifier-head width from a checkpoint's param tree.

    attention ends in ``mlp_classify.W_h`` (reference model.py:412);
    baseline/bert end in ``fc_final`` (model.py:25).
    """
    try:
        if model_name == "attention":
            return int(params["mlp_classify"]["W_h"]["kernel"].shape[-1])
        return int(params["fc_final"]["kernel"].shape[-1])
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"checkpoint param tree does not match model {model_name!r} "
            f"(missing classifier head): {e}") from e


class _ServingEngine:
    """Host-side serving logic shared by :class:`VQAPredictor` and the AOT
    :class:`vqa_tpu.export.ExportedPredictor`: question encoding, image
    decode, fixed-shape batch padding, and top-k answer-string mapping.
    Subclasses provide ``_probs`` (the device forward) and may hook
    ``_prepare_batch`` (first-batch auto-calibration)."""

    vocab: Vocab
    batch_size: int
    image_size: int
    synthetic_images: bool

    def _prepare_batch(self, images_u8) -> None:
        """Called with each chunk's decoded images before the forward."""

    def _probs(self, images_u8, ids, lens) -> np.ndarray:
        """[B,S,S,3] uint8 + [B,L]/[B] int32 -> softmax probs [B,K]."""
        raise NotImplementedError

    def encode_questions(self, questions: list[str]):
        """Raw question strings -> (ids [N, L], lengths [N])."""
        unk = self.vocab.word2idx[UNK_TOKEN]
        ids = np.zeros((len(questions), self.vocab.max_seq_length), np.int32)
        lens = np.zeros((len(questions),), np.int32)
        for i, q in enumerate(questions):
            toks = [self.vocab.word2idx.get(w, unk) for w in preprocess_text(q)]
            ids[i] = pad_sequences(toks, self.vocab.max_seq_length)
            lens[i] = int(np.count_nonzero(ids[i]))
        return ids, lens

    def predict(self, image_paths: list[str], questions: list[str],
                top_k: int = 1) -> list[dict]:
        """Answer (image, question) pairs; any count up to padding, no recompile.

        Returns per-sample dicts: {answer, prob, topk: [(answer, prob), ...]}.
        """
        assert len(image_paths) == len(questions)
        results: list[dict] = []
        bs = self.batch_size
        for start in range(0, len(questions), bs):
            chunk_paths = image_paths[start:start + bs]
            chunk_qs = questions[start:start + bs]
            n = len(chunk_qs)
            images = decode_batch(chunk_paths, self.image_size,
                                  synthetic_fallback=self.synthetic_images)
            self._prepare_batch(images)
            ids, lens = self.encode_questions(chunk_qs)
            # pad the batch to the compiled shape
            if n < bs:
                images = np.concatenate(
                    [images, np.zeros((bs - n,) + images.shape[1:], images.dtype)])
                ids = np.concatenate([ids, np.zeros((bs - n, ids.shape[1]), ids.dtype)])
                lens = np.concatenate([lens, np.ones((bs - n,), lens.dtype)])
            probs = self._probs(images, ids, lens)[:n]
            order = np.argsort(-probs, axis=-1)[:, :top_k]
            for row, top in zip(probs, order):
                # class ids beyond the vocab's realized labels are untrained
                # head slots; surface them as UNKNOWN rather than KeyError
                topk = [(self.vocab.idx2label.get(int(i), "UNKNOWN"), float(row[i]))
                        for i in top]
                results.append({"answer": topk[0][0], "prob": topk[0][1],
                                "topk": topk})
        return results


class VQAPredictor(_ServingEngine):
    """Compiled batch predictor over a trained checkpoint."""

    def __init__(self, model_name: str, vocab: Vocab, checkpoint: str | None = None,
                 *, num_cls: int | None = None, batch_size: int = 32,
                 opt_lvl: int = 1, use_pallas: bool = False,
                 int8_backbone: bool | None = None,
                 hpack_pool: bool = True,
                 fused_stem: bool = True,
                 int8_handoff: bool = True,
                 int8_stages: tuple | None = None,
                 calib_file: str | None = None,
                 int8_dynamic: bool = False,
                 synthetic_images: bool = False, image_size: int | None = None):
        self.vocab = vocab
        self.model_name = model_name
        self.batch_size = batch_size
        self.synthetic_images = synthetic_images
        self._needs_calib = False

        loaded = None
        if checkpoint:
            from .train.checkpoint import load_params_only
            loaded = load_params_only(checkpoint, model_name)
            # head size comes from the checkpoint itself — training may have
            # used a larger --num_cls than the vocab's realized label count
            num_classes = _infer_num_classes(model_name, loaded[0])
        else:
            num_classes = (num_cls + 1) if num_cls is not None else vocab.num_labels
        self.num_classes = num_classes
        self.model, cfg = build_model(model_name, vocab.size, num_classes,
                                      hpack_pool=hpack_pool,
                                      fused_stem=fused_stem,
                                      int8_handoff=int8_handoff,
                                      int8_stages_override=int8_stages,
                                      opt_lvl=opt_lvl, use_pallas=use_pallas,
                                      int8_backbone=int8_backbone)
        if self.model.int8_stages:
            # static-scale resolution order: (1) an explicit --calib_file
            # (explicit user input wins — it must never be silently
            # shadowed by whatever sidecar happens to sit next to the
            # checkpoint), (2) the checkpoint's training-time sidecar,
            # (3) bake scales from the first request batch (mirrors main.py
            # test mode's auto-PTQ) — predictions are batch-composition-
            # invariant from the first answer on either way. Dynamic
            # per-batch scales (r2 behavior) only behind --int8_dynamic.
            from .train.calibrate import load_calib
            amax = None
            if calib_file:
                amax = self._load_calib_file(calib_file,
                                             self.model.int8_stages)
            if amax is None and checkpoint:
                amax = load_calib(os.path.dirname(os.path.abspath(checkpoint)),
                                  self.model.int8_stages)
            if amax is not None:
                self.model = self.model.clone(int8_amax=amax)
            elif int8_dynamic:
                print("NOTE: no int8_calib.json next to the checkpoint; "
                      "int8 stages use dynamic per-batch activation scales "
                      "(predictions depend on batch composition)")
            else:
                self._needs_calib = True
                print("NOTE: no int8_calib.json next to the checkpoint; "
                      "static scales will be calibrated from the first "
                      "request batch (pass --int8_dynamic for per-batch "
                      "scales, or --calib_file for a curated sidecar)")
        self.image_size = image_size or cfg.image_size
        self.preprocess = make_image_preprocessor(self.image_size)

        sample = {
            "image": self.preprocess(np.zeros((1, self.image_size, self.image_size, 3),
                                              np.uint8)),
            "question": jnp.zeros((1, vocab.max_seq_length), jnp.int32),
            "ques_len": jnp.ones((1,), jnp.int32),
        }
        variables = jax.jit(self.model.init)(
            {"params": jax.random.PRNGKey(0)}, sample["image"],
            sample["question"], sample["ques_len"])
        if loaded is not None:
            params, batch_stats = loaded
            self.variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
            if batch_stats:
                self.variables["batch_stats"] = jax.tree_util.tree_map(
                    jnp.asarray, batch_stats)
        else:
            self.variables = variables

        self._fwd = self._make_fwd()

    def _make_fwd(self):
        def fwd(variables, image, question, ques_len):
            logits = self.model.apply(variables, image, question, ques_len,
                                      train=False, use_running_stats=True)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return probs

        return jax.jit(fwd)

    @staticmethod
    def _load_calib_file(path: str, int8_stages: tuple) -> tuple:
        """Explicit calibration sidecar (the save_calib JSON format).

        Unlike the checkpoint-adjacent sidecar (silently skipped when its
        stage set is stale), a user-named file that does not parse or does
        not match the active stage set is an error — wrong static scales
        are worse than no scales."""
        with open(path) as f:
            data = json.load(f)
        stages = tuple(data.get("stages", ()))
        if stages != tuple(int8_stages):
            raise ValueError(
                f"--calib_file {path} was calibrated for int8 stages "
                f"{stages}, but the model runs {tuple(int8_stages)}; "
                f"re-calibrate or pass a matching --int8_stages")
        return tuple(tuple(float(x) for x in v) if isinstance(v, list)
                     else float(v) for v in data["amax"])

    def _calibrate(self, images_u8) -> None:
        """Bake static int8 scales from the first request batch and rebuild
        the compiled forward (main.py test mode's auto-PTQ, applied to the
        serving engine — subsequent predictions no longer depend on batch
        composition)."""
        from .train.calibrate import calibrate_model
        print(f"int8 serve calibration: static per-channel scales from the "
              f"first request batch ({len(images_u8)} images)")
        self.model = calibrate_model(self.model_name, self.model,
                                     self.variables, self.preprocess,
                                     [images_u8], log=lambda s: None)
        self._needs_calib = False
        self._fwd = self._make_fwd()

    def _prepare_batch(self, images_u8) -> None:
        if self._needs_calib:
            self._calibrate(images_u8)

    def _probs(self, images_u8, ids, lens) -> np.ndarray:
        return np.asarray(self._fwd(self.variables, self.preprocess(images_u8),
                                    jnp.asarray(ids), jnp.asarray(lens)))


def build_parser():
    ap = argparse.ArgumentParser(description="VQA batched inference")
    ap.add_argument("--model", choices=["baseline", "attention", "bert"],
                    help="required unless --from_export (the artifact "
                         "manifest carries the model identity)")
    ap.add_argument("--vocab_file", required=True)
    ap.add_argument("--model_ckpt", help=".ckpt or reference .pth")
    ap.add_argument("--img_dir", default=".", help="image directory")
    ap.add_argument("--input",
                    help="dataset .txt (img\\tq\\t[ans]) or '-' for stdin "
                         "pairs 'img\\tq'; required unless --export_to")
    ap.add_argument("--from_export",
                    help="serve from an AOT StableHLO artifact directory "
                         "(vqa_tpu.export) instead of building the model "
                         "from a checkpoint")
    ap.add_argument("--export_to",
                    help="after building the predictor, export it as an "
                         "AOT artifact to this directory and exit (unless "
                         "--input is also given)")
    ap.add_argument("--output", help="output JSONL (default stdout)")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--top_k", type=int, default=1)
    ap.add_argument("--num_cls", type=int)
    ap.add_argument("--opt_lvl", type=int, default=1, choices=[0, 1, 2, 3])
    ap.add_argument("--int8_backbone", type=str, default="auto",
                    choices=["auto", "true", "false"],
                    help="int8-PTQ frozen backbone; auto = on at "
                         "--opt_lvl >= 1 on TPU (eval drift <=0.4pp "
                         "measured, BASELINE.md r3)")
    ap.add_argument("--int8_stages", type=str, default="auto",
                    help="comma-separated conv indices to int8-quantize, "
                         "overriding the measured default set — must match "
                         "the set the checkpoint's calibration sidecar was "
                         "built with if one is present")
    ap.add_argument("--calib_file", type=str,
                    help="explicit int8 calibration sidecar (the "
                         "int8_calib.json format) when the checkpoint dir "
                         "has none")
    ap.add_argument("--int8_dynamic", action="store_true",
                    help="use dynamic per-batch activation scales instead "
                         "of auto-calibrating static ones from the first "
                         "request batch (predictions then depend on batch "
                         "composition)")
    ap.add_argument("--use_pallas", action="store_true")
    ap.add_argument("--synthetic_images", action="store_true")
    ap.add_argument("--image_size", type=int,
                    help="override input resolution (default: per-model)")
    return ap


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.from_export and args.export_to:
        parser.error("--from_export and --export_to are mutually exclusive")
    if not args.from_export and not args.model:
        parser.error("--model is required (unless serving --from_export)")
    if not args.input and not args.export_to:
        parser.error("--input is required (unless only exporting via "
                     "--export_to)")
    vocab = Vocab.load(args.vocab_file)
    if args.from_export:
        if args.model_ckpt:
            print("NOTE: --model_ckpt is ignored with --from_export (the "
                  "artifact carries the weights)")
        from .export import ExportedPredictor
        predictor = ExportedPredictor(
            args.from_export, vocab, vocab_path=args.vocab_file,
            synthetic_images=args.synthetic_images)
    else:
        predictor = VQAPredictor(
            args.model, vocab, args.model_ckpt,
            num_cls=args.num_cls, batch_size=args.batch_size,
            opt_lvl=args.opt_lvl, use_pallas=args.use_pallas,
            int8_backbone={"auto": None, "true": True,
                           "false": False}[args.int8_backbone],
            int8_stages=(None if args.int8_stages == "auto" else
                         tuple(int(i) for i in args.int8_stages.split(",") if i)),
            calib_file=args.calib_file, int8_dynamic=args.int8_dynamic,
            synthetic_images=args.synthetic_images,
            image_size=args.image_size)
    if args.export_to:
        from .export import export_predictor
        manifest = export_predictor(predictor, args.export_to,
                                    vocab_path=args.vocab_file)
        print(f"exported serving artifact -> {args.export_to} "
              f"({manifest['artifact_bytes'] / 1e6:.1f} MB, platforms "
              f"{manifest['platforms']})")
        if not args.input:
            return

    import sys
    lines = (sys.stdin if args.input == "-" else open(args.input)).read().split("\n")
    img_paths, questions = [], []
    for lineno, line in enumerate(lines, 1):
        if not line.strip():
            continue
        parts = line.strip().split("\t")
        if len(parts) < 2:
            raise SystemExit(f"{args.input}:{lineno}: expected 'img\\tquestion"
                             f"[\\tanswer]', got: {line.strip()!r}")
        img_paths.append(os.path.join(args.img_dir, parts[0]))
        questions.append(parts[1])

    # stream results batch-by-batch (the chunking mirrors predict()'s own
    # internal batching, so the compiled path is identical): each completed
    # batch is on disk before the next one runs — a mid-run kill keeps all
    # finished work, and memory stays bounded by one batch of results
    out = open(args.output, "w") if args.output else sys.stdout
    n_written = 0
    for start in range(0, len(questions), args.batch_size):
        chunk_p = img_paths[start:start + args.batch_size]
        chunk_q = questions[start:start + args.batch_size]
        for path, q, r in zip(chunk_p, chunk_q,
                              predictor.predict(chunk_p, chunk_q,
                                                top_k=args.top_k)):
            out.write(json.dumps({"image": os.path.basename(path),
                                  "question": q.replace(",", " "), **r}) + "\n")
            n_written += 1
        out.flush()
    if args.output:
        out.close()
        print(f"wrote {n_written} predictions to {args.output}")


if __name__ == "__main__":
    main()
