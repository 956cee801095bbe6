"""Train/eval CLI — flag-compatible with the reference's ``main.py``.

Every reference flag is accepted with the same name, type, default, and
observable behavior (/root/reference/main.py:34-78): log-dir layout
``expt_dir/expt_name/run_name``, ``train_log.txt`` flag dump, TensorBoard
tags, ``model_<step>`` checkpoints, the same console format strings, periodic
+ epoch-end validation with the reference's metric definition.

Beyond-reference capabilities (all opt-in or invisible by default):
- ``--mode test`` is implemented (the reference raises NotImplementedError,
  main.py:286-287): evaluates a checkpoint on ``--val_file`` and can dump
  predictions;
- full-state checkpoints -> exact resume (optimizer/step/rng restored);
  ``--model_ckpt`` also accepts reference ``.pth`` weight files;
- ``--num_devices`` shards the batch over a data-parallel mesh (ICI);
  ``--model_parallel``/``--fsdp``/``--seq_parallel`` add tensor, ZeRO and
  sequence parallelism on a 2-D mesh (parallel/sharding.py);
- ``--grad_accum`` microbatches the step (activation memory scales with
  batch_size/grad_accum); ``--ckpt_backend orbax`` writes async sharded
  checkpoints;
- ``--synthetic_images``/``--host_size`` control the input pipeline when the
  COCO archive is absent;
- ``--use_pallas`` is RETIRED (r5): the experimental fused co-attention
  kernel lives in tools/retired/ (PARITY.md M8); 'true' fails fast.

GPU-only reference flags (``--gpu_id``) are accepted and ignored with a note,
keeping launch scripts working.
"""

from __future__ import annotations

import argparse
import os

import jax

# Honor an explicitly-set JAX_PLATFORMS env var. On axon-tunnel machines a
# sitecustomize re-registers the TPU backend and clobbers the env var's
# platform selection, so ``JAX_PLATFORMS=cpu python -m vqa_tpu.main`` (the
# documented CPU smoke-run recipe) silently lands on the TPU; re-asserting
# the user's choice through the config API before first device use restores
# the standard jax contract. No-op when the var is unset.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: 448^2 train-step compiles cost 3-25+ min
# through the TPU tunnel; without this every CLI session pays them again
# (JAX_COMPILATION_CACHE_DIR overrides the ~/.cache default).
from .compile_cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import numpy as np

from .config import build_model, compute_dtype_for_opt_lvl, int_min_two, str2bool
from .data import DataLoader, VQASamples, make_image_preprocessor
from .parallel.mesh import get_mesh, replicate_to_mesh, shard_batch
from .train.checkpoint import load_any
from .train.logging import (ETAEstimator, make_summary_writer, print_and_log,
                            setup_logs_file)
from .train.state import create_train_state, make_optimizer
from .train.steps import compute_validation_metrics, make_eval_step, make_train_step
from .vocab import Vocab


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Visual Question Answering")

    # Experiment params (reference main.py:37-41)
    parser.add_argument("--mode", type=str, required=True, choices=["train", "test"],
                        help="train or test mode")
    parser.add_argument("--expt_dir", type=str, required=True,
                        help="root directory to save model & summaries")
    parser.add_argument("--expt_name", type=str, required=True,
                        help="expt_dir/expt_name: organize experiments")
    parser.add_argument("--run_name", type=str, required=True,
                        help="expt_dir/expt_name/run_name: organize training runs")
    parser.add_argument("--model", type=str, required=True,
                        choices=["baseline", "attention", "bert"], help="VQA model")

    # Data params (main.py:44-48)
    parser.add_argument("--train_img", type=str, help="path to training images directory")
    parser.add_argument("--train_file", type=str, help="training dataset file")
    parser.add_argument("--val_img", type=str, help="path to validation images directory")
    parser.add_argument("--val_file", type=str, help="validation dataset file")
    parser.add_argument("--num_cls", "-K", type=int_min_two, default=1000,
                        help="top K answers (labels); min=2")

    # Vocab params (main.py:51)
    parser.add_argument("--vocab_file", type=str,
                        help="vocabulary pickle file (gen. by prepare_data.py)")

    # Training params (main.py:54-59)
    parser.add_argument("--batch_size", "-bs", type=int, default=8, help="batch size")
    parser.add_argument("--num_epochs", "-ep", type=int, default=50, help="number of epochs")
    parser.add_argument("--learning_rate", "-lr", type=float, default=1e-4,
                        help="initial learning rate")
    parser.add_argument("--log_interval", type=int, default=100,
                        help="interval size for logging training summaries")
    parser.add_argument("--save_interval", type=int, default=3000,
                        help="save model after `n` weight update steps")
    parser.add_argument("--val_size", type=int, default=10000,
                        help="validation set size for evaluating accuracy")

    # Evaluation params (main.py:62)
    parser.add_argument("--K_eval", type=int, default=1000,
                        help="top-K labels during evaluation/inference")

    # Model params (main.py:65-67)
    parser.add_argument("--model_ckpt", type=str,
                        help="resume training/perform inference; e.g. model_1000.ckpt or .pth")
    parser.add_argument("--vgg_wts_path", type=str,
                        help="VGG-11 (bn) pre-trained weights (.pth) file")
    parser.add_argument("--vgg_train", type=str2bool, default="false",
                        help="whether to train the VGG encoder")

    # Device params (main.py:72-73) — gpu_id kept for script compat, ignored
    parser.add_argument("--gpu_id", type=int, default=0,
                        help="(GPU flag, ignored on TPU; kept for script compatibility)")
    parser.add_argument("--opt_lvl", type=int, default=1, choices=[0, 1, 2, 3],
                        help="precision: 0=fp32, 1-3=bf16 compute (Apex O-level analog)")

    # Misc params (main.py:76)
    parser.add_argument("--num_workers", type=int, default=6,
                        help="host image-decode workers (threads or "
                             "native_mp processes; default mirrors the "
                             "reference's published num_workers=6 envelope "
                             "— feeding the int8 headline rate needs "
                             "11-14 native processes, BASELINE.md r3)")
    parser.add_argument("--decode_backend", type=str, default="auto",
                        choices=["auto", "native", "pil", "native_mp"],
                        help="host JPEG decode engine: auto resolves to "
                             "native_mp (process pool of native decoders, "
                             "the torch-DataLoader worker model — measured "
                             "fastest real-data engine, BASELINE.md r3) "
                             "for real-data loaders with >1 worker, else "
                             "the native C++ thread pool when built")

    # --- TPU-native extensions (not in the reference) ---
    parser.add_argument("--num_devices", type=int, default=1,
                        help="data-parallel devices in the mesh (1 = single chip)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="tensor-parallel ways on a 2-D (data x model) "
                             "mesh; must divide --num_devices. Megatron-"
                             "paired shardings for the trainable head, "
                             "frozen VGG replicated (parallel/sharding.py)")
    parser.add_argument("--fsdp", type=str2bool, default="false",
                        help="ZeRO-style sharding of params + Adam moments "
                             "over the data axis (composes with "
                             "--model_parallel)")
    parser.add_argument("--ckpt_backend", type=str, default="flax",
                        choices=["flax", "orbax"],
                        help="checkpoint format: 'flax' = single msgpack "
                             "file (host gather); 'orbax' = async sharded "
                             "model_<step>.orbax directory — per-host shard "
                             "writes + restore directly into TP/FSDP "
                             "shardings. Both restore via --model_ckpt")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="gradient-accumulation microbatches per "
                             "optimizer step (lax.scan; activation memory "
                             "scales with batch_size/grad_accum). Requires "
                             "running-stats BN (the frozen-backbone "
                             "default) and batch_size divisible by it")
    parser.add_argument("--seq_parallel", type=str2bool, default="false",
                        help="shard the image feature sequence (S=196) over "
                             "the model axis in the co-attention block; "
                             "requires --model_parallel > 1 and the "
                             "attention model")
    parser.add_argument("--preempt_save", type=str2bool, default="true",
                        help="on SIGTERM, save a full checkpoint at the next "
                             "step boundary and exit cleanly (resume with "
                             "--model_ckpt latest; exact intra-epoch resume). "
                             "A second SIGTERM kills immediately")
    parser.add_argument("--force_mesh", type=str2bool, default="false",
                        help="build the GSPMD data mesh even when "
                             "--num_devices is 1 — runs the sharded code "
                             "path (replicated state, sharded batch, mesh "
                             "collectives) on a single chip, validating the "
                             "multi-device program on real hardware")
    parser.add_argument("--use_pallas", type=str2bool, default="false",
                        help="RETIRED r5 (PARITY.md M8): the fused co-attention "
                             "kernel moved to tools/retired/; 'true' now fails "
                             "fast with that pointer")
    parser.add_argument("--synthetic_images", type=str2bool, default="false",
                        help="deterministic synthetic images when files are missing")
    parser.add_argument("--host_size", type=int, default=0,
                        help="host-side decode size (0 = model image size)")
    parser.add_argument("--seed", type=int, default=0, help="global RNG seed")
    parser.add_argument("--image_size", type=int, default=0,
                        help="override model input resolution (0 = per-model default)")
    parser.add_argument("--test_out", type=str,
                        help="test mode: write predictions (img, question, answer) here")
    parser.add_argument("--test_out_format", type=str, default="plain",
                        choices=["plain", "vqa"],
                        help="--test_out format: plain = one answer per line; "
                             "vqa = the official evaluation JSON "
                             "[{question_id, answer}] that datahelper.VQA."
                             "loadRes consumes (question_id = 0-based line "
                             "index into --val_file, the id prepare_data "
                             "assigns when no annotation ids exist)")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler trace of N train steps into the run dir")
    parser.add_argument("--bn_mode", type=str, default="auto",
                        choices=["auto", "batch", "running"],
                        help="frozen-VGG BatchNorm mode during training: auto="
                             "running stats when frozen (fixed behavior); batch="
                             "the reference's exact quirk (batch stats even when "
                             "frozen); running=always running stats")
    parser.add_argument("--prefetch_batches", type=int, default=2,
                        help="device batches prepared ahead of the train step "
                             "(HBM vs overlap; <=1 disables prefetch)")
    parser.add_argument("--cache_features", type=str2bool, default="false",
                        help="precompute the frozen image tower once per "
                             "image into a disk cache and train the head "
                             "against cached features (requires a frozen VGG "
                             "in running-stats BN mode)")
    parser.add_argument("--int8_backbone", type=str, default="auto",
                        choices=["auto", "true", "false"],
                        help="int8 post-training quantization of the frozen "
                             "VGG conv stack (per-channel weight scales, "
                             "calibrated static activation scales; 6.64x "
                             "measured at <=0.4pp drift, BASELINE.md r3). "
                             "auto = on at --opt_lvl >= 1 on TPU (r3 "
                             "default decision), off at O0")
    parser.add_argument("--hpack_pool", type=str2bool, default="true",
                        help="run pooled int8 stages with C_in <= 64 "
                             "(conv1, when int8-quantized) through the "
                             "fused H-pair-packed Pallas kernel "
                             "(conv+bias+ReLU+maxpool in one pass, same "
                             "quantization within 1 ulp f32; BASELINE.md "
                             "r3). Inert without --int8_backbone")
    parser.add_argument("--fused_stem", type=str2bool, default="true",
                        help="join conv0/conv1 with a packed-int8 handoff "
                             "(ops/conv_stem.py): conv0's epilogue emits "
                             "conv1's kernel input directly — no full-"
                             "resolution bf16 intermediate. Engages only "
                             "once static int8 calibration exists for "
                             "stages 0 and 1; inert otherwise")
    parser.add_argument("--int8_handoff", type=str2bool, default="true",
                        help="quantize each int8-XLA stage's output for "
                             "the next inside the fused epilogue "
                             "(conv2..6): inter-stage maps move through "
                             "HBM as int8, half the bytes. Engages only "
                             "with static calibration; inert otherwise")
    parser.add_argument("--int8_stages", type=str, default="auto",
                        help="comma-separated conv indices (0-7) to "
                             "int8-quantize, overriding the measured "
                             "default set (0,2,3,4,5,6). Requires "
                             "--int8_backbone; used to gate default-set "
                             "extensions with PTQ drift evals")
    parser.add_argument("--int8_calib", type=int, default=8,
                        help="int8 static-scale calibration: batches of "
                             "train data sampled at startup to fix each "
                             "quantized stage's activation scale (batch-"
                             "invariant features, no per-step amax "
                             "reduction; persisted as int8_calib.json). "
                             "0 = dynamic per-batch scales")
    parser.add_argument("--cache_dir", type=str, default="",
                        help="feature-cache root (default: <run log dir>/"
                             "feature_cache); caches are keyed by weights "
                             "fingerprint and reused across runs")
    return parser


def _init_shapes(preprocess, max_seq_length: int) -> dict:
    """Shape-only sample batch for model init (avoids decoding real images).

    The preprocessor resizes any host resolution to the model's input size,
    so a tiny dummy suffices.
    """
    return {"image": preprocess(np.zeros((1, 8, 8, 3), np.uint8)),
            "question": jnp.zeros((1, max_seq_length), jnp.int32),
            "ques_len": jnp.ones((1,), jnp.int32)}


def _resolve_ckpt(model_ckpt: str, log_dir: str) -> str:
    """``--model_ckpt latest`` -> highest-step model_<step>.ckpt in the run dir."""
    if model_ckpt == "latest":
        from .train.checkpoint import latest_checkpoint
        path = latest_checkpoint(log_dir)
        if path is None:
            raise SystemExit(f"--model_ckpt latest: no model_<step>.ckpt in {log_dir}")
        return path
    return model_ckpt if os.path.exists(model_ckpt) \
        else os.path.join(log_dir, model_ckpt)


def _pad_to_multiple(batch: dict, multiple: int):
    """Pad a host batch's leading axis to a multiple (repeat the last row).

    Mesh sharding splits the leading axis across devices
    (parallel/mesh.py:44-51), which requires divisibility; the final
    drop_last=False eval batch may not comply. Returns (padded, n_valid).
    """
    n = len(batch["label"])
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def p(a):
        a = np.asarray(a)
        return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

    return {k: p(v) for k, v in batch.items()}, n


def _device_batch(batch, preprocess, mesh=None):
    # cached-feature batches arrive as floats and are already "preprocessed";
    # pixel batches arrive uint8 and go through resize+normalize on device
    is_pixels = np.asarray(batch["image"]).dtype == np.uint8
    raw = {"image": batch["image"],
           "question": np.asarray(batch["question"]),
           "ques_len": np.asarray(batch["ques_len"]),
           "label": np.asarray(batch["label"])}
    if mesh is not None and mesh.size > 1:
        # shard the small uint8 batch FIRST: the jitted preprocess then runs
        # under GSPMD on every device instead of serializing (and risking
        # OOM) on device 0 followed by a full-size float reshard
        raw = shard_batch(raw, mesh)
        if is_pixels:
            raw["image"] = preprocess(raw["image"])
        return raw
    raw = {k: jnp.asarray(v) for k, v in raw.items()}
    if is_pixels:
        raw["image"] = preprocess(raw["image"])
    return raw


def _make_feature_encoder(model_name, model, variables, preprocess):
    """Jitted frozen-tower encoder for the feature cache build.

    Returns ``(encode_fn, fingerprint, boundary)``: ``encode_fn`` maps host
    uint8 images -> the model's cacheable frozen representation; the
    fingerprint covers exactly the variables the encoder consumes, so any
    weight change invalidates caches (vqa_tpu.data.feature_cache).
    """
    from .data.feature_cache import variables_fingerprint
    from .train.calibrate import image_tower

    # int8_stages (and the calibrated static scales, which change the
    # values) must match the training tower exactly — the cached features
    # ARE the tower's output — and participate in the boundary so int8,
    # bf16, and differently-calibrated caches can never collide
    int8_tag = ""
    if model.int8_stages:
        int8_tag = f"|i8{','.join(map(str, model.int8_stages))}"
        if model.hpack_pool:
            # the fused pooled-stage kernel matches the XLA int8 stages
            # only to 1 ulp f32 (FMA contraction), so its caches are keyed
            # separately from plain-XLA int8 caches
            int8_tag += "|hp"
        if (getattr(model, "fused_stem", False) and model.int8_amax
                and 0 in model.int8_stages and 1 in model.int8_stages):
            # the fused conv0->conv1 handoff quantizes conv1's input from
            # the f32 epilogue instead of a bf16 store (ops/conv_stem.py)
            # — different values than the unfused chain, so its caches key
            # separately (conservative: tagged even if a shape check later
            # routes unfused, which only costs a redundant rebuild)
            int8_tag += "|fs"
        if (getattr(model, "int8_handoff", False) and model.int8_amax
                and any((i + 1) in model.int8_stages
                        for i in model.int8_stages)):
            # inter-stage int8 handoffs quantize from f32 epilogues
            # (models/vgg.py int8_handoff note) — different values than
            # the bf16-store chain, so those caches key separately
            int8_tag += "|ho"
        if model.int8_amax:
            # flatten per-channel amax tuples (legacy scalars stay scalars;
            # the value lists differ between schemes, so tags never collide)
            int8_tag += "@" + ",".join(
                f"{v:.8g}" for a in model.int8_amax
                for v in (a if isinstance(a, (tuple, list)) else (a,)))
    # Boundary notes: attention caches the co-attention image-encoder
    # output; baseline/bert cache the conv-stack output [7, 7, 512], NOT
    # the 4096-d head — the FC head's Dropout(0.5) layers must stay live
    # in-step for cached training to equal uncached training exactly.
    # The param narrowing in image_tower keeps head-only weight changes
    # from spuriously invalidating caches (and skips hashing ~400MB).
    enc, sub_vars = image_tower(model_name, model, variables)
    boundary = ("coattn_image_encoder" if model_name == "attention"
                else "vgg11_features") + int8_tag

    @jax.jit
    def encode(images_u8):
        x = preprocess(images_u8)
        return enc.apply(sub_vars, x, False, True)

    return encode, variables_fingerprint(sub_vars), boundary


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)

    from .parallel.distributed import initialize_distributed
    initialize_distributed()  # no-op single-host; required before device use

    print(f"Selected Device(s): {jax.devices()[:args.num_devices]}")

    vocab = Vocab.load(args.vocab_file)
    print(f"Vocabulary loaded from {args.vocab_file}")

    num_classes = args.num_cls + 1  # +1 for UNKNOWN (reference main.py:155)
    if vocab.num_labels > num_classes:
        # label ids >= num_classes would silently NaN the loss; fail loudly
        raise SystemExit(
            f"--num_cls {args.num_cls} is smaller than the vocab's answer set "
            f"({vocab.num_labels - 1} labels + UNKNOWN). Rebuild the vocab with "
            f"-K {args.num_cls} or pass --num_cls {vocab.num_labels - 1}.")
    int8_backbone = {"auto": None, "true": True, "false": False}[args.int8_backbone]
    model, cfg = build_model(args.model, vocab.size, num_classes,
                             vgg_trainable=args.vgg_train, opt_lvl=args.opt_lvl,
                             use_pallas=args.use_pallas,
                             int8_backbone=int8_backbone,
                             hpack_pool=args.hpack_pool,
                             fused_stem=args.fused_stem,
                             int8_handoff=args.int8_handoff,
                             int8_stages_override=(
                                 None if args.int8_stages == "auto" else
                                 tuple(int(i) for i in
                                       args.int8_stages.split(",") if i)),
                             max_seq_length=vocab.max_seq_length)
    image_size = args.image_size or cfg.image_size
    host_size = args.host_size or image_size
    compute_dtype = compute_dtype_for_opt_lvl(args.opt_lvl)
    preprocess = make_image_preprocessor(image_size, compute_dtype)

    log_dir = os.path.join(args.expt_dir, args.expt_name, args.run_name)
    os.makedirs(log_dir, exist_ok=True)

    mesh = get_mesh(args.num_devices, model_parallel=args.model_parallel) \
        if args.num_devices > 1 or args.force_mesh else None
    if mesh is None and (args.model_parallel > 1 or args.fsdp):
        raise SystemExit("--model_parallel/--fsdp need a device mesh: set "
                         "--num_devices > 1 (or --force_mesh true)")
    if args.seq_parallel:
        if mesh is None or args.model_parallel <= 1:
            raise SystemExit("--seq_parallel requires --model_parallel > 1")
        if not hasattr(model, "act_mesh"):
            raise SystemExit(f"--seq_parallel is attention-family only "
                             f"(got --model {args.model})")
        seq_len_s = (image_size // 32) ** 2  # VGG downsamples 32x
        if seq_len_s % args.model_parallel:
            raise SystemExit(
                f"--seq_parallel: the image feature sequence S={seq_len_s} "
                f"(image_size {image_size}) is not divisible by "
                f"--model_parallel {args.model_parallel}; the constraint "
                f"would silently no-op")
        model = model.clone(act_mesh=mesh)

    from .parallel.distributed import host_shard
    shard_index, num_shards = host_shard()

    def make_loader(data_file, img_dir, shuffle=True, drop_last=True,
                    feature_cache=None, samples=None, samples_only=False):
        if samples is None:
            samples = VQASamples(data_file, img_dir, vocab.word2idx,
                                 vocab.label2idx, vocab.max_seq_length)
        if samples_only:
            return samples, None
        loader = DataLoader(samples, args.batch_size, host_size=host_size,
                            shuffle=shuffle, drop_last=drop_last,
                            num_workers=args.num_workers, seed=args.seed,
                            synthetic_images=args.synthetic_images,
                            shard_index=shard_index, num_shards=num_shards,
                            decode_backend=args.decode_backend,
                            feature_cache=feature_cache)
        return samples, loader

    if args.mode == "train":
        train(args, model, vocab, preprocess, make_loader, log_dir, parser, mesh,
              image_size=image_size, host_size=host_size)
    else:
        test(args, model, vocab, preprocess, make_loader, log_dir, mesh)


def train(args, model, vocab, preprocess, make_loader, log_dir, parser, mesh=None,
          image_size: int = 0, host_size: int = 0):
    print(f"Training Log Directory: {log_dir}\n")
    writer = make_summary_writer(log_dir)
    log_file = setup_logs_file(vars(args), log_dir)

    # datasets first; loaders are built once, after the feature-cache
    # decision (a cached loader skips the decode pool entirely)
    train_dataset, _ = make_loader(args.train_file, args.train_img,
                                   samples_only=True)
    print(f"Question Vocabulary Size: {vocab.size} \n\n")
    print(f"Train Data Size: {len(train_dataset)}")

    val_dataset = val_loader = None
    if args.val_file:
        val_dataset, _ = make_loader(args.val_file, args.val_img,
                                     samples_only=True)
        print_and_log(
            f"Validation Data Size: {len(val_dataset)}\n"
            f"Validation Accuracy is computed using {args.val_size} samples. "
            f"See --val_size\n", log_file)

    # Pretrained VGG weights (reference main.py:395-398; no silent fallback to
    # a hardcoded path — random init with a notice when absent)
    pretrained_vgg = None
    if args.vgg_wts_path:
        from .models.convert import load_torch_state_dict, vgg11_encoder_from_torchvision
        sd = load_torch_state_dict(args.vgg_wts_path)
        pretrained_vgg = vgg11_encoder_from_torchvision(
            sd, include_head=(args.model != "attention"))
        print_and_log(f"Loaded VGG weights from {args.vgg_wts_path}", log_file)
    elif args.model in ("baseline", "attention"):
        print_and_log("NOTE: no --vgg_wts_path given; VGG starts from random "
                      "init (pretrained download is unavailable here)", log_file)

    # Initialize state from statically-known shapes (no batch decode needed)
    init_batch = _init_shapes(preprocess, vocab.max_seq_length)
    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, rng, init_batch, args.learning_rate,
                               vgg_trainable=args.vgg_train,
                               pretrained_vgg=pretrained_vgg)

    if args.model_ckpt:
        ckpt_path = _resolve_ckpt(args.model_ckpt, log_dir)
        state = load_any(ckpt_path, state, args.model)
        print_and_log(f"Model successfully loaded from {ckpt_path}"
                      "\nResuming Training...", log_file)

    # int8 static-scale calibration (AFTER checkpoint load: scales depend on
    # the weights in use). Reuses the run's int8_calib.json when present so
    # resume/test see identical quantization; otherwise records per-stage
    # activation amax over the first --int8_calib batches of the epoch-0
    # order and bakes them into the model as compile-time constants.
    if model.int8_stages and args.int8_calib > 0:
        from .train.calibrate import calibrate_model, load_calib
        amax = load_calib(log_dir, model.int8_stages)
        if amax is not None:
            model = model.clone(int8_amax=amax)
            print_and_log("int8 calibration: reusing "
                          f"{os.path.join(log_dir, 'int8_calib.json')}",
                          log_file)
        else:
            _, calib_loader = make_loader(args.train_file, args.train_img,
                                          samples=train_dataset)

            def host_batches(n=args.int8_calib, loader=calib_loader):
                # stream (not collect): N full-size uint8 batches would be
                # hundreds of MB of host RAM at b160@448
                it = iter(loader)
                try:
                    for _ in range(n):
                        try:
                            yield next(it)["image"]
                        except StopIteration:
                            return
                finally:
                    it.close()

            model = calibrate_model(args.model, model, state.variables(),
                                    preprocess, host_batches(),
                                    log_dir=log_dir,
                                    log=lambda s: print_and_log(s, log_file))

    # Frozen-tower feature cache: build (or reuse) AFTER checkpoint load so
    # the cache fingerprints the weights actually in use, then create the
    # loaders in feature mode (vqa_tpu.data.feature_cache)
    image_is_features = False
    train_cache = val_cache = None
    if args.cache_features:
        if args.vgg_train:
            raise SystemExit("--cache_features requires a frozen VGG "
                             "(--vgg_train false)")
        if args.bn_mode == "batch":
            raise SystemExit("--cache_features requires running-stats BN: "
                             "batch-stats features are batch-dependent and "
                             "not cacheable (--bn_mode auto|running)")
        from .data.feature_cache import build_or_open
        encode, fingerprint, boundary = _make_feature_encoder(
            args.model, model, state.variables(), preprocess)
        cache_root = args.cache_dir or os.path.join(log_dir, "feature_cache")

        def build_cache(samples):
            return build_or_open(
                cache_root, samples, encode, fingerprint=fingerprint,
                image_size=image_size, dtype=model.dtype, boundary=boundary,
                batch_size=args.batch_size, host_size=host_size,
                num_workers=args.num_workers,
                synthetic_images=args.synthetic_images,
                decode_backend=args.decode_backend,
                log=lambda s: print_and_log(s, log_file))

        # Multi-host note: concurrent builds are SAFE (pid-unique tmp files +
        # atomic publish; the content is deterministic given the weights) but
        # redundant — on a shared cache_root only the last writer's identical
        # bytes survive, on per-host disks every host builds its own copy.
        # No cross-process barrier here by design: a collective that parks
        # N-1 processes for an hours-long build invites distributed-runtime
        # timeouts and deadlocks if the builder dies (the tunnel-OOM hazard).
        # For large multi-host runs, pre-build once with a single-process
        # invocation against the shared --cache_dir; later runs take the
        # reuse path.
        train_cache = build_cache(train_dataset)
        if val_dataset is not None:
            val_cache = build_cache(val_dataset)
        image_is_features = True

    _, train_loader = make_loader(args.train_file, args.train_img,
                                  feature_cache=train_cache,
                                  samples=train_dataset)
    if val_dataset is not None:
        _, val_loader = make_loader(args.val_file, args.val_img,
                                    feature_cache=val_cache,
                                    samples=val_dataset)

    tx = make_optimizer(args.learning_rate, state.params, args.vgg_train)
    bn_batch_stats = {"auto": None, "batch": True, "running": False}[args.bn_mode]
    model_sharded = mesh is not None and (args.model_parallel > 1 or args.fsdp)
    step_shardings = None
    if model_sharded:
        import jax as _jax
        if _jax.process_count() > 1 and args.ckpt_backend == "flax":
            raise SystemExit("multi-host TP/FSDP states are not fully "
                             "addressable: the flax checkpoint backend "
                             "cannot gather them — use --ckpt_backend orbax")
        from .parallel.mesh import batch_sharding
        from .parallel.sharding import shard_state_to_mesh, state_shardings
        tp = args.model_parallel > 1
        step_shardings = (state_shardings(state, mesh, tp=tp, fsdp=args.fsdp),
                          batch_sharding(mesh))
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        raise SystemExit(f"--grad_accum {args.grad_accum} must divide "
                         f"--batch_size {args.batch_size}")
    train_step = make_train_step(model, tx, vgg_trainable=args.vgg_train,
                                 bn_batch_stats=bn_batch_stats,
                                 image_is_features=image_is_features,
                                 shardings=step_shardings,
                                 grad_accum=args.grad_accum)
    eval_step = make_eval_step(model, image_is_features=image_is_features)

    if model_sharded:
        state = shard_state_to_mesh(state, mesh, shardings=step_shardings[0])
    elif mesh is not None:
        state = replicate_to_mesh(state, mesh)

    steps_per_epoch = len(train_loader)
    curr_step = int(state.step)
    # resume: position the data order at the exact batch the restored step
    # points at — the epoch index selects the deterministic (seed, epoch)
    # shuffle and skip_batches fast-forwards past the consumed prefix, so a
    # mid-epoch resume sees the same remaining batches an uninterrupted run
    # would (pipeline.set_epoch; beats the reference's weights-only resume,
    # /root/reference/main.py:168-176, which restarts the data order)
    train_loader.set_epoch(curr_step // max(steps_per_epoch, 1),
                           skip_batches=curr_step % max(steps_per_epoch, 1))
    eta = ETAEstimator(steps_per_epoch, args.num_epochs, start_step=curr_step)

    from .train.checkpoint import AsyncCheckpointer
    from .train.profiling import SyncedRateTracker
    checkpointer = AsyncCheckpointer(backend=args.ckpt_backend)
    timer = SyncedRateTracker(args.batch_size)
    profile_started = profile_done = args.profile_steps <= 0

    guard = None
    if args.preempt_save:
        from .train.preemption import PreemptionGuard
        guard = PreemptionGuard().install()
    preempted = False

    from .data.pipeline import device_prefetch

    def prepare_batch(b):
        return _device_batch(b, preprocess, mesh)

    def _preemption_save():
        # persist the exact position (full TrainState, same artifact as
        # --save_interval saves) and leave cleanly; --model_ckpt latest
        # resumes bit-exactly mid-epoch
        print_and_log(
            f"SIGTERM received: saving checkpoint at step {curr_step} "
            f"to {log_dir} and exiting; resume with --model_ckpt "
            f"latest", log_file)
        checkpointer.save(state, log_dir, curr_step)

    try:
        for epoch in range(args.num_epochs):
            for device_batch in device_prefetch(train_loader, prepare_batch,
                                                depth=args.prefetch_batches):
                # profile a post-warmup window of steps (compile excluded)
                if not profile_started and curr_step >= 3:
                    from jax import profiler as _profiler
                    _profiler.start_trace(log_dir)
                    profile_started = True
                    profile_stop_at = curr_step + args.profile_steps
                if profile_started and not profile_done and curr_step >= profile_stop_at:
                    from jax import profiler as _profiler
                    _profiler.stop_trace()
                    profile_done = True
                    print_and_log(f"profiler trace written to {log_dir}", log_file)

                state, metrics = train_step(state, device_batch)

                if (curr_step + 1) % args.log_interval == 0 or curr_step == 1:
                    loss_val = float(metrics["loss"])   # device sync point
                    timer.mark(curr_step)               # before validation runs
                    if val_loader is not None:
                        vm = compute_validation_metrics(
                            eval_step, state.variables(), iter(val_loader),
                            prepare_batch, args.batch_size, args.val_size)
                        print_and_log(
                            "Validation Accuracy: {:.2f} %  || Validation Loss: {:.4f}"
                            .format(vm["accuracy"], vm["loss"]), log_file)
                        writer.add_scalar("Val/Accuracy", vm["accuracy"], curr_step)
                        writer.add_scalar("Val/Loss", vm["loss"], curr_step)

                    writer.add_scalar("Train/Loss", loss_val, curr_step)
                    writer.add_scalar("Train/QAPairsPerSec", timer.qa_pairs_per_sec,
                                      curr_step)
                    elapsed, left = eta(curr_step)
                    print_and_log(
                        "Epoch [{}/{}], Step [{}/{}], Loss: {:.4f} | time elapsed: "
                        "{:.2f}h | time left: {:.2f}h | {}".format(
                            epoch + 1, args.num_epochs, curr_step + 1, steps_per_epoch,
                            loss_val, elapsed, left, timer.summary()), log_file)

                if (curr_step + 1) % args.save_interval == 0:
                    print(f"Saving the model at the {curr_step + 1} step to "
                          f"directory:{log_dir}")
                    checkpointer.save(state, log_dir, curr_step + 1)

                curr_step += 1

                if guard is not None and guard.triggered:
                    _preemption_save()
                    preempted = True
                    break

            if preempted:
                break

            if guard is not None and guard.triggered:
                # SIGTERM landed after the last step's poll (e.g. during the
                # prefetcher's epoch-end drain): skip the epoch-end
                # validation pass and save immediately
                _preemption_save()
                preempted = True
                break

            if val_loader is not None:
                vm = compute_validation_metrics(
                    eval_step, state.variables(), iter(val_loader),
                    prepare_batch, args.batch_size, len(val_dataset))
                print_and_log(
                    "\nAfter {} epoch:\nValidation Accuracy: {:.2f} %  || "
                    "Validation Loss: {:.4f}\n".format(epoch + 1, vm["accuracy"],
                                                       vm["loss"]), log_file)
    except Exception:
        # A SIGTERM delivered to the whole process group can kill pieces the
        # loop depends on faster than the step-boundary poll runs (the
        # decode workers now ignore SIGTERM, but loaders can still fail for
        # group-signal reasons). If the guard fired, a loader crash must
        # still end in a checkpoint — that is the feature's contract.
        if guard is not None and guard.triggered and not preempted:
            _preemption_save()
            preempted = True
        else:
            raise
    finally:
        if profile_started and not profile_done:
            from jax import profiler as _profiler
            _profiler.stop_trace()
            print_and_log(f"profiler trace written to {log_dir}", log_file)
        checkpointer.wait()
        if guard is not None:
            guard.uninstall()
        writer.close()
        log_file.close()


def test(args, model, vocab, preprocess, make_loader, log_dir, mesh=None):
    """Test/inference mode — implemented (reference raises NotImplementedError).

    Evaluates ``--model_ckpt`` on ``--val_file`` with the reference metric
    definition; optionally writes per-sample predictions to ``--test_out``.
    Shards batches over the data mesh when ``--num_devices`` > 1.
    """
    if not args.val_file:
        raise SystemExit("--mode test requires --val_file")
    if args.cache_features:
        print("NOTE: --cache_features is a training-loop feature; test mode "
              "evaluates each image once and ignores it")
    needs_calib = False
    if model.int8_stages:
        # evaluation must quantize exactly like training did: reuse the
        # run's calibrated static scales when the sidecar exists
        from .train.calibrate import load_calib
        amax = load_calib(log_dir, model.int8_stages)
        if amax is not None:
            model = model.clone(int8_amax=amax)
            print(f"int8 calibration: loaded static scales from {log_dir}")
        elif args.int8_calib > 0:
            # no sidecar (e.g. PTQ of a bf16-trained checkpoint): calibrate
            # on the first --int8_calib eval batches after the weights load
            needs_calib = True
        else:
            print("NOTE: no int8_calib.json in the run dir; int8 stages use "
                  "dynamic per-batch activation scales (batch-dependent)")
    # full-set evaluation: keep the final partial batch (one extra compile)
    dataset, loader = make_loader(args.val_file, args.val_img, shuffle=False,
                                  drop_last=False)

    if args.model_ckpt:
        # params-only restore: immune to the optimizer structure the
        # checkpoint was trained with (frozen vs trainable VGG)
        from .train.checkpoint import load_params_only

        ckpt_path = _resolve_ckpt(args.model_ckpt, log_dir)
        params, batch_stats = load_params_only(ckpt_path, args.model)
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
        if batch_stats:
            variables["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, batch_stats)
        print(f"Model loaded from {ckpt_path}")
    else:
        print("WARNING: no --model_ckpt given; evaluating a randomly "
              "initialized model")
        init_batch = _init_shapes(preprocess, vocab.max_seq_length)
        state = create_train_state(model, jax.random.PRNGKey(args.seed),
                                   init_batch, args.learning_rate,
                                   vgg_trainable=False)
        variables = state.variables()

    if needs_calib:
        # post-training quantization of a checkpoint trained without int8:
        # calibrate static per-channel scales on the eval distribution (the
        # standard PTQ deployment recipe). Not persisted — the sidecar
        # contract belongs to the training run that owns log_dir.
        from .train.calibrate import calibrate_model
        _, calib_loader = make_loader(args.val_file, args.val_img,
                                      shuffle=False, drop_last=False)

        def host_batches(n=args.int8_calib, loader=calib_loader):
            it = iter(loader)
            try:
                for _ in range(n):
                    try:
                        yield next(it)["image"]
                    except StopIteration:
                        return
            finally:
                it.close()

        model = calibrate_model(args.model, model, variables, preprocess,
                                host_batches(), log_dir=None)

    eval_step = make_eval_step(model)
    if mesh is not None:
        from .parallel.mesh import replicated_sharding
        variables = jax.device_put(variables, replicated_sharding(mesh))

    num_correct = 0
    total = 0
    loss_sum = 0.0
    predictions = []
    for batch in loader:
        # mesh sharding needs a leading axis divisible by the device count;
        # pad the final partial batch and weight metrics by the real count
        padded, n = _pad_to_multiple(batch, mesh.size if mesh is not None else 1)
        device_batch = _device_batch(padded, preprocess, mesh)
        m = eval_step(variables, device_batch)
        preds = np.asarray(m["pred"])[:n]
        labels = np.asarray(batch["label"])[:n]
        num_correct += int((preds == labels).sum())
        # sample-weighted loss: sum per-sample CE over valid rows so the
        # final partial batch counts by its size, exactly like accuracy
        loss_sum += float(np.asarray(m["loss_per"])[:n].sum())
        total += n
        if args.test_out:
            predictions.extend(vocab.idx2label[int(p)] for p in preds)

    accuracy = 100.0 * num_correct / max(total, 1)
    print(f"Test Accuracy: {accuracy:.2f} %  || Test Loss: {loss_sum / max(total, 1):.4f} "
          f"({total} samples)")

    if args.test_out:
        with open(args.test_out, "w") as f:
            if args.test_out_format == "vqa":
                # official evaluation format (datahelper.VQA.loadRes,
                # /root/reference/datahelper.py:149-183): one record per
                # --val_file line, question_id = its 0-based line index
                # (the loader runs unshuffled with drop_last=False, so
                # prediction order IS file order)
                import json
                json.dump([{"question_id": i, "answer": p}
                           for i, p in enumerate(predictions)], f)
            else:
                for pred in predictions:
                    f.write(pred + "\n")
        print(f"Predictions written to {args.test_out}")


if __name__ == "__main__":
    main()
