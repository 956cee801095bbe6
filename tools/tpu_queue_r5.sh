#!/bin/bash
# Round-5 TPU work queue — the repeatable recipe behind the r5 BASELINE.md
# rows (device profile + stem phase-conv + gates). Each step is
# independently resumable.
#
#   bash tools/tpu_queue_r5.sh probe        # tunnel health (fast)
#   bash tools/tpu_queue_r5.sh bench        # headline bench, default path
#   bash tools/tpu_queue_r5.sh profile      # per-kernel device profile + roofline
#   bash tools/tpu_queue_r5.sh ab_conv1     # step-level A/B: pallas vs xla_phase conv1
#   bash tools/tpu_queue_r5.sh ga_quiet     # grad-accum cost A/B (run on a QUIET host)
#   bash tools/tpu_queue_r5.sh newshape     # cache check: new-shape bench twice
#   bash tools/tpu_queue_r5.sh mesh1        # 1-D + 2-D (1,1) mesh through real Mosaic
#   bash tools/tpu_queue_r5.sh dryrun       # dp+tp+sp+fsdp on the 8-dev CPU mesh
#   bash tools/tpu_queue_r5.sh tp_suite     # TP/SP/FSDP + orbax test files (CPU)
#   bash tools/tpu_queue_r5.sh gpdata       # K=144 gridpair gate datasets (CPU)
#   bash tools/tpu_queue_r5.sh gptrain      # 12-ep bf16 ckpt, 1000-wide head
#   bash tools/tpu_queue_r5.sh gpgates      # PTQ drift gates on the fresh 5k val
#   bash tools/tpu_queue_r5.sh aot          # AOT export round-trip on-chip
#
# Compile-time rules learned r4/r5:
# - a NEW shape's first compile can take 15-25+ min through the tunnel;
#   budget 2300s+ (BENCH_BUDGET_S=2300, timeout 2400) for any first run.
#   bench.py prints a flushed "# compiling ..." line before the warmup so a
#   budget kill is diagnosable, and streams a JSON line per window.
# - the axon tunnel caches compiles SERVER-side across processes (measured
#   r5: 89.2s first process, 1.58s second, same shape); the client-side
#   JAX_COMPILATION_CACHE_DIR (~/.cache/vqa_tpu default) fills only where
#   compilation is local (CPU/real TPU hosts) — keep both.
# - do NOT time against the chip while heavy CPU work (the test suite)
#   shares this 1-core host: r5's first grad-accum rows were contaminated.
set -u
cd /root/repo

case "${1:-}" in
  probe)
    timeout 240 python -c "import jax,jax.numpy as jnp; print('tunnel ok:', float(jnp.ones((8,8)).sum()))"
    ;;
  bench)
    BENCH_BUDGET_S=2300 timeout 2400 python bench.py
    ;;
  profile)
    timeout 2400 python tools/profile_headline.py
    ;;
  ab_conv1)
    echo "=== conv1 pallas (r3-r4 kernel) ==="
    VQA_STEM_CONV1=pallas BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    echo "=== conv1 xla_phase (r5) ==="
    VQA_STEM_CONV1=xla_phase BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    ;;
  ga_quiet)
    echo "=== b320 monolithic ==="
    BENCH_BATCH=320 BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    echo "=== b320 ga=2 (same microbatch count as b160 headline) ==="
    BENCH_BATCH=320 BENCH_GRAD_ACCUM=2 BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    ;;
  newshape)
    # item-3 verification: a deliberately-new shape twice; the second
    # process must start its first window without the big compile
    for i in 1 2; do
      echo "=== invocation $i ==="
      BENCH_MODEL=baseline BENCH_BATCH=88 BENCH_STEPS=10 BENCH_WINDOWS=1 \
        BENCH_BUDGET_S=2300 timeout 2400 python bench.py
    done
    ;;
  mesh1)
    # 2-D tp+sp+fsdp rules through REAL Mosaic on the one chip (1,1 mesh)
    timeout 2400 python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(1)"
    ;;
  dryrun)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 900 python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    ;;
  tp_suite)
    timeout 3600 python -m pytest tests/test_parallel_tp.py \
      tests/test_checkpoint.py tests/test_parallel.py -q
    ;;
  gpdata)
    # production-head-width gate datasets (r4-VERDICT item 7): K=144
    # genuine classes trained into a --num_cls 1000 head
    JAX_PLATFORMS=cpu python tools/make_synth_dataset.py \
      --out_dir /tmp/gridpair --task gridpair --n_train 10000 --n_val 2000
    JAX_PLATFORMS=cpu python tools/make_synth_dataset.py \
      --out_dir /tmp/gridpair5k --task gridpair --n_train 100 --n_val 5000 \
      --seed 1234
    ;;
  gptrain)
    # 12-ep bf16 drift-gate checkpoint at the production head width
    timeout 7200 python tools/run_accuracy.py --framework tpu \
      --data_dir /tmp/gridpair --model attention --num_cls 1000 \
      --epochs 12 --batch_size 32 --lr 5e-4 --opt_lvl 1 --int8 false \
      --host_size 224 --run_name gp12_bf16 --save_interval 3744
    ;;
  gpi8)
    # int8-full-default training trajectory at the production head width
    # (the r4 i8train pattern on gridpair; resume to epoch 24 with a second
    # --model_ckpt latest leg, compare vs the bf16 legs' 21.9% @24)
    timeout 4800 python tools/run_accuracy.py --framework tpu \
      --data_dir /tmp/gridpair --model attention --num_cls 1000 \
      --epochs 12 --batch_size 32 --lr 5e-4 --opt_lvl 1 --int8 true \
      --host_size 224 --run_name gp12_i8 --save_interval 3744
    ;;
  aot)
    # AOT export/serve round-trip on the real chip (Mosaic custom calls
    # through serialize/deserialize; numerics vs the live predictor)
    timeout 2400 python tools/exp_aot_tpu.py
    ;;
  gpgates)
    # PTQ drift gates on the fresh 5k val (seed 1234), K=1000 head
    # the r5 run: 5 x 12-epoch --model_ckpt latest legs -> epoch 60
    GPCKPT=/tmp/gridpair/expts/acc/gp12_bf16/model_18720.ckpt
    for leg in "gp_bf16|--int8_backbone false" \
               "gp_int8|--int8_backbone true --int8_calib 8" \
               "gp_fp32|--opt_lvl 0 --int8_backbone false"; do
      tag="${leg%%|*}"; extra="${leg#*|}"
      echo "=== $tag ==="
      timeout 2400 python -m vqa_tpu.main --mode test --model attention \
        --expt_dir /tmp/gp_eval5k --expt_name e --run_name "$tag" \
        --model_ckpt "$GPCKPT" \
        --train_img /tmp/gridpair/imgs --train_file /tmp/gridpair/train.txt \
        --val_img /tmp/gridpair5k/imgs --val_file /tmp/gridpair5k/val.txt \
        --vocab_file /tmp/gridpair/vocab.pkl \
        --val_size 5000 --batch_size 32 --host_size 224 --num_cls 1000 \
        $extra 2>&1 | tail -4
    done
    ;;
  *)
    grep '^#   bash' "$0"
    ;;
esac
