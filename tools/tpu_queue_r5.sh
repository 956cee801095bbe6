#!/bin/bash
# Round-5 TPU work queue — the repeatable recipe behind the r5-session
# BASELINE.md rows (parallelism + grad-accum + orbax session). Each step is
# independently resumable.
#
#   bash tools/tpu_queue_r5.sh probe      # tunnel health (fast)
#   bash tools/tpu_queue_r5.sh bench      # headline bench, default path
#   bash tools/tpu_queue_r5.sh ga160      # grad-accum cost at split microbatch
#   bash tools/tpu_queue_r5.sh ga320      # grad-accum at matched microbatch
#   bash tools/tpu_queue_r5.sh dryrun     # dp+tp+sp+fsdp on the 8-dev CPU mesh
#   bash tools/tpu_queue_r5.sh tp_suite   # TP/SP/FSDP + orbax test files (CPU)
#
# Gotcha reproduced this session: a NEW microbatch shape (b80@448, from
# BENCH_GRAD_ACCUM=2 at BENCH_BATCH=160) took >15 min of tunnel compile — the
# late-r4 compile ballooning. Budget 2300s+ for any first-compile of a new
# shape; bench.py streams a JSON line per completed window either way.
set -u
cd /root/repo

case "${1:-}" in
  probe)
    timeout 240 python -c "import jax,jax.numpy as jnp; print('tunnel ok:', float(jnp.ones((8,8)).sum()))"
    ;;
  bench)
    timeout 900 python bench.py
    ;;
  ga160)
    BENCH_GRAD_ACCUM=2 BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    ;;
  ga320)
    BENCH_BATCH=320 BENCH_GRAD_ACCUM=2 BENCH_WINDOWS=2 BENCH_BUDGET_S=2300 \
      timeout 2400 python bench.py
    ;;
  dryrun)
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 900 python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    ;;
  tp_suite)
    timeout 3600 python -m pytest tests/test_parallel_tp.py \
      tests/test_checkpoint.py tests/test_parallel.py -q
    ;;
  *)
    grep '^#   bash' "$0"
    ;;
esac
