#!/bin/bash
# Round-3 (cont.) TPU work queue — run when the tunnel recovers.
# Each step is independently resumable; outputs land in /tmp/r3c_*.log.
#
#   bash tools/tpu_queue_r3c.sh probe   # tunnel health (fast)
#   bash tools/tpu_queue_r3c.sh fuse    # exp_fuse01 measurement
#   bash tools/tpu_queue_r3c.sh bench   # headline bench (default path)
#   bash tools/tpu_queue_r3c.sh conv7   # PTQ drift gate for the conv7 ext
set -u
cd /root/repo

D=/tmp/gridvqa6
CKPT=$D/expts/acc/conv12_bf16/model_3744.ckpt

ptq_eval() {  # $1=run tag, $2=--int8_stages value (or "none"), $3=extra flags
  local tag=$1 stages=$2 extra="${3:-}"
  if [ "$stages" = "none" ]; then extra="--int8_backbone false $extra";
  else extra="--int8_backbone true --int8_stages $stages --int8_calib 8 $extra"; fi
  timeout 2400 python -m vqa_tpu.main --mode test --model attention \
    --expt_dir /tmp/ptq_eval --expt_name e --run_name "$tag" \
    --model_ckpt "$CKPT" \
    --train_img $D/imgs --train_file $D/train.txt \
    --val_img $D/imgs --val_file $D/val.txt \
    --vocab_file $D/vocab.pkl \
    --val_size 2000 --batch_size 32 --host_size 224 --num_cls 12 \
    $extra 2>&1 | tail -6
}

case "${1:-all}" in
  probe)
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,8)); print('tunnel OK', float((x@x).sum()))" ;;
  fuse)
    timeout 1800 python tools/exp_fuse01.py 2>&1 | tee /tmp/r3c_fuse.log | tail -3 ;;
  ab)
    timeout 2400 python tools/exp_stem_handoff.py 2>&1 | tee /tmp/r3c_ab.log | tail -2 ;;
  bench)
    timeout 1800 python bench.py 2>&1 | tee /tmp/r3c_bench.log | tail -2 ;;
  bench_eval)
    BENCH_MODE=eval timeout 1800 python bench.py 2>&1 | tee /tmp/r3c_bench_eval.log | tail -2 ;;
  drift)
    # PTQ drift gate for the NEW default numerics (fused stem + int8
    # handoffs) vs the recorded unfused band (90.30-90.55, BASELINE.md):
    # same checkpoint, same 2000 samples. Control leg reproduces the
    # unfused chain for same-process comparability.
    ptq_eval i8_fs_ho "0,1,2,3,4,5,6" | tee /tmp/r3c_drift_new.log
    ptq_eval i8_unfused "0,1,2,3,4,5,6" \
      "--fused_stem false --int8_handoff false" | tee /tmp/r3c_drift_ctl.log ;;
  conv7)
    # the conv7 int8 extension row (gate pending since the r3 tunnel wedge)
    ptq_eval i8_ext_017 "0,1,2,3,4,5,6,7" | tee /tmp/r3c_conv7_ext.log ;;
  *)
    echo "usage: $0 {probe|fuse|bench|bench_eval|conv7}" ;;
esac
