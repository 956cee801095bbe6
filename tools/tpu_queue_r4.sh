#!/bin/bash
# Round-4 TPU work queue — the repeatable recipe behind the r4 BASELINE.md
# rows. Each step is independently resumable; outputs land in /tmp/r4_*.log.
#
#   bash tools/tpu_queue_r4.sh probe      # tunnel health (fast)
#   bash tools/tpu_queue_r4.sh data       # regenerate the K=12 grid datasets
#   bash tools/tpu_queue_r4.sh retrain    # 12-ep bf16 drift-gate checkpoint
#   bash tools/tpu_queue_r4.sh baseline   # 12-ep baseline anchor checkpoint
#   bash tools/tpu_queue_r4.sh epi        # wpool A/B (r4 conv push)
#   bash tools/tpu_queue_r4.sh bblk       # multi-sample grid-block probe
#   bash tools/tpu_queue_r4.sh gates5k    # PTQ drift gates on the 5k val set
#   bash tools/tpu_queue_r4.sh anchor     # torch reference scores the ckpts
#   bash tools/tpu_queue_r4.sh i8train    # 12-ep train at the full r4 default
#   bash tools/tpu_queue_r4.sh bench      # headline bench (default path)
set -u
cd /root/repo

D=/tmp/gridvqa6
V5=/tmp/gridval5k
CKPT=$D/expts/acc/conv12_bf16/model_3744.ckpt
BCKPT=$D/expts/acc/base12_bf16/model_3744.ckpt

ptq_eval5k() {  # $1=run tag, $2=extra flags
  local tag=$1 extra="${2:-}"
  timeout 2400 python -m vqa_tpu.main --mode test --model attention \
    --expt_dir /tmp/ptq_eval5k --expt_name e --run_name "$tag" \
    --model_ckpt "$CKPT" \
    --train_img $D/imgs --train_file $D/train.txt \
    --val_img $V5/imgs --val_file $V5/val.txt --vocab_file $D/vocab.pkl \
    --val_size 5000 --batch_size 32 --host_size 224 --num_cls 12 \
    $extra 2>&1 | tail -4
}

case "${1:-probe}" in
  probe)
    timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8,8)); print('tunnel OK', float((x@x).sum()))" ;;
  data)
    python tools/make_synth_dataset.py --out_dir $D --task grid --grid_n 2 \
      --n_colors 12 --noise 25 --cell_fill 0.7
    python tools/make_synth_dataset.py --out_dir $V5 --task grid --grid_n 2 \
      --n_colors 12 --noise 25 --cell_fill 0.7 --seed 1234 \
      --n_train 100 --n_val 5000 ;;
  retrain)
    # reproduces 90.52 / 0.269 bit-exactly (3 independent sessions so far)
    timeout 4800 python tools/run_accuracy.py --framework tpu --data_dir $D \
      --model attention --num_cls 12 --epochs 12 --batch_size 32 --lr 5e-4 \
      --opt_lvl 1 --int8 false --host_size 224 --run_name conv12_bf16 \
      --save_interval 3744 ;;
  baseline)
    timeout 4800 python tools/run_accuracy.py --framework tpu --data_dir $D \
      --model baseline --num_cls 12 --epochs 12 --batch_size 32 --lr 5e-4 \
      --opt_lvl 1 --int8 false --run_name base12_bf16 --save_interval 3744 ;;
  epi)
    timeout 2400 python tools/exp_r4_epi.py 2>&1 | tee /tmp/r4_epi.log | tail -2 ;;
  bblk)
    timeout 2400 python tools/exp_r4_bblk.py 2>&1 | tee /tmp/r4_bblk.log | tail -2 ;;
  gates5k)
    ptq_eval5k bf16 "--int8_backbone false" | tee /tmp/r4_gate_bf16.log
    ptq_eval5k int8_default "--int8_backbone true --int8_calib 8" \
      | tee /tmp/r4_gate_int8.log
    ptq_eval5k fp32 "--opt_lvl 0 --int8_backbone false" | tee /tmp/r4_gate_fp32.log ;;
  anchor)
    timeout 2400 python -m vqa_tpu.main --mode test --model baseline \
      --expt_dir /tmp/ptq_eval5k --expt_name e --run_name base_bf16 \
      --model_ckpt "$BCKPT" \
      --train_img $D/imgs --train_file $D/train.txt \
      --val_img $D/imgs --val_file $D/val.txt --vocab_file $D/vocab.pkl \
      --val_size 2000 --batch_size 32 --num_cls 12 --int8_backbone false \
      2>&1 | tail -4
    timeout 7200 python tools/ref_eval_ckpt.py --data_dir $D --ckpt "$BCKPT" \
      --model baseline --num_cls 12 2>&1 | tail -4 ;;
  i8train)
    timeout 4800 python tools/run_accuracy.py --framework tpu --data_dir $D \
      --model attention --num_cls 12 --epochs 12 --batch_size 32 --lr 5e-4 \
      --opt_lvl 1 --int8 true --host_size 224 --run_name conv12_i8_r4 \
      --save_interval 3744 ;;
  bench)
    timeout 1800 python bench.py 2>&1 | tail -3 ;;
  *)
    echo "usage: $0 {probe|data|retrain|baseline|epi|bblk|gates5k|anchor|i8train|bench}" ;;
esac
