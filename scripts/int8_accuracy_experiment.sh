#!/bin/bash
# int8 accuracy-delta experiment: train a small real model on the synthetic
# fixture (TPU), then eval the same checkpoint float vs --quantize int8.
set -x
ROOT=/tmp/svol_acc_fixture
CKPT=/tmp/acc_ckpt
rm -rf $ROOT $CKPT /tmp/acc_logs /tmp/acc_res_f /tmp/acc_res_q
python -c "
from svol_tpu.data.synthetic import generate_synthetic_dataset
generate_synthetic_dataset('$ROOT', videos_per_category=4, frames_per_video=12, image_hw=(320, 240))
"
COMMON="--root $ROOT --anno_root $ROOT/annos --sketch_dataset sketchy \
  --num_frames 8 --num_queries 80 --num_queries_per_frame 10 --image_size 224 \
  --bs 8 --eval_bs 4 --num_workers 1 --loader_backend threads \
  --log_dir /tmp/acc_logs --checkpoint $CKPT"
python -m svol_tpu.cli.train $COMMON --num_iters 400 --val_interval 10000 \
  --log_interval 50 --save_interval 200 --early_stop_patience -1 \
  --results_dir /tmp/acc_res_f || exit 1
LATEST=$(python -c "from svol_tpu.train.checkpoints import find_latest_checkpoint; print(find_latest_checkpoint('$CKPT'))")
echo "LATEST=$LATEST"
python -m svol_tpu.cli.infer $COMMON --resume "$LATEST" --results_dir /tmp/acc_res_f 2>&1 | grep -E "mIoU|mAP|R@|R1" | tail -8
python -m svol_tpu.cli.infer $COMMON --resume "$LATEST" --results_dir /tmp/acc_res_q --quantize int8 2>&1 | grep -E "mIoU|mAP|R@|R1" | tail -8
# static-scale variant (calibrated on the first 4 eval batches)
python -m svol_tpu.cli.infer $COMMON --resume "$LATEST" --results_dir /tmp/acc_res_qs \
  --quantize int8 --calibration_batches 4 2>&1 | grep -E "mIoU|mAP|R@|R1" | tail -8
