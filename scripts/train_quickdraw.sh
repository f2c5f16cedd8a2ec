#!/bin/bash
# QuickDraw training recipe (hyperparameters from the reference
# train_quickdraw.sh:13-30: 100k iters, lr drop @30k, T=32, 2 layers,
# 320 queries, costs 5/1/2, resnet backbone, svanet head, per-frame matcher).
# On TPU there is no torchrun/process-per-device: one process drives the
# whole mesh; data parallelism comes from the jit sharding.
set -e

root=${SVOL_ROOT:-data/svol}
anno_root=${SVOL_ANNO_ROOT:-data/svol/annos}

python -m svol_tpu.cli.train \
  --root "${root}" \
  --anno_root "${anno_root}" \
  --video_dataset imagenet_vid \
  --sketch_dataset quickdraw \
  --num_iters 100000 \
  --lr_drop_step 30000 \
  --log_interval 100 \
  --val_interval 2000 \
  --early_stop_patience 10 \
  --bs 16 \
  --lr 1e-4 \
  --num_layers 2 \
  --num_frames 32 \
  --num_queries 320 \
  --num_queries_per_frame 10 \
  --set_cost_bbox 5 \
  --set_cost_giou 1 \
  --set_cost_class 2 \
  --sketch_head svanet \
  --backbone resnet \
  --matcher per_frame_matcher \
  "$@"
