#!/bin/bash
# TU-Berlin training recipe (reference train_tu_berlin.sh:13-30: 20k iters,
# lr drop @6k, val every 400, otherwise identical to quickdraw).
set -e

root=${SVOL_ROOT:-data/svol}
anno_root=${SVOL_ANNO_ROOT:-data/svol/annos}

python -m svol_tpu.cli.train \
  --root "${root}" \
  --anno_root "${anno_root}" \
  --video_dataset imagenet_vid \
  --sketch_dataset tu_berlin \
  --num_iters 20000 \
  --lr_drop_step 6000 \
  --log_interval 100 \
  --val_interval 400 \
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
