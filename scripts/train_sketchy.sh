#!/bin/bash
# Sketchy training recipe (reference train_sketchy.sh:13-30: 50k iters,
# lr drop @30k, otherwise identical to quickdraw).
set -e

root=${SVOL_ROOT:-data/svol}
anno_root=${SVOL_ANNO_ROOT:-data/svol/annos}

python -m svol_tpu.cli.train \
  --root "${root}" \
  --anno_root "${anno_root}" \
  --video_dataset imagenet_vid \
  --sketch_dataset sketchy \
  --num_iters 50000 \
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
