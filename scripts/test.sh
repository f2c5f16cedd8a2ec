#!/bin/bash
# Evaluation recipe (reference test.sh:13-27: eval_bs=1, best checkpoint,
# per-frame JSONL results).
set -e

root=${SVOL_ROOT:-data/svol}
anno_root=${SVOL_ANNO_ROOT:-data/svol/annos}
sketch_dataset=${SKETCH_DATASET:-quickdraw}
ckpt_dir=${CKPT_DIR:-./save}

resume=${ckpt_dir}/best_model_imagenet_vid_${sketch_dataset}_svanet_resnet_2l_32f_320q_5_1_2

python -m svol_tpu.cli.infer \
  --root "${root}" \
  --anno_root "${anno_root}" \
  --video_dataset imagenet_vid \
  --sketch_dataset "${sketch_dataset}" \
  --eval_bs 1 \
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
  --resume "${resume}" \
  "$@"
