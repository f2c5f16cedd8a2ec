"""svol_tpu — TPU-native sketch-based video object localization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of sangminwoo/SVOL
(arXiv:2304.00450): given a query sketch and a video clip, predict a bounding
box for the sketched object in every frame, DETR-style (set prediction with
Hungarian matching and L1/GIoU/CE losses).

Design stance (vs. the PyTorch reference at /root/reference):
  * dataclass configs instead of an import-time argparse global
    (reference: lib/configs.py:179)
  * static shapes everywhere: ragged per-frame target lists are densified to
    ``[T, K, 4]`` boxes + validity masks so the whole train/eval step jits
  * the Hungarian matcher runs *on device*, batched over frames
    (reference round-trips to scipy on CPU every step, lib/modeling/matcher.py:86)
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding instead of
    apex DDP/NCCL (reference: train.py:124)
  * bf16 compute policy instead of apex AMP (reference: train.py:111)
  * Orbax checkpoints instead of torch.save (reference: train.py:267-284)
"""

__version__ = "0.1.0"
