"""Frame-directory probe: uniformly sample and decode frames from one clip.

Port of the reference's probe helper ``preprocess/frame_dataset.py:1-34``
(a torch Dataset that rglobs ``*.JPEG`` under a directory, uniform-samples
``frame`` of them with the same round(i * stride) rule as the main dataset,
and loads them) — reimplemented without torch: plain numpy + cv2, returning
one (N, H, W, 3) uint8 array. Useful for eyeballing a clip directory layout
before running the full pipeline.

CLI:  python -m svol_tpu.preprocess.frame_probe <dir> [--frames 64]
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np


def list_frames(root: str, num_frames: int = 64) -> List[Path]:
    """Sorted *.JPEG files under ``root``, uniform-sampled to ``num_frames``
    when there are at least that many (frame_dataset.py:16-19)."""
    files = sorted(Path(root).rglob("*.JPEG"))
    if len(files) >= num_frames:
        stride = len(files) / num_frames
        files = [files[round(i * stride)] for i in range(num_frames)]
    return files


def load_frames(
    root: str, num_frames: int = 64, size: Optional[int] = None
) -> np.ndarray:
    """Decode the sampled frames to one (N, H, W, 3) uint8 RGB array
    (the reference stacks them via a DataLoader batch, frame_dataset.py:29-35);
    pass ``size`` to resize square."""
    import cv2

    frames = []
    for p in list_frames(root, num_frames):
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(p)
        if size is not None:
            img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="probe a clip directory")
    p.add_argument("root")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--size", type=int, default=None)
    args = p.parse_args(argv)
    arr = load_frames(args.root, args.frames, args.size)
    print(arr.shape, arr.dtype)


if __name__ == "__main__":
    main()
