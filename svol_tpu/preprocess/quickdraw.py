"""QuickDraw sketch rasterization (ports of preprocess/quickdraw_*.py).

Three renderers producing 224x224 PNG sketches on white:
  * ``bitmaps_to_png``: the 28x28 numpy-bitmap release, inverted and
    upsampled (quickdraw_array_to_pil.py:13-37), with the reference's class
    renames (motorbike -> motorcycle, sea turtle -> turtle).
  * ``strokes_to_line_png``: the raw stroke-JSON release drawn as polylines
    (quickdraw_generate_image_with_lines.py:27-49) — here with cv2.line on a
    numpy canvas instead of a matplotlib figure per sketch (orders of
    magnitude faster, no GUI deps).
  * ``strokes_to_dot_png``: dot rasterization with square padding
    (quickdraw_generate_image_with_dots.py:24-60), vectorized.

CLI:  python -m svol_tpu.preprocess.quickdraw bitmaps --root ... --samples 1000
"""
from __future__ import annotations

import argparse
import json
import os
import random
from typing import Iterable, Sequence

import numpy as np

# QuickDraw categories shared with ImageNet-VID (quickdraw_array_to_pil.py:13-17)
QUICKDRAW_AND_IMAGENET = [
    "airplane", "bear", "bicycle", "bird", "bus", "car", "cat", "cow", "dog",
    "elephant", "horse", "lion", "monkey", "motorbike", "panda", "rabbit",
    "sheep", "snake", "squirrel", "tiger", "train", "sea turtle", "whale",
    "zebra",
]
RENAMES = {"motorbike": "motorcycle", "sea turtle": "turtle"}


def _save_png(path: str, img: np.ndarray) -> None:
    import cv2

    cv2.imwrite(path, img)


def bitmaps_to_png(root_dir: str, sample_size: int = 1000, seed: int = 0,
                   categories: Sequence[str] = QUICKDRAW_AND_IMAGENET) -> int:
    """.npy 28x28 bitmaps -> inverted 224^2 PNGs, ``sample_size`` per class."""
    import cv2

    data_dir = os.path.join(root_dir, "full", "numpy_bitmap")
    save_dir = os.path.join(root_dir, "images")
    rng = random.Random(seed)
    n_written = 0
    for category in categories:
        save_as = RENAMES.get(category, category)
        out_dir = os.path.join(save_dir, save_as)
        os.makedirs(out_dir, exist_ok=True)
        arr = np.load(os.path.join(data_dir, category + ".npy"))
        idxs = rng.sample(range(arr.shape[0]), min(sample_size, arr.shape[0]))
        for i, sample in enumerate(arr[idxs]):
            img = 255 - sample.reshape(28, 28)  # black strokes on white
            img = cv2.resize(img, (224, 224), interpolation=cv2.INTER_CUBIC)
            _save_png(os.path.join(out_dir, f"{save_as}_{i}.png"), img)
            n_written += 1
    return n_written


def render_strokes_lines(drawing: Iterable[Sequence[Sequence[int]]],
                         size: int = 224, thickness: int = 2) -> np.ndarray:
    """Rasterize one stroke list [[xs, ys, (ts)], ...] as black polylines on
    white, fit to the canvas with a small margin."""
    import cv2

    xs = np.concatenate([np.asarray(s[0], float) for s in drawing])
    ys = np.concatenate([np.asarray(s[1], float) for s in drawing])
    x0, y0 = xs.min(), ys.min()
    span = max(xs.max() - x0, ys.max() - y0, 1.0)
    margin = 0.05 * size
    scale = (size - 2 * margin) / span

    canvas = np.full((size, size), 255, np.uint8)
    for stroke in drawing:
        pts = np.stack([
            (np.asarray(stroke[0], float) - x0) * scale + margin,
            (np.asarray(stroke[1], float) - y0) * scale + margin,
        ], axis=1).astype(np.int32)
        cv2.polylines(canvas, [pts], isClosed=False, color=0,
                      thickness=thickness, lineType=cv2.LINE_AA)
    return canvas


def render_strokes_dots(drawing: Iterable[Sequence[Sequence[int]]],
                        size: int = 224, pad: int = 5) -> np.ndarray:
    """Dot rasterization: each recorded coordinate becomes a (2*pad) square
    (quickdraw_generate_image_with_dots.py semantics, vectorized)."""
    import cv2

    xs = np.concatenate([np.asarray(s[0], int) for s in drawing])
    ys = np.concatenate([np.asarray(s[1], int) for s in drawing])
    coords = np.unique(np.stack([xs, ys], 1), axis=0)
    x0, y0 = coords[:, 0].min(), coords[:, 1].min()
    w = coords[:, 0].max() - x0 + pad
    h = coords[:, 1].max() - y0 + pad
    canvas = np.full((h, w), 255, np.uint8)
    for dx in range(-pad + 1, pad):
        for dy in range(-pad + 1, pad):
            r = np.clip(coords[:, 1] - y0 - 1 + dy, 0, h - 1)
            c = np.clip(coords[:, 0] - x0 - 1 + dx, 0, w - 1)
            canvas[r, c] = 0
    return cv2.resize(canvas, (size, size), interpolation=cv2.INTER_LANCZOS4)


def strokes_file_to_pngs(ndjson_path: str, out_dir: str, style: str = "lines",
                         max_per_class: int = 1000) -> int:
    """Render one QuickDraw .ndjson raw file (skipping unrecognized sketches,
    quickdraw_generate_image_with_lines.py:29)."""
    category = os.path.basename(ndjson_path)[:-len(".ndjson")]
    save_as = RENAMES.get(category, category)
    dst = os.path.join(out_dir, save_as)
    os.makedirs(dst, exist_ok=True)
    render = render_strokes_lines if style == "lines" else render_strokes_dots
    count = 0
    with open(ndjson_path) as f:
        for line in f:
            row = json.loads(line)
            if not row.get("recognized", True):
                continue
            count += 1
            img = render(row["drawing"])
            _save_png(os.path.join(dst, f"{save_as}{count:04d}.png"), img)
            if count >= max_per_class:
                break
    return count


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="QuickDraw rasterizers")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("bitmaps")
    b.add_argument("--root", required=True)
    b.add_argument("--samples", type=int, default=1000)
    s = sub.add_parser("strokes")
    s.add_argument("--ndjson", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--style", choices=["lines", "dots"], default="lines")
    s.add_argument("--max_per_class", type=int, default=1000)
    args = p.parse_args(argv)
    if args.cmd == "bitmaps":
        n = bitmaps_to_png(args.root, args.samples)
    else:
        n = strokes_file_to_pngs(args.ndjson, args.out, args.style, args.max_per_class)
    print(f"wrote {n} sketches")


if __name__ == "__main__":
    main()
