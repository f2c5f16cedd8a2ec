"""Synthetic fixture dataset generator.

Writes a miniature dataset with the exact on-disk layout the loader expects
(ImageNet-VID-style JPEG frame folders + annotation JSON, sketch PNG folders,
class->video / class->sketch split JSONs, val pair CSVs), so the complete
pipeline — file IO, decode, sampling, densification, eval JSONL — runs in
tests and benchmarks without the real corpora (SURVEY.md §4: fixed-seed
fixture datasets).

Videos are moving colored rectangles; the "sketch" for a category is a fixed
line-drawn glyph. The box annotations track the rectangles exactly, so a
perfect model could reach 100 mIoU.
"""
from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Sequence, Tuple

import numpy as np

CATEGORIES = ["airplane", "bear", "bicycle", "car"]


def _draw_rect(img: np.ndarray, x0: int, y0: int, x1: int, y1: int, color) -> None:
    img[y0:y1, x0:x1] = color


def _glyph(category: str, size: int = 224) -> np.ndarray:
    """Deterministic per-category line drawing on white."""
    img = np.full((size, size, 3), 255, np.uint8)
    rng = random.Random(category)
    for _ in range(6):
        x0, y0 = rng.randrange(size // 2), rng.randrange(size // 2)
        x1, y1 = x0 + rng.randrange(10, size // 2), y0 + rng.randrange(10, size // 2)
        img[y0:y1, x0 : x0 + 3] = 0
        img[y0 : y0 + 3, x0:x1] = 0
    return img


def generate_synthetic_dataset(
    root: str,
    categories: Sequence[str] = CATEGORIES,
    videos_per_category: int = 2,
    sketches_per_category: int = 2,
    frames_per_video: int = 12,
    image_hw: Tuple[int, int] = (160, 120),
    sketch_dataset: str = "sketchy",
    video_dataset: str = "imagenet_vid",
    seed: int = 0,
    folders: Sequence[str] = ("train", "val"),
) -> Dict[str, List[str]]:
    """Create the fixture tree under ``root``; returns {folder: [video_ids]}."""
    import cv2

    rng = random.Random(seed)
    w, h = image_hw
    anno_root = os.path.join(root, "annos")
    os.makedirs(anno_root, exist_ok=True)

    out: Dict[str, List[str]] = {}
    for folder in folders:
        annos: Dict[str, dict] = {}
        class_to_video: Dict[str, List[str]] = {c: [] for c in categories}
        for c_idx, category in enumerate(categories):
            color = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)][
                c_idx % 4
            ]
            for v in range(videos_per_category):
                video_id = f"SYN_{folder}_{category}_{v:04d}"
                vdir = os.path.join(root, video_dataset, "Data", "VID", folder, video_id)
                os.makedirs(vdir, exist_ok=True)
                bw = rng.randrange(w // 6, w // 3)
                bh = rng.randrange(h // 6, h // 3)
                x = rng.randrange(0, w - bw)
                y = rng.randrange(0, h - bh)
                dx = rng.choice([-3, -2, 2, 3])
                dy = rng.choice([-2, -1, 1, 2])
                frames_anno = {}
                for f in range(frames_per_video):
                    img = np.full((h, w, 3), 96, np.uint8)
                    x = int(np.clip(x + dx, 0, w - bw))
                    y = int(np.clip(y + dy, 0, h - bh))
                    _draw_rect(img, x, y, x + bw, y + bh, color)
                    cv2.imwrite(
                        os.path.join(vdir, f"{f:06d}.JPEG"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                        [cv2.IMWRITE_JPEG_QUALITY, 95],
                    )
                    frames_anno[f"{f:06d}"] = [{
                        "track_id": 0,
                        "label": category,
                        "bbox": [x, y, x + bw, y + bh],
                    }]
                annos[video_id] = {
                    "size": [w, h],
                    "num_frames": frames_per_video,
                    "objects": [category],
                    "frames": frames_anno,
                }
                class_to_video[category].append(video_id)
        out[folder] = [v for vs in class_to_video.values() for v in vs]

        anno_dir = os.path.join(root, video_dataset, "Annotations", "VID")
        os.makedirs(anno_dir, exist_ok=True)
        with open(os.path.join(anno_dir, f"{folder}.json"), "w") as f:
            json.dump(annos, f)
        with open(os.path.join(anno_root, f"{video_dataset}_{folder}.json"), "w") as f:
            json.dump(class_to_video, f)

        # sketches + class->sketch split
        class_to_sketch: Dict[str, List[str]] = {}
        for category in categories:
            sdir = os.path.join(root, sketch_dataset, category)
            os.makedirs(sdir, exist_ok=True)
            ids = []
            for s in range(sketches_per_category):
                sketch_id = f"{category}{s:04d}"
                cv2.imwrite(os.path.join(sdir, sketch_id + ".png"), _glyph(category))
                ids.append(sketch_id)
            class_to_sketch[category] = ids
        with open(os.path.join(anno_root, f"{sketch_dataset}_{folder}.json"), "w") as f:
            json.dump(class_to_sketch, f)

        # val pair CSV in the shipped (sketch, video) column order
        if folder == "val":
            rows = []
            for category in categories:
                for video_id in class_to_video[category]:
                    for sketch_id in class_to_sketch[category]:
                        rows.append(f"{sketch_id} {video_id}")
            with open(
                os.path.join(anno_root, f"{video_dataset}_{sketch_dataset}_val.csv"),
                "w",
            ) as f:
                f.write("\n".join(rows) + "\n")
    return out
