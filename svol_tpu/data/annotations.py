"""Annotation / split / pair-list loading.

File formats (produced by the preprocess stage, see svol_tpu/preprocess/):
  * video annotations: ``{video_id: {size: [w, h], num_frames: int,
    objects: [...], frames: {frame_key: [{track_id, label, bbox(xyxy abs)}]}}}``
    (schema from preprocess/annotation_preprocess.py:41-83)
  * class->video / class->sketch splits: ``{category: [ids...]}``
    (preprocess/class_to_video.py:49-88, class_to_sketch.py:19-31)
  * val pair CSVs: space-delimited ``<sketch_id> <video_id>`` — NB the
    reference unpacks these in (video, sketch) order (svol_dataset.py:172)
    which scrambles its category lookup; we normalize to sketch-first
    (SURVEY.md §2 defects).
"""
from __future__ import annotations

import csv
import json
import os
import random
import re
from typing import Dict, List, Tuple

# Class vocabularies per sketch dataset (svol_dataset.py:46-52).
CLASSES: Dict[str, List[str]] = {
    "sketchy": [
        "airplane", "bear", "bicycle", "car", "cat", "cow", "dog", "elephant",
        "horse", "lion", "lizard", "motorcycle", "rabbit", "sheep", "snake",
        "squirrel", "tiger", "turtle", "zebra",
    ],
    "tu_berlin": [
        "airplane", "bear", "bicycle", "bus", "car", "cat", "cow", "dog",
        "elephant", "horse", "lion", "monkey", "motorcycle", "panda", "rabbit",
        "sheep", "snake", "squirrel", "tiger", "train", "zebra",
    ],
    "quickdraw": [
        "airplane", "bear", "bicycle", "bird", "bus", "car", "cat", "cow",
        "dog", "elephant", "horse", "lion", "monkey", "motorcycle", "panda",
        "rabbit", "sheep", "snake", "squirrel", "tiger", "train", "turtle",
        "whale", "zebra",
    ],
}
CLASSES["union"] = sorted(set().union(*[set(v) for v in CLASSES.values()]))
CLASSES["intersection"] = sorted(
    set(CLASSES["sketchy"]) & set(CLASSES["tu_berlin"]) & set(CLASSES["quickdraw"])
)

# Held-out classes for zero-shot category evaluation (svol_dataset.py:83).
UNSEEN_CATEGORIES = ["airplane", "bear", "cat", "cow", "dog"]

_TRAILING_ID = re.compile(r"[_-]?\d+$")


def category_of(sketch_id: str) -> str:
    """Category from a sketch id: 'airplane0598' / 'airplane_12' -> 'airplane'.

    The reference slices a fixed 4 chars (svol_dataset.py:183) which breaks on
    ids whose numeric suffix isn't exactly 4 chars (e.g. 'airplane_12' in the
    shipped CSVs); stripping the trailing id is robust to both conventions.
    """
    return _TRAILING_ID.sub("", sketch_id)


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def read_pair_csv(path: str) -> List[Tuple[str, str]]:
    """Read a val pair CSV -> [(sketch_id, video_id), ...] (normalized)."""
    pairs = []
    with open(path) as f:
        for row in csv.reader(f, delimiter=" "):
            if not row:
                continue
            a, b = row[0], row[1]
            # normalize regardless of column convention: the video id always
            # carries the ILSVRC prefix
            if a.startswith("ILSVRC"):
                a, b = b, a
            pairs.append((a, b))
    return pairs


def build_pair_list(
    root: str,
    anno_root: str,
    phase: str,
    video_dataset: str = "imagenet_vid",
    sketch_dataset: str = "sketchy",
    zeroshot_dataset_eval: bool = False,
    zeroshot_category_eval: bool = False,
    unified_sketch_dataset: bool = False,
    seed: int = 1,
) -> List[Tuple[str, str, str]]:
    """(video_id, sketch_id, sketch_dataset) triples for a phase.

    Mirrors svol_dataset.py:121-172: train/test take the cross product of
    class->video x class->sketch splits and shuffle; val reads the shipped
    pair CSVs. Zero-shot category eval holds out UNSEEN_CATEGORIES;
    zero-shot dataset (style) eval trains on one sketch style and evaluates
    on another via its dedicated CSV.
    """
    assert phase in ("train", "val", "test")
    folder = "all" if (zeroshot_dataset_eval or zeroshot_category_eval) else (
        "val" if phase in ("val", "test") else "train"
    )

    pairs: List[Tuple[str, str, str]] = []
    if phase in ("train", "test"):
        video_split = load_json(
            os.path.join(anno_root, f"{video_dataset}_{folder}.json")
        )
        if unified_sketch_dataset:
            sketch_splits = {
                ds: load_json(os.path.join(anno_root, f"{ds}_{folder}.json"))
                for ds in ("sketchy", "tu_berlin", "quickdraw")
            }
            categories = CLASSES["intersection"]
            for category in categories:
                for video_id in video_split.get(category, []):
                    for ds, split in sketch_splits.items():
                        for sketch_id in split.get(category, []):
                            pairs.append((video_id, sketch_id, ds))
        else:
            if zeroshot_category_eval:
                categories = (
                    sorted(set(CLASSES[sketch_dataset]) - set(UNSEEN_CATEGORIES))
                    if phase == "train"
                    else UNSEEN_CATEGORIES
                )
            else:
                categories = CLASSES[sketch_dataset]
            sketch_split = load_json(
                os.path.join(anno_root, f"{sketch_dataset}_{folder}.json")
            )
            for category in categories:
                for video_id in video_split.get(category, []):
                    for sketch_id in sketch_split.get(category, []):
                        pairs.append((video_id, sketch_id, sketch_dataset))
        random.Random(seed).shuffle(pairs)
    else:  # val
        if unified_sketch_dataset:
            categories = set(CLASSES["intersection"])
            for ds in ("sketchy", "tu_berlin", "quickdraw"):
                csv_path = os.path.join(anno_root, f"{video_dataset}_{ds}_val.csv")
                for sketch_id, video_id in read_pair_csv(csv_path):
                    if category_of(sketch_id) in categories:
                        pairs.append((video_id, sketch_id, ds))
        else:
            if zeroshot_category_eval:
                name = f"zeroshot_class_{video_dataset}_{sketch_dataset}_val.csv"
            elif zeroshot_dataset_eval:
                name = f"zeroshot_style_{video_dataset}_{sketch_dataset}_val.csv"
            else:
                name = f"{video_dataset}_{sketch_dataset}_val.csv"
            for sketch_id, video_id in read_pair_csv(os.path.join(anno_root, name)):
                pairs.append((video_id, sketch_id, sketch_dataset))
    return pairs


def sample_frame_indices(num_frames: int, target: int, tight: bool) -> List[int]:
    """Uniform frame sampling (svol_dataset.py:188-192): videos shorter than
    ``target`` keep all frames (unless ``tight``, which duplicates); longer
    ones are strided with python round(). Clamped defensively — the
    reference's round can index one past the end for very short clips."""
    if not tight and num_frames < target:
        return list(range(num_frames))
    rate = num_frames / target
    return [min(round(rate * i), num_frames - 1) for i in range(target)]
