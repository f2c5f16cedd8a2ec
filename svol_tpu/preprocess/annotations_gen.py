"""ImageNet-VID annotation + split generation.

Ports of the reference's one-time host jobs:
  * XML -> nested annotation JSON (preprocess/annotation_preprocess.py:41-83)
  * class -> video split JSON + per-class histograms
    (preprocess/class_to_video.py:49-88)
  * class -> sketch 80/20 split JSON (preprocess/class_to_sketch.py:19-31)

CLI:
  python -m svol_tpu.preprocess.annotations_gen xml2json --xml_root ... --out ...
  python -m svol_tpu.preprocess.annotations_gen class_to_video --xml_root ... --out ...
  python -m svol_tpu.preprocess.annotations_gen class_to_sketch --sketch_root ... --out_prefix ...
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Tuple
from xml.etree.ElementTree import parse

# ImageNet-VID wnid -> class name, with the reference's renames
# (annotation_preprocess.py:10-39: cattle->cow, domestic cat->cat,
#  giant panda->panda)
WNID_TO_CLASS: Dict[str, str] = {
    "n02691156": "airplane", "n02419796": "antelope", "n02131653": "bear",
    "n02834778": "bicycle", "n01503061": "bird", "n02924116": "bus",
    "n02958343": "car", "n02402425": "cow", "n02084071": "dog",
    "n02121808": "cat", "n02503517": "elephant", "n02118333": "fox",
    "n02510455": "panda", "n02342885": "hamster", "n02374451": "horse",
    "n02129165": "lion", "n01674464": "lizard", "n02484322": "monkey",
    "n03790512": "motorcycle", "n02324045": "rabbit", "n02509815": "red panda",
    "n02411705": "sheep", "n01726692": "snake", "n02355227": "squirrel",
    "n02129604": "tiger", "n04468005": "train", "n01662784": "turtle",
    "n04530566": "watercraft", "n02062744": "whale", "n02391049": "zebra",
}

# The 23 SVOL classes used for splits (class_to_video.py ID_TO_NAME — the
# full VID vocabulary minus antelope/fox/hamster/red panda/watercraft...).
SPLIT_CLASSES = [
    "airplane", "bear", "bicycle", "bus", "car", "cow", "dog", "cat",
    "elephant", "panda", "horse", "lion", "lizard", "monkey", "motorcycle",
    "rabbit", "sheep", "snake", "squirrel", "tiger", "train", "turtle",
    "zebra",
]


def parse_video_xml_dir(video_dir: str) -> dict:
    """Parse one video's per-frame XML dir into the annotation record."""
    record = {"size": None, "num_frames": 0, "objects": [], "frames": {}}
    objects = set()
    frame_files = sorted(os.listdir(video_dir))
    for idx, fname in enumerate(frame_files):
        root = parse(os.path.join(video_dir, fname)).getroot()
        if idx == 0:
            record["size"] = [
                int(root.find("size").find("width").text),
                int(root.find("size").find("height").text),
            ]
        objs = []
        for obj in root.findall("object"):
            wnid = obj.find("name").text
            if wnid not in WNID_TO_CLASS:
                continue
            label = WNID_TO_CLASS[wnid]
            objects.add(label)
            bb = obj.find("bndbox")
            objs.append({
                "track_id": int(obj.find("trackid").text),
                "label": label,
                "bbox": [
                    int(bb.find("xmin").text), int(bb.find("ymin").text),
                    int(bb.find("xmax").text), int(bb.find("ymax").text),
                ],
            })
        record["frames"][fname[:-len(".xml")]] = objs
    record["num_frames"] = len(frame_files)
    record["objects"] = sorted(objects)
    return record


def xml_to_json(xml_root: str, phase: str, out_path: str) -> int:
    """All videos of a phase dir -> one annotation JSON."""
    phase_dir = os.path.join(xml_root, phase)
    annos = {}
    for video_id in sorted(os.listdir(phase_dir)):
        annos[video_id] = parse_video_xml_dir(os.path.join(phase_dir, video_id))
    with open(out_path, "w") as f:
        json.dump(annos, f)
    return len(annos)


def class_to_video_split(
    xml_root: str, phase: str
) -> Tuple[Dict[str, List[str]], Dict[str, int], Dict[str, int]]:
    """class -> [video_ids] plus track-id-specific / -agnostic histograms
    (class_to_video.py:54-88)."""
    phase_dir = os.path.join(xml_root, phase)
    class_to_vid: Dict[str, List[str]] = {c: [] for c in SPLIT_CLASSES}
    hist_specific = {c: 0 for c in SPLIT_CLASSES}
    hist_agnostic = {c: 0 for c in SPLIT_CLASSES}
    for video_id in sorted(os.listdir(phase_dir)):
        specific, agnostic = set(), set()
        vdir = os.path.join(phase_dir, video_id)
        for fname in os.listdir(vdir):
            root = parse(os.path.join(vdir, fname)).getroot()
            for obj in root.findall("object"):
                wnid = obj.find("name").text
                if wnid not in WNID_TO_CLASS:
                    continue
                label = WNID_TO_CLASS[wnid]
                if label not in class_to_vid:
                    continue
                specific.add((int(obj.find("trackid").text), label))
                agnostic.add(label)
        for label in agnostic:
            class_to_vid[label].append(video_id)
            hist_agnostic[label] += 1
        for _, label in specific:
            hist_specific[label] += 1
    return class_to_vid, hist_specific, hist_agnostic


def class_to_sketch_split(
    sketch_root: str, train_frac: float = 0.8
) -> Tuple[Dict[str, List[str]], Dict[str, List[str]]]:
    """Per-category 80/20 sketch-id split in listing order
    (class_to_sketch.py:19-31)."""
    train, val = {}, {}
    for category in sorted(os.listdir(sketch_root)):
        cdir = os.path.join(sketch_root, category)
        if not os.path.isdir(cdir):
            continue
        ids = [os.path.splitext(f)[0] for f in sorted(os.listdir(cdir))]
        cut = int(len(ids) * train_frac)
        train[category] = ids[:cut]
        val[category] = ids[cut:]
    return train, val


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="annotation/split generation")
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("xml2json")
    a.add_argument("--xml_root", required=True)
    a.add_argument("--phase", default="train")
    a.add_argument("--out", required=True)
    b = sub.add_parser("class_to_video")
    b.add_argument("--xml_root", required=True)
    b.add_argument("--phase", default="train")
    b.add_argument("--out", required=True)
    c = sub.add_parser("class_to_sketch")
    c.add_argument("--sketch_root", required=True)
    c.add_argument("--out_prefix", required=True)
    args = p.parse_args(argv)

    if args.cmd == "xml2json":
        n = xml_to_json(args.xml_root, args.phase, args.out)
        print(f"wrote {n} video records to {args.out}")
    elif args.cmd == "class_to_video":
        split, hist_s, hist_a = class_to_video_split(args.xml_root, args.phase)
        with open(args.out, "w") as f:
            json.dump(split, f)
        print("CLASS_HISTOGRAM_ID_SPECIFIC", hist_s)
        print("CLASS_HISTOGRAM_ID_AGNOSTIC", hist_a)
    else:
        train, val = class_to_sketch_split(args.sketch_root)
        for name, data in (("train", train), ("val", val)):
            with open(f"{args.out_prefix}_{name}.json", "w") as f:
                json.dump(data, f)
        print(f"wrote {args.out_prefix}_train.json / _val.json")


if __name__ == "__main__":
    main()
