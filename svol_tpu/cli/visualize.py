"""Result visualization (port of visualize.py:8-62).

Reads a results JSONL (schema from cli/infer.py), draws ground-truth boxes
in green and predictions above a score threshold in red onto the original
frames, and writes PNGs to <out>/<video>/<sketch>/<frame>.png.

CLI:  python -m svol_tpu.cli.visualize --results <jsonl> --video_dir <VID root>
"""
from __future__ import annotations

import argparse
import os

from svol_tpu.utils.io import load_jsonl


def _find_frame(video_dir: str, video: str, frame: int) -> str:
    for sub in ("train", "val", ""):
        path = os.path.join(video_dir, sub, video, f"{frame:06d}.JPEG")
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"{video}/{frame:06d}.JPEG under {video_dir}")


def visualize(results_path: str, video_dir: str, out_dir: str = "visualize",
              score_threshold: float = 0.5) -> int:
    import cv2

    n = 0
    for result in load_jsonl(results_path):
        video, sketch, frame = result["video"], result["sketch"], result["frame"]
        img = cv2.imread(_find_frame(video_dir, video, frame), cv2.IMREAD_COLOR)
        h, w = img.shape[:2]

        def scale(b):
            return (round(b[0] * w), round(b[1] * h)), (round(b[2] * w), round(b[3] * h))

        for gt in result["gt_boxes"]:
            bbox = gt["bbox"] if isinstance(gt, dict) else gt
            p0, p1 = scale(bbox)
            cv2.rectangle(img, p0, p1, (0, 255, 0), 1)  # green (BGR)
        for pred in result["pred_boxes"]:
            if pred[4] < score_threshold:
                continue
            p0, p1 = scale(pred)
            cv2.rectangle(img, p0, p1, (0, 0, 255), 1)  # red (BGR)

        dst = os.path.join(out_dir, video, sketch)
        os.makedirs(dst, exist_ok=True)
        cv2.imwrite(os.path.join(dst, f"{frame}.png"), img)
        n += 1
    return n


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="draw GT/pred boxes on frames")
    p.add_argument("--results", required=True, help="results JSONL path")
    p.add_argument("--video_dir", required=True, help="imagenet_vid/Data/VID root")
    p.add_argument("--out", default="visualize")
    p.add_argument("--score_threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    n = visualize(args.results, args.video_dir, args.out, args.score_threshold)
    print(f"wrote {n} annotated frames to {args.out}/")


if __name__ == "__main__":
    main()
