"""Zero-shot and unified pair-list construction (svol_dataset.py:121-172
semantics) — pure JSON/CSV logic, no images needed."""
import json
import os

import pytest

from svol_tpu.data.annotations import (
    CLASSES,
    UNSEEN_CATEGORIES,
    build_pair_list,
    category_of,
)


@pytest.fixture
def anno_root(tmp_path):
    root = tmp_path / "annos"
    root.mkdir()
    cats = ["airplane", "bear", "car", "zebra"]  # airplane/bear are UNSEEN
    video_split = {c: [f"VID_{c}_{i}" for i in range(2)] for c in cats}
    sketch_split = {c: [f"{c}{i:04d}" for i in range(2)] for c in cats}
    for name, data in (
        ("imagenet_vid_all.json", video_split),
        ("imagenet_vid_train.json", video_split),
        ("imagenet_vid_val.json", video_split),
        ("sketchy_all.json", sketch_split),
        ("sketchy_train.json", sketch_split),
        ("sketchy_val.json", sketch_split),
        ("tu_berlin_all.json", sketch_split),
        ("tu_berlin_train.json", sketch_split),
        ("quickdraw_all.json", sketch_split),
        ("quickdraw_train.json", sketch_split),
    ):
        (root / name).write_text(json.dumps(data))
    rows = [f"{c}0000 VID_{c}_0" for c in cats]
    (root / "zeroshot_class_imagenet_vid_sketchy_val.csv").write_text("\n".join(rows))
    (root / "zeroshot_style_imagenet_vid_sketchy_val.csv").write_text("\n".join(rows))
    return str(root)


def test_zeroshot_category_train_excludes_unseen(anno_root):
    pairs = build_pair_list(
        "", anno_root, "train", sketch_dataset="sketchy",
        zeroshot_category_eval=True,
    )
    cats = {category_of(s) for _, s, _ in pairs}
    assert cats == {"car", "zebra"}  # airplane/bear held out
    assert cats.isdisjoint(UNSEEN_CATEGORIES)


def test_zeroshot_category_test_uses_unseen_only(anno_root):
    pairs = build_pair_list(
        "", anno_root, "test", sketch_dataset="sketchy",
        zeroshot_category_eval=True,
    )
    cats = {category_of(s) for _, s, _ in pairs}
    assert cats == {"airplane", "bear"}


def test_zeroshot_val_csv_selection(anno_root):
    for kw, fname in (
        ({"zeroshot_category_eval": True}, "class"),
        ({"zeroshot_dataset_eval": True}, "style"),
    ):
        pairs = build_pair_list("", anno_root, "val", sketch_dataset="sketchy", **kw)
        assert len(pairs) == 4
        assert all(v.startswith("VID_") for v, _, _ in pairs)


def test_unified_mode_merges_sketch_datasets(anno_root):
    pairs = build_pair_list(
        "", anno_root, "train", sketch_dataset="sketchy",
        unified_sketch_dataset=True,
    )
    datasets = {ds for _, _, ds in pairs}
    assert datasets == {"sketchy", "tu_berlin", "quickdraw"}
    # intersection classes only
    cats = {category_of(s) for _, s, _ in pairs}
    assert cats <= set(CLASSES["intersection"])
