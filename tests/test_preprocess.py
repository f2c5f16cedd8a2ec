"""Preprocess ports: QuickDraw rasterizers, XML annotation parsing, splits."""
import json
import os

import numpy as np
import pytest

from svol_tpu.preprocess.annotations_gen import (
    class_to_sketch_split,
    class_to_video_split,
    parse_video_xml_dir,
    xml_to_json,
)
from svol_tpu.preprocess.quickdraw import (
    bitmaps_to_png,
    render_strokes_dots,
    render_strokes_lines,
    strokes_file_to_pngs,
)

DRAWING = [
    [[0, 50, 100], [0, 80, 20]],  # one stroke: xs, ys
    [[20, 60], [90, 10]],
]


def test_render_lines():
    img = render_strokes_lines(DRAWING)
    assert img.shape == (224, 224)
    assert (img == 255).any() and (img < 128).any()  # white bg, black strokes


def test_render_dots():
    img = render_strokes_dots(DRAWING)
    assert img.shape == (224, 224)
    assert (img < 128).any()


def test_strokes_file(tmp_path):
    ndjson = tmp_path / "cat.ndjson"
    rows = [
        {"recognized": True, "drawing": DRAWING},
        {"recognized": False, "drawing": DRAWING},  # skipped
        {"recognized": True, "drawing": DRAWING},
    ]
    ndjson.write_text("\n".join(json.dumps(r) for r in rows))
    n = strokes_file_to_pngs(str(ndjson), str(tmp_path / "out"))
    assert n == 2
    assert os.path.exists(tmp_path / "out" / "cat" / "cat0001.png")


def test_bitmaps_to_png(tmp_path, rng):
    d = tmp_path / "full" / "numpy_bitmap"
    d.mkdir(parents=True)
    np.save(d / "sea turtle.npy",
            rng.integers(0, 255, size=(5, 784)).astype(np.uint8))
    n = bitmaps_to_png(str(tmp_path), sample_size=3, categories=["sea turtle"])
    assert n == 3
    # renamed category (quickdraw_array_to_pil.py:24-26)
    assert os.path.exists(tmp_path / "images" / "turtle" / "turtle_0.png")


def write_xml(path, objects, size=(640, 360)):
    objs = "".join(
        f"<object><trackid>{tid}</trackid><name>{wnid}</name>"
        f"<bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
        f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
        for tid, wnid, b in objects
    )
    path.write_text(
        f"<annotation><size><width>{size[0]}</width>"
        f"<height>{size[1]}</height></size>{objs}</annotation>"
    )


@pytest.fixture
def xml_root(tmp_path):
    vdir = tmp_path / "train" / "VIDEO_A"
    vdir.mkdir(parents=True)
    # n02958343=car, n02084071=dog, n02402425=cow (renamed from cattle)
    write_xml(vdir / "000000.xml", [(0, "n02958343", (10, 10, 100, 100))])
    write_xml(vdir / "000001.xml",
              [(0, "n02958343", (12, 12, 102, 102)),
               (1, "n02402425", (200, 50, 300, 150))])
    vdir2 = tmp_path / "train" / "VIDEO_B"
    vdir2.mkdir(parents=True)
    write_xml(vdir2 / "000000.xml", [(0, "n02084071", (5, 5, 50, 50))])
    return tmp_path


def test_parse_video_xml(xml_root):
    rec = parse_video_xml_dir(str(xml_root / "train" / "VIDEO_A"))
    assert rec["size"] == [640, 360]
    assert rec["num_frames"] == 2
    assert rec["objects"] == ["car", "cow"]  # cattle wnid renamed to cow
    assert rec["frames"]["000001"][1]["label"] == "cow"
    assert rec["frames"]["000000"][0]["bbox"] == [10, 10, 100, 100]


def test_xml_to_json_roundtrip_with_dataset(xml_root, tmp_path):
    out = tmp_path / "train.json"
    n = xml_to_json(str(xml_root), "train", str(out))
    assert n == 2
    annos = json.loads(out.read_text())
    assert set(annos) == {"VIDEO_A", "VIDEO_B"}


def test_class_to_video_split(xml_root):
    split, hist_s, hist_a = class_to_video_split(str(xml_root), "train")
    assert split["car"] == ["VIDEO_A"]
    assert split["dog"] == ["VIDEO_B"]
    assert split["cow"] == ["VIDEO_A"]
    assert hist_a["car"] == 1 and hist_s["car"] == 1


def test_class_to_sketch_split(tmp_path):
    for c, n in (("cat", 10), ("dog", 5)):
        d = tmp_path / c
        d.mkdir()
        for i in range(n):
            (d / f"{c}{i:04d}.png").write_bytes(b"x")
    train, val = class_to_sketch_split(str(tmp_path))
    assert len(train["cat"]) == 8 and len(val["cat"]) == 2  # 80/20
    assert len(train["dog"]) == 4 and len(val["dog"]) == 1
    assert train["cat"][0] == "cat0000"
