"""Data layer tests on the synthetic fixture dataset (real file IO)."""
import os

import numpy as np
import pytest

from svol_tpu.config import DataConfig, ModelConfig, SvolConfig
from svol_tpu.data.annotations import (
    CLASSES,
    build_pair_list,
    category_of,
    read_pair_csv,
    sample_frame_indices,
)
from svol_tpu.data.dataset import SVOLDataset, collate
from svol_tpu.data.pipeline import build_loader, threaded_batches
from svol_tpu.data.synthetic import CATEGORIES, generate_synthetic_dataset

T, K, IMG = 8, 5, 64


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svol_fixture"))
    generate_synthetic_dataset(root, frames_per_video=12)
    return root


def make_cfg(root):
    return SvolConfig(
        data=DataConfig(
            root=root, anno_root=os.path.join(root, "annos"),
            num_frames=T, max_boxes_per_frame=K, image_size=IMG,
            bs=4, eval_bs=4, num_workers=2,
        ),
        model=ModelConfig(num_queries=T * K, num_queries_per_frame=K),
    )


def test_category_of():
    assert category_of("airplane0598") == "airplane"
    assert category_of("airplane_12") == "airplane"
    assert category_of("airplane_229") == "airplane"
    assert category_of("tu_berlin_style") == "tu_berlin_style"


def test_class_vocab_sizes():
    # svol_dataset.py:46-52
    assert len(CLASSES["sketchy"]) == 19
    assert len(CLASSES["tu_berlin"]) == 21
    assert len(CLASSES["quickdraw"]) == 24
    assert len(CLASSES["union"]) == 25
    assert len(CLASSES["intersection"]) == 17


def test_frame_sampling():
    # short video, loose sampling: keep all frames (svol_dataset.py:188-189)
    assert sample_frame_indices(5, 8, tight=False) == [0, 1, 2, 3, 4]
    # long video: strided with round()
    idxs = sample_frame_indices(64, 32, tight=False)
    assert len(idxs) == 32 and idxs[0] == 0 and idxs[-1] == 62
    # tight: duplicates allowed, never out of range
    idxs = sample_frame_indices(5, 8, tight=True)
    assert len(idxs) == 8 and max(idxs) <= 4


def test_pair_list_and_csv(fixture_root):
    pairs = build_pair_list(
        fixture_root, os.path.join(fixture_root, "annos"), "train",
        sketch_dataset="sketchy",
    )
    # only fixture categories present in the splits
    assert len(pairs) == len(CATEGORIES) * 2 * 2  # videos x sketches
    # deterministic shuffle
    again = build_pair_list(
        fixture_root, os.path.join(fixture_root, "annos"), "train",
        sketch_dataset="sketchy",
    )
    assert pairs == again

    csv_pairs = read_pair_csv(
        os.path.join(fixture_root, "annos", "imagenet_vid_sketchy_val.csv")
    )
    sk, vid = csv_pairs[0]
    assert vid.startswith("SYN_") and not sk.startswith("SYN_")


def test_dataset_item_shapes(fixture_root):
    cfg = make_cfg(fixture_root)
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
    )
    ex = ds[0]
    assert ex.video.shape == (T, IMG, IMG, 3)
    assert ex.sketch.shape == (1, IMG, IMG, 3)
    assert ex.boxes.shape == (T, K, 4)
    assert ex.box_valid.shape == (T, K)
    assert ex.video.dtype == np.uint8  # pixels stay uint8 on host
    # every sampled frame of the fixture has exactly one box
    assert ex.box_valid[:, 0].all() and not ex.box_valid[:, 1:].any()
    # boxes normalized cxcywh in [0,1]
    assert (ex.boxes[ex.box_valid] >= 0).all() and (ex.boxes[ex.box_valid] <= 1).all()
    assert ex.meta["video"].startswith("SYN_train_")
    assert len(ex.meta["frame_keys"]) == T


def test_dataset_short_video_padding(fixture_root):
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=16, max_boxes_per_frame=K, image_size=IMG,
    )
    ex = ds[0]  # fixture videos have 12 frames < 16
    assert ex.video_mask.sum() == 12
    assert not ex.box_valid[12:].any()


def test_box_alignment_with_pixels(fixture_root):
    """The fixture rectangle is axis-aligned and solid: the annotated cxcywh
    box must coincide with the colored region (validates normalization and
    the flip-consistency fix)."""
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="val", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
        hflip_prob=0.0,
    )
    ex = ds[0]
    frame = ex.video[0]
    cx, cy, w, h = ex.boxes[0, 0]
    ys, xs = np.where(frame.astype(np.float32).std(axis=-1) > 25)  # colored pixels
    assert len(xs) > 0
    got_cx = (xs.min() + xs.max() + 1) / 2 / IMG
    got_cy = (ys.min() + ys.max() + 1) / 2 / IMG
    assert abs(got_cx - cx) < 0.04 and abs(got_cy - cy) < 0.04


def test_flip_consistency(fixture_root):
    """With flip_boxes=True (default), a flipped frame's box must cover the
    flipped pixels."""
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
        hflip_prob=1.0, flip_boxes=True,
    )
    ex = ds[0]
    frame = ex.video[0]
    cx = ex.boxes[0, 0, 0]
    ys, xs = np.where(frame.astype(np.float32).std(axis=-1) > 25)
    got_cx = (xs.min() + xs.max() + 1) / 2 / IMG
    assert abs(got_cx - cx) < 0.04


def test_flip_rerandomizes_across_visits(fixture_root):
    """Revisiting the same example must draw fresh flips (the reference's
    RandomHorizontalFlip re-randomizes on every access); a (seed, idx)-only
    RNG would freeze the flip for the whole run."""
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
        hflip_prob=0.5,
    )
    frames = [ds[0].video[0] for _ in range(12)]
    assert any(not np.array_equal(frames[0], f) for f in frames[1:])


def test_augmentation_deterministic_under_thread_scheduling(fixture_root):
    """Augmentation draws depend only on (seed, idx, per-idx visit count) —
    NOT on cross-example fetch order. Two datasets visiting the same indices
    in different interleavings must produce identical examples per
    (idx, visit). A shared global visit counter breaks this the moment
    loader worker threads race (ADVICE r2)."""
    mk = lambda: SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
        hflip_prob=0.5, seed=7,
    )
    ds_a, ds_b = mk(), mk()
    idxs = [0, 1, 2]
    # a: idx-major (epoch 0 all idxs, then epoch 1); b: visit-major per idx
    a = {}
    for visit in range(2):
        for i in idxs:
            a[(i, visit)] = ds_a[i]
    b = {}
    for i in idxs:
        for visit in range(2):
            b[(i, visit)] = ds_b[i]
    for key in a:
        np.testing.assert_array_equal(a[key].video, b[key].video, err_msg=str(key))
        np.testing.assert_array_equal(a[key].boxes, b[key].boxes)


def test_per_frame_flip_reference_compat(fixture_root):
    """per_frame_flip=True + flip_boxes=False reproduces the reference
    exactly: independent flip decision per frame (svol_dataset.py:218-232),
    boxes untouched."""
    common = dict(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="train", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
    )
    # NB: same seed for both datasets — the seed also shuffles the pair list,
    # so differing seeds would compare different (video, sketch) items
    base = SVOLDataset(hflip_prob=0.0, seed=1, **common)[0]
    ds = SVOLDataset(hflip_prob=0.5, per_frame_flip=True, flip_boxes=False,
                     seed=1, **common)
    ex = ds[0]
    flipped = unflipped = 0
    for t in range(T):
        if np.array_equal(ex.video[t], base.video[t]):
            unflipped += 1
        elif np.array_equal(ex.video[t], base.video[t][:, ::-1, :]):
            flipped += 1
    assert flipped + unflipped == T  # every frame is one or the other
    assert flipped > 0 and unflipped > 0  # per-frame independence
    np.testing.assert_array_equal(ex.boxes, base.boxes)  # boxes never flipped


def test_threaded_loader_abandoned_consumer(fixture_root):
    """Abandoning the generator early (debug mode) must unwind the producer
    thread instead of leaving it blocked on a full queue."""
    import threading
    import time

    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="val", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
    )
    before = threading.active_count()
    for _ in range(3):
        gen = threaded_batches(ds, batch_size=2, prefetch=1, num_workers=2)
        next(gen)
        gen.close()  # consumer walks away after one batch
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_frame_probe_matches_reference_sampling(tmp_path):
    """frame_probe uniform sampling reproduces preprocess/frame_dataset.py:16-19."""
    import cv2

    from svol_tpu.preprocess.frame_probe import list_frames, load_frames

    d = tmp_path / "clip"
    d.mkdir()
    for i in range(10):
        cv2.imwrite(str(d / f"{i:06d}.JPEG"), np.full((8, 8, 3), i, np.uint8))
    files = [d / f"{i:06d}.JPEG" for i in range(10)]
    n = 4
    stride = len(files) / n
    expected = [files[round(i * stride)] for i in range(n)]
    assert list_frames(str(d), n) == expected
    arr = load_frames(str(d), n, size=6)
    assert arr.shape == (4, 6, 6, 3) and arr.dtype == np.uint8
    # fewer files than requested: keep all (frame_dataset.py:17 guard)
    assert len(list_frames(str(d), 64)) == 10


def test_threaded_loader(fixture_root):
    cfg = make_cfg(fixture_root)
    loader = build_loader(cfg, "val", backend="threads")
    batch, extra = next(iter(loader))
    assert batch["src_video"].shape == (4, T, IMG, IMG, 3)
    assert extra["targets"]["boxes"].shape == (4, T, K, 4)
    assert len(extra["meta"]) == 4
    # full epoch, deterministic order; meta counts the real examples even if
    # the tail batch was shape-padded
    n = sum(len(e["meta"]) for _, e in build_loader(cfg, "val", backend="threads"))
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="val", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
    )
    assert n == len(ds)


def test_eval_loader_single_batch_shape(fixture_root):
    """Eval batches keep ONE array shape regardless of dataset size — the
    tail batch is padded by replicating its last example (meta drops it), so
    the eval executable compiles once (reference protocol: test.sh eval_bs=1
    never hits this; larger eval_bs must not recompile)."""
    ds = SVOLDataset(
        root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
        phase="val", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
    )
    bs = 3
    assert len(ds) % bs != 0, "fixture must exercise a ragged tail"
    shapes, metas = set(), 0
    last = None
    for batch, extra in threaded_batches(ds, bs, pad_to_batch=True):
        shapes.add(batch["src_video"].shape)
        metas += len(extra["meta"])
        last = (batch, extra)
    assert shapes == {(bs, T, IMG, IMG, 3)}
    assert metas == len(ds)
    # padding replicates the final real example
    tail_real = len(last[1]["meta"])
    assert last[1]["n_real"] == tail_real < bs
    np.testing.assert_array_equal(
        last[0]["src_video"][tail_real], last[0]["src_video"][tail_real - 1]
    )


def test_threaded_loader_sharding(fixture_root):
    cfg = make_cfg(fixture_root)
    seen = []
    for shard in range(2):
        for _, extra in threaded_batches(
            SVOLDataset(
                root=fixture_root, anno_root=os.path.join(fixture_root, "annos"),
                phase="val", num_frames=T, max_boxes_per_frame=K, image_size=IMG,
            ),
            batch_size=4, shard_index=shard, shard_count=2,
        ):
            seen.extend(m["video"] + m["sketch"] for m in extra["meta"])
    # shards partition the dataset without overlap
    assert len(seen) == len(set(seen))


def test_device_prefetch_order_and_placement():
    """device_prefetch keeps batches in order, places them on device ahead of
    consumption, and drains short iterators cleanly."""
    import jax

    from svol_tpu.data.pipeline import device_prefetch

    data = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(data), jax.device_put, size=2))
    assert [int(np.asarray(o["x"])[0, 0]) for o in out] == list(range(5))
    assert all(isinstance(o["x"], jax.Array) for o in out)
    assert len(list(device_prefetch(iter(data[:1]), jax.device_put, size=3))) == 1
    assert list(device_prefetch(iter([]), jax.device_put, size=2)) == []


def test_grain_train_loader(fixture_root):
    cfg = make_cfg(fixture_root)
    it = build_loader(cfg, "train", backend="grain")
    b1 = next(it)
    b2 = next(it)
    assert b1["src_video"].shape == (4, T, IMG, IMG, 3)
    assert b1["boxes"].shape == (4, T, K, 4)
    assert not np.array_equal(b1["src_video"], b2["src_video"])
