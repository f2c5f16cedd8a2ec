"""Native C++ clip decoder: builds, decodes correctly vs OpenCV, and plugs
into the dataset."""
import os

import numpy as np
import pytest

from svol_tpu.native import decode_clip, load_clip_decoder


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory, ):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("jpegs")
    paths = []
    for i in range(6):
        img = rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
        # smooth it so JPEG round-trip error is small
        img = cv2.GaussianBlur(img, (0, 0), 3)
        p = str(d / f"{i:06d}.JPEG")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_library_builds():
    assert load_clip_decoder() is not None, "g++/libjpeg toolchain expected here"


def test_decode_matches_cv2(jpeg_dir):
    import cv2

    out = decode_clip(jpeg_dir, size=64)
    assert out is not None and out.shape == (6, 64, 64, 3)
    for i, p in enumerate(jpeg_dir):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(ref, (64, 64), interpolation=cv2.INTER_LINEAR)
        # same JPEG lib + same half-pixel bilinear: near-identical
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 2.0 and np.percentile(diff, 99) <= 12, (
            np.mean(diff), diff.max()
        )


def test_missing_file_raises(jpeg_dir):
    with pytest.raises(FileNotFoundError):
        decode_clip([jpeg_dir[0], "/nonexistent/x.JPEG"], size=64)


def test_dataset_native_vs_cv2(tmp_path):
    from svol_tpu.data.dataset import SVOLDataset
    from svol_tpu.data.synthetic import generate_synthetic_dataset

    root = str(tmp_path)
    generate_synthetic_dataset(root, frames_per_video=6)
    kwargs = dict(
        root=root, anno_root=os.path.join(root, "annos"), phase="val",
        num_frames=4, max_boxes_per_frame=3, image_size=64, hflip_prob=0.0,
    )
    ds_native = SVOLDataset(decoder="native", **kwargs)
    ds_cv2 = SVOLDataset(decoder="cv2", **kwargs)
    a, b = ds_native[0], ds_cv2[0]
    assert np.abs(a.video.astype(int) - b.video.astype(int)).mean() < 2.5
    np.testing.assert_array_equal(a.boxes, b.boxes)
