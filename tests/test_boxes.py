"""Golden tests for box geometry vs. independent numpy implementations of the
reference formulas (lib/utils/box_utils.py, lib/evaluate/utils.py)."""
import numpy as np
import pytest

from svol_tpu.ops import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    iou_cross,
    iou_paired,
    masks_to_boxes,
)


def random_xyxy(rng, n):
    xy0 = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([xy0, xy0 + wh], axis=1).astype(np.float32)


def np_iou_matrix(b1, b2):
    """Reference box_iou (box_utils.py:24-37) in numpy."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union, union


def test_conversion_roundtrip(rng):
    b = random_xyxy(rng, 64)
    back = np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(b)))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_conversion_values():
    b = np.array([[0.2, 0.3, 0.6, 0.5]], np.float32)
    cxcywh = np.asarray(box_xyxy_to_cxcywh(b))
    np.testing.assert_allclose(cxcywh, [[0.4, 0.4, 0.4, 0.2]], atol=1e-6)


def test_box_area(rng):
    b = random_xyxy(rng, 16)
    expected = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    np.testing.assert_allclose(np.asarray(box_area(b)), expected, rtol=1e-6)


def test_box_iou_matches_reference_formula(rng):
    b1, b2 = random_xyxy(rng, 13), random_xyxy(rng, 7)
    iou, union = box_iou(b1, b2)
    exp_iou, exp_union = np_iou_matrix(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), exp_iou, atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), exp_union, atol=1e-5)


def test_giou_identity_and_disjoint():
    a = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    np.testing.assert_allclose(np.asarray(generalized_box_iou(a, a)), [[1.0]], atol=1e-6)
    b = np.array([[2.0, 2.0, 3.0, 3.0]], np.float32)
    # IoU 0; enclosing box 3x3=9, union 2 -> giou = 0 - (9-2)/9
    np.testing.assert_allclose(
        np.asarray(generalized_box_iou(a, b)), [[-(9 - 2) / 9]], atol=1e-5
    )


def test_giou_range(rng):
    b1, b2 = random_xyxy(rng, 20), random_xyxy(rng, 20)
    g = np.asarray(generalized_box_iou(b1, b2))
    assert (g <= 1.0 + 1e-6).all() and (g >= -1.0 - 1e-6).all()


def test_iou_paired_matches_eval_formula(rng):
    """Port parity with evaluate/utils.py:35-71 including the unclamped
    intersection + validity masking behavior."""
    b1, b2 = random_xyxy(rng, 50), random_xyxy(rng, 50)
    got = np.asarray(iou_paired(b1, b2))

    xmin = np.maximum(b1[:, 0], b2[:, 0])
    ymin = np.maximum(b1[:, 1], b2[:, 1])
    xmax = np.minimum(b1[:, 2], b2[:, 2])
    ymax = np.minimum(b1[:, 3], b2[:, 3])
    inter = (xmax - xmin) * (ymax - ymin)
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1 + a2 - inter
    valid = (xmin <= xmax) & (ymin <= ymax)
    expected = np.where(valid, inter / np.where(union == 0, 1, union), 0.0)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_iou_cross_shape_and_consistency(rng):
    b1, b2 = random_xyxy(rng, 5), random_xyxy(rng, 8)
    cross = np.asarray(iou_cross(b1, b2))
    assert cross.shape == (5, 8)
    ref_iou, _ = np_iou_matrix(b1, b2)
    np.testing.assert_allclose(cross, ref_iou, atol=1e-5)


def test_masks_to_boxes():
    mask = np.zeros((1, 10, 12), np.float32)
    mask[0, 2:5, 3:9] = 1.0
    box = np.asarray(masks_to_boxes(mask))
    np.testing.assert_allclose(box, [[3.0, 2.0, 8.0, 4.0]])
