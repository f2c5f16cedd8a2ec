"""Box geometry in pure jnp (static shapes, vmap/jit friendly).

Semantics match the reference:
  * conversions + pairwise IoU/GIoU: ``lib/utils/box_utils.py:9-61``
  * evaluation IoU (paired / cross):  ``lib/evaluate/utils.py:35-96``

All functions accept arbitrary leading batch dimensions where noted.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def box_cxcywh_to_xyxy(b: Array) -> Array:
    """(..., 4) center-size -> corner format (box_utils.py:9-13)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: Array) -> Array:
    """(..., 4) corner -> center-size format (box_utils.py:16-20)."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: Array) -> Array:
    """(..., 4) xyxy -> (...,) area."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: Array, boxes2: Array) -> tuple[Array, Array]:
    """Pairwise IoU between two xyxy sets.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> iou, union: (..., N, M).
    Mirrors box_utils.py:24-37 (no epsilon; degenerate boxes are the
    caller's responsibility, as in the reference).
    """
    area1 = box_area(boxes1)  # (..., N)
    area2 = box_area(boxes2)  # (..., M)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]  # (..., N, M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise GIoU (https://giou.stanford.edu/) between xyxy sets.

    boxes1: (..., N, 4), boxes2: (..., M, 4) -> (..., N, M).
    Mirrors box_utils.py:40-61 minus the host-side asserts (shape-polymorphic
    asserts don't trace; predictions are sigmoid-parameterized so w,h >= 0).
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    area = wh[..., 0] * wh[..., 1]  # enclosing box area

    return iou - (area - union) / area


def iou_paired(box1: Array, box2: Array) -> Array:
    """Elementwise IoU of aligned xyxy boxes: (..., 4), (..., 4) -> (...,).

    Exact port of the evaluation formula (evaluate/utils.py:35-71): the
    intersection "area" is computed unclamped and a validity test zeroes
    non-overlapping pairs.
    """
    xmin = jnp.maximum(box1[..., 0], box2[..., 0])
    ymin = jnp.maximum(box1[..., 1], box2[..., 1])
    xmax = jnp.minimum(box1[..., 2], box2[..., 2])
    ymax = jnp.minimum(box1[..., 3], box2[..., 3])

    inter = (xmax - xmin) * (ymax - ymin)
    union = box_area(box1) + box_area(box2) - inter
    valid = (xmin <= xmax) & (ymin <= ymax)
    # Guard the division so the masked branch cannot emit inf/nan.
    safe_union = jnp.where(union == 0.0, 1.0, union)
    return jnp.where(valid, inter / safe_union, 0.0)


def iou_cross(box1: Array, box2: Array) -> Array:
    """All-pairs IoU: (N, 4), (M, 4) -> (N, M) (evaluate/utils.py:74-96)."""
    return iou_paired(box1[:, None, :], box2[None, :, :])


def masks_to_boxes(masks: Array) -> Array:
    """Bounding boxes around binary masks: (N, H, W) -> (N, 4) xyxy.

    Port of box_utils.py:64-87 (static-shape: empty input yields (0, 4)).
    """
    if masks.size == 0:
        return jnp.zeros((0, 4), dtype=jnp.float32)

    h, w = masks.shape[-2:]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]

    m = masks.astype(jnp.float32)
    x_mask = m * x
    x_max = x_mask.reshape(masks.shape[0], -1).max(-1)
    x_min = jnp.where(masks.astype(bool), x_mask, 1e8).reshape(masks.shape[0], -1).min(-1)

    y_mask = m * y
    y_max = y_mask.reshape(masks.shape[0], -1).max(-1)
    y_min = jnp.where(masks.astype(bool), y_mask, 1e8).reshape(masks.shape[0], -1).min(-1)

    return jnp.stack([x_min, y_min, x_max, y_max], axis=1)
