"""Set-prediction matchers, fully on device (port of lib/modeling/matcher.py).

The reference builds one big (B*Q, total_boxes) cost matrix, ships it to the
CPU, and runs scipy LSAP per frame (matcher.py:59-93). Here targets are
densified to static shapes — ``boxes (B, T, K, 4)`` + ``valid (B, T, K)``
with K = num_queries_per_frame — so the cost is a batched (B, T, K, K)
tensor and the exact Hungarian solve runs vmapped inside jit. Invalid target
slots get a constant pad cost (see ops/hungarian.masked_cost_matrix), which
provably reproduces scipy's rectangular-LSAP solution on the valid columns.

Cost terms and weights mirror matcher.py:76-85:
    C = cost_bbox * L1(pred, tgt) + cost_giou * (-GIoU) + cost_class * (-P_fg)
with foreground_label = 0 (matcher.py:35).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from svol_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from svol_tpu.ops.hungarian import (
    hungarian,
    hungarian_scipy_callback,
    masked_cost_matrix,
    masked_cost_matrix_rows,
)


class MatchResult(NamedTuple):
    """Assignment aligned with prediction slots.

    ``tgt_index[..., i]`` is the target column assigned to prediction row i in
    its (frame- or video-level) problem; ``matched[..., i]`` says whether that
    column is a real (valid) target.
    """

    tgt_index: Array  # (..., K) int32
    matched: Array  # (..., K) bool


def _cost_matrix(
    pred_logits: Array,  # (..., K, 2)
    pred_boxes: Array,  # (..., K, 4) cxcywh
    tgt_boxes: Array,  # (..., M, 4) cxcywh
    cost_class: float,
    cost_bbox: float,
    cost_giou: float,
) -> Array:
    prob_fg = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[..., 0]
    c_class = -prob_fg[..., :, None]  # identical across target columns
    c_bbox = jnp.abs(
        pred_boxes[..., :, None, :] - tgt_boxes[..., None, :, :]
    ).sum(-1)
    c_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    return (
        cost_bbox * c_bbox.astype(jnp.float32)
        + cost_giou * c_giou.astype(jnp.float32)
        + cost_class * c_class
    )


def match_per_frame(
    pred_logits: Array,  # (B, Q, 2) with Q = T * K
    pred_boxes: Array,  # (B, Q, 4)
    tgt_boxes: Array,  # (B, T, K, 4)
    tgt_valid: Array,  # (B, T, K) bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 1.0,
    impl: str = "on_device",
) -> MatchResult:
    """PerFrameMatcher (matcher.py:12-119): one KxK LSAP per frame, solved
    for all B*T frames at once."""
    B, T, K, _ = tgt_boxes.shape
    logits = pred_logits.reshape(B, T, K, -1)
    boxes = pred_boxes.reshape(B, T, K, 4)

    C = _cost_matrix(logits, boxes, tgt_boxes, cost_class, cost_bbox, cost_giou)
    C = masked_cost_matrix(C, tgt_valid)
    solver = hungarian if impl == "on_device" else hungarian_scipy_callback
    assign = solver(C)  # (B, T, K)
    matched = jnp.take_along_axis(tgt_valid, assign, axis=-1)
    return MatchResult(tgt_index=assign, matched=matched)


def match_per_frame_rect(
    pred_logits: Array,  # (B, Q, 2) with Q = T * Qf, Qf > K
    pred_boxes: Array,  # (B, Q, 4)
    tgt_boxes: Array,  # (B, T, K, 4)
    tgt_valid: Array,  # (B, T, K) bool
    queries_per_frame: int,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 1.0,
    impl: str = "on_device",
) -> MatchResult:
    """Rectangular per-frame matching for heads with more queries per frame
    than target slots (SketchDETR's 100, sketch_detr.py:129).

    Solved transposed — rows are the K target slots, columns the Qf queries —
    so the LSAP stays K x Qf instead of Qf x Qf. The result is re-aligned to
    prediction slots: ``tgt_index[b, t, q]`` is the target column matched to
    query q (0 and unmatched where ``matched`` is False).
    """
    B, T, K, _ = tgt_boxes.shape
    Qf = queries_per_frame
    logits = pred_logits.reshape(B, T, Qf, -1)
    boxes = pred_boxes.reshape(B, T, Qf, 4)

    # cost with rows = targets, cols = queries
    C = _cost_matrix(logits, boxes, tgt_boxes, cost_class, cost_bbox, cost_giou)
    C = jnp.swapaxes(C, -1, -2)  # (B, T, K, Qf)
    C = masked_cost_matrix_rows(C, tgt_valid)
    solver = hungarian if impl == "on_device" else hungarian_scipy_callback
    assign = solver(C)  # (B, T, K): query column per target row

    onehot = jax.nn.one_hot(assign, Qf, dtype=jnp.float32)  # (B, T, K, Qf)
    onehot = onehot * tgt_valid[..., None]
    matched = onehot.sum(-2) > 0  # (B, T, Qf)
    tgt_index = jnp.einsum(
        "btkq,k->btq", onehot, jnp.arange(K, dtype=jnp.float32)
    ).astype(jnp.int32)
    return MatchResult(tgt_index=tgt_index, matched=matched)


def match_per_frame_stacked(
    all_logits: Array,  # (L, B, Q, 2) — final + aux layers stacked
    all_boxes: Array,  # (L, B, Q, 4)
    tgt_boxes: Array,  # (B, T, K, 4)
    tgt_valid: Array,  # (B, T, K) bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 1.0,
    impl: str = "on_device",
) -> MatchResult:
    """All decoder layers' per-frame LSAPs in ONE solver call.

    The reference re-runs its matcher once per aux layer (loss.py:148-155);
    the unmerged path here does the same with L sequential vmapped solves.
    Stacking the layer axis into the vmap batch turns them into a single
    (L*B*T)-wide solve — same assignments, fewer sequential while-loop
    programs. Returns MatchResult with leading (L, B, ...) axes.

    Opt-in via ``--merged_matcher``. History: with the old vmapped-JV
    solver the merged 1024-wide solve reproducibly crashed this
    environment's tunneled TPU worker (scripts/repro_wide_matcher.py
    isolates the trigger). The dense-batched solver (round 3, the default)
    removed that program shape and the crash with it; the merged step now
    measures identical to unmerged (124.8 vs 124.6 ms/step — PERFORMANCE.md
    "Merged matcher, round-3 re-measurement"), because the dense solver
    already shrank total matching to ~3 ms/step. Kept as a scheduling
    variant, no longer a crash risk.
    """
    L = all_logits.shape[0]
    B, T, K, _ = tgt_boxes.shape
    logits = all_logits.reshape(L, B, T, K, -1)
    boxes = all_boxes.reshape(L, B, T, K, 4)

    # broadcast targets over the layer axis inside the cost computation
    C = _cost_matrix(logits, boxes, tgt_boxes[None], cost_class, cost_bbox,
                     cost_giou)  # (L, B, T, K, K)
    C = masked_cost_matrix(C, tgt_valid[None])
    solver = hungarian if impl == "on_device" else hungarian_scipy_callback
    assign = solver(C)  # (L, B, T, K)
    matched = jnp.take_along_axis(
        jnp.broadcast_to(tgt_valid[None], assign.shape), assign, axis=-1
    )
    return MatchResult(tgt_index=assign, matched=matched)


def match_per_video(
    pred_logits: Array,  # (B, Q, 2)
    pred_boxes: Array,  # (B, Q, 4)
    tgt_boxes: Array,  # (B, T, K, 4)
    tgt_valid: Array,  # (B, T, K) bool
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 1.0,
    impl: str = "on_device",
) -> MatchResult:
    """HungarianMatcher / 'video_matcher' (matcher.py:122-159): one QxQ LSAP
    per video over all its boxes (the target set is capped at T*K = Q slots,
    so the padded problem stays square)."""
    B, T, K, _ = tgt_boxes.shape
    flat_boxes = tgt_boxes.reshape(B, T * K, 4)
    flat_valid = tgt_valid.reshape(B, T * K)

    C = _cost_matrix(
        pred_logits, pred_boxes, flat_boxes, cost_class, cost_bbox, cost_giou
    )
    C = masked_cost_matrix(C, flat_valid)
    solver = hungarian if impl == "on_device" else hungarian_scipy_callback
    assign = solver(C)  # (B, Q)
    matched = jnp.take_along_axis(flat_valid, assign, axis=-1)
    return MatchResult(tgt_index=assign, matched=matched)
