"""Set criterion: CE + L1 + GIoU over Hungarian-matched pairs.

Port of lib/modeling/loss.py:10-213 with densified targets. Normalization
matches the reference exactly:
  * loss_label: per-element weighted NLL (fg weight 1, bg weight eos_coef)
    averaged over all B*Q logits — torch ``F.cross_entropy(..,
    weight, reduction='none').mean()`` semantics (loss.py:54-55), which
    divides by the *count*, not the weight sum.
  * loss_bbox: elementwise L1 averaged over (num_matched * 4) coordinates
    (loss.py:93-94).
  * loss_giou: (1 - GIoU) averaged over matched pairs (loss.py:96-102).
  * class_error: 100 - top-1 accuracy of matched logits (loss.py:59).
  * cardinality_error: |#fg-predicted - #targets| averaged over batch
    (loss.py:62-74); logging only.
Aux losses re-run the matcher per decoder layer (loss.py:148-155) with the
same weights suffixed ``_i``.

Everything is one jit-able pure function of (outputs, targets).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import Array

from svol_tpu.config import SvolConfig
from svol_tpu.losses.matcher import (
    MatchResult,
    match_per_frame,
    match_per_frame_rect,
    match_per_frame_stacked,
    match_per_video,
)
from svol_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou

FOREGROUND = 0
BACKGROUND = 1


def _losses_for_layer(
    pred_logits: Array,  # (B, Q, 2)
    pred_boxes: Array,  # (B, Q, 4)
    tgt_boxes: Array,  # (B, T, K, 4)
    tgt_valid: Array,  # (B, T, K)
    match: MatchResult,
    eos_coef: float,
    per_frame: bool,
) -> Dict[str, Array]:
    B, Q, _ = pred_logits.shape
    _, T, K, _ = tgt_boxes.shape

    matched = match.matched.reshape(B, Q)  # (B, Q) bool

    # --- classification (loss.py:39-60) --------------------------------
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    nll = jnp.where(matched, -logp[..., FOREGROUND], -logp[..., BACKGROUND])
    weight = jnp.where(matched, 1.0, eos_coef)
    loss_label = (weight * nll).mean()

    # class_error: accuracy over matched predictions only (loss.py:59)
    pred_cls = jnp.argmax(pred_logits, axis=-1)
    n_matched = jnp.maximum(matched.sum(), 1)
    acc = jnp.where(matched, (pred_cls == FOREGROUND), False).sum() / n_matched
    class_error = 100.0 * (1.0 - acc)

    # --- boxes (loss.py:76-103) -----------------------------------------
    if per_frame:
        # match indices are per-frame columns
        sel = jnp.take_along_axis(tgt_boxes, match.tgt_index[..., None], axis=2)
        sel = sel.reshape(B, Q, 4)
    else:
        flat = tgt_boxes.reshape(B, T * K, 4)
        sel = jnp.take_along_axis(flat, match.tgt_index[..., None], axis=1)

    pred = pred_boxes.astype(jnp.float32)
    sel = sel.astype(jnp.float32)
    m = matched.astype(jnp.float32)

    l1 = jnp.abs(pred - sel).sum(-1)  # (B, Q)
    denom = jnp.maximum(m.sum(), 1.0)
    loss_bbox = (l1 * m).sum() / (denom * 4.0)

    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(pred)[..., None, :], box_cxcywh_to_xyxy(sel)[..., None, :]
    )[..., 0, 0]  # paired diagonal, (B, Q)
    loss_giou = ((1.0 - giou) * m).sum() / denom

    # --- cardinality (loss.py:62-74) -------------------------------------
    card_pred = (pred_cls != pred_logits.shape[-1] - 1).sum(-1).astype(jnp.float32)
    n_tgt = tgt_valid.reshape(B, -1).sum(-1).astype(jnp.float32)
    cardinality_error = jnp.abs(card_pred - n_tgt).mean()

    return {
        "loss_label": loss_label,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "class_error": class_error,
        "cardinality_error": cardinality_error,
    }


class SetCriterion:
    """Callable criterion bound to a config (build_loss, loss.py:192-213)."""

    def __init__(self, config: SvolConfig):
        l = config.loss
        self.cost_class = float(l.set_cost_class)
        self.cost_bbox = float(l.set_cost_bbox)
        self.cost_giou = float(l.set_cost_giou)
        self.eos_coef = float(l.eos_coef)
        self.aux_loss = bool(l.aux_loss)
        self.per_frame = l.matcher == "per_frame_matcher"
        self.impl = l.hungarian_impl
        self.merged_matcher = bool(getattr(l, "merged_matcher", False))
        # weight_dict mirrors loss.py:195-202 (incl. aux suffixes)
        self.weight_dict: Dict[str, float] = {
            "loss_bbox": self.cost_bbox,
            "loss_giou": self.cost_giou,
            "loss_label": self.cost_class,
        }
        if self.aux_loss:
            n_aux = config.model.num_layers - 1
            for i in range(n_aux):
                for k in ("loss_bbox", "loss_giou", "loss_label"):
                    self.weight_dict[f"{k}_{i}"] = self.weight_dict[k]

    def weighted_log_view(self, losses: Dict[str, Array]) -> Dict[str, Array]:
        """The reference's LOGGING convention (test.py:131, train.py:243):
        every component meter records ``value * weight_dict[key]``; keys
        without a weight (class_error, cardinality_error, loss_overall,
        loss_moe_aux, grad_norm) record as-is. The criterion itself keeps
        returning UNWEIGHTED components (``loss_overall`` applies the
        weights once) — this view exists so our meters/metrics.jsonl read
        value-for-value like the reference's logs."""
        return {k: (v * self.weight_dict[k] if k in self.weight_dict else v)
                for k, v in losses.items()}

    def _match(self, logits: Array, boxes: Array, tgt_boxes: Array,
               tgt_valid: Array, queries_per_frame: int = 0) -> MatchResult:
        kwargs = dict(
            cost_class=self.cost_class, cost_bbox=self.cost_bbox,
            cost_giou=self.cost_giou, impl=self.impl,
        )
        K = tgt_boxes.shape[2]
        logits = jax.lax.stop_gradient(logits)
        boxes = jax.lax.stop_gradient(boxes)
        if self.per_frame and queries_per_frame and queries_per_frame != K:
            # SketchDETR-style head: more queries/frame than target slots
            return match_per_frame_rect(
                logits, boxes, tgt_boxes, tgt_valid,
                queries_per_frame=queries_per_frame, **kwargs,
            )
        fn = match_per_frame if self.per_frame else match_per_video
        return fn(logits, boxes, tgt_boxes, tgt_valid, **kwargs)

    def __call__(self, outputs: Dict[str, Any], targets: Dict[str, Array]) -> Dict[str, Array]:
        tgt_boxes = targets["boxes"]  # (B, T, K, 4)
        tgt_valid = targets["box_valid"]  # (B, T, K)

        logits, boxes = outputs["pred_logits"], outputs["pred_boxes"]
        qf = int(outputs.get("queries_per_frame", 0))
        K = tgt_boxes.shape[2]
        has_aux = self.aux_loss and "aux_logits" in outputs
        use_merged = (
            self.merged_matcher and has_aux and self.per_frame
            and (not qf or qf == K)
        )

        if use_merged:
            # one (L*B*T)-wide solve for final + all aux layers
            all_logits = jnp.concatenate(
                [logits[None], outputs["aux_logits"]], axis=0
            )
            all_boxes = jnp.concatenate(
                [boxes[None], outputs["aux_boxes"]], axis=0
            )
            stacked = match_per_frame_stacked(
                jax.lax.stop_gradient(all_logits),
                jax.lax.stop_gradient(all_boxes),
                tgt_boxes, tgt_valid,
                cost_class=self.cost_class, cost_bbox=self.cost_bbox,
                cost_giou=self.cost_giou, impl=self.impl,
            )
            match = MatchResult(stacked.tgt_index[0], stacked.matched[0])
        else:
            match = self._match(logits, boxes, tgt_boxes, tgt_valid, qf)
        losses = _losses_for_layer(
            logits, boxes, tgt_boxes, tgt_valid, match, self.eos_coef, self.per_frame
        )

        if has_aux:
            n_aux = outputs["aux_logits"].shape[0]
            for i in range(n_aux):
                a_logits = outputs["aux_logits"][i]
                a_boxes = outputs["aux_boxes"][i]
                if use_merged:
                    a_match = MatchResult(
                        stacked.tgt_index[i + 1], stacked.matched[i + 1]
                    )
                else:
                    a_match = self._match(a_logits, a_boxes, tgt_boxes, tgt_valid, qf)
                aux = _losses_for_layer(
                    a_logits, a_boxes, tgt_boxes, tgt_valid, a_match,
                    self.eos_coef, self.per_frame,
                )
                losses.update({f"{k}_{i}": v for k, v in aux.items()})

        losses["loss_overall"] = sum(
            losses[k] * w for k, w in self.weight_dict.items() if k in losses
        )
        return losses


def build_criterion(config: SvolConfig) -> SetCriterion:
    return SetCriterion(config)
