from svol_tpu.ops.boxes import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    iou_cross,
    iou_paired,
    masks_to_boxes,
)
from svol_tpu.ops.hungarian import hungarian, hungarian_cost

__all__ = [
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_iou",
    "box_xyxy_to_cxcywh",
    "generalized_box_iou",
    "iou_cross",
    "iou_paired",
    "masks_to_boxes",
    "hungarian",
    "hungarian_cost",
]
