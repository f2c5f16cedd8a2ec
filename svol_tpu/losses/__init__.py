from svol_tpu.losses.criterion import SetCriterion, build_criterion
from svol_tpu.losses.matcher import match_per_frame, match_per_video

__all__ = ["SetCriterion", "build_criterion", "match_per_frame", "match_per_video"]
