from svol_tpu.utils.logging import AverageMeter, setup_logger
from svol_tpu.utils.io import load_jsonl, save_json, save_jsonl, cur_time

__all__ = ["AverageMeter", "setup_logger", "load_jsonl", "save_json", "save_jsonl", "cur_time"]
