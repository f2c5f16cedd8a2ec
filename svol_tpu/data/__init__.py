from svol_tpu.data.dataset import SVOLDataset, build_dataset
from svol_tpu.data.pipeline import build_loader

__all__ = ["SVOLDataset", "build_dataset", "build_loader"]
