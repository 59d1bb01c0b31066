from care_tpu.data.loader import get_loader
from care_tpu.data.datasets import JointDataset, VideoOnlyDataset, TextOnlyDataset

__all__ = ["get_loader", "JointDataset", "VideoOnlyDataset", "TextOnlyDataset"]
