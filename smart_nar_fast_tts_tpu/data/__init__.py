"""Data layer: offline feature extraction and the online bucketed pipeline."""

from .textgrid import TextGrid, read_textgrid
from .alignment import get_alignment
from .pitch import estimate_f0
from .preprocessor import Preprocessor
from .dataset import AcousticDataset, TextOnlyDataset, BucketBatcher

__all__ = [
    "TextGrid", "read_textgrid", "get_alignment", "estimate_f0",
    "Preprocessor", "AcousticDataset", "TextOnlyDataset", "BucketBatcher",
]
