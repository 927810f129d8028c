from .dataset import (
    BatchLoader,
    ImageFolderDataset,
    SyntheticDataset,
    generate_synthetic_dataset,
)
from .imagenet100 import (
    dataset_stats,
    detect_structure,
    download_imagenet100,
    kaggle_available,
    split_flat_classes,
)

__all__ = [
    "BatchLoader",
    "ImageFolderDataset",
    "SyntheticDataset",
    "generate_synthetic_dataset",
    "dataset_stats",
    "detect_structure",
    "download_imagenet100",
    "kaggle_available",
    "split_flat_classes",
]
