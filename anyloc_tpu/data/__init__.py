"""Dataset layer: the CustomDataset protocol, per-dataset GT logic, transforms,
and fixed-shape batch iteration for XLA (SURVEY.md §2.2)."""

from anyloc_tpu.data.base import VPRDataset, natsorted
from anyloc_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    base_transform,
    center_crop_multiple,
    load_image,
    preprocess_image,
)
from anyloc_tpu.data.registry import get_dataset, dataset_names

__all__ = [
    "VPRDataset",
    "natsorted",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "base_transform",
    "center_crop_multiple",
    "load_image",
    "preprocess_image",
    "get_dataset",
    "dataset_names",
]
