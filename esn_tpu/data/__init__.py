from .datasets import (CITYSCAPES, CAMVID, SPECS, DatasetSpec, get_spec,
                       ManifestDataset, SyntheticDataset, read_manifest)
from .inform import compute_class_weights, collect_stats, load_or_compute_inform
from .augment import make_augment_fn, make_eval_transform, normalize
from .loader import BatchLoader, device_prefetch
from .builders import build_dataset_train, build_dataset_test
from . import palettes

__all__ = [
    "CITYSCAPES", "CAMVID", "SPECS", "DatasetSpec", "get_spec",
    "ManifestDataset", "SyntheticDataset", "read_manifest",
    "compute_class_weights", "collect_stats", "load_or_compute_inform",
    "make_augment_fn", "make_eval_transform", "normalize",
    "BatchLoader", "device_prefetch",
    "build_dataset_train", "build_dataset_test", "palettes",
]
