from .class_weights import calculate_class_weights
from .datasets import (
    BinarySegmentation,
    EvaluationDataset,
    batch_iterator,
    decode_target,
)
from .synthetic import generate_scene, write_dataset
from .transforms import (
    AugmentConfig,
    augment_batch,
    augment_sample,
    denormalize,
    normalize,
    val_transform_batch,
)

__all__ = [
    "AugmentConfig",
    "BinarySegmentation",
    "EvaluationDataset",
    "augment_batch",
    "augment_sample",
    "batch_iterator",
    "calculate_class_weights",
    "decode_target",
    "denormalize",
    "generate_scene",
    "normalize",
    "val_transform_batch",
    "write_dataset",
]
