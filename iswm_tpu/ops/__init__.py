from .resize import resize_bilinear, resize_nearest
from .losses import (
    cross_entropy_loss,
    weighted_cross_entropy_loss,
    focal_loss,
    make_loss_fn,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "cross_entropy_loss",
    "weighted_cross_entropy_loss",
    "focal_loss",
    "make_loss_fn",
]
