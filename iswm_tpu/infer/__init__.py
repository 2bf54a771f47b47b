from .products import (
    binarize_confidence_map,
    confidence_map,
    generate_synthetic_broken_areas,
    has_internal_wave,
    prob_to_mask,
)
from .predictor import Predictor
from .tiling import TileEngine, tile_origins

__all__ = [
    "Predictor",
    "TileEngine",
    "binarize_confidence_map",
    "confidence_map",
    "generate_synthetic_broken_areas",
    "has_internal_wave",
    "prob_to_mask",
    "tile_origins",
]
