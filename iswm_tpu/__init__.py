"""ISWM-TPU: TPU-native internal-solitary-wave segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the ISWM
reference pipeline (Alanlee0323/ISWM): DeepLabV3+/DeepLabV3 segmentation
models, device-resident augmentation, fused losses, the four-evaluator
metrics engine (confusion matrix / temporal / front-tracking / region),
a sharded pjit trainer with Orbax checkpoints, a batched sliding-window
inference engine, and bf16/int8 quantized serving.

Layout:
    iswm_tpu.models   — flax.linen model zoo (ResNet/MobileNet/Xception + DeepLab heads)
    iswm_tpu.ops      — losses, resize, pallas kernels
    iswm_tpu.data     — datasets, paired transforms (device-side), loaders
    iswm_tpu.metrics  — numpy-exact evaluators + on-device reductions
    iswm_tpu.train    — jitted/sharded train loop, optax schedules, checkpoints
    iswm_tpu.infer    — tile engine, prediction products, quantization harness
    iswm_tpu.parallel — mesh / sharding helpers
    iswm_tpu.cli      — train/predict/evaluate entry points (reference-flag parity)
    iswm_tpu.compat   — reference .pth checkpoint importer
"""

__version__ = "0.1.0"

# Convenience re-exports (import is cheap; jax loads lazily inside)
from .config import Config  # noqa: E402

__all__ = ["Config", "__version__"]
