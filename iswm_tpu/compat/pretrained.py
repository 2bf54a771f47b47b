"""ImageNet-pretrained backbone initialization from local weight caches.

Reference behavior: ``pretrained_backbone=True`` is the factory default
(reference network/modeling.py:75, train.py:412-419) and pulls torchvision
ImageNet weights via torch-hub (reference network/backbone/resnet.py:218-226),
then adapts the stem for non-RGB inputs by mean-replicating conv1
(network/modeling.py:25-43).

This box (and typical TPU CI) has no network egress, so resolution is
cache-only: we search, in order,

  1. ``$ISWM_PRETRAINED_DIR``
  2. ``~/.cache/iswm_tpu/pretrained``
  3. ``~/.cache/torch/hub/checkpoints``  (torch-hub's own cache)

for a file named ``<backbone>.pth`` or the torchvision convention
``<backbone>-<hash>.pth``.  If none is found the model keeps its random
init with a loud warning (training must not hard-fail in clean CI), unless
``ISWM_REQUIRE_PRETRAINED=1`` is set.
"""

from __future__ import annotations

import glob
import os
import warnings
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from .torch_import import (
    adapt_stem_in_channels,
    import_mobilenetv2_backbone,
    import_resnet_backbone,
    import_xception_backbone,
    strip_module_prefix,
)

_CACHE_DIRS = (
    lambda: os.environ.get("ISWM_PRETRAINED_DIR"),
    lambda: os.path.expanduser("~/.cache/iswm_tpu/pretrained"),
    lambda: os.path.expanduser("~/.cache/torch/hub/checkpoints"),
)

_RESNETS = (
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d",
    "wide_resnet50_2", "wide_resnet101_2",
)


_FILE_ALIASES = {
    "mobilenetv2": ("mobilenetv2", "mobilenet_v2"),
}


def find_pretrained_file(backbone: str) -> Optional[str]:
    """Locate a cached torchvision ImageNet state dict for ``backbone``."""
    names = _FILE_ALIASES.get(backbone, (backbone,))
    for get_dir in _CACHE_DIRS:
        d = get_dir()
        if not d or not os.path.isdir(d):
            continue
        for name in names:
            exact = os.path.join(d, f"{name}.pth")
            if os.path.isfile(exact):
                return exact
            matches = sorted(glob.glob(os.path.join(d, f"{name}-*.pth")))
            if matches:
                return matches[0]
    return None


def load_torchvision_backbone(path: str, backbone: str) -> Tuple[dict, dict]:
    """Raw ImageNet .pth -> ({'backbone': params}, {'backbone': stats}).

    ResNets and MobileNetV2 use torchvision layout; Xception uses the
    reference's module layout (reference network/backbone/xception.py).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {
        k: v.detach().cpu().numpy()
        for k, v in strip_module_prefix(sd).items()
    }
    params: dict = {}
    stats: dict = {}
    if backbone in _RESNETS:
        import_resnet_backbone(params, stats, sd, backbone, prefix="")
    elif backbone == "xception":
        import_xception_backbone(params, stats, sd, prefix="")
    elif backbone == "mobilenetv2":
        import_mobilenetv2_backbone(params, stats, sd, prefix="")
    else:
        raise NotImplementedError(f"no pretrained import for {backbone!r}")
    return params, stats


def _overlay(dst: Any, src: dict) -> Any:
    """Replace leaves of ``dst`` with ``src`` values, keeping dtype/sharding."""
    if isinstance(src, dict):
        out = dict(dst)
        for k, v in src.items():
            out[k] = _overlay(dst[k], v)
        return out
    arr = jnp.asarray(np.asarray(src), dtype=dst.dtype)
    if arr.shape != dst.shape:
        raise ValueError(f"pretrained shape {arr.shape} != model {dst.shape}")
    return jax.device_put(arr, dst.sharding)


def apply_pretrained_backbone(
    params: Any,
    batch_stats: Any,
    cfg: ModelConfig,
    path: Optional[str] = None,
) -> Tuple[Any, Any, Optional[str]]:
    """Overlay ImageNet backbone weights onto freshly-initialized trees.

    Returns (params, batch_stats, source_path_or_None).  Head parameters
    are untouched (reference trains the head from scratch,
    network/modeling.py:44-56).
    """
    path = path or find_pretrained_file(cfg.backbone)
    if path is None:
        msg = (
            f"pretrained_backbone=True but no cached ImageNet weights found "
            f"for {cfg.backbone!r} (searched $ISWM_PRETRAINED_DIR, "
            f"~/.cache/iswm_tpu/pretrained, ~/.cache/torch/hub/checkpoints); "
            f"continuing with random initialization"
        )
        if os.environ.get("ISWM_REQUIRE_PRETRAINED"):
            raise FileNotFoundError(msg)
        warnings.warn(msg, stacklevel=2)
        return params, batch_stats, None
    bb_params, bb_stats = load_torchvision_backbone(path, cfg.backbone)
    bb_params = adapt_stem_in_channels(bb_params, cfg.in_channels)
    new_params = _overlay(params, bb_params)
    new_stats = _overlay(batch_stats, bb_stats)
    return new_params, new_stats, path
