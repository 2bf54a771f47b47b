"""Datasets: BinarySegmentation + EvaluationDataset.

``BinarySegmentation`` is re-specified from its call sites because the
reference snapshot lost the datasets/ package (SURVEY §0.1.1):
  - ctor (root, split, transform-ish) (reference train.py:371-380)
  - yields (image, label) pairs (train.py:1037-1040)
  - exposes ``.images``: filename list usable as sortable timestamps
    (train.py:649,662,673)
  - class-level ``decode_target`` mask->RGB {0: black, 1: white}
    (reference predict.py:379, train.py:611-618)
  - labels {0,1}, 255 = ignore (train.py:457)

Directory layout follows the one dataset class that *did* survive —
``EvaluationDataset`` (reference evaluate_quantization.py:34-79): an
``imgs/`` dir + ``masks/`` dir with ``{name}_mask{ext}`` files; masks are
grayscale, binarized by >0; a missing mask yields an all-zero label.

Unlike the reference (torch DataLoader + PIL transforms), these classes
only do host-side IO and batch assembly into numpy arrays — every random
augmentation runs on device (iswm_tpu.data.transforms).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def decode_target(mask: np.ndarray) -> np.ndarray:
    """{1 -> white, 0 -> black} RGB decode (reference train.py:611-618)."""
    mask = np.asarray(mask)
    rgb = np.zeros((*mask.shape, 3), dtype=np.uint8)
    rgb[mask == 1] = (255, 255, 255)
    return rgb


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _load_mask(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        m = np.asarray(im.convert("L"), dtype=np.uint8)
    out = np.zeros_like(m)
    out[m > 0] = 1  # binarize (reference evaluate_quantization.py:61-63)
    return out


class BinarySegmentation:
    """Binary ISW segmentation dataset over an imgs/ + masks/ tree."""

    decode_target = staticmethod(decode_target)

    def __init__(self, root: str, split: str = "train", transform=None, cache: bool = False):
        self.root = root
        self.split = split
        self.transform = transform  # host-side paired callable, optional
        self.cache = cache  # keep decoded arrays in RAM (host decode is the
        # bottleneck on small hosts; augmentation runs on device anyway)
        self._cache: dict = {}

        base = Path(root) if split in ("", ".") else Path(root) / split
        if not (base / "imgs").is_dir():
            # also accept a flat root (root/imgs) for split-less trees
            if (Path(root) / "imgs").is_dir():
                base = Path(root)
            else:
                raise FileNotFoundError(f"no imgs/ directory under {base} or {root}")
        self.img_dir = base / "imgs"
        self.mask_dir = base / "masks"
        self.images: List[str] = sorted(
            f for f in os.listdir(self.img_dir) if f.lower().endswith(IMG_EXTENSIONS)
        )
        if not self.images:
            raise FileNotFoundError(f"no images found in {self.img_dir}")

    def __len__(self) -> int:
        return len(self.images)

    def _mask_path(self, img_name: str) -> Optional[Path]:
        stem, ext = os.path.splitext(img_name)
        for cand_ext in (ext,) + tuple(e for e in IMG_EXTENSIONS if e != ext):
            p = self.mask_dir / f"{stem}_mask{cand_ext}"
            if p.exists():
                return p
        return None

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.cache and idx in self._cache:
            image, label = self._cache[idx]
        else:
            name = self.images[idx]
            image = _load_image(str(self.img_dir / name))
            mask_path = self._mask_path(name)
            if mask_path is None:
                label = np.zeros(image.shape[:2], dtype=np.uint8)  # empty-mask fallback
            else:
                label = _load_mask(str(mask_path))
            if self.cache:
                self._cache[idx] = (image, label)
        if self.transform is not None:
            image, label = self.transform(image, label)
        return image, label


class EvaluationDataset(BinarySegmentation):
    """Eval-only variant returning (image, mask, name, raw image) 4-tuples
    (reference evaluate_quantization.py:34-79)."""

    def __getitem__(self, idx: int):  # type: ignore[override]
        name = self.images[idx]
        image = _load_image(str(self.img_dir / name))
        mask_path = self._mask_path(name)
        if mask_path is None:
            label = np.zeros(image.shape[:2], dtype=np.uint8)
        else:
            label = _load_mask(str(mask_path))
        out = image
        if self.transform is not None:
            out, _ = self.transform(image, label)
        return out, label, name, image


def batch_iterator(
    dataset: BinarySegmentation,
    batch_size: int,
    *,
    shuffle: bool = False,
    drop_last: bool = False,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Host batch assembly (replaces torch DataLoader, reference
    train.py:949-953).  Yields stacked uint8 (images [B,H,W,3], labels [B,H,W]).
    Requires uniform image sizes within a batch (the reference's loader had
    the same implicit constraint)."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            if drop_last and len(idxs) < batch_size:
                continue
            imgs, lbls = zip(*(dataset[int(i)] for i in idxs))
            yield np.stack(imgs), np.stack(lbls).astype(np.int32)
        epoch += 1
        if epochs is None:
            continue
