"""Batch inference driver: checkpoint -> per-image products on disk.

Replaces the reference's predict.py main path (reference
predict.py:258-368): loads the best checkpoint, walks an input directory
(top level + one level of subdirectories, predict.py:300-312), and writes
``{name}_predict.png`` (+ optional ``_confidence.png``,
``_binary_mask.png``) per image.  Large scenes route through the batched
sliding-window TileEngine instead of the reference's single whole-image
forward.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import IMG_EXTENSIONS, decode_target
from ..data.transforms import val_transform_batch
from ..models import build_model
from ..train import checkpoint as ckpt_lib
from ..train.optim import make_optimizer
from ..train.step import create_train_state
from .products import binarize_confidence_map, confidence_map, prob_to_mask
from .tiling import TileEngine


def _channel_mean(feats) -> np.ndarray:
    """[1, h, w, c] activations -> normalized [h, w] heatmap."""
    arr = np.asarray(feats[0], np.float32).mean(axis=-1)
    lo, hi = arr.min(), arr.max()
    return (arr - lo) / (hi - lo + 1e-8)


class Predictor:
    def __init__(self, cfg: Config, ckpt_path: Optional[str] = None):
        cfg.validate()
        self.cfg = cfg
        self.model = build_model(cfg.model)

        # materialize a state template, then restore weights into it
        tx, _ = make_optimizer(cfg.optim, total_itrs=1)
        sample = jnp.zeros((1, 64, 64, cfg.model.in_channels), cfg.model.compute_dtype)
        state = create_train_state(self.model, tx, jax.random.key(0), sample)
        # QAT checkpoints carry learned activation amaxes in a "quant"
        # collection (see conv_scales_from_quant) — reused for int8 serving
        self.quant: Dict = {}
        if ckpt_path and ckpt_path.endswith((".pth", ".pt")):
            # reference torch checkpoint: import directly (predict parity
            # with reference predict.py:69-91 incl. module.-prefix strip)
            from ..compat.torch_import import load_reference_checkpoint

            params, batch_stats, _ = load_reference_checkpoint(
                ckpt_path, backbone=cfg.model.backbone, head=cfg.model.name
            )
            self.params = jax.tree.map(
                lambda x: jnp.asarray(x, cfg.model.param_dtype), params
            )
            self.batch_stats = jax.tree.map(
                lambda x: jnp.asarray(x, cfg.model.param_dtype), batch_stats
            )
        else:
            if ckpt_path:
                state, _ = ckpt_lib.restore(ckpt_path, state)
            self.params = state.params
            self.batch_stats = state.batch_stats
            self.quant = getattr(state, "quant", {}) or {}

        def _apply(images, params, stats):  # [N,T,T,C] normalized
            return self.model.apply(
                {"params": params, "batch_stats": stats},
                images.astype(cfg.model.compute_dtype),
                train=False,
            ).astype(jnp.float32)

        def model_fn(images):  # [N,T,T,C] normalized -> [N,T,T,K]
            return _apply(images, self.params, self.batch_stats)

        # weights-as-arguments protocol for TileEngine (infer/tiling.py)
        model_fn.inner = _apply
        model_fn.bound_args = (self.params, self.batch_stats)

        variant = cfg.predict.serving_variant
        self._needs_calibration = False
        if variant == "int8":
            # weight-only: no calibration needed, build immediately
            from .quantization import make_variant_fn

            model_fn = make_variant_fn(
                self.model, self.batch_stats, self.params, "int8"
            )
        elif variant.startswith("int8_exec"):
            # activation scales calibrate on the first scene's tiles
            # (predict_image), after which the engine is rebuilt once
            self._needs_calibration = True
        elif variant != "bf16":
            raise ValueError(f"unknown serving_variant {variant!r}")

        self._make_engine = lambda fn: TileEngine(
            fn,
            tile=cfg.predict.tile_size,
            overlap=cfg.predict.tile_overlap,
            batch=cfg.predict.tile_batch,
            num_classes=cfg.model.num_classes,
        )
        self.engine = self._make_engine(model_fn)

    def _calibrate_int8(self, scene: jax.Array) -> None:
        """Calibrate conv input scales on tiles of the first real scene and
        swap the tile engine onto the int8 serving fn (one-time rebuild)."""
        from .quantization import calibrate_conv_inputs, make_variant_fn

        t = self.cfg.predict.tile_size
        h, w = scene.shape[:2]
        tiles = []
        for ty, tx in ((0, 0), (max(0, h - t), max(0, w - t)),
                       (max(0, (h - t) // 2), max(0, (w - t) // 2))):
            tile = scene[ty : ty + t, tx : tx + t]
            if tile.shape[0] == t and tile.shape[1] == t:
                tiles.append(jnp.asarray(tile, jnp.float32)[None])
        if not tiles:  # scene smaller than a tile in SOME dim: crop + pad
            # max(0, ...) both ways — a 256x1024 scene must crop the long
            # axis to the tile and pad only the short one (negative pad
            # widths raise in jnp.pad)
            pad_h, pad_w = max(0, t - h), max(0, t - w)
            tiles = [jnp.pad(jnp.asarray(scene[:t, :t], jnp.float32),
                             ((0, pad_h), (0, pad_w), (0, 0)))[None]]
        conv_scales = calibrate_conv_inputs(
            self.model, self.params, self.batch_stats, tiles, wide=True,
            grouped=self.cfg.predict.int8_grouped,
            stem=self.cfg.predict.int8_stem,
        )
        if self.quant:
            # QAT-learned running amaxes override the few-tile calibration
            # where present (learned over the whole training distribution)
            from .quantization import conv_scales_from_quant

            conv_scales.update(conv_scales_from_quant(self.quant))
        fn = make_variant_fn(
            self.model, self.batch_stats, self.params,
            self.cfg.predict.serving_variant, conv_scales=conv_scales,
            grouped=self.cfg.predict.int8_grouped,
            stem=self.cfg.predict.int8_stem,
        )
        self.engine = self._make_engine(fn)
        self._needs_calibration = False

    # ------------------------------------------------------------- single
    def predict_image(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """uint8 [H,W,3] image -> products dict.

        ``mask`` uses the predict-path semantics (fg prob > pred_threshold,
        reference predict.py:275) unless cfg.predict.use_argmax selects the
        validation semantics (train.py:644).
        """
        cfg = self.cfg.predict
        x = val_transform_batch(jnp.asarray(image)[None])[0]
        if self._needs_calibration:
            self._calibrate_int8(x)
        logits = self.engine.infer_scene(x)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        prob_fg = probs[..., 1]
        if cfg.use_argmax:
            mask = np.argmax(np.asarray(logits), axis=-1).astype(np.uint8)
        else:
            mask = prob_to_mask(prob_fg, cfg.pred_threshold)
        conf = confidence_map(prob_fg)
        return {
            "mask": mask,
            "prob_fg": prob_fg,
            "confidence": conf,
            "rgb": decode_target(mask),
        }

    # -------------------------------------------------------- feature maps
    def extract_feature_maps(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Channel-mean activation heatmaps of the backbone taps + ASPP.

        Functional replacement for the reference's vestigial
        --save_feature_maps path (reference train.py:342-344, 869-872 — the
        flag only ever created a directory; its FeatureVisDataset import is
        dead, SURVEY §0.1.1).  Uses flax intermediate capture on a center
        tile; returns float [h, w] maps in [0, 1].
        """
        t = self.cfg.predict.tile_size
        h, w = image.shape[:2]
        top, left = max(0, (h - t) // 2), max(0, (w - t) // 2)
        tile = image[top : top + t, left : left + t]
        if tile.shape[0] < t or tile.shape[1] < t:
            tile = np.pad(
                tile, ((0, t - tile.shape[0]), (0, t - tile.shape[1]), (0, 0)),
                mode="reflect",
            )
        x = val_transform_batch(jnp.asarray(tile)[None]).astype(
            self.cfg.model.compute_dtype
        )
        _, mods = self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            x,
            train=False,
            capture_intermediates=lambda mdl, name: name == "__call__",
            mutable=["intermediates"],
        )
        inter = mods["intermediates"]
        maps: Dict[str, np.ndarray] = {}

        def tap(path, label):
            node = inter
            for p in path:
                if p not in node:
                    return
                node = node[p]
            feats = node["__call__"][0]
            if isinstance(feats, dict):
                for k, v in feats.items():
                    maps[f"{label}_{k}"] = _channel_mean(v)
            else:
                maps[label] = _channel_mean(feats)

        tap(("backbone",), "backbone")
        tap(("head", "aspp"), "aspp")
        return maps

    # ---------------------------------------------------------- directory
    def process_images(self, input_dir: str, output_dir: str) -> int:
        """Walk input_dir (and one level of subdirs); write products.
        Returns the number of images processed."""
        from PIL import Image

        cfg = self.cfg.predict
        os.makedirs(output_dir, exist_ok=True)

        jobs = []
        root = Path(input_dir)
        for entry in sorted(root.iterdir()):
            if entry.is_file() and entry.suffix.lower() in IMG_EXTENSIONS:
                jobs.append((entry, Path(output_dir)))
            elif entry.is_dir():
                sub_out = Path(output_dir) / entry.name
                for f in sorted(entry.iterdir()):
                    if f.is_file() and f.suffix.lower() in IMG_EXTENSIONS:
                        jobs.append((f, sub_out))

        count = 0
        for src, out_dir in jobs:
            try:
                out_dir.mkdir(parents=True, exist_ok=True)
                with Image.open(src) as im:
                    image = np.asarray(im.convert("RGB"), dtype=np.uint8)
                products = self.predict_image(image)
                stem = src.stem
                Image.fromarray(products["rgb"]).save(out_dir / f"{stem}_predict.png")
                if cfg.save_confidence:
                    Image.fromarray(products["confidence"]).save(
                        out_dir / f"{stem}_confidence.png"
                    )
                if cfg.save_binary:
                    binary = binarize_confidence_map(
                        products["confidence"],
                        min_prob=cfg.min_prob,
                        max_prob=cfg.max_prob,
                        pred_mask=products["rgb"],
                        enable_wave_processing=cfg.enable_wave_processing,
                        synthetic_prob=cfg.synthetic_damage_prob,
                        synthetic_ratio=cfg.synthetic_damage_ratio,
                    )
                    Image.fromarray(binary).save(out_dir / f"{stem}_binary_mask.png")
                if cfg.save_feature_maps:
                    for label, fmap in self.extract_feature_maps(image).items():
                        Image.fromarray((fmap * 255).astype(np.uint8)).save(
                            out_dir / f"{stem}_fmap_{label}.png"
                        )
                count += 1
            except Exception as e:  # skip bad images (reference predict.py:363-364)
                print(f"skipping {src}: {e}")
        return count
