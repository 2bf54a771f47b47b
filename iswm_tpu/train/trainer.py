"""The training orchestrator.

End-to-end replacement for the reference's main loop + validation driver
(reference train.py:840-1116, 620-745), redesigned TPU-first:

  - ONE jitted program per training iteration (augment + fwd + loss + bwd +
    optimizer + schedule), batch sharded over the mesh's data axis;
  - validation collects (filename, pred, gt) for the whole set via a jitted
    eval step, sorts by filename (timestamp proxy, train.py:673), then
    scores 7-frame sliding windows with StreamMetrics (train.py:676-683);
  - best-model gate == reference is_best_score; on best: Orbax checkpoint +
    validation image dump;
  - observability: JSONL/MLflow series, plots, jax.profiler trace hook
    (the reference had no profiler at all, SURVEY §5.1).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import (
    AugmentConfig,
    BinarySegmentation,
    batch_iterator,
    calculate_class_weights,
    decode_target,
    write_dataset,
)
from ..metrics import StreamMetrics, weighted_score
from ..models import build_model
from ..ops import make_loss_fn
from ..parallel.mesh import make_mesh
from . import checkpoint as ckpt_lib
from .best_score import is_best_score, update_best_score
from .logging import MetricsLogger, try_setup_mlflow
from .optim import make_optimizer
from .step import TrainState, create_train_state, make_eval_step, make_train_step


class Trainer:
    def __init__(self, cfg: Config, mesh=None):
        cfg.validate()
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            data_axis=cfg.parallel.data_axis, model_axis=cfg.parallel.model_axis
        )
        data_devices = self.mesh.shape[self.mesh.axis_names[0]]
        if cfg.data.batch_size % data_devices != 0:
            raise ValueError(
                f"batch_size ({cfg.data.batch_size}) must be divisible by the "
                f"mesh data axis ({data_devices} devices); adjust batch_size "
                f"or pass a smaller mesh"
            )

        # ------------------------------------------------------------ data
        if cfg.data.synthetic:
            root = os.path.join(cfg.data.data_root, "synthetic")
            if not os.path.isdir(os.path.join(root, "train")):
                n_val = 0 if cfg.data.synthetic_sequence_val else cfg.data.synthetic_val_size
                write_dataset(
                    root,
                    n_train=cfg.data.synthetic_train_size,
                    n_val=n_val,
                    size=(cfg.data.synthetic_image_size,) * 2,
                    seed=cfg.train.random_seed,
                )
                if cfg.data.synthetic_sequence_val:
                    from ..data.synthetic import write_sequence_dataset

                    write_sequence_dataset(
                        root,
                        n_sequences=max(
                            1,
                            cfg.data.synthetic_val_size
                            // cfg.metrics.sequence_length,
                        ),
                        length=cfg.metrics.sequence_length,
                        size=(cfg.data.synthetic_image_size,) * 2,
                        seed=cfg.train.random_seed + 1,
                        split="val",
                    )
            data_root = root
        else:
            data_root = cfg.data.data_root
        self.train_ds = BinarySegmentation(
            data_root, split="train", cache=cfg.data.cache_in_memory
        )
        self.val_ds = BinarySegmentation(
            data_root, split="val", cache=cfg.data.cache_in_memory
        )

        # ----------------------------------------------------------- model
        self.model = build_model(cfg.model)

        # ------------------------------------------------------------ loss
        class_weights = None
        if cfg.loss.loss_type == "IWce_loss":
            class_weights = calculate_class_weights(
                lbl
                for _, lbl in batch_iterator(
                    self.train_ds, cfg.data.batch_size, epochs=1
                )
            )
            print(f"Class weights: {class_weights}")
        self.class_weights = class_weights
        self.loss_fn = make_loss_fn(
            cfg.loss.loss_type,
            class_weights=class_weights,
            ignore_index=cfg.loss.ignore_index,
            focal_alpha=cfg.loss.focal_alpha,
            focal_gamma=cfg.loss.focal_gamma,
            fused=cfg.loss.fused_kernel,
            num_classes=cfg.model.num_classes,
            mesh=self.mesh,
        )

        # ------------------------------------------------------- optimizer
        self.tx, self.schedule = make_optimizer(cfg.optim, cfg.train.total_itrs)

        # ------------------------------------------------------ train step
        aug = AugmentConfig(
            crop_size=cfg.data.crop_size,
            scale_min=cfg.data.scale_range[0],
            scale_max=cfg.data.scale_range[1],
            hflip_prob=cfg.data.hflip_prob,
            mean=tuple(cfg.data.mean),
            std=tuple(cfg.data.std),
        )
        self._aug = aug
        self.train_step = make_train_step(
            self.model, self.tx, self.loss_fn, augment=aug,
            remat=cfg.parallel.remat,
        )
        self.eval_step = make_eval_step(self.model, want=("preds",))
        # int8-early / bf16-finish hybrid schedule (TrainConfig.
        # int8_switch_iter): iterations >= the switch run the plain bf16
        # step.  The bf16 model/step are built lazily at the switch (the
        # second compile happens then, not at startup).
        self._switch_iter = (
            cfg.train.int8_switch_iter if cfg.model.int8_training else 0
        )

        # ----------------------------------------------------------- state
        rng = jax.random.key(cfg.train.random_seed)
        self.rng, init_rng = jax.random.split(rng)
        sample = jnp.zeros(
            (1, cfg.data.crop_size, cfg.data.crop_size, cfg.model.in_channels),
            cfg.model.compute_dtype,
        )
        self.state = create_train_state(self.model, self.tx, init_rng, sample)
        if cfg.model.pretrained_backbone:
            # reference default behavior: ImageNet backbone, fresh head
            # (network/modeling.py:75, backbone/resnet.py:218-226)
            from ..compat.pretrained import apply_pretrained_backbone

            p, bs, src = apply_pretrained_backbone(
                self.state.params, self.state.batch_stats, cfg.model
            )
            self.state = self.state.replace(params=p, batch_stats=bs)
            if src:
                print(f"initialized {cfg.model.backbone} backbone from {src}")
        self.best_score: Optional[Dict[str, float]] = None
        self.best_weighted = 0.0

        # --------------------------------------------------------- logging
        tag = cfg.train.experiment_tag or time.strftime("%Y%m%d_%H%M%S")
        exp_name = (
            f"DeepLabV3Plus_{cfg.model.backbone}_{cfg.loss.loss_type}_"
            f"{cfg.optim.optimizer}_os{cfg.model.output_stride}_{tag}"
        )
        mlflow = try_setup_mlflow(exp_name, cfg.train.use_mlflow)
        self.logger = MetricsLogger(cfg.train.log_dir, mlflow)
        # config snapshot (the reference logs ~35 hyperparams to mlflow,
        # train.py:884-934; we persist the full config always and mirror it
        # into mlflow params when enabled)
        os.makedirs(cfg.train.log_dir, exist_ok=True)
        cfg.to_yaml(os.path.join(cfg.train.log_dir, "config.yaml"))
        if mlflow is not None:
            try:
                mlflow.start_run()
                flat = {
                    f"{s}.{k}": str(v)
                    for s, sub in cfg.to_dict().items()
                    for k, v in sub.items()
                }
                mlflow.log_params(flat)
            except Exception:
                pass

        # ------------------------------------------------------ restore
        if cfg.train.ckpt:
            self._restore(cfg.train.ckpt, continue_training=cfg.train.continue_training)
        elif cfg.train.auto_resume:
            latest = ckpt_lib.find_latest(cfg.train.checkpoints_dir)
            if latest is not None:
                self._restore(latest, continue_training=True)

    # ----------------------------------------------------------------- io
    def _restore(self, path: str, continue_training: bool) -> None:
        restored, meta = ckpt_lib.restore(path, self.state)
        if continue_training:
            self.state = restored
            self.best_weighted = float(meta.get("weighted_score", 0.0))
            bs = meta.get("best_score") or None
            self.best_score = bs if bs else None
            print(f"Resumed at iter {int(self.state.step)} (best {self.best_weighted:.4f})")
        else:
            # model weights only; fresh optimizer (reference train.py:1006-1011)
            self.state = TrainState(
                step=self.state.step,
                params=restored.params,
                batch_stats=restored.batch_stats,
                opt_state=self.state.opt_state,
                quant=restored.quant,
            )
            print(f"Loaded model weights from {path}")

    # --------------------------------------------------------------- train
    def fit(self) -> Dict[str, float]:
        cfg = self.cfg
        from ..data.loader import device_prefetch_iterator

        it = device_prefetch_iterator(
            batch_iterator(
                self.train_ds,
                cfg.data.batch_size,
                shuffle=True,
                drop_last=True,
                seed=cfg.train.random_seed,
                epochs=None,
            ),
            mesh=self.mesh,
            depth=cfg.data.num_workers // 2 or 2,
        )
        interval_loss = 0.0
        n_interval = 0
        pending_losses = []
        t0 = time.time()
        profiling = False
        # host-side step mirror: reading state.step each iteration would be
        # a device sync per step
        step = int(self.state.step)
        try:
            while step < cfg.train.total_itrs:
                if self._switch_iter and step >= self._switch_iter:
                    self._switch_to_bf16()
                if cfg.train.profile_steps:
                    if step == cfg.train.profile_start and not profiling:
                        jax.profiler.start_trace(
                            os.path.join(cfg.train.log_dir, "profile")
                        )
                        profiling = True
                    elif (
                        profiling
                        and step >= cfg.train.profile_start + cfg.train.profile_steps
                    ):
                        jax.profiler.stop_trace()
                        profiling = False
                images, labels = next(it)  # prefetched + device-placed
                self.state, metrics = self.train_step(
                    self.state, images, labels, self.rng
                )
                step += 1
                # keep the loss on device; fetching a scalar every step is a
                # hidden host sync (expensive on remote backends) — drain
                # once per print interval instead
                pending_losses.append(metrics["loss"])
                n_interval += 1

                if step % cfg.train.print_interval == 0:
                    lr = float(self.schedule(step))
                    interval_loss += float(np.sum(jax.device_get(pending_losses)))
                    pending_losses.clear()
                    avg = interval_loss / max(n_interval, 1)
                    self.logger.log_step(
                        step,
                        {
                            "train_loss": avg,
                            "lr": lr,
                            "epoch": step * cfg.data.batch_size / len(self.train_ds),
                        },
                    )
                    rate = n_interval * cfg.data.batch_size / (time.time() - t0)
                    print(
                        f"it {step}/{cfg.train.total_itrs} loss {avg:.4f} "
                        f"lr {lr:.5f} ({rate:.1f} img/s)"
                    )
                    interval_loss, n_interval, t0 = 0.0, 0, time.time()

                if (
                    cfg.train.latest_interval
                    and step % cfg.train.latest_interval == 0
                ):
                    ckpt_lib.save_latest(
                        cfg.train.checkpoints_dir,
                        self.state,
                        weighted_score=self.best_weighted,
                        best_score=self.best_score or {},
                    )

                if (
                    cfg.train.quick_eval_interval
                    and step % cfg.train.quick_eval_interval == 0
                    and step % cfg.train.val_interval != 0
                ):
                    qm = self.quick_eval()
                    self.logger.log_step(
                        step, {f"quick_{k}": v for k, v in qm.items()}
                    )
                    print(
                        f"[quick-eval @ {step}] "
                        + " ".join(f"{k} {v:.4f}" for k, v in qm.items())
                    )

                if step % cfg.train.val_interval == 0:
                    self.validate_and_save(step)
        finally:
            if profiling:
                jax.profiler.stop_trace()
            self.logger.save_plots(cfg.train.metrics_plots_dir)
            if self.logger.mlflow is not None:
                try:  # best-of-run metrics + completion status (reference
                    # train.py:1112-1116)
                    self.logger.mlflow.log_metric(
                        "best_weighted_score", self.best_weighted
                    )
                    self.logger.mlflow.set_tag("status", "completed")
                    self.logger.mlflow.end_run()
                except Exception:
                    pass
            self.logger.close()
        return {"best_weighted_score": self.best_weighted}

    # ------------------------------------------------------- hybrid switch
    def _switch_to_bf16(self) -> None:
        """int8-early / bf16-finish: swap the train/eval steps to a plain
        bf16 model (TrainConfig.int8_switch_iter).  QAT adds no parameters,
        so the TrainState (params, BN stats, optimizer state) carries over
        unchanged; a delayed-mode "quant" collection (stale activation
        amaxes) is dropped — the bf16 program does not read it."""
        import dataclasses

        mcfg = dataclasses.replace(
            self.cfg.model, int8_training=0, int8_training_bwd=False
        )
        self.model = build_model(mcfg)
        self.train_step = make_train_step(
            self.model, self.tx, self.loss_fn, augment=self._aug,
            remat=self.cfg.parallel.remat,
        )
        self.eval_step = make_eval_step(self.model, want=("preds",))
        if jax.tree_util.tree_leaves(self.state.quant):
            self.state = self.state.replace(quant={})
        print(
            f"[int8_switch @ {int(self.state.step)}] "
            "train step switched int8 -> bf16 (hybrid schedule)"
        )
        self._switch_iter = 0

    # ---------------------------------------------------------- validation
    def quick_eval(self) -> Dict[str, float]:
        """Device-side CM-only eval over the val set (no per-image host
        transfer, no front-tracking): miou/fiou/precision/recall/f1 from a
        streaming confusion matrix (metrics/device.py).  This is the cheap
        monitor; the full StreamMetrics validation at ``val_interval``
        keeps gating the best checkpoint (reference cadence
        train.py:1067-1080)."""
        from ..metrics.device import DeviceEvalAccumulator

        cfg = self.cfg
        acc = DeviceEvalAccumulator(cfg.model.num_classes)
        for images, labels in batch_iterator(
            self.val_ds, cfg.data.val_batch_size, epochs=1
        ):
            out = self.eval_step(
                self.state.params, self.state.batch_stats, jnp.asarray(images)
            )
            acc.update(jnp.asarray(labels), out["preds"])
        return acc.results()

    def validate(self) -> Tuple[Dict[str, float], StreamMetrics, list]:
        """Whole-set validation -> sliding-window metrics (reference
        train.py:620-696)."""
        cfg = self.cfg
        metrics = StreamMetrics(
            cfg.model.num_classes,
            sequence_length=cfg.metrics.sequence_length,
            threshold=cfg.metrics.wave_presence_threshold,
            weights=cfg.metrics.weights,
            max_fte=cfg.metrics.max_fte,
        )
        all_samples = []
        idx = 0
        for images, labels in batch_iterator(
            self.val_ds, cfg.data.val_batch_size, epochs=1
        ):
            out = self.eval_step(self.state.params, self.state.batch_stats,
                                 jnp.asarray(images))
            preds = np.asarray(out["preds"])
            for i in range(len(preds)):
                name = self.val_ds.images[idx + i]
                all_samples.append((name, preds[i], labels[i]))
            idx += len(preds)

        if len(all_samples) < cfg.metrics.sequence_length:
            print("Not enough samples for sequence evaluation.")
            if all_samples:
                for name, p, g in all_samples:
                    metrics.update(g, p, sequence_data=False)
        else:
            all_samples.sort(key=lambda s: s[0])
            L = cfg.metrics.sequence_length
            for i in range(len(all_samples) - L + 1):
                window = all_samples[i : i + L]
                window_preds = np.stack([s[1] for s in window])
                window_gts = np.stack([s[2] for s in window])
                metrics.update(window_gts, window_preds, sequence_data=True)
        return metrics.get_results(), metrics, all_samples

    def validate_and_save(self, step: int) -> Dict[str, float]:
        cfg = self.cfg
        val_score, metrics, samples = self.validate()
        ws = self.logger.log_validation(step, val_score, cfg.metrics.weights)
        print(f"[val @ {step}] weighted {ws:.4f} | " + ", ".join(
            f"{k} {val_score[k]:.4f}"
            for k in ("MIoU", "Foreground IoU", "Foreground F1")
        ))

        if is_best_score(val_score, self.best_score, cfg.metrics.weights):
            self.best_score = update_best_score(val_score)
            self.best_weighted = ws
            path = ckpt_lib.save_best(
                cfg.train.checkpoints_dir,
                self.state,
                model_name=f"{cfg.model.name}_{cfg.model.backbone}",
                dataset=cfg.data.dataset,
                output_stride=cfg.model.output_stride,
                num_classes=cfg.model.num_classes,
                weighted=ws,
                val_score=val_score,
                best_score=self.best_score,
            )
            print(f"New best ({ws:.4f}) -> {path}")
            if cfg.train.save_val_results:
                out_dir = os.path.join(
                    cfg.train.val_results_dir,
                    f"best_model_iter_{step}_score_{ws:.4f}",
                )
                limit = cfg.train.val_dump_limit
                save_validation_results(
                    out_dir,
                    samples[:limit] if limit else samples,
                    self.val_ds,
                    save_confidence=cfg.train.save_confidence_map,
                )
        self.logger.save_confusion_matrix(
            metrics.confusion_matrix, cfg.train.metrics_plots_dir, step
        )
        return val_score


def save_validation_results(
    out_dir: str,
    samples,
    dataset: BinarySegmentation,
    save_confidence: bool = False,
) -> None:
    """Dump per-sample (original, GT, pred, overlay) PNGs into a
    best_model_iter_* directory (reference train.py:461-523)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    name_to_idx = {n: i for i, n in enumerate(dataset.images)}
    for name, pred, gt in samples:
        stem = os.path.splitext(name)[0]
        img, _ = dataset[name_to_idx[name]]
        Image.fromarray(img).save(os.path.join(out_dir, f"{stem}_image.png"))
        Image.fromarray(decode_target(gt)).save(
            os.path.join(out_dir, f"{stem}_gt.png")
        )
        Image.fromarray(decode_target(pred)).save(
            os.path.join(out_dir, f"{stem}_pred.png")
        )
        overlay = img.astype(np.float32).copy()
        overlay[pred == 1] = 0.3 * overlay[pred == 1] + 0.7 * np.array([255, 0, 0])
        Image.fromarray(overlay.astype(np.uint8)).save(
            os.path.join(out_dir, f"{stem}_overlay.png")
        )
