"""Trainer stack tests: optimizers/schedules, best gate, end-to-end smoke."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iswm_tpu.config import Config
from iswm_tpu.train import (
    Trainer,
    initialize_best_score,
    is_best_score,
    make_optimizer,
    make_schedule,
    update_best_score,
)
from iswm_tpu.config import OptimConfig


# ----------------------------------------------------------------- schedules
def test_cosine_schedule_matches_torch_semantics():
    cfg = OptimConfig(lr=0.01, schedule="cosine", cosine_min_factor=0.01)
    sched = make_schedule(cfg, total_itrs=1000)
    # torch CosineAnnealingLR: eta_min + (lr-eta_min)*(1+cos(pi*t/T))/2
    eta_min = 0.01 * 0.01
    for t in (0, 250, 500, 999, 1000):
        expected = eta_min + (0.01 - eta_min) * (1 + math.cos(math.pi * t / 1000)) / 2
        assert float(sched(t)) == pytest.approx(expected, rel=1e-5), t


def test_poly_schedule():
    cfg = OptimConfig(lr=0.01, schedule="poly", poly_power=0.9, poly_min_lr=1e-6)
    sched = make_schedule(cfg, total_itrs=100)
    assert float(sched(0)) == pytest.approx(0.01)
    assert float(sched(50)) == pytest.approx(0.01 * 0.5**0.9, rel=1e-5)
    assert float(sched(100)) == pytest.approx(1e-6)


@pytest.mark.parametrize("opt", ["sgd", "adam", "adamw"])
def test_optimizers_step(opt):
    tx, _ = make_optimizer(OptimConfig(optimizer=opt, lr=0.1), 100)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.asarray(updates["w"]) < 0)  # descent direction


# ----------------------------------------------------------------- best gate
def test_best_score_gate_semantics():
    weights = {
        "MIoU": 0.05,
        "Foreground IoU": 0.25,
        "Foreground F1": 0.25,
        "Front Tracking Error": 0.25,
        "Temporal Consistency": 0.10,
        "Region Continuity": 0.10,
    }
    assert is_best_score({"MIoU": 0.1}, None, weights)  # first compare

    good = {
        "MIoU": 0.9,
        "Foreground IoU": 0.8,
        "Foreground F1": 0.8,
        "Temporal Consistency": 0.9,
        "Region Continuity": 0.9,
        "Front Tracking Error": 2.0,
        "Precision": 0.8,
        "Recall": 0.8,
    }
    worse = dict(good, **{"Foreground IoU": 0.5, "Front Tracking Error": 8.0})
    best = update_best_score(good)
    assert not is_best_score(worse, best, weights)
    better = dict(good, **{"Foreground IoU": 0.9})
    assert is_best_score(better, best, weights)


def test_update_best_score_nan_guard():
    best = update_best_score(
        {"MIoU": float("nan"), "Front Tracking Error": float("nan"),
         "Temporal Consistency": None, "Foreground IoU": 0.5,
         "Foreground F1": 0.4, "Region Continuity": 0.3}
    )
    assert best["MIoU"] == 0.0
    assert best["Front Tracking Error"] == 10.0
    assert best["Temporal Consistency"] == 0.0
    assert best["Foreground IoU"] == 0.5


def test_initialize_best_score_sentinels():
    b = initialize_best_score()
    assert b["MIoU"] == -math.inf and b["Front Tracking Error"] == math.inf


# ------------------------------------------------------------- end-to-end
@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("run"))
    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.output_stride = 16
    cfg.model.compute_dtype = "float32"
    cfg.data.synthetic = True
    cfg.data.data_root = os.path.join(root, "data")
    cfg.data.synthetic_train_size = 8
    cfg.data.synthetic_val_size = 8
    cfg.data.synthetic_image_size = 40
    cfg.data.crop_size = 32
    cfg.data.batch_size = 8  # divisible by the 8-device test mesh
    cfg.data.val_batch_size = 4
    cfg.train.total_itrs = 6
    cfg.train.val_interval = 6
    cfg.train.print_interval = 2
    cfg.train.checkpoints_dir = os.path.join(root, "ckpt")
    cfg.train.val_results_dir = os.path.join(root, "val_results")
    cfg.train.metrics_plots_dir = os.path.join(root, "plots")
    cfg.train.log_dir = os.path.join(root, "logs")
    cfg.metrics.sequence_length = 3
    return cfg


def test_trainer_end_to_end(tiny_config):
    trainer = Trainer(tiny_config)
    out = trainer.fit()
    assert int(trainer.state.step) == 6
    # loss was logged
    assert len(trainer.logger.history["train_loss"]) >= 2
    # validation ran and produced a best checkpoint
    ckpts = os.listdir(tiny_config.train.checkpoints_dir)
    assert any(c.startswith("best_deeplabv3plus_resnet18") for c in ckpts)
    assert out["best_weighted_score"] > 0
    # val image dump exists
    dumps = os.listdir(tiny_config.train.val_results_dir)
    assert len(dumps) == 1
    files = os.listdir(os.path.join(tiny_config.train.val_results_dir, dumps[0]))
    assert any(f.endswith("_overlay.png") for f in files)
    # plots + jsonl
    assert os.path.exists(os.path.join(tiny_config.train.log_dir, "metrics.jsonl"))


def test_trainer_resume(tiny_config):
    from iswm_tpu.train import find_best

    best = find_best(tiny_config.train.checkpoints_dir)
    assert best is not None
    cfg = tiny_config
    cfg.train.ckpt = best
    cfg.train.continue_training = True
    cfg.train.total_itrs = 8
    trainer = Trainer(cfg)
    assert int(trainer.state.step) == 6  # resumed
    trainer.fit()
    assert int(trainer.state.step) == 8


def test_remat_train_step_matches(tiny_config):
    """Remat changes memory, not math: one step with/without remat agrees."""
    import jax
    import jax.numpy as jnp

    from iswm_tpu.config import ModelConfig
    from iswm_tpu.models import build_model
    from iswm_tpu.ops import make_loss_fn
    from iswm_tpu.train.optim import make_optimizer
    from iswm_tpu.train.step import create_train_state, make_train_step

    model = build_model(ModelConfig(backbone="resnet18", compute_dtype="float32"))
    tx, _ = make_optimizer(OptimConfig(), 100)
    loss_fn = make_loss_fn("ce_loss")
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    lbls = jnp.zeros((2, 32, 32), jnp.int32)
    rng = jax.random.key(0)

    s0 = create_train_state(model, tx, jax.random.key(1), imgs[:1])
    plain = make_train_step(model, tx, loss_fn, donate=False)
    remat = make_train_step(model, tx, loss_fn, donate=False, remat=True)
    _, m_plain = plain(s0, imgs, lbls, rng)
    _, m_remat = remat(s0, imgs, lbls, rng)
    assert float(m_plain["loss"]) == pytest.approx(float(m_remat["loss"]), rel=1e-6)


def test_fused_loss_selection():
    from iswm_tpu.ops import make_loss_fn

    import functools

    # on CPU, auto must choose the jnp path (a functools.partial of the jnp
    # loss, not the fused closure)
    fn = make_loss_fn("ce_loss", fused="auto", num_classes=2)
    assert isinstance(fn, functools.partial)
    # 'never' always jnp
    fn = make_loss_fn("IWce_loss", class_weights=[1.0, 2.0], fused="never")
    assert fn.func.__name__ == "weighted_cross_entropy_loss"
    # focal never fuses
    fn = make_loss_fn("focal_loss", fused="always")
    assert fn.func.__name__ == "focal_loss"


def test_trainer_sequence_val(tmp_path):
    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.data.synthetic = True
    cfg.data.synthetic_sequence_val = True
    cfg.data.data_root = str(tmp_path / "data")
    cfg.data.synthetic_train_size = 8
    cfg.data.synthetic_val_size = 6
    cfg.data.synthetic_image_size = 40
    cfg.data.crop_size = 32
    cfg.data.batch_size = 8
    cfg.data.val_batch_size = 4
    cfg.train.total_itrs = 2
    cfg.train.val_interval = 2
    cfg.train.print_interval = 1
    cfg.train.latest_interval = 1
    cfg.train.checkpoints_dir = str(tmp_path / "ckpt")
    cfg.train.val_results_dir = str(tmp_path / "vr")
    cfg.train.metrics_plots_dir = str(tmp_path / "plots")
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.metrics.sequence_length = 3
    trainer = Trainer(cfg)
    # sequence val: 2 sequences x 3 frames
    assert len(trainer.val_ds) == 6
    trainer.fit()
    # rolling latest checkpoint exists alongside the best one
    assert os.path.isdir(os.path.join(cfg.train.checkpoints_dir, "latest"))

    # auto-resume from the rolling checkpoint
    cfg2 = cfg
    cfg2.train.total_itrs = 3
    cfg2.train.auto_resume = True
    trainer2 = Trainer(cfg2)
    assert int(trainer2.state.step) == 2


def test_quick_eval_series(tmp_path):
    """quick_eval_interval emits device-CM metric points between full vals."""
    import json

    from iswm_tpu.config import Config
    from iswm_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.data.synthetic = True
    cfg.data.crop_size = 64
    cfg.data.batch_size = 8
    cfg.data.synthetic_train_size = 8
    cfg.data.synthetic_val_size = 4
    cfg.train.total_itrs = 6
    cfg.train.val_interval = 6
    cfg.train.quick_eval_interval = 2
    cfg.train.print_interval = 2
    for k in ("log_dir", "checkpoints_dir", "val_results_dir",
              "metrics_plots_dir"):
        setattr(cfg.train, k, str(tmp_path / k))
    Trainer(cfg).fit()

    quick_steps = []
    with open(tmp_path / "log_dir" / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "quick_fiou" in rec:
                quick_steps.append(rec["step"])
                assert 0.0 <= rec["quick_miou"] <= 1.0
    # steps 2 and 4 quick-eval; step 6 is the full validation instead
    assert quick_steps == [2, 4]
