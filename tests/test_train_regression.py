"""Golden end-to-end training-regression test (VERDICT r1 item 5).

Fixed seed, resnet18, 20 steps on the synthetic set through the REAL
Trainer (fused augment + loss + optimizer + scheduler + validation): the
per-step loss trajectory and the step-20 weighted score are snapshotted in
tests/golden/train_regression.json.  Any silent numerics change in the
step/optimizer/BN/augment path fails this test.

Regenerate deliberately (after an intentional numerics change) with:
  ISWM_REGEN_GOLDEN=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python -m pytest tests/test_train_regression.py -q

The snapshot is tied to CPU XLA numerics at float32; a jax/XLA major-version
bump may legitimately shift values beyond tolerance — regenerate then, with
a commit message saying why.
"""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "train_regression.json")


def _run():
    from iswm_tpu.config import Config
    from iswm_tpu.train.trainer import Trainer

    import tempfile

    tmp = tempfile.mkdtemp(prefix="golden_")
    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.data.synthetic = True
    cfg.data.crop_size = 64
    cfg.data.batch_size = 8
    cfg.data.synthetic_train_size = 16
    cfg.data.synthetic_val_size = 8
    cfg.loss.loss_type = "IWce_loss"
    cfg.optim.lr = 0.01
    cfg.train.total_itrs = 20
    cfg.train.print_interval = 1
    cfg.train.val_interval = 20
    cfg.train.latest_interval = 0
    cfg.train.random_seed = 1234
    for k in ("log_dir", "checkpoints_dir", "val_results_dir", "metrics_plots_dir"):
        setattr(cfg.train, k, os.path.join(tmp, k))

    trainer = Trainer(cfg)
    result = trainer.fit()

    losses = []
    with open(os.path.join(cfg.train.log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss" in rec:
                losses.append(rec["train_loss"])
    assert len(losses) == 20, f"expected 20 per-step losses, got {len(losses)}"
    return {
        "losses": [round(float(x), 6) for x in losses],
        "best_weighted_score": round(float(result["best_weighted_score"]), 6),
    }


def test_training_trajectory_matches_golden():
    got = _run()
    if os.environ.get("ISWM_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1)
        raise AssertionError(f"golden regenerated at {GOLDEN}; rerun without "
                             f"ISWM_REGEN_GOLDEN")
    assert os.path.exists(GOLDEN), (
        f"golden file missing; generate with ISWM_REGEN_GOLDEN=1 ({GOLDEN})"
    )
    with open(GOLDEN) as f:
        want = json.load(f)
    np.testing.assert_allclose(
        got["losses"], want["losses"], rtol=2e-4,
        err_msg="training loss trajectory drifted from golden snapshot",
    )
    np.testing.assert_allclose(
        got["best_weighted_score"], want["best_weighted_score"], atol=2e-4,
        err_msg="validation weighted score drifted from golden snapshot",
    )
    # sanity: training actually learns on the synthetic set
    assert np.mean(got["losses"][-5:]) < np.mean(got["losses"][:5])
