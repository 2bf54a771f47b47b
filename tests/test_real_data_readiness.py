"""Real-data readiness (VERDICT r2 item 7).

The real Himawari tree (reference data.dvc: 11,712 files) is unreachable
from CI, so these tests materialize a miniature tree with the exact
layout/naming contract documented in docs/REAL_DATA.md — Himawari-stamped
stems (`H09_YYYYMMDD_HHMM`), `{name}_mask` pairing, no-wave frames with NO
mask file — and drive every component the real-data path depends on:
the layout doctor, the loader, the class-weight pass, the validation
sequence-window sort, and a short `--data_root` CLI training run.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def real_layout_root(tmp_path_factory):
    from iswm_tpu.data.synthetic import write_dataset

    root = str(tmp_path_factory.mktemp("real_layout"))
    write_dataset(root, n_train=12, n_val=9, size=(64, 64), seed=7)
    # real trees contain no-wave frames with no mask file at all
    # (the loader's empty-mask fallback, reference evaluate_quantization.py:66-79)
    from PIL import Image

    for split in ("train", "val"):
        img_dir = Path(root) / split / "imgs"
        blank = np.zeros((64, 64, 3), np.uint8)
        Image.fromarray(blank).save(img_dir / "H09_20250131_2300.png")
    return root


def test_doctor_accepts_real_layout(real_layout_root):
    from iswm_tpu.data.doctor import check_data_root, format_report

    report = check_data_root(real_layout_root)
    assert report["ok"], format_report(report)
    tr = report["splits"]["train"]
    assert tr["n_images"] == 13 and tr["n_masks"] == 12
    assert tr["n_timestamped"] == tr["n_images"]
    assert tr["image_sizes"] == [(64, 64)]


def test_doctor_flags_broken_trees(tmp_path):
    from iswm_tpu.data.doctor import check_data_root

    # missing imgs/ entirely
    assert not check_data_root(str(tmp_path))["ok"]
    # images present but zero masks -> systematic-absence problem
    img_dir = tmp_path / "train" / "imgs"
    img_dir.mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / "a.png")
    report = check_data_root(str(tmp_path))
    assert not report["splits"]["train"]["ok"]
    assert any("mask" in p for p in report["splits"]["train"]["problems"])


def test_loader_and_timestamp_sort(real_layout_root):
    from iswm_tpu.data import BinarySegmentation, batch_iterator

    ds = BinarySegmentation(real_layout_root, split="val")
    assert len(ds) == 10
    # filename sort == time sort for Himawari-stamped names, and the
    # no-mask frame yields the empty-label fallback
    assert ds.images == sorted(ds.images)
    img, lbl = ds[ds.images.index("H09_20250131_2300.png")]
    assert lbl.max() == 0
    imgs, lbls = next(batch_iterator(ds, 4))
    assert imgs.shape == (4, 64, 64, 3) and lbls.shape == (4, 64, 64)
    assert set(np.unique(lbls)) <= {0, 1}


def test_class_weight_pass(real_layout_root):
    from iswm_tpu.data import BinarySegmentation, batch_iterator
    from iswm_tpu.data.class_weights import calculate_class_weights

    ds = BinarySegmentation(real_layout_root, split="train")
    w = np.asarray(
        calculate_class_weights(
            lbl for _, lbl in batch_iterator(ds, 4, epochs=1)
        )
    )
    # reference semantics: w = [1, sqrt(bg/fg)] (train.py:388-410)
    assert w[0] == 1.0 and w[1] > 1.0 and np.isfinite(w[1])


def test_sequence_window_sort(real_layout_root):
    """The validation driver's 7-frame sliding window over the
    filename-sorted val set (reference train.py:669-683)."""
    from iswm_tpu.data import BinarySegmentation
    from iswm_tpu.metrics import StreamMetrics

    ds = BinarySegmentation(real_layout_root, split="val")
    samples = [(name, ds[i][1], ds[i][1]) for i, name in enumerate(ds.images)]
    samples.sort(key=lambda s: s[0])
    L = 7
    metrics = StreamMetrics(2, sequence_length=L)
    n_windows = 0
    for i in range(len(samples) - L + 1):
        window = samples[i : i + L]
        preds = np.stack([s[1] for s in window])
        gts = np.stack([s[2] for s in window])
        metrics.update(gts, preds, sequence_data=True)
        n_windows += 1
    assert n_windows == len(samples) - L + 1 == 4
    results = metrics.get_results()
    # perfect predictions: IoU family saturates
    assert results["MIoU"] == pytest.approx(1.0)


def test_cli_train_smoke_on_real_layout(real_layout_root, tmp_path):
    """`--data_root` end-to-end through the real CLI entry point."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable, "-m", "iswm_tpu.cli.train",
            "--data_root", real_layout_root,
            "--model", "deeplabv3plus_resnet18",
            "--crop_size", "48", "--batch_size", "8",
            "--val_batch_size", "8",
            "--total_itrs", "3", "--val_interval", "3",
            "--loss_type", "IWce_loss",
            "--checkpoints_dir", str(tmp_path / "ckpt"),
            "--val_results_dir", str(tmp_path / "val"),
            "--metrics_plots_dir", str(tmp_path / "plots"),
            "--log_dir", str(tmp_path / "logs"),
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert (tmp_path / "logs" / "metrics.jsonl").exists()
