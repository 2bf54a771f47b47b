"""CLI entry point tests (run in-process with --platform cpu)."""

import os

import numpy as np
import pytest


def test_train_cli_and_predict_cli(tmp_path):
    from iswm_tpu.cli.train import main as train_main
    from iswm_tpu.cli.predict import main as predict_main

    root = str(tmp_path)
    rc = train_main([
        "--synthetic", "--data_root", os.path.join(root, "data"),
        "--model", "deeplabv3plus_resnet18", "--compute_dtype", "float32",
        "--crop_size", "32",
        "--batch_size", "8", "--total_itrs", "2", "--val_interval", "2",
        "--print_interval", "1", "--sequence_length", "3",
        "--checkpoints_dir", os.path.join(root, "ckpt"),
        "--val_results_dir", os.path.join(root, "vr"),
        "--metrics_plots_dir", os.path.join(root, "plots"),
    ])
    assert rc == 0
    ckpts = os.listdir(os.path.join(root, "ckpt"))
    assert len(ckpts) == 1

    rc = predict_main([
        "--input_dir", os.path.join(root, "data", "synthetic", "val", "imgs"),
        "--output_dir", os.path.join(root, "preds"),
        "--ckpt", os.path.join(root, "ckpt", ckpts[0]),
        "--model", "deeplabv3plus_resnet18", "--compute_dtype", "float32",
        "--tile_size", "32", "--tile_overlap", "8",
        "--save_confidence",
    ])
    assert rc == 0
    outs = os.listdir(os.path.join(root, "preds"))
    assert any(o.endswith("_predict.png") for o in outs)
    assert any(o.endswith("_confidence.png") for o in outs)


def test_predict_cli_missing_input_dir(tmp_path):
    from iswm_tpu.cli.predict import main as predict_main

    rc = predict_main(["--input_dir", str(tmp_path / "nope")])
    assert rc == 2


def test_quantization_cli(tmp_path):
    from iswm_tpu.cli.evaluate_quantization import main as quant_main
    from iswm_tpu.data import write_dataset

    root = write_dataset(str(tmp_path), n_train=1, n_val=4, size=(32, 32), seed=3)
    rc = quant_main([
        "--data_dir", os.path.join(root, "val"),
        "--model", "deeplabv3plus_resnet18", "--compute_dtype", "float32",
        "--variants", "f32,int8",
        "--max_images", "4", "--sequence_length", "3",
        "--comparison_dir", os.path.join(str(tmp_path), "cmp"),
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path), "cmp", "variant_comparison.png"))


def test_train_cli_flag_mapping_int8_switch():
    """--int8_switch_iter maps to train.int8_switch_iter (config-only)."""
    from iswm_tpu.cli.train import build_config, get_argparser

    args = get_argparser().parse_args([
        "--int8_training", "256", "--int8_bwd", "1",
        "--int8_switch_iter", "2400", "--total_itrs", "3000",
    ])
    cfg = build_config(args)
    assert cfg.train.int8_switch_iter == 2400
    assert cfg.model.int8_training == 256
    assert bool(cfg.model.int8_training_bwd)  # int flag (0/1), truthy here
