"""Dataset manifest + misc utils tests."""

import json

import numpy as np
import pytest

from iswm_tpu.data.manifest import build_manifest, main as manifest_main, verify_manifest
from iswm_tpu.utils import Denormalize, denormalize, safe_process, timing_debug


def test_manifest_roundtrip(tmp_path):
    d = tmp_path / "data"
    (d / "train").mkdir(parents=True)
    (d / "train" / "a.png").write_bytes(b"abc")
    (d / "b.txt").write_text("hello")

    m = build_manifest(str(d))
    assert m["nfiles"] == 2 and m["size"] == 8

    report = verify_manifest(str(d), m)
    assert report["ok"]

    (d / "train" / "a.png").write_bytes(b"abcd")  # change
    (d / "c.txt").write_text("x")  # extra
    report = verify_manifest(str(d), m)
    assert not report["ok"]
    assert report["changed"] == ["train/a.png"]
    assert report["extra"] == ["c.txt"]

    (d / "train" / "a.png").unlink()
    report = verify_manifest(str(d), m)
    assert report["missing"] == ["train/a.png"]


def test_manifest_cli(tmp_path, capsys):
    d = tmp_path / "data"
    d.mkdir()
    (d / "f").write_text("1")
    out = tmp_path / "m.json"
    assert manifest_main(["build", str(d), str(out)]) == 0
    assert manifest_main(["verify", str(d), str(out)]) == 0
    (d / "f").write_text("2")
    assert manifest_main(["verify", str(d), str(out)]) == 1


def test_denormalize_chw_and_hwc():
    mean, std = (0.5, 0.5, 0.5), (0.2, 0.2, 0.2)
    hwc = np.zeros((4, 4, 3), np.float32)
    np.testing.assert_allclose(denormalize(hwc, mean, std), 0.5)
    chw = np.zeros((3, 4, 4), np.float32)
    np.testing.assert_allclose(Denormalize(mean, std)(chw), 0.5)


def test_safe_process_and_timing(capsys):
    @safe_process(error_value=-1)
    def boom():
        raise RuntimeError("nope")

    assert boom() == -1
    assert "Error in boom" in capsys.readouterr().out

    @timing_debug
    def fast():
        return 42

    assert fast() == 42
    assert "took" in capsys.readouterr().out
