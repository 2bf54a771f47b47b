"""Pretrained ImageNet backbone initialization (VERDICT r1 item 2).

Reference behavior: pretrained_backbone pulls torchvision ImageNet weights
and keeps the head random (reference network/modeling.py:75,
backbone/resnet.py:218-226).  CI has no network, so the loader is
cache-only; these tests synthesize a torchvision-format resnet18 state
dict on disk and point $ISWM_PRETRAINED_DIR at it.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from iswm_tpu.config import Config, ModelConfig  # noqa: E402


def _tv_resnet18_state_dict(rng):
    """Torchvision-layout resnet18 ImageNet state dict (random values)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(size=(o, i, k, k)).astype(np.float32)
        )

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(rng.normal(size=c).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(rng.normal(size=c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(
            rng.normal(size=c).astype(np.float32)
        )
        sd[f"{name}.running_var"] = torch.tensor(
            rng.random(c).astype(np.float32) + 0.5
        )
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, planes in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            t = f"layer{stage}.{b}"
            stride_block = b == 0 and stage > 1
            conv(f"{t}.conv1", planes, inplanes if b == 0 else planes, 3)
            bn(f"{t}.bn1", planes)
            conv(f"{t}.conv2", planes, planes, 3)
            bn(f"{t}.bn2", planes)
            if stride_block:
                conv(f"{t}.downsample.0", planes, inplanes, 1)
                bn(f"{t}.downsample.1", planes)
        inplanes = planes
    sd["fc.weight"] = torch.tensor(rng.normal(size=(1000, 512)).astype(np.float32))
    sd["fc.bias"] = torch.tensor(rng.normal(size=1000).astype(np.float32))
    return sd


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    rng = np.random.default_rng(42)
    sd = _tv_resnet18_state_dict(rng)
    path = tmp_path / "resnet18-f37072fd.pth"
    torch.save(sd, str(path))
    monkeypatch.setenv("ISWM_PRETRAINED_DIR", str(tmp_path))
    return sd, str(path)


def _init_model(cfg_model):
    import jax
    import jax.numpy as jnp

    from iswm_tpu.models import build_model

    model = build_model(cfg_model)
    x = jnp.zeros((1, 64, 64, cfg_model.in_channels), jnp.float32)
    v = jax.jit(lambda: model.init({"params": jax.random.key(0)}, x, train=False))()
    return v["params"], v["batch_stats"]


def test_overlay_loads_backbone_keeps_head(cache_dir):
    sd, path = cache_dir
    from iswm_tpu.compat.pretrained import apply_pretrained_backbone

    cfg = ModelConfig(backbone="resnet18", compute_dtype="float32")
    params, stats = _init_model(cfg)
    head_before = np.asarray(params["head"]["cls0"]["conv"]["kernel"])
    stem_random = np.asarray(params["backbone"]["stem"]["conv"]["kernel"])

    new_p, new_s, src = apply_pretrained_backbone(params, stats, cfg)
    assert src == path

    want_stem = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    got_stem = np.asarray(new_p["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(got_stem, want_stem, rtol=1e-6)
    assert not np.allclose(got_stem, stem_random)  # differs from random init

    got_l2 = np.asarray(new_p["backbone"]["layer2_0"]["downsample"]["conv"]["kernel"])
    want_l2 = np.transpose(sd["layer2.0.downsample.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got_l2, want_l2, rtol=1e-6)

    got_var = np.asarray(new_s["backbone"]["layer4_1"]["conv2"]["bn"]["var"])
    np.testing.assert_allclose(got_var, sd["layer4.1.bn2.running_var"].numpy(),
                               rtol=1e-6)

    np.testing.assert_array_equal(
        np.asarray(new_p["head"]["cls0"]["conv"]["kernel"]), head_before
    )


def test_stem_adaptation_non_rgb(cache_dir):
    sd, _ = cache_dir
    from iswm_tpu.compat.pretrained import apply_pretrained_backbone

    cfg = ModelConfig(backbone="resnet18", in_channels=5, compute_dtype="float32")
    params, stats = _init_model(cfg)
    new_p, _, src = apply_pretrained_backbone(params, stats, cfg)
    assert src is not None
    got = np.asarray(new_p["backbone"]["stem"]["conv"]["kernel"])
    want3 = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got[:, :, :3, :], want3, rtol=1e-6)
    # extra channels = mean over pretrained RGB (reference modeling.py:25-43)
    np.testing.assert_allclose(got[:, :, 3, :], want3.mean(axis=2), rtol=1e-5)


def test_missing_cache_warns_and_keeps_random(tmp_path, monkeypatch):
    from iswm_tpu.compat.pretrained import apply_pretrained_backbone

    monkeypatch.setenv("ISWM_PRETRAINED_DIR", str(tmp_path / "empty"))
    monkeypatch.setenv("HOME", str(tmp_path))  # hide real torch-hub caches
    cfg = ModelConfig(backbone="resnet18", compute_dtype="float32")
    params, stats = _init_model(cfg)
    with pytest.warns(UserWarning, match="no cached ImageNet weights"):
        new_p, new_s, src = apply_pretrained_backbone(params, stats, cfg)
    assert src is None
    np.testing.assert_array_equal(
        np.asarray(new_p["backbone"]["stem"]["conv"]["kernel"]),
        np.asarray(params["backbone"]["stem"]["conv"]["kernel"]),
    )

    monkeypatch.setenv("ISWM_REQUIRE_PRETRAINED", "1")
    with pytest.raises(FileNotFoundError):
        apply_pretrained_backbone(params, stats, cfg)


def test_trainer_wires_pretrained(cache_dir, tmp_path):
    """End-to-end: Trainer with pretrained_backbone=True loads the cache."""
    sd, _ = cache_dir
    from iswm_tpu.config import Config
    from iswm_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.model.pretrained_backbone = True
    cfg.data.synthetic = True
    cfg.data.crop_size = 64
    cfg.data.batch_size = 8
    cfg.train.total_itrs = 1
    cfg.train.log_dir = str(tmp_path / "logs")
    cfg.train.checkpoints_dir = str(tmp_path / "ckpt")
    cfg.train.val_results_dir = str(tmp_path / "val")
    cfg.train.metrics_plots_dir = str(tmp_path / "plots")
    trainer = Trainer(cfg)
    got = np.asarray(trainer.state.params["backbone"]["stem"]["conv"]["kernel"])
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
