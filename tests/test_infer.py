"""Inference engine tests: tiling correctness, products semantics, predictor."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iswm_tpu.infer import (
    TileEngine,
    binarize_confidence_map,
    confidence_map,
    generate_synthetic_broken_areas,
    has_internal_wave,
    prob_to_mask,
    tile_origins,
)
from iswm_tpu.infer.tiling import _blend_window


# ------------------------------------------------------------------ tiling
def test_tile_origins_cover_flush():
    o = tile_origins(100, 40, 30)
    assert o.tolist() == [0, 30, 60]  # 60+40 = 100 flush
    assert tile_origins(40, 40, 30).tolist() == [0]
    assert tile_origins(30, 40, 30).tolist() == [0]


def test_blend_window_positive_interior_one():
    w = _blend_window(32, 8)
    assert w.shape == (32, 32)
    assert np.all(w > 0)
    assert w[16, 16] == pytest.approx(1.0)


def test_tile_engine_matches_direct_for_linear_model():
    # For a pixelwise (linear) model, tiled+blended == direct application.
    def model_fn(x):  # [N,T,T,C] -> [N,T,T,2]
        return jnp.stack([x[..., 0], 1.0 - x[..., 0]], axis=-1)

    engine = TileEngine(model_fn, tile=16, overlap=4, batch=2, num_classes=2)
    scene = jnp.asarray(np.random.default_rng(0).random((40, 56, 3)), jnp.float32)
    out = np.asarray(engine.infer_scene(scene))
    expected = np.stack([np.asarray(scene[..., 0]), 1 - np.asarray(scene[..., 0])], -1)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_tile_engine_small_scene_pads():
    def model_fn(x):
        return jnp.stack([x[..., 0], -x[..., 0]], axis=-1)

    engine = TileEngine(model_fn, tile=32, overlap=8, batch=1, num_classes=2)
    scene = jnp.asarray(np.random.default_rng(1).random((20, 24, 3)), jnp.float32)
    out = np.asarray(engine.infer_scene(scene))
    assert out.shape == (20, 24, 2)
    np.testing.assert_allclose(out[..., 0], np.asarray(scene[..., 0]), atol=1e-5)


# ---------------------------------------------------------------- products
def test_prob_to_mask_and_confidence():
    p = np.array([[0.2, 0.6], [0.5, 0.9]])
    assert prob_to_mask(p, 0.5).tolist() == [[0, 1], [0, 1]]
    c = confidence_map(p)
    assert c.dtype == np.uint8
    assert c[1, 1] == 229  # 0.9*255 truncated


def test_has_internal_wave_rgb_and_gray():
    rgb = np.zeros((50, 50, 3), np.uint8)
    rgb[:10, :10] = 255  # 4% of area > 1%
    assert has_internal_wave(rgb)
    gray = np.zeros((50, 50), np.uint8)
    gray[0, 0] = 255  # 0.04% < 1%
    assert not has_internal_wave(gray)


def test_binarize_confidence_band():
    conf = np.array([[0, 60, 128], [170, 200, 255]], np.uint8)
    out = binarize_confidence_map(conf, min_prob=0.2, max_prob=0.7)
    # 60/255=.235, 128/255=.502, 170/255=.667 in band; 0, 200/255=.78, 255 out
    assert out.tolist() == [[0, 255, 255], [255, 0, 0]]


def test_synthetic_damage_reaches_ratio():
    import random

    for style in ("linear", "random_structures", "blob"):
        m = generate_synthetic_broken_areas(
            (100, 100), style=style, ratio=0.05, rng=random.Random(3)
        )
        assert m.shape == (100, 100)
        # noise fill samples with replacement (as the reference does), so the
        # target ratio is approached, not exact
        assert (m > 0).sum() >= 0.05 * 100 * 100 * 0.9


def test_binarize_adds_synthetic_for_no_wave():
    import random

    conf = np.zeros((60, 60), np.uint8)  # nothing in band
    pred = np.zeros((60, 60, 3), np.uint8)  # no wave
    out = binarize_confidence_map(
        conf,
        pred_mask=pred,
        enable_wave_processing=True,
        synthetic_prob=1.0,
        rng=random.Random(5),
    )
    assert (out > 0).sum() > 0


# --------------------------------------------------------------- predictor
def test_predictor_end_to_end(tmp_path):
    from PIL import Image

    from iswm_tpu.config import Config
    from iswm_tpu.infer import Predictor

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.predict.tile_size = 32
    cfg.predict.tile_overlap = 8
    cfg.predict.tile_batch = 2
    cfg.predict.save_confidence = True
    cfg.predict.save_binary = True

    # input tree with a subdirectory level
    in_dir = tmp_path / "in"
    (in_dir / "sub").mkdir(parents=True)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    Image.fromarray(img).save(in_dir / "a.png")
    Image.fromarray(img).save(in_dir / "sub" / "b.png")

    predictor = Predictor(cfg, ckpt_path=None)
    n = predictor.process_images(str(in_dir), str(tmp_path / "out"))
    assert n == 2
    assert (tmp_path / "out" / "a_predict.png").exists()
    assert (tmp_path / "out" / "a_confidence.png").exists()
    assert (tmp_path / "out" / "a_binary_mask.png").exists()
    assert (tmp_path / "out" / "sub" / "b_predict.png").exists()

    products = predictor.predict_image(img)
    assert products["mask"].shape == (40, 40)
    assert products["prob_fg"].shape == (40, 40)
    # threshold vs argmax semantics both available
    cfg.predict.use_argmax = True
    products2 = predictor.predict_image(img)
    assert products2["mask"].shape == (40, 40)


def test_feature_map_extraction(tmp_path):
    from PIL import Image

    from iswm_tpu.config import Config
    from iswm_tpu.infer import Predictor

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.predict.tile_size = 32
    cfg.predict.tile_overlap = 8
    cfg.predict.save_feature_maps = True
    predictor = Predictor(cfg, ckpt_path=None)

    img = np.random.default_rng(1).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    maps = predictor.extract_feature_maps(img)
    assert "backbone_low_level" in maps and "backbone_out" in maps
    assert "aspp" in maps
    for m in maps.values():
        assert 0.0 <= m.min() and m.max() <= 1.0

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    Image.fromarray(img).save(in_dir / "x.png")
    predictor.process_images(str(in_dir), str(tmp_path / "out"))
    outs = os.listdir(tmp_path / "out")
    assert any("_fmap_" in o for o in outs)


def test_tile_engine_multichip_mesh_matches_single():
    """Scene parallelism: tiles sharded over the 8-device data axis give
    the same blended logits as the single-device engine (ROADMAP item)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from iswm_tpu.infer.tiling import TileEngine

    def model_fn(x):  # cheap stand-in with spatial structure
        k = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([k, -k], axis=-1)

    scene = jnp.asarray(
        np.random.default_rng(0).random((300, 280, 3)), jnp.float32
    )
    single = TileEngine(model_fn, tile=128, overlap=32, batch=2)
    out1 = np.asarray(single.infer_scene(scene))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    multi = TileEngine(model_fn, tile=128, overlap=32, batch=1, mesh=mesh)
    out2 = np.asarray(multi.infer_scene(scene))
    assert out1.shape == out2.shape == (300, 280, 2)
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_predictor_int8_serving_variant(tmp_path):
    """serving_variant='int8_exec_xla': first-scene calibration swaps the
    tile engine onto the int8 fn; masks agree with the bf16 predictor."""
    from iswm_tpu.config import Config
    from iswm_tpu.infer import Predictor

    def make_cfg(variant):
        cfg = Config()
        cfg.model.backbone = "resnet18"
        cfg.model.compute_dtype = "float32"
        cfg.predict.tile_size = 32
        cfg.predict.tile_overlap = 8
        cfg.predict.tile_batch = 2
        cfg.predict.serving_variant = variant
        return cfg

    img = np.random.default_rng(3).integers(0, 255, (48, 48, 3), dtype=np.uint8)
    ref = Predictor(make_cfg("bf16"), ckpt_path=None).predict_image(img)

    p = Predictor(make_cfg("int8_exec_xla"), ckpt_path=None)
    assert p._needs_calibration
    got = p.predict_image(img)
    assert not p._needs_calibration
    agree = float((got["mask"] == ref["mask"]).mean())
    assert agree > 0.95, f"int8 serving mask agreement {agree}"
    # second call reuses the calibrated engine
    again = p.predict_image(img)
    np.testing.assert_array_equal(again["mask"], got["mask"])

    # weight-only int8 needs no calibration
    p8 = Predictor(make_cfg("int8"), ckpt_path=None)
    assert not p8._needs_calibration
    assert p8.predict_image(img)["mask"].shape == (48, 48)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="serving_variant"):
        Predictor(make_cfg("fp4"), ckpt_path=None)


def test_predictor_int8_grouped_knob():
    """PredictConfig.int8_grouped=True routes mobilenetv2's depthwise
    stages too (the opt-in bandwidth play); masks stay agreeing with bf16.
    Mirrors tests/test_quantization.py's routing test through the full
    Predictor product path (config knob -> calibration -> engine swap)."""
    from iswm_tpu.config import Config
    from iswm_tpu.infer import Predictor

    def make_cfg(variant, grouped=False):
        cfg = Config()
        cfg.model.backbone = "mobilenetv2"
        cfg.model.compute_dtype = "float32"
        cfg.predict.tile_size = 32
        cfg.predict.tile_overlap = 8
        cfg.predict.tile_batch = 2
        cfg.predict.serving_variant = variant
        cfg.predict.int8_grouped = grouped
        return cfg

    img = np.random.default_rng(5).integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ref = Predictor(make_cfg("bf16"), ckpt_path=None).predict_image(img)

    p = Predictor(make_cfg("int8_exec_xla", grouped=True), ckpt_path=None)
    got = p.predict_image(img)
    agree = float((got["mask"] == ref["mask"]).mean())
    assert agree > 0.9, f"grouped int8 serving mask agreement {agree}"
    # the engine's variant fn must have routed depthwise (grouped) sites
    # (mobilenetv2 names them "depthwise", models/mobilenetv2.py)
    routed = set(getattr(p.engine.model_fn, "routed_sites", []))
    assert any("depthwise" in s for s in routed), (
        f"no depthwise site routed: {sorted(routed)[:8]}"
    )


def test_tile_engine_mesh_with_int8_variant():
    """int8_exec_xla serving composes with scene parallelism: the variant
    fn (inner jit) inlines into the mesh-sharded tile program and matches
    the single-device int8 engine."""
    import jax
    from jax.sharding import Mesh

    from iswm_tpu.config import ModelConfig
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_variant_fn,
    )
    from iswm_tpu.infer.tiling import TileEngine
    from iswm_tpu.models import build_model

    model = build_model(ModelConfig(backbone="resnet18", compute_dtype="float32"))
    x0 = jnp.asarray(np.random.default_rng(5).normal(size=(1, 32, 32, 3)),
                     jnp.float32)
    v = model.init({"params": jax.random.key(2)}, x0, train=False)
    scales = calibrate_conv_inputs(
        model, v["params"], v["batch_stats"], [x0], wide=True
    )
    fn = make_variant_fn(model, v["batch_stats"], v["params"],
                         "int8_exec_xla", conv_scales=scales)

    scene = jnp.asarray(np.random.default_rng(6).normal(size=(72, 64, 3)),
                        jnp.float32)
    single = TileEngine(fn, tile=32, overlap=8, batch=2)
    out1 = np.asarray(single.infer_scene(scene))
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    multi = TileEngine(fn, tile=32, overlap=8, batch=1, mesh=mesh)
    out2 = np.asarray(multi.infer_scene(scene))
    assert out1.shape == out2.shape == (72, 64, 2)
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-4)


def test_predictor_int8_calibration_narrow_scene():
    """Scene smaller than the tile in ONE dimension (e.g. a 24x64 strip):
    the calibration fallback must crop the long axis and pad only the
    short one (a negative pad width raises in jnp.pad)."""
    from iswm_tpu.config import Config
    from iswm_tpu.infer import Predictor

    cfg = Config()
    cfg.model.backbone = "resnet18"
    cfg.model.compute_dtype = "float32"
    cfg.predict.tile_size = 32
    cfg.predict.tile_overlap = 8
    cfg.predict.tile_batch = 2
    cfg.predict.serving_variant = "int8_exec_xla"

    img = np.random.default_rng(7).integers(0, 255, (24, 64, 3), dtype=np.uint8)
    p = Predictor(cfg, ckpt_path=None)
    got = p.predict_image(img)  # must calibrate without raising
    assert not p._needs_calibration
    assert got["mask"].shape == (24, 64)
