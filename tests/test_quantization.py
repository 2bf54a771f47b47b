"""Quantization subsystem tests: int8 round-trip, size, report, verdict tiers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iswm_tpu.config import ModelConfig
from iswm_tpu.infer.quantization import (
    cast_params,
    compare_variants,
    dequantize_params,
    format_report,
    logit_diff_verdict,
    make_variant_fn,
    param_bytes,
    quantize_params_int8,
)
from iswm_tpu.models import build_model


@pytest.fixture(scope="module")
def small_model():
    cfg = ModelConfig(backbone="resnet18", compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, variables["params"], variables["batch_stats"]


def test_verdict_tiers():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 100, 2))
    assert logit_diff_verdict(a, a)[1].startswith("excellent")

    def flip(frac, seed=1):
        b = a.copy()
        r = np.random.default_rng(seed)
        idx = r.choice(100 * 100, int(frac * 100 * 100), replace=False)
        flat = b.reshape(-1, 2)
        flat[idx] = flat[idx][:, ::-1] + 10  # force argmax change
        return b

    assert logit_diff_verdict(a, flip(0.005))[1].startswith("good")
    assert logit_diff_verdict(a, flip(0.03))[1].startswith("warning")
    assert logit_diff_verdict(a, flip(0.2))[1].startswith("broken")


def test_int8_quantization_roundtrip(small_model):
    _, params, _ = small_model
    q, s = quantize_params_int8(params)
    # conv kernels became int8
    kernels = [l for l in jax.tree.leaves(q) if l.dtype == jnp.int8]
    assert kernels, "no kernels quantized"
    # ~4x size reduction on the conv-kernel-dominated tree
    assert param_bytes(q) < 0.35 * param_bytes(cast_params(params, jnp.float32))
    # dequantized weights close to the originals (per-channel 8-bit)
    deq = dequantize_params(q, s, jnp.float32)
    for orig, back in zip(jax.tree.leaves(params), jax.tree.leaves(deq)):
        if orig.ndim == 4:
            amax = float(jnp.max(jnp.abs(orig)))
            np.testing.assert_allclose(
                np.asarray(back, np.float32),
                np.asarray(orig, np.float32),
                atol=amax / 127 + 1e-7,
            )


def test_variant_fns_agree(small_model):
    model, params, batch_stats = small_model
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32)
    f32 = make_variant_fn(model, batch_stats, params, "f32")
    int8 = make_variant_fn(model, batch_stats, params, "int8")
    a, b = np.asarray(f32(x)), np.asarray(int8(x))
    assert a.shape == b.shape == (1, 32, 32, 2)
    agreement, verdict = logit_diff_verdict(a, b)
    assert agreement > 0.8  # int8 weights keep most decisions intact


def test_compare_variants_report(small_model, tmp_path):
    from iswm_tpu.data import write_dataset
    from iswm_tpu.data.datasets import EvaluationDataset

    model, params, batch_stats = small_model
    root = write_dataset(str(tmp_path), n_train=1, n_val=5, size=(32, 32), seed=7)
    ds = EvaluationDataset(root, split="val")
    report = compare_variants(
        model, params, batch_stats, ds,
        variants=("f32", "int8"), sequence_length=3, max_images=5,
    )
    assert set(report) == {"f32", "int8"}
    assert report["int8"]["size_reduction"] > 2.5
    assert "speedup" in report["int8"]
    assert report["int8"]["verdict"]
    table = format_report(report)
    assert "f32" in table and "int8" in table and "verdict" in table


def test_activation_calibration_and_int8_act(small_model, tmp_path):
    from iswm_tpu.data import write_dataset
    from iswm_tpu.data.datasets import EvaluationDataset
    from iswm_tpu.infer.quantization import (
        calibrate_activations,
        compare_variants,
        make_variant_fn,
    )
    from iswm_tpu.data.transforms import normalize

    model, params, batch_stats = small_model
    root = write_dataset(str(tmp_path), n_train=1, n_val=4, size=(32, 32), seed=9)
    ds = EvaluationDataset(root, split="val")

    def batches():
        for i in range(3):
            yield normalize(jnp.asarray(ds[i][0], jnp.float32)[None] / 255.0)

    scales = calibrate_activations(model, params, batch_stats, batches(), 3)
    assert scales, "no activation sites observed"
    assert all(s > 0 for s in scales.values())
    # sites are ConvBN paths
    assert any("stem" in k for k in scales)

    fn = make_variant_fn(model, batch_stats, params, "int8_act", act_scales=scales)
    x = normalize(jnp.asarray(ds[0][0], jnp.float32)[None] / 255.0)
    out = np.asarray(fn(x))
    assert out.shape == (1, 32, 32, 2) and np.isfinite(out).all()

    # full report including the calibrated variant
    report = compare_variants(
        model, params, batch_stats, ds,
        variants=("f32", "int8_act"), sequence_length=3, max_images=4,
    )
    assert "int8_act" in report
    assert report["int8_act"]["size_reduction"] > 2.5


def test_int8_act_requires_scales(small_model):
    from iswm_tpu.infer.quantization import make_variant_fn

    model, params, batch_stats = small_model
    with pytest.raises(ValueError, match="calibration"):
        make_variant_fn(model, batch_stats, params, "int8_act")


def test_int8_exec_variant(small_model):
    """Executed-int8: eligible 1x1 convs route through the Pallas int8
    matmul (interpret mode on CPU) and masks stay in agreement."""
    import jax.numpy as jnp

    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    model, params, batch_stats = small_model
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)

    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x])
    assert conv_scales, "no int8-executable conv sites found"
    assert any("aspp" in k for k in conv_scales), sorted(conv_scales)

    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales)
    logits_q = np.asarray(fn(x))
    routed = set(fn.routed_sites)
    assert "head/aspp/project/conv" in routed and "head/aspp/b0/conv" in routed
    assert routed <= set(conv_scales)

    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    assert agree > 0.97, f"int8-exec mask agreement {agree}"


def test_int8_xla_matmul_matches_reference():
    """The XLA-lowered int8 contraction (ops/int8_xla) computes the same
    quantize -> integer matmul -> dequantize as the Pallas kernel's
    numpy oracle."""
    import jax.numpy as jnp

    from iswm_tpu.ops.int8_xla import int8_matmul_xla, int8_matmul_prequant_xla

    rng = np.random.default_rng(21)
    m, k, n = 100, 256, 128
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = rng.normal(size=(k, n)).astype(np.float32)
    w_amax = np.abs(w).max(axis=0)
    w_scale = np.where(w_amax > 0, w_amax / 127.0, 1.0)
    w_q = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
    x_scale = float(np.abs(np.asarray(x)).max() / 127.0)

    got = int8_matmul_xla(x, jnp.asarray(w_q), jnp.asarray(w_scale), x_scale)
    x_q = np.clip(np.round(np.asarray(x) / x_scale), -127, 127)
    ref = (x_q @ w_q.astype(np.int64)) * x_scale * w_scale
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)

    got_pq = int8_matmul_prequant_xla(
        jnp.asarray(x_q, jnp.int8), jnp.asarray(w_q), jnp.asarray(w_scale),
        x_scale,
    )
    np.testing.assert_allclose(np.asarray(got_pq), ref, rtol=1e-5)


def test_quantized_conv1x1_xla_matches_dense():
    import jax
    import jax.numpy as jnp

    from iswm_tpu.infer.quantization import quantize_params_int8
    from iswm_tpu.ops.int8_xla import quantized_conv1x1_xla

    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 256)), jnp.float32)
    params = {"proj": {"kernel": jnp.asarray(rng.normal(size=(1, 1, 256, 128)),
                                             jnp.float32)}}
    q, s = quantize_params_int8(params)
    x_scale = float(jnp.max(jnp.abs(x))) / 127.0
    got = quantized_conv1x1_xla(x, q["proj"]["kernel"], s["proj"]["kernel"],
                                x_scale)
    dense = jax.lax.conv_general_dilated(
        x, params["proj"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    rel = float(jnp.max(jnp.abs(got - dense)) / jnp.max(jnp.abs(dense)))
    assert got.shape == (2, 8, 16, 128)
    assert rel < 0.05
    # and bit-identical to the Pallas kernel's quantization contract
    from iswm_tpu.ops.pallas.int8_matmul import quantized_conv1x1

    pallas = quantized_conv1x1(x, q["proj"]["kernel"], s["proj"]["kernel"],
                               x_scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pallas), rtol=1e-5)


def test_int8_exec_xla_variant(small_model):
    """backend='xla' with wide calibration routes general convs (3x3s, the
    decoder classifier) in addition to the 1x1 sites, and stays in mask
    agreement with f32."""
    import jax.numpy as jnp

    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    model, params, batch_stats = small_model
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)

    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x],
                                        wide=True)
    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales,
                           backend="xla")
    logits_q = np.asarray(fn(x))
    routed = set(fn.routed_sites)
    assert "head/aspp/project/conv" in routed
    # wide coverage: at least one non-1x1 site routes (decoder 3x3)
    assert any("cls0" in k or "cls1" in k for k in routed), sorted(routed)

    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    # random-init logits have near-zero class margins, so stacked int8
    # noise flips a few percent of pixels here; trained weights measure
    # 0.997 agreement (BASELINE.md).  Routing cls0 (ConcatConvBN) moved
    # this fixture from 0.971 to 0.969.
    assert agree > 0.95, f"int8-exec-xla mask agreement {agree}"


def test_int8_packed_stem_conv_matches_plain_strided():
    """The packed int8 stem conv is bit-exact against the plain strided
    int8 conv on the same quantized operands: packing only permutes the
    kernel/input taps (zeros pad exactly in int8), so the int32
    accumulators and the f32 scale-out are identical."""
    import jax.numpy as jnp

    from iswm_tpu.infer.quantization import quantize_params_int8
    from iswm_tpu.ops.int8_xla import (
        int8_packed_stem_conv,
        quantized_conv_xla,
    )

    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    params = {"k": {"kernel": jnp.asarray(
        rng.normal(size=(7, 7, 3, 32)), jnp.float32)}}
    q, s = quantize_params_int8(params)
    x_scale = float(jnp.max(jnp.abs(x))) / 127.0
    got = int8_packed_stem_conv(
        x, q["k"]["kernel"], s["k"]["kernel"], x_scale, 7
    )
    want = quantized_conv_xla(
        x, q["k"]["kernel"], s["k"]["kernel"], x_scale,
        strides=(2, 2), padding=[(3, 3), (3, 3)],
    )
    assert got.shape == want.shape == (2, 8, 8, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # odd-extent fallback takes the plain strided path
    x_odd = x[:, :15, :15]
    got_odd = int8_packed_stem_conv(
        x_odd, q["k"]["kernel"], s["k"]["kernel"], x_scale, 7
    )
    want_odd = quantized_conv_xla(
        x_odd, q["k"]["kernel"], s["k"]["kernel"], x_scale,
        strides=(2, 2), padding=[(3, 3), (3, 3)],
    )
    np.testing.assert_array_equal(np.asarray(got_odd), np.asarray(want_odd))


def test_int8_exec_xla_routes_stem(small_model):
    """stem=True routes the packed stem conv: calibration records the
    3-channel image site, the interceptor reports it routed, and logits
    stay in mask agreement with f32 (the stem input quantizes nearly
    losslessly — its source is 8-bit imagery)."""
    import jax.numpy as jnp

    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    model, params, batch_stats = small_model
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)

    conv_scales = calibrate_conv_inputs(
        model, params, batch_stats, [x], wide=True, stem=True
    )
    assert "backbone/stem/conv" in conv_scales
    fn = make_int8_exec_fn(
        model, batch_stats, params, conv_scales, backend="xla", stem=True
    )
    logits_q = np.asarray(fn(x))
    assert "backbone/stem/conv" in set(fn.routed_sites)

    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    assert agree > 0.94, f"stem-routed int8 mask agreement {agree}"

    # without the flag the stem stays bf16 (default unchanged)
    fn_off = make_int8_exec_fn(
        model, batch_stats, params, conv_scales, backend="xla"
    )
    fn_off(x)
    assert "backbone/stem/conv" not in set(fn_off.routed_sites)


def test_int8_shifted_dilated_matches_dense():
    """int8 valid-tap atrous conv vs the f32 ShiftedDilatedConv math."""
    import jax.numpy as jnp

    from iswm_tpu.models.layers import dilated_conv3x3
    from iswm_tpu.infer.quantization import quantize_params_int8
    from iswm_tpu.ops.int8_xla import int8_shifted_dilated_conv

    rng = np.random.default_rng(31)
    for d in (2, 6):
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
        params = {"k": {"kernel": jnp.asarray(
            rng.normal(size=(3, 3, 64, 128)), jnp.float32)}}
        q, s = quantize_params_int8(params)
        x_scale = float(jnp.max(jnp.abs(x))) / 127.0
        got = int8_shifted_dilated_conv(
            x, q["k"]["kernel"], s["k"]["kernel"], x_scale, d
        )
        dense = dilated_conv3x3(x, params["k"]["kernel"], d)
        rel = float(jnp.max(jnp.abs(got - dense)) / jnp.max(jnp.abs(dense)))
        assert got.shape == dense.shape
        assert rel < 0.06, (d, rel)


def test_int8_exec_xla_routes_concat_conv_bn(small_model):
    """The decoder's ConcatConvBN (cls0, the largest op of the int8 serving
    profile) routes as per-part int8 convs + running-stats BN: wide
    calibration records per-part scales ('<site>#p<i>'), the interceptor
    reports the site routed, and logits stay in mask agreement with f32."""
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    model, params, batch_stats = small_model
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)

    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x],
                                        wide=True)
    part_keys = [k for k in conv_scales if "#p" in k]
    assert "head/cls0#p0" in part_keys and "head/cls0#p1" in part_keys, (
        sorted(part_keys)
    )

    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales,
                           backend="xla")
    logits_q = np.asarray(fn(x))
    assert "head/cls0" in set(fn.routed_sites), sorted(set(fn.routed_sites))

    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    assert agree > 0.97, f"mask agreement {agree}"

    # dropping a part's scale falls the module back to the dense path
    partial = {k: v for k, v in conv_scales.items() if k != "head/cls0#p1"}
    fn2 = make_int8_exec_fn(model, batch_stats, params, partial,
                            backend="xla")
    fn2(x)
    assert "head/cls0" not in set(fn2.routed_sites)


def test_int8_exec_xla_engine_serialize_roundtrip(small_model):
    """The executed-int8 serving variant is a deployable engine artifact:
    it AOT-serializes to StableHLO (infer/engine.serialize — the .trt-file
    analogue of the reference's build_engine.py:27-114) with the quantized
    weights baked in as constants, and the deserialized program reproduces
    the live variant's logits exactly."""
    from iswm_tpu.infer.engine import deserialize, serialize
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
    )

    model, params, batch_stats = small_model
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)

    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x],
                                        wide=True)
    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales,
                           backend="xla")
    live = np.asarray(fn(x))
    assert fn.routed_sites  # int8 convs are actually in the program

    blob = serialize(fn, (1, 32, 32, 3), jnp.float32)
    assert isinstance(blob, bytes) and len(blob) > 1000
    # int8 kernels ride along as int8 constants, not dequantized copies:
    # the blob stays well under the f32 parameter footprint (~45 MB).
    assert len(blob) < 40e6, f"blob {len(blob)/1e6:.1f} MB"

    out = np.asarray(deserialize(blob)(x))
    np.testing.assert_array_equal(out, live)


def test_int8_exec_xla_grouped_backbone():
    """Grouped-conv zoo member (resnext50_32x4d) with blockdiag OFF: the
    int8 serving router must skip every grouped 3x3 (feature_group_count
    gate — a per-tensor dense int8 matmul would be numerically wrong for a
    grouped contraction) while still routing the dense 1x1s, and the
    variant stays in mask agreement with f32."""
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    cfg = ModelConfig(backbone="resnext50_32x4d", compute_dtype="float32",
                      grouped_blockdiag=0)
    model = build_model(cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x],
                                        wide=True)
    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales,
                           backend="xla")
    logits_q = np.asarray(fn(x))
    routed = set(fn.routed_sites)
    assert routed, "no conv routed on resnext"
    # grouped 3x3s (backbone layerN_M/conv2) must NOT be int8-routed
    grouped = [k for k in routed if "/conv2/" in k and "backbone" in k]
    assert not grouped, f"grouped convs wrongly routed: {grouped}"
    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    assert agree > 0.95, f"grouped-backbone int8 mask agreement {agree}"


def test_int8_exec_xla_routes_blockdiag():
    """resnext50 at the DEFAULT config (grouped_blockdiag auto -> 256):
    the narrow grouped 3x3s execute as BlockDiagConv, which the int8
    serving router treats like any dense conv — exact under per-O weight
    scales because each O's only nonzero input block is its own slice —
    so blockdiag and int8_exec_xla now COMPOSE (round-3's interceptor
    skipped the blockdiag path entirely).  The wide grouped 3x3s
    (layer3/4, cin > gate) stay native-grouped and must NOT route."""
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    cfg = ModelConfig(backbone="resnext50_32x4d", compute_dtype="float32")
    model = build_model(cfg)
    assert model.backbone.quant.grouped_blockdiag_max == 256  # the auto default
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    conv_scales = calibrate_conv_inputs(model, params, batch_stats, [x],
                                        wide=True)
    fn = make_int8_exec_fn(model, batch_stats, params, conv_scales,
                           backend="xla")
    logits_q = np.asarray(fn(x))
    routed = set(fn.routed_sites)
    # layer1/2 conv2 (cin 128/256 <= gate) are BlockDiagConv -> routed
    bd = [k for k in routed if "/conv2/" in k
          and ("layer1" in k or "layer2" in k)]
    assert bd, f"no blockdiag conv2 routed: {sorted(routed)[:10]}"
    # layer3/4 conv2 (cin 512/1024 > gate) stay native grouped -> skipped
    wide_grouped = [k for k in routed if "/conv2/" in k
                    and ("layer3" in k or "layer4" in k)]
    assert not wide_grouped, f"wide grouped convs wrongly routed: {wide_grouped}"
    ref = make_variant_fn(model, batch_stats, params, "f32")
    logits_f = np.asarray(ref(x))
    agree = float((logits_q.argmax(-1) == logits_f.argmax(-1)).mean())
    assert agree > 0.95, f"blockdiag int8 mask agreement {agree}"


def test_quantized_conv_xla_grouped_exact_on_grid():
    """feature_group_count>1 under the symmetric contract: with planted
    amax=127 operands (all scales exactly 1) the int8 grouped conv must
    reproduce the f32 grouped conv bit-exactly — per-O weight scales
    factor out of a group contraction identically to the dense case."""
    from iswm_tpu.ops.int8_xla import quantized_conv_xla

    rng = np.random.default_rng(41)

    def mk(shape):
        a = rng.integers(-126, 127, shape).astype(np.float32)
        a.flat[0] = 127.0
        return a

    for groups, cin, cout in ((4, 16, 32), (16, 16, 16)):  # grouped, depthwise
        x = mk((2, 10, 9, cin))
        w = mk((3, 3, cin // groups, cout))
        w[0, 0, 0, :] = 127.0  # per-O scales exactly 1
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        got = quantized_conv_xla(
            jnp.asarray(x), jnp.asarray(w, np.int8),
            jnp.ones((1, 1, 1, cout), jnp.float32), 1.0,
            strides=(1, 1), padding=[(1, 1), (1, 1)], dilation=(1, 1),
            feature_group_count=groups,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_int8_exec_xla_grouped_routing_mobilenet():
    """grouped=True (opt-in) routes the depthwise stages of mobilenetv2
    through int8 convs; default leaves them bf16.  Mask agreement with f32
    holds for both."""
    from iswm_tpu.infer.quantization import (
        calibrate_conv_inputs,
        make_int8_exec_fn,
        make_variant_fn,
    )

    cfg = ModelConfig(backbone="mobilenetv2", compute_dtype="float32")
    model = build_model(cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    scales_g = calibrate_conv_inputs(model, params, batch_stats, [x],
                                     wide=True, grouped=True)
    scales_d = calibrate_conv_inputs(model, params, batch_stats, [x],
                                     wide=True)
    assert set(scales_d) < set(scales_g), "grouped must add sites"

    fn_d = make_int8_exec_fn(model, batch_stats, params, scales_d,
                             backend="xla")
    fn_g = make_int8_exec_fn(model, batch_stats, params, scales_g,
                             backend="xla", grouped=True)
    ld, lg = np.asarray(fn_d(x)), np.asarray(fn_g(x))
    extra = set(fn_g.routed_sites) - set(fn_d.routed_sites)
    assert extra, "grouped=True must route additional (depthwise) convs"

    ref = make_variant_fn(model, batch_stats, params, "f32")
    lf = np.asarray(ref(x))
    for name, lq in (("default", ld), ("grouped", lg)):
        agree = float((lq.argmax(-1) == lf.argmax(-1)).mean())
        assert agree > 0.95, f"{name} mask agreement {agree}"


def test_variant_fns_carry_no_weight_constants(small_model):
    """The variable trees must be jit ARGUMENTS, not closure constants:
    closed-over arrays embed into the lowered program as literals, which
    blew the remote-compile request-body limit on wide_resnet50_2 (HTTP
    413) and duplicated the weights in HBM.  Pin the property by bounding
    the lowered program text of ``fn.inner`` — with the weights inlined it
    is tens of MB even for resnet18."""
    model, params, batch_stats = small_model
    x = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32)
    for name in ("bf16", "int8"):
        fn = make_variant_fn(model, batch_stats, params, name)
        assert hasattr(fn, "inner") and hasattr(fn, "bound_args")
        txt = jax.jit(fn.inner).lower(x, *fn.bound_args).as_text()
        assert len(txt) < 2_000_000, (
            f"{name}: lowered program is {len(txt):,} bytes — weights are "
            "being inlined as constants again"
        )
