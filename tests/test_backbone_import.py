"""Xception / MobileNetV2 torch checkpoint import parity (VERDICT r1 item 7).

Xception is pinned against the reference's own module
(/root/reference/network/backbone/xception.py, random-initialized);
MobileNetV2 (no reference module exists, SURVEY §0.1.3) is pinned against
a functional torch evaluation of the same torchvision-layout state dict.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "network"))


def _to_flax(x):
    import jax.numpy as jnp

    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference snapshot absent")
def test_xception_backbone_import_parity():
    import jax
    import jax.numpy as jnp

    from iswm_tpu.compat.torch_import import import_xception_backbone
    from iswm_tpu.models.xception import Xception

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from network.backbone.xception import Xception as RefXception

    # Undilated config: with any dilated stage the reference's conv3/conv4
    # keep padding=1 while dilation=2 (xception.py:155,160), shrinking the
    # map (and crashing at small inputs) — dead-code geometry we deliberately
    # fix with size-preserving pad=dilation, so parity is pinned where the
    # geometries agree.
    torch.manual_seed(0)
    ref = RefXception(num_classes=10,
                      replace_stride_with_dilation=[False] * 4)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params: dict = {}
    stats: dict = {}
    import_xception_backbone(params, stats, sd, prefix="")

    model = Xception(replace_stride_with_dilation=(False,) * 4,
                     dtype=jnp.float32)
    x_t = torch.randn(1, 3, 129, 129)
    variables = {"params": params["backbone"], "batch_stats": stats["backbone"]}
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, _to_flax(x_t)
    )

    with torch.no_grad():
        feat = ref.features(x_t)
        ref_out = torch.relu(feat)  # ours folds the consumer's ReLU
        # low_level = block1 output: replay the entry flow
        y = ref.relu1(ref.bn1(ref.conv1(x_t)))
        y = ref.relu2(ref.bn2(ref.conv2(y)))
        ref_low = ref.block1(y)

    got_out = np.asarray(out["out"]).transpose(0, 3, 1, 2)
    got_low = np.asarray(out["low_level"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_out, ref_out.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got_low, ref_low.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- mobilenet

_MBV2_SETTINGS = (  # (t, c, n, s) — must match models/mobilenetv2.py
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
)


def _tv_mbv2_state_dict(rng):
    """Random torchvision-layout mobilenet_v2 state dict."""
    sd = {}

    def conv(name, o, i, k, groups=1):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(size=(o, i // groups, k, k)).astype(np.float32) * 0.1
        )

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(rng.normal(size=c).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(rng.normal(size=c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(
            (rng.normal(size=c) * 0.1).astype(np.float32))
        sd[f"{name}.running_var"] = torch.tensor(
            (rng.random(c) + 0.5).astype(np.float32))

    conv("features.0.0", 32, 3, 3)
    bn("features.0.1", 32)
    fi, in_ch = 1, 32
    for t, c, n, _s in _MBV2_SETTINGS:
        for _b in range(n):
            base = f"features.{fi}"
            hidden = in_ch * t
            if t != 1:
                conv(f"{base}.conv.0.0", hidden, in_ch, 1)
                bn(f"{base}.conv.0.1", hidden)
                dw, proj, proj_bn = "conv.1", "conv.2", "conv.3"
            else:
                dw, proj, proj_bn = "conv.0", "conv.1", "conv.2"
            conv(f"{base}.{dw}.0", hidden, hidden, 3, groups=hidden)
            bn(f"{base}.{dw}.1", hidden)
            conv(f"{base}.{proj}", c, hidden, 1)
            bn(f"{base}.{proj_bn}", c)
            fi, in_ch = fi + 1, c
    # ImageNet head (ignored by the importer, present in real files)
    conv("features.18.0", 1280, 320, 1)
    bn("features.18.1", 1280)
    sd["classifier.1.weight"] = torch.tensor(
        rng.normal(size=(1000, 1280)).astype(np.float32))
    sd["classifier.1.bias"] = torch.tensor(
        rng.normal(size=1000).astype(np.float32))
    return sd


def _torch_mbv2_features(x, sd, output_stride):
    """Functional torch forward with OUR stride->dilation semantics."""
    import torch.nn.functional as F

    def convbn(x, conv_key, bn_key, stride=1, dilation=1, groups=1):
        w = sd[f"{conv_key}.weight"]
        pad = (w.shape[-1] // 2) * dilation
        x = F.conv2d(x, w, None, stride, pad, dilation, groups)
        return F.batch_norm(
            x, sd[f"{bn_key}.running_mean"], sd[f"{bn_key}.running_var"],
            sd[f"{bn_key}.weight"], sd[f"{bn_key}.bias"], False, 0.0, 1e-5,
        )

    x = F.relu6(convbn(x, "features.0.0", "features.0.1", stride=2))
    fi, in_ch = 1, 32
    current_stride, dilation = 2, 1
    low = out = None
    for stage_idx, (t, c, n, s) in enumerate(_MBV2_SETTINGS):
        for b in range(n):
            stride = s if b == 0 else 1
            if stride > 1 and current_stride >= output_stride:
                dilation *= stride
                stride = 1
            base = f"features.{fi}"
            hidden = in_ch * t
            y = x
            if t != 1:
                y = F.relu6(convbn(y, f"{base}.conv.0.0", f"{base}.conv.0.1"))
                dw, proj, proj_bn = "conv.1", "conv.2", "conv.3"
            else:
                dw, proj, proj_bn = "conv.0", "conv.1", "conv.2"
            y = F.relu6(convbn(y, f"{base}.{dw}.0", f"{base}.{dw}.1",
                               stride=stride, dilation=dilation, groups=hidden))
            y = convbn(y, f"{base}.{proj}", f"{base}.{proj_bn}")
            x = x + y if (stride == 1 and in_ch == c) else y
            current_stride *= stride
            fi, in_ch = fi + 1, c
        if stage_idx == 1:
            low = x
    out = x
    return low, out


def test_mobilenetv2_backbone_import_parity():
    import jax
    import jax.numpy as jnp

    from iswm_tpu.compat.torch_import import import_mobilenetv2_backbone
    from iswm_tpu.models.mobilenetv2 import MobileNetV2

    rng = np.random.default_rng(3)
    sd_t = _tv_mbv2_state_dict(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}

    params: dict = {}
    stats: dict = {}
    import_mobilenetv2_backbone(params, stats, sd, prefix="")
    assert "stage6_0" in params["backbone"]  # all 17 blocks mapped

    model = MobileNetV2(output_stride=16, dtype=jnp.float32)
    x_t = torch.randn(1, 3, 64, 64)
    variables = {"params": params["backbone"], "batch_stats": stats["backbone"]}
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, _to_flax(x_t)
    )

    with torch.no_grad():
        ref_low, ref_out = _torch_mbv2_features(x_t, sd_t, output_stride=16)
    np.testing.assert_allclose(
        np.asarray(out["low_level"]).transpose(0, 3, 1, 2), ref_low.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["out"]).transpose(0, 3, 1, 2), ref_out.numpy(),
        rtol=1e-4, atol=1e-4)


def test_pretrained_routes_all_backbones(tmp_path, monkeypatch):
    """find_pretrained_file + load path works for xception/mobilenetv2."""
    from iswm_tpu.compat.pretrained import (
        find_pretrained_file,
        load_torchvision_backbone,
    )

    rng = np.random.default_rng(5)
    sd = _tv_mbv2_state_dict(rng)
    torch.save(sd, str(tmp_path / "mobilenet_v2-b0353104.pth"))
    monkeypatch.setenv("ISWM_PRETRAINED_DIR", str(tmp_path))
    path = find_pretrained_file("mobilenetv2")
    assert path is not None
    params, stats = load_torchvision_backbone(path, "mobilenetv2")
    got = np.asarray(params["backbone"]["stem"]["conv"]["kernel"])
    want = np.transpose(sd["features.0.0.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
