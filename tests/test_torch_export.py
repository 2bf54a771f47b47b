"""flax -> reference .pth export (the compat round-trip's other half).

Proves a model trained here is loadable by the reference's OWN torch
module with strict=True and produces the same logits — i.e. reference
users can take our checkpoints into their predict.py / export_onnx.py
toolchain unchanged.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


@pytest.fixture(scope="module")
def ref_network():
    if not REF.exists():
        pytest.skip("reference tree not available")
    torch = pytest.importorskip("torch")
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    for name in ("src", "src.utils", "src.datasets"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["src.utils"].ext_transforms = types.ModuleType("ext_transforms")
    sys.modules["src.datasets"].FeatureVisDataset = type("FeatureVisDataset", (), {})
    import network.modeling as ref_modeling

    return torch, ref_modeling


def _build_flax(backbone="resnet50", head="deeplabv3plus"):
    import jax
    import jax.numpy as jnp

    from iswm_tpu.config import ModelConfig
    from iswm_tpu.models import build_model

    cfg = ModelConfig(name=head, backbone=backbone, compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(7), "dropout": jax.random.key(8)},
            x, train=False,
        )
    )()
    return model, v["params"], v["batch_stats"]


@pytest.mark.parametrize(
    "backbone",
    ["resnet18", "xception", "mobilenetv2", "resnext50_32x4d"],
)
def test_export_import_roundtrip(backbone):
    import jax

    from iswm_tpu.compat.torch_import import (
        export_torch_state_dict,
        import_torch_state_dict,
    )

    _, params, stats = _build_flax(backbone)
    sd = export_torch_state_dict(params, stats, backbone=backbone)
    p2, s2 = import_torch_state_dict(sd, backbone=backbone)

    for tree, tree2 in ((params, p2), (stats, s2)):
        leaves = jax.tree_util.tree_leaves_with_path(tree)
        flat2 = dict(jax.tree_util.tree_leaves_with_path(tree2))
        assert len(leaves) == len(flat2)
        for path, leaf in leaves:
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32), np.asarray(flat2[path], np.float32),
                rtol=1e-6, err_msg=str(path),
            )


def test_reference_model_accepts_export(ref_network, tmp_path):
    torch, ref_modeling = ref_network
    import jax
    import jax.numpy as jnp

    from iswm_tpu.compat.torch_import import save_reference_checkpoint

    model, params, stats = _build_flax("resnet50")
    path = save_reference_checkpoint(
        str(tmp_path / "export.pth"), params, stats,
        backbone="resnet50", cur_itrs=123, best_score={"MIoU": 0.5},
    )

    payload = torch.load(path, map_location="cpu", weights_only=False)
    assert payload["cur_itrs"] == 123
    ref_model = ref_modeling.deeplabv3plus_resnet50(
        num_classes=2, output_stride=16, pretrained_backbone=False
    )
    missing, unexpected = ref_model.load_state_dict(
        payload["model_state"], strict=True
    )
    assert not missing and not unexpected
    ref_model.eval()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref_model(torch.from_numpy(x)).numpy()

    ours = jax.jit(
        lambda v, xx: model.apply(v, xx, train=False)
    )({"params": params, "batch_stats": stats},
      jnp.asarray(x.transpose(0, 2, 3, 1)))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_logits, rtol=1e-3, atol=1e-2)
