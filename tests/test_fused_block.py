"""Fused BN-training residual-block kernels vs references (interpret mode).

The fused path is numerically equivalent (to bf16 rounding) to the
unfused ConvBN composition, declares an identical variable tree, and its
custom VJPs match autodiff of the reference implementations.  On v5e the
composite block measured *slower* than XLA's conv fusions, so the path
is opt-in (ModelConfig.fused_blocks, default "never") — see ROADMAP
"Performance" for the measured negative result; these tests keep the
groundwork correct.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iswm_tpu.models.resnet import Bottleneck
from iswm_tpu.ops.pallas import fused_block as fb

f32 = jnp.float32


@pytest.fixture()
def nprng():
    # fresh, deterministic per test: grad tolerances are validated for
    # THIS data; a shared stream would make them order-dependent
    return np.random.default_rng(7)


@pytest.mark.parametrize("prologue", [False, True])
def test_matmul_bn_stats_fwd_and_grads(nprng, prologue):
    M, K, N = 256, 16, 32
    x = jnp.asarray(nprng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(nprng.normal(size=(K, N)) * 0.1, jnp.bfloat16)
    a = jnp.asarray(nprng.normal(size=(K,)) * 0.5 + 1.0, f32)
    b = jnp.asarray(nprng.normal(size=(K,)) * 0.1, f32)

    y, s, q = fb.matmul_bn_stats(x, w, a, b, prologue, True)
    yr, sr, qr = fb.ref_matmul_bn_stats(x, w, a, b, prologue)
    np.testing.assert_array_equal(np.asarray(y, f32), np.asarray(yr, f32))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-5)

    def loss(f):
        def inner(x, w, a, b):
            y, s, q = f(x, w, a, b)
            return (
                jnp.sum(y.astype(f32) ** 2) * 1e-3
                + jnp.sum(jnp.sin(s))
                + jnp.sum(jnp.cos(q * 1e-3))
            )
        return inner

    gk = jax.grad(loss(lambda *ar: fb.matmul_bn_stats(*ar, prologue, True)),
                  argnums=(0, 1, 2, 3))(x, w, a, b)
    gr = jax.grad(loss(lambda *ar: fb.ref_matmul_bn_stats(*ar, prologue)),
                  argnums=(0, 1, 2, 3))(x, w, a, b)
    for k_, r_ in zip(gk, gr):
        k_, r_ = np.asarray(k_, f32), np.asarray(r_, f32)
        scale = max(np.abs(r_).max(), 1e-6)
        assert np.abs(k_ - r_).max() / scale < 2e-2  # bf16 grads


def test_conv3x3_bn_stats_fwd_and_grads(nprng):
    B, H, W, C, N = 2, 16, 24, 8, 16
    y1 = jnp.asarray(nprng.normal(size=(B, H, W, C)), jnp.bfloat16)
    a = jnp.asarray(nprng.normal(size=(C,)) * 0.5 + 1.0, f32)
    b = jnp.asarray(nprng.normal(size=(C,)) * 0.1, f32)
    w = jnp.asarray(nprng.normal(size=(3, 3, C, N)) * 0.2, f32)

    y2, s, q = fb.conv3x3_bn_stats(y1, a, b, w, True)
    yr, sr, qr = fb.ref_conv3x3_bn_stats(y1, a, b, w)
    np.testing.assert_array_equal(np.asarray(y2, f32), np.asarray(yr, f32))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(qr), rtol=1e-4)

    def loss(f):
        def inner(y1, a, b, w):
            y2, s, q = f(y1, a, b, w)
            return (
                jnp.sum(y2.astype(f32) ** 2) * 1e-2
                + jnp.sum(jnp.sin(s))
                + jnp.sum(jnp.cos(q * 1e-2))
            )
        return inner

    gk = jax.grad(loss(lambda *ar: fb.conv3x3_bn_stats(*ar, True)),
                  argnums=(0, 1, 2, 3))(y1, a, b, w)
    gr = jax.grad(loss(fb.ref_conv3x3_bn_stats), argnums=(0, 1, 2, 3))(y1, a, b, w)
    for k_, r_ in zip(gk, gr):
        k_, r_ = np.asarray(k_, f32), np.asarray(r_, f32)
        scale = max(np.abs(r_).max(), 1e-6)
        assert np.abs(k_ - r_).max() / scale < 2e-2


def test_fused_bottleneck_matches_unfused(nprng):
    x = jnp.asarray(nprng.normal(size=(2, 8, 8, 16)), jnp.bfloat16)
    kw = dict(planes=8, strides=1, dilation=1, downsample=True)
    unf = Bottleneck(**kw, fused_mode="never")
    fus = Bottleneck(**kw, fused_mode="interpret")
    v = unf.init({"params": jax.random.key(0)}, x, train=False)
    # identical variable trees: fused init must accept unfused variables
    v2 = fus.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def run(m):
        out, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        return out.astype(f32), mut["batch_stats"]

    o1, bs1 = run(unf)
    o2, bs2 = run(fus)
    scale = float(jnp.abs(o1).max())
    assert float(jnp.abs(o1 - o2).max()) / scale < 2e-2
    for d in jax.tree.leaves(jax.tree.map(
        lambda p, q: float(jnp.abs(p - q).max()), bs1, bs2
    )):
        assert d < 1e-4  # running stats essentially exact (f32 math)

    def loss(params, m):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(f32) ** 2)

    g1 = jax.grad(loss)(v["params"], unf)
    g2 = jax.grad(loss)(v["params"], fus)
    rels = jax.tree.map(
        lambda p, q: float(jnp.abs(p - q).max() / (jnp.abs(p).max() + 1e-9)), g1, g2
    )
    assert max(jax.tree.leaves(rels)) < 3e-2


def test_fused_bottleneck_eval_ineligible_falls_back(nprng):
    # eval mode and strided/dilated blocks must take the unfused path
    x = jnp.asarray(nprng.normal(size=(2, 8, 8, 16)), jnp.bfloat16)
    m = Bottleneck(planes=8, strides=2, dilation=1, downsample=True,
                   fused_mode="interpret")
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 4, 4, 32)  # strided path ran
    m2 = Bottleneck(planes=8, strides=1, dilation=1, downsample=True,
                    fused_mode="interpret")
    v2 = m2.init({"params": jax.random.key(1)}, x, train=False)
    out_eval = m2.apply(v2, x, train=False)
    assert out_eval.shape == (2, 8, 8, 32)
