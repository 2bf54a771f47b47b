"""Fused stem tail (ops/pallas/fused_stem.py) — interpret-mode parity.

The oracle is the exact composition the kernels replace: packed conv ->
flax-semantics train BatchNorm -> relu -> max_pool(3,2,1).  Gradient
parity holds wherever the pool has no exact float ties (f32 random
inputs); a dedicated test pins the equal-split tie semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from iswm_tpu.ops.pallas.fused_stem import (
    _stem_conv,
    stem_fused_eval,
    stem_fused_train,
)

f32 = jnp.float32
EPS = 1e-5


def _inputs(s, c=12, f=64, b=2, seed=0):
    rng = np.random.default_rng(seed)
    xp = jnp.asarray(rng.normal(size=(b, s, s, c)), f32)
    xp_pad = jnp.pad(xp, ((0, 0), (0, 0), (2, 1), (0, 0)))
    kk = jnp.asarray(rng.normal(size=(4, 4, c, f)) * 0.1, f32)
    gamma = jnp.asarray(rng.normal(size=(f,)) * 0.5 + 1.0, f32)
    beta = jnp.asarray(rng.normal(size=(f,)) * 0.1, f32)
    return xp_pad, kk, gamma, beta


def _composed(xp_pad, kk, gamma, beta):
    z = _stem_conv(xp_pad, kk)
    zf = z.astype(f32)
    n = z.shape[0] * z.shape[1] * z.shape[2]
    mean = zf.sum((0, 1, 2)) / n
    var = jnp.maximum((zf * zf).sum((0, 1, 2)) / n - mean * mean, 0.0)
    si = jax.lax.rsqrt(var + EPS)
    y = jnp.maximum(zf * (gamma * si) + (beta - mean * gamma * si), 0.0)
    p = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    return p.astype(z.dtype), mean, var


@pytest.mark.parametrize("s", [32, 20])  # pm=8 and pm=5 block paths
def test_forward_parity(s):
    xp_pad, kk, gamma, beta = _inputs(s)
    p_ref, mean_ref, var_ref = _composed(xp_pad, kk, gamma, beta)
    p, mean, var = stem_fused_train(xp_pad, kk, gamma, beta, EPS, True)
    np.testing.assert_allclose(p, p_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mean, mean_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(var, var_ref, rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    xp_pad, kk, gamma, beta = _inputs(32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 64)), f32)

    def loss_ref(kk, gamma, beta):
        p, _, _ = _composed(xp_pad, kk, gamma, beta)
        return jnp.sum(p.astype(f32) * w)

    def loss_fused(kk, gamma, beta):
        p, _, _ = stem_fused_train(xp_pad, kk, gamma, beta, EPS, True)
        return jnp.sum(p.astype(f32) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(kk, gamma, beta)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(kk, gamma, beta)
    for a, b in zip(gr, gf):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5 * max(scale, 1.0))


def test_eval_parity():
    xp_pad, kk, gamma, beta = _inputs(32)
    p_ref, mean_ref, var_ref = _composed(xp_pad, kk, gamma, beta)
    si = jax.lax.rsqrt(var_ref + EPS)
    scale = gamma * si
    bias = beta - mean_ref * scale
    pe = stem_fused_eval(xp_pad, kk, scale, bias, interpret=True)
    np.testing.assert_allclose(pe, p_ref, rtol=1e-5, atol=1e-5)


def test_equal_split_ties_preserve_gradient_mass():
    """Engineered tie: a window whose max appears twice receives dp/2 at
    each tying position — total gradient mass per window is preserved."""
    from iswm_tpu.ops.pallas.fused_stem import stem_tail_bwd

    b, s, c, f = 1, 8, 12, 64
    # z constant within each window => every window is a 9-way (interior)
    # tie after the affine.  gamma=1, beta large => relu mask all-open.
    z = jnp.ones((b, s, s, f), jnp.float32)
    xp_pad = jnp.zeros((b, s, s + 3, c), jnp.float32)
    dp = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, s // 2, s // 2, f)), f32
    )
    gamma = jnp.ones((f,), f32)
    beta = jnp.full((f,), 5.0, f32)
    mu = jnp.zeros((f,), f32)
    si = jnp.ones((f,), f32)
    _dw, dgamma, dbeta = stem_tail_bwd(
        z, xp_pad, dp, gamma, beta, mu, si, interpret=True
    )
    # dbeta = sum of d_bn = sum of the scattered pool gradient; equal-split
    # conserves each window's mass, so it equals sum(dp) exactly.
    np.testing.assert_allclose(dbeta, dp.sum((0, 1, 2)), rtol=1e-5, atol=1e-5)


def test_model_fused_stem_matches_unfused():
    """FusedStemPool inside the real backbone: logits match the unfused
    path (eval), and a train step produces matching batch-stat updates."""
    from iswm_tpu.config import ModelConfig
    from iswm_tpu.models import build_model

    cfg = ModelConfig(backbone="resnet18", compute_dtype="float32")
    cfg.fused_stem = "never"
    m_ref = build_model(cfg)
    cfg2 = ModelConfig(backbone="resnet18", compute_dtype="float32")
    cfg2.fused_stem = "interpret"
    m_fused = build_model(cfg2)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 32, 32, 3)), jnp.float32
    )
    v = m_ref.init({"params": jax.random.key(0)}, x, train=False)
    # identical variable trees -> same params usable by both
    chex_tree_ref = jax.tree.structure(v)
    v2 = m_fused.init({"params": jax.random.key(0)}, x, train=False)
    assert chex_tree_ref == jax.tree.structure(v2)

    out_ref = m_ref.apply(v, x, train=False)
    out_fused = m_fused.apply(v, x, train=False)
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-4, atol=2e-4)

    # train-mode batch stats update parity
    _, mut_ref = m_ref.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    _, mut_fused = m_fused.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    a = mut_ref["batch_stats"]["backbone"]["stem"]["bn"]
    bq = mut_fused["batch_stats"]["backbone"]["stem"]["bn"]
    np.testing.assert_allclose(bq["mean"], a["mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(bq["var"], a["var"], rtol=1e-5, atol=1e-5)
