"""Optimizer/scheduler parity vs torch on a real multi-step trace.

The formula tests in test_train.py pin single-step semantics; these pin the
full trajectory: a tiny least-squares problem is trained for 30 iterations
in torch (the reference's exact setup: SGD momentum .9 nesterov + coupled
weight decay, CosineAnnealingLR stepped per iteration with
eta_min = lr*0.01 — reference train.py:421-452, 1103) and with our optax
chain (iswm_tpu/train/optim.py), asserting the parameter trajectories track
step-by-step.  Coupled-vs-decoupled weight-decay drift, momentum-buffer
initialization, bias correction, and schedule indexing all show up as
divergence here and nowhere else.  Skipped when torch is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iswm_tpu.config import OptimConfig
from iswm_tpu.train.optim import make_optimizer, make_schedule

torch = pytest.importorskip("torch")

STEPS = 30
LR = 0.05
WD = 1e-4
SEED = 7


def _problem():
    """Fixed least-squares instance: W [4,3], X [3,16], Y [4,16]."""
    rng = np.random.default_rng(SEED)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    y = rng.standard_normal((4, 16)).astype(np.float32)
    return w0, x, y


def _torch_trace(opt_name: str, schedule: str):
    w0, x, y = _problem()
    w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    if opt_name == "sgd":
        opt = torch.optim.SGD([w], lr=LR, momentum=0.9, nesterov=True, weight_decay=WD)
    elif opt_name == "adam":
        opt = torch.optim.Adam([w], lr=LR, weight_decay=WD)
    elif opt_name == "adamw":
        opt = torch.optim.AdamW([w], lr=LR, weight_decay=WD)
    else:  # pragma: no cover
        raise ValueError(opt_name)
    if schedule == "cosine":
        # reference train.py:449-451 + per-iteration step at train.py:1103
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=STEPS, eta_min=LR * 0.01
        )
    else:
        sched = None
    traj = []
    for _ in range(STEPS):
        opt.zero_grad()
        loss = 0.5 * ((w @ xt - yt) ** 2).sum()
        loss.backward()
        opt.step()
        if sched is not None:
            sched.step()
        traj.append(w.detach().numpy().copy())
    return np.stack(traj)


def _optax_trace(opt_name: str, schedule: str):
    w0, x, y = _problem()
    cfg = OptimConfig(
        optimizer=opt_name, lr=LR, weight_decay=WD, schedule=schedule,
        momentum=0.9, nesterov=True, cosine_min_factor=0.01,
    )
    tx, _ = make_optimizer(cfg, STEPS)
    w = jnp.asarray(w0)
    state = tx.init(w)

    def loss_fn(w):
        return 0.5 * jnp.sum((w @ jnp.asarray(x) - jnp.asarray(y)) ** 2)

    grad_fn = jax.jit(jax.grad(loss_fn))

    import optax

    traj = []
    for _ in range(STEPS):
        updates, state = tx.update(grad_fn(w), state, w)
        w = optax.apply_updates(w, updates)
        traj.append(np.asarray(w))
    return np.stack(traj)


@pytest.mark.parametrize(
    "opt_name,schedule",
    [("sgd", "cosine"), ("adam", "cosine"), ("adamw", "cosine")],
)
def test_trajectory_matches_torch(opt_name, schedule):
    ours = _optax_trace(opt_name, schedule)
    ref = _torch_trace(opt_name, schedule)
    # f32 roundoff accumulates over 30 steps; any semantic mismatch
    # (coupled-vs-decoupled wd, nesterov form, schedule off-by-one)
    # diverges by orders of magnitude more than this.
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_cosine_lr_values_match_torch_scheduler():
    """Per-iteration LR sequence vs torch CosineAnnealingLR (closed form)."""
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=STEPS, eta_min=LR * 0.01
    )
    fn = make_schedule(OptimConfig(lr=LR, schedule="cosine",
                                   cosine_min_factor=0.01), STEPS)
    for it in range(STEPS):
        # our schedule computes in f32, torch in f64 → ~1e-6 relative noise
        assert float(fn(it)) == pytest.approx(sched.get_last_lr()[0], rel=1e-5), it
        opt.step()
        sched.step()
