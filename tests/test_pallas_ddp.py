"""Fused Pallas DDP-IK kernel vs the XLA DDP (interpreter mode on CPU).

The kernel's hand-derived FK/centroidal tangents, SE(3) chart blocks,
structured Riccati and in-kernel Cholesky must reproduce the XLA
Gauss-Newton DDP (solvers/ddp.py + mpc/ik.py) step for step. A tiny
single-iteration problem keeps interpret mode tractable; the full-size
compiled check runs on real TPU via scripts/check_pallas_ddp.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import ik as IK
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.solvers import ddp
from bunmpc_tpu.solvers import pallas_ddp as PD


@pytest.fixture(scope="module")
def setup():
    model = Solo12Config.load_model()
    eff = Solo12Config.eff_names
    H = 3
    rng = np.random.default_rng(7)
    nq, nv = model.nq, model.nv
    f32 = jnp.float32
    x_reg = np.concatenate([Solo12Config.q0(), np.zeros(nv)])
    tasks = IK.IkTasks(
        ee_targets=jnp.asarray(rng.normal(size=(H, 4, 3)) * 0.1, f32),
        ee_wts=jnp.asarray(rng.uniform(0.5, 2.0, size=(H, 4)), f32),
        com_ref=jnp.asarray(rng.normal(size=(H + 1, 3)) * 0.05, f32),
        mom_ref=jnp.asarray(rng.normal(size=(H + 1, 6)) * 0.05, f32),
        com_wt=jnp.asarray(3.0, f32),
        mom_wt=jnp.asarray(2.0, f32),
        state_wt=jnp.asarray(rng.uniform(0.1, 1.0, size=2 * nv), f32),
        x_reg=jnp.asarray(x_reg, f32),
        reg_wt_state=0.7,
        reg_wt_ctrl=1e-4,
        ctrl_wt=jnp.asarray(rng.uniform(0.1, 1.0, size=nv), f32),
        dts=jnp.full(H, 0.05, f32),
    )
    x0 = jnp.asarray(np.concatenate([Solo12Config.q0(), np.zeros(nv)]), f32)
    return model, eff, tasks, x0


def _run_pallas(model, eff, tasks, x0, cfg):
    H = tasks.dts.shape[0]
    nq, nv = model.nq, model.nv
    w_stage, w_term, ctrl_w, x_reg = IK.dense_weights(model, eff, tasks)
    B = PD.LANES
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    xs, us, cost = PD.solve_ik_batch(
        model, eff, tile(x0),
        tile(tasks.ee_targets), tile(tasks.com_ref), tile(tasks.mom_ref),
        tile(x_reg), tile(w_stage), tile(w_term), tile(ctrl_w), tile(tasks.dts),
        cfg=cfg,
    )
    return xs[0], us[0], cost[0]


def test_single_iteration_matches_xla(setup):
    """One DDP iteration, single line-search alpha: the pallas kernel's
    Jacobians/Riccati/Cholesky reproduce the XLA step (f32 tolerance)."""
    model, eff, tasks, x0 = setup
    # f64 would be needed for exact match; f32 keeps interpret time sane
    res = IK.solve_ik(model, eff, x0, tasks, cfg=ddp.DdpConfig(n_iters=1, alphas=(1.0,)))
    xs_p, us_p, cost_p = _run_pallas(
        model, eff, tasks, x0,
        PD.PallasDdpConfig(n_iters=1, alphas=(1.0,), interpret=True),
    )
    np.testing.assert_allclose(np.asarray(xs_p), np.asarray(res.xs), atol=2e-4)
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(res.us), atol=2e-3)
    np.testing.assert_allclose(float(cost_p), float(res.cost), rtol=1e-4)


def test_dense_weights_match_residual_fns(setup):
    """dense_weights reproduces build_residual_fns' per-row weights."""
    model, eff, tasks, x0 = setup
    stage, term, ctrl_w_ref = IK.build_residual_fns(model, eff, tasks)
    w_stage, w_term, ctrl_w, _ = IK.dense_weights(model, eff, tasks)
    for k in range(tasks.dts.shape[0]):
        _, w_k = stage(x0, k)
        np.testing.assert_allclose(np.asarray(w_stage[k]), np.asarray(w_k), rtol=1e-6)
    _, w_t = term(x0)
    np.testing.assert_allclose(np.asarray(w_term), np.asarray(w_t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ctrl_w), np.asarray(ctrl_w_ref), rtol=1e-6)
