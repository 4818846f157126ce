"""Pallas fused-ADMM kernel vs the XLA reference implementation (interpreter
mode on CPU; the device path is exercised by bench/perf scripts on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import centroidal as cd
from bunmpc_tpu.solvers import biconvex, pallas_admm

H, NE, M = 20, 4, 2.5
B = pallas_admm.LANES  # one lane tile


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    cnt = (rng.random((B, H, NE)) > 0.4).astype(np.float32)
    r = (rng.normal(size=(B, H, NE, 3)) * 0.15).astype(np.float32)
    r[..., 2] = 0.018
    dt = np.full((B, H), 0.05, np.float32)
    plan = cd.ContactPlan(cnt=jnp.asarray(cnt), r=jnp.asarray(r), dt=jnp.asarray(dt))
    x_init = np.tile(np.array([0, 0, 0.2, 0, 0, 0, 0, 0, 0], np.float32), (B, 1))
    x_init[:, 0:2] += rng.normal(size=(B, 2)).astype(np.float32) * 0.01
    W = np.tile(
        np.array([1e-5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e4, 1e4, 1e4], np.float32), (B, H + 1, 1)
    )
    W[:, -1] = 10 * np.array([1e5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e5, 1e5, 1e5], np.float32)
    X_ref = np.tile(np.array([0, 0, 0.2, 0, 0, 0, 0, 0, 0], np.float32), (B, H + 1, 1))
    W_F = np.full((B, H, NE, 3), 1e1, np.float32)
    X_wm = np.tile(x_init[:, None, :], (1, H + 1, 1))
    F_wm = np.zeros((B, H, NE, 3), np.float32)
    lb = np.full((B, H + 1, 9), -np.inf, np.float32)
    ub = np.full((B, H + 1, 9), np.inf, np.float32)
    return plan, x_init, W, X_ref, W_F, X_wm, F_wm, (lb, ub)


def test_pallas_admm_matches_xla(problem):
    plan, x_init, W, X_ref, W_F, X_wm, F_wm, bounds = problem
    # plain dual-ascent schedule: the iterate-for-iterate comparison below
    # needs both paths on the exact same trajectory (the accelerated default
    # magnifies tiny f32 ordering differences through the escalated rho)
    cfg = pallas_admm.PallasAdmmConfig(
        rho=5e4, max_admm_iters=60, fista_max_iters=120, interpret=True,
        dual_relax=1.0, rho_growth=1.0, x_solver="fista",
    )
    Xp, Fp, violp, itersp = pallas_admm.solve(
        plan, M, x_init, W, X_ref, W_F, X_wm, F_wm, bounds, cfg
    )

    xla_cfg = biconvex.BiconvexConfig(
        rho=5e4, max_admm_iters=60, fista_max_iters=120, step_mode="power",
        dual_relax=1.0, rho_growth=1.0, x_solver="fista",
    )
    res = biconvex.solve(
        plan,
        M,
        jnp.asarray(x_init),
        biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref)),
        jnp.asarray(W_F),
        jnp.asarray(X_wm),
        jnp.asarray(F_wm),
        jnp.zeros((B, H + 1, 9), jnp.float32),
        xla_cfg,
    )
    # the kernel reproduces the XLA solver iterate-for-iterate (same fixed
    # step sizes, same masked updates): violations and trajectories agree
    np.testing.assert_allclose(
        np.asarray(violp), np.asarray(res.viol_norm), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(res.X), atol=5e-3)
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(res.F), atol=2e-1)
    # initial state pinned on converged elements
    ok = np.asarray(violp) < 2e-3
    np.testing.assert_allclose(np.asarray(Xp)[ok, 0], x_init[ok], atol=5e-3)


def test_pallas_admm_accelerated_converges(problem):
    """With the accelerated default schedule (dual over-relaxation + rho
    escalation) both backends must reach exit_tol on every problem and agree
    on the converged trajectory loosely (small f32 ordering differences are
    magnified through the escalated rho, so no iterate-level comparison)."""
    plan, x_init, W, X_ref, W_F, X_wm, F_wm, bounds = problem
    accel = dict(dual_relax=1.8, rho_growth=3.0, rho_growth_every=10, rho_max_scale=27.0)
    cfg = pallas_admm.PallasAdmmConfig(rho=5e4, interpret=True, **accel)
    Xp, Fp, violp, _ = pallas_admm.solve(
        plan, M, x_init, W, X_ref, W_F, X_wm, F_wm, bounds, cfg
    )
    res = biconvex.solve(
        plan,
        M,
        jnp.asarray(x_init),
        biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref)),
        jnp.asarray(W_F),
        jnp.asarray(X_wm),
        jnp.asarray(F_wm),
        jnp.zeros((B, H + 1, 9), jnp.float32),
        biconvex.BiconvexConfig(rho=5e4, step_mode="power", **accel),
    )
    assert np.all(np.asarray(violp) < cfg.exit_tol)
    assert np.all(np.asarray(res.viol_norm) < cfg.exit_tol)
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(res.X), atol=5e-2)


def test_pallas_thomas_matches_xla_thomas(problem):
    """x_solver="thomas" (exact block-tridiagonal X-solve): the kernel's
    unrolled lane-layout Cholesky sweep must reproduce the XLA
    block-Thomas path iterate-for-iterate (both are exact solves, so the
    agreement is much tighter than the FISTA comparison)."""
    plan, x_init, W, X_ref, W_F, X_wm, F_wm, bounds = problem
    cfg = pallas_admm.PallasAdmmConfig(
        rho=5e4, max_admm_iters=15, interpret=True,
        dual_relax=1.0, rho_growth=1.0, x_solver="thomas",
    )
    Xp, Fp, violp, itersp = pallas_admm.solve(
        plan, M, x_init, W, X_ref, W_F, X_wm, F_wm, bounds, cfg
    )
    res = biconvex.solve(
        plan,
        M,
        jnp.asarray(x_init),
        biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref)),
        jnp.asarray(W_F),
        jnp.asarray(X_wm),
        jnp.asarray(F_wm),
        jnp.zeros((B, H + 1, 9), jnp.float32),
        biconvex.BiconvexConfig(
            rho=5e4, max_admm_iters=15, step_mode="power",
            dual_relax=1.0, rho_growth=1.0, x_solver="thomas",
        ),
    )
    np.testing.assert_allclose(
        np.asarray(violp), np.asarray(res.viol_norm), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(res.X), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(res.F), atol=1e-3)
