"""Solver-core tests: centroidal operators vs dense reference layout, FISTA
vs scipy on box QPs, cone projection properties, biconvex ADMM convergence.

This resurrects the reference's C++-vs-Python twin strategy (reference
examples/dynamics/cpp_centroidal.py:27-31, examples/solvers/cpp_fista.py):
the dense matrices in ``centroidal.ax_dense``/``af_dense`` replicate the
reference's sparse layout row-for-row and the matrix-free operators must
agree with them to machine precision.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from bunmpc_tpu.mpc import centroidal as cd
from bunmpc_tpu.solvers import biconvex, fista

H, NE = 10, 4
M_ROBOT = 2.5


@pytest.fixture()
def plan():
    rng = np.random.default_rng(0)
    cnt = (rng.random((H, NE)) > 0.4).astype(float)
    r = rng.normal(size=(H, NE, 3)) * 0.2
    dt = np.full(H, 0.05)
    return cd.ContactPlan(cnt=jnp.asarray(cnt), r=jnp.asarray(r), dt=jnp.asarray(dt))


@pytest.fixture()
def rng():
    return np.random.default_rng(1)


def test_ax_matvec_matches_dense(plan, rng):
    X = jnp.asarray(rng.normal(size=(H + 1, 9)))
    F = jnp.asarray(rng.normal(size=(H, NE, 3)))
    A = cd.ax_dense(plan, M_ROBOT, X)
    want = (A @ np.asarray(F).reshape(-1)).reshape(H + 1, 9)
    got = np.asarray(cd.ax_apply(plan, M_ROBOT, X, F))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_ax_transpose_adjoint(plan, rng):
    X = jnp.asarray(rng.normal(size=(H + 1, 9)))
    F = jnp.asarray(rng.normal(size=(H, NE, 3)))
    Y = jnp.asarray(rng.normal(size=(H + 1, 9)))
    lhs = float(jnp.sum(cd.ax_apply(plan, M_ROBOT, X, F) * Y))
    rhs = float(jnp.sum(F * cd.ax_applyT(plan, M_ROBOT, X, Y)))
    assert abs(lhs - rhs) < 1e-10


def test_af_matvec_matches_dense(plan, rng):
    X = jnp.asarray(rng.normal(size=(H + 1, 9)))
    F = jnp.asarray(rng.normal(size=(H, NE, 3)))
    A = cd.af_dense(plan, M_ROBOT, F)
    want = (A @ np.asarray(X).reshape(-1)).reshape(H + 1, 9)
    got = np.asarray(cd.af_apply(plan, M_ROBOT, F, X))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_af_transpose_adjoint(plan, rng):
    X = jnp.asarray(rng.normal(size=(H + 1, 9)))
    F = jnp.asarray(rng.normal(size=(H, NE, 3)))
    Y = jnp.asarray(rng.normal(size=(H + 1, 9)))
    lhs = float(jnp.sum(cd.af_apply(plan, M_ROBOT, F, X) * Y))
    rhs = float(jnp.sum(X * cd.af_applyT(plan, M_ROBOT, F, Y)))
    assert abs(lhs - rhs) < 1e-10


def test_constraint_consistency(plan, rng):
    """A state trajectory rolled out with the exact discrete dynamics must
    satisfy both constraint systems simultaneously."""
    F = jnp.asarray(np.abs(rng.normal(size=(H, NE, 3))) * 5)
    x0 = jnp.asarray(rng.normal(size=9))
    # roll out the centroidal Euler recursion
    Xs = [x0]
    cnt, r, dt = np.asarray(plan.cnt), np.asarray(plan.r), np.asarray(plan.dt)
    Fn = np.asarray(F)
    for t in range(H):
        x = np.asarray(Xs[-1]).copy()
        com, vel, amom = x[0:3], x[3:6], x[6:9]
        f_tot = (cnt[t][:, None] * Fn[t]).sum(0)
        vel_new = vel + dt[t] * (f_tot / M_ROBOT - np.array([0, 0, 9.81]))
        com_new = com + dt[t] * vel_new
        tau = sum(cnt[t, n] * np.cross(r[t, n] - com, Fn[t, n]) for n in range(NE))
        amom_new = amom + dt[t] * tau
        Xs.append(np.concatenate([com_new, vel_new, amom_new]))
    X = jnp.asarray(np.stack(Xs))
    viol_x = cd.af_apply(plan, M_ROBOT, F, X) - cd.bf_vec(plan, M_ROBOT, F, x0)
    np.testing.assert_allclose(np.asarray(viol_x), 0, atol=1e-10)
    viol_f = cd.ax_apply(plan, M_ROBOT, X, F) - cd.bx_vec(plan, X)
    np.testing.assert_allclose(np.asarray(viol_f), 0, atol=1e-10)


def _random_box_qp(rng, n, n_con):
    Q = np.diag(np.abs(rng.normal(size=n)) + 0.1)
    q = rng.normal(size=n)
    A = rng.normal(size=(n_con, n))
    b = rng.normal(size=n_con)
    lb = -np.abs(rng.normal(size=n)) - 0.2
    ub = np.abs(rng.normal(size=n)) + 0.2
    rho = 10.0
    return Q, q, A, b, lb, ub, rho


def test_fista_matches_scipy_box_qp():
    """min x'Qx + q'x + rho||Ax - b||^2 s.t. lb <= x <= ub, batched, vs L-BFGS-B."""
    rng = np.random.default_rng(3)
    B, n, n_con = 4, 12, 6
    probs = [_random_box_qp(rng, n, n_con) for _ in range(B)]
    Qb = jnp.asarray(np.stack([p[0] for p in probs]))
    qb = jnp.asarray(np.stack([p[1] for p in probs]))
    Ab = jnp.asarray(np.stack([p[2] for p in probs]))
    bb = jnp.asarray(np.stack([p[3] for p in probs]))
    lb = jnp.asarray(np.stack([p[4] for p in probs]))
    ub = jnp.asarray(np.stack([p[5] for p in probs]))
    rho = probs[0][6]

    def obj_np(x, Q, q, A, b):
        return x @ Q @ x + q @ x + rho * np.sum((A @ x - b) ** 2)

    def grad(y):
        return (
            2.0 * jnp.einsum("bij,bj->bi", Qb, y)
            + qb
            + 2.0 * rho * jnp.einsum("bji,bj->bi", Ab, jnp.einsum("bij,bj->bi", Ab, y) - bb)
        )

    def obj_diff(y1, y0):
        d = y1 - y0
        quad = jnp.einsum("bi,bij,bj->b", y1 + y0, Qb, d) + jnp.sum(qb * d, -1)
        r1 = jnp.einsum("bij,bj->bi", Ab, y1) - bb
        r0 = jnp.einsum("bij,bj->bi", Ab, y0) - bb
        return quad + rho * (jnp.sum(r1 * r1, -1) - jnp.sum(r0 * r0, -1))

    cfg = fista.FistaConfig(max_iters=4000, tol=1e-12)
    res = fista.solve(
        jnp.zeros((B, n)), grad, obj_diff, fista.box_projector(lb, ub), 1.0, cfg, n_var_dims=1
    )
    for i, (Q, q, A, b, l, u, _) in enumerate(probs):
        ref = scipy.optimize.minimize(
            obj_np,
            np.zeros(n),
            args=(Q, q, A, b),
            jac=lambda x, Q=Q, q=q, A=A, b=b: 2 * Q @ x + q + 2 * rho * A.T @ (A @ x - b),
            bounds=list(zip(l, u)),
            method="L-BFGS-B",
            options={"ftol": 1e-15, "gtol": 1e-12, "maxiter": 5000},
        )
        xi = np.asarray(res.x[i])
        # feasibility
        assert np.all(xi >= l - 1e-12) and np.all(xi <= u + 1e-12)
        # objective within FISTA's sublinear accuracy of the L-BFGS-B optimum
        f_fista = obj_np(xi, Q, q, A, b)
        f_ref = obj_np(ref.x, Q, q, A, b)
        assert f_fista <= f_ref + 1e-6 * (1 + abs(f_ref))
        np.testing.assert_allclose(xi, ref.x, atol=5e-3)


def test_soc_projection_properties():
    """Exact cone projection: idempotent, feasible output, fixed points kept."""
    rng = np.random.default_rng(5)
    mu = 0.7
    proj = fista.soc_projector(mu, "exact")
    z = jnp.asarray(rng.normal(size=(100, 3)) * 10)
    p = proj(z)
    fxy = np.linalg.norm(np.asarray(p[:, :2]), axis=-1)
    fz = np.asarray(p[:, 2])
    assert np.all(fxy <= mu * fz + 1e-8)
    np.testing.assert_allclose(np.asarray(proj(p)), np.asarray(p), atol=1e-10)
    inside = jnp.asarray([[0.1, 0.1, 1.0], [0.0, 0.0, 0.5]])
    np.testing.assert_allclose(np.asarray(proj(inside)), np.asarray(inside), atol=1e-12)
    # projection is the closest point: check against a brute-force grid for one case
    z0 = np.array([2.0, 0.0, 0.5])
    p0 = np.asarray(proj(jnp.asarray(z0)))
    # any feasible candidate must be no closer
    cand = np.array([[0.0, 0.0, 0.0], [0.35, 0.0, 0.5], [0.7, 0.0, 1.0], [1.0, 0.0, 1.5]])
    d0 = np.linalg.norm(p0 - z0)
    for c in cand:
        assert np.linalg.norm(c - z0) >= d0 - 1e-9


def test_biconvex_admm_converges(plan):
    """Trot-like window: the ADMM must reach exit_tol and produce a
    dynamically consistent (X, F) pair with feasible friction forces."""
    rng = np.random.default_rng(7)
    # standing-ish problem: all feet in contact half the time, weight support
    x_init = jnp.asarray(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]))
    X_ref = np.tile(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]), (H + 1, 1))
    W = np.tile(np.array([1e-5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e4, 1e4, 1e4]), (H + 1, 1))
    W[-1] = 10 * np.array([1e5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e5, 1e5, 1e5])
    cost_x = biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref))
    W_F = jnp.full((H, NE, 3), 1e1)
    X_wm = jnp.tile(x_init, (H + 1, 1))
    F_wm = jnp.zeros((H, NE, 3))
    P_wm = jnp.zeros((H + 1, 9))
    cfg = biconvex.BiconvexConfig(rho=5e4, log_statistics=True)
    res = biconvex.solve(plan, M_ROBOT, x_init, cost_x, W_F, X_wm, F_wm, P_wm, cfg)
    assert float(res.viol_norm) < cfg.exit_tol
    # friction feasibility of the returned forces
    F = np.asarray(res.F)
    fxy = np.linalg.norm(F[..., :2], axis=-1)
    assert np.all(fxy <= cfg.mu * F[..., 2] + 1e-6)
    # violation history decreases overall
    hist = np.asarray(res.viol_hist)[: int(res.admm_iters)]
    assert hist[-1] < hist[0]
    # initial state pinned
    np.testing.assert_allclose(np.asarray(res.X[0]), np.asarray(x_init), atol=1e-3)


def test_biconvex_batched(plan):
    """Batched solve must match per-sample solves."""
    B = 3
    rng = np.random.default_rng(11)
    x_init = jnp.asarray(
        np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]) + rng.normal(size=(B, 9)) * 0.01
    )
    X_ref = jnp.asarray(
        np.tile(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]), (B, H + 1, 1))
    )
    W = jnp.asarray(
        np.tile(np.array([1e-5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e4, 1e4, 1e4]), (B, H + 1, 1))
    )
    cost_x = biconvex.CostX(W=W, X_ref=X_ref)
    W_F = jnp.full((B, H, NE, 3), 1e1)
    bplan = cd.ContactPlan(
        cnt=jnp.tile(plan.cnt, (B, 1, 1)),
        r=jnp.tile(plan.r, (B, 1, 1, 1)),
        dt=jnp.tile(plan.dt, (B, 1)),
    )
    X_wm = jnp.tile(x_init[:, None, :], (1, H + 1, 1))
    F_wm = jnp.zeros((B, H, NE, 3))
    P_wm = jnp.zeros((B, H + 1, 9))
    cfg = biconvex.BiconvexConfig(rho=5e4)
    res = biconvex.solve(bplan, M_ROBOT, x_init, cost_x, W_F, X_wm, F_wm, P_wm, cfg)
    assert res.X.shape == (B, H + 1, 9)
    assert np.all(np.asarray(res.viol_norm) < cfg.exit_tol)

    single = biconvex.solve(
        plan,
        M_ROBOT,
        x_init[0],
        biconvex.CostX(W=W[0], X_ref=X_ref[0]),
        W_F[0],
        X_wm[0],
        F_wm[0],
        P_wm[0],
        cfg,
    )
    # same problem solved alone vs in a batch: identical up to masked-iteration
    # scheduling (batch elements run in lockstep) — allow loose tolerance
    np.testing.assert_allclose(np.asarray(res.X[0]), np.asarray(single.X), atol=1e-4)


def test_af_diag_matches_dense(plan, rng):
    """Closed-form diag(A_f^T A_f) (Jacobi metric) vs the dense twin —
    including the initial-state pinning row's +1 on ALL 9 components of
    knot 0 (advisor round-2 fix: vel/ang previously omitted it)."""
    F = jnp.asarray(rng.normal(size=(H, NE, 3)))
    A = cd.af_dense(plan, M_ROBOT, F)
    want = np.diag(A.T @ A).reshape(H + 1, 9)
    got = np.asarray(cd.af_diag(plan, F))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_dual_rescale_warm_start_consistency(plan):
    """With rho escalation, the returned scaled dual P must be expressed
    relative to the BASE rho so (X, F, P) can seed a fresh solve: the warm
    restart should converge almost immediately instead of re-doing the work
    (advisor round-2 medium finding)."""
    x_init = jnp.asarray(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]))
    X_ref = np.tile(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]), (H + 1, 1))
    W = np.tile(np.array([1e-5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e4, 1e4, 1e4]), (H + 1, 1))
    cost_x = biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref))
    W_F = jnp.full((H, NE, 3), 1e1)
    X_wm = jnp.tile(x_init, (H + 1, 1))
    F_wm = jnp.zeros((H, NE, 3))
    P_wm = jnp.zeros((H + 1, 9))
    accel = biconvex.BiconvexConfig(
        rho=5e4, dual_relax=1.8, rho_growth=3.0, rho_growth_every=5,
        x_solver="fista",
    )
    res = biconvex.solve(plan, M_ROBOT, x_init, cost_x, W_F, X_wm, F_wm, P_wm, accel)
    assert float(res.viol_norm) < accel.exit_tol
    # warm restart with the SAME accelerated schedule (the warm_start_carry
    # scenario): the rescaled dual must beat both the cold solve and a
    # mis-scaled dual (measured: 15 iters vs 25 cold / 25 unscaled)
    res2 = biconvex.solve(plan, M_ROBOT, x_init, cost_x, W_F, res.X, res.F, res.P, accel)
    assert float(res2.viol_norm) < accel.exit_tol
    assert int(res2.admm_iters) < int(res.admm_iters) - 2


def test_thomas_x_solve_exact(plan, rng):
    """block_thomas.solve_x_exact vs dense normal equations (f64)."""
    from bunmpc_tpu.solvers import block_thomas as bt

    F = jnp.asarray(rng.normal(size=(H, NE, 3)) * 3)
    W = jnp.asarray(np.abs(rng.normal(size=(H + 1, 9))) + 0.1)
    rho = 1e4
    X_ref = jnp.asarray(rng.normal(size=(H + 1, 9)))
    P = jnp.asarray(rng.normal(size=(H + 1, 9)) * 0.1)
    x_init = jnp.asarray(rng.normal(size=9))
    X = np.asarray(bt.solve_x_exact(plan, M_ROBOT, F, W, X_ref, P, rho, x_init))
    A = cd.af_dense(plan, M_ROBOT, F)
    Mn = 2 * np.diag(np.asarray(W).ravel()) + 2 * rho * (A.T @ A)
    b = np.asarray(cd.bf_vec(plan, M_ROBOT, F, x_init))
    rhs = (
        2 * np.asarray(W) * np.asarray(X_ref)
        + 2 * rho * np.asarray(cd.af_applyT(plan, M_ROBOT, F, jnp.asarray(b) - P))
    ).ravel()
    want = np.linalg.solve(Mn, rhs).reshape(H + 1, 9)
    np.testing.assert_allclose(X, want, rtol=1e-8, atol=1e-10)


def test_admm_thomas_matches_fista_trajectory(plan):
    """ADMM with the exact X-solve must land on the same trajectory as the
    projected-FISTA X-solve (reference semantics) on a convergent window."""
    x_init = jnp.asarray(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]))
    X_ref = np.tile(np.array([0.0, 0.0, 0.2, 0, 0, 0, 0, 0, 0]), (H + 1, 1))
    W = np.tile(np.array([1e-5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e4, 1e4, 1e4]), (H + 1, 1))
    W[-1] = 10 * np.array([1e5, 1e-5, 1e5, 1e1, 1e1, 2e2, 1e5, 1e5, 1e5])
    cost_x = biconvex.CostX(W=jnp.asarray(W), X_ref=jnp.asarray(X_ref))
    W_F = jnp.full((H, NE, 3), 1e1)
    X_wm = jnp.tile(x_init, (H + 1, 1))
    F_wm = jnp.zeros((H, NE, 3))
    P_wm = jnp.zeros((H + 1, 9))
    res = {}
    for xs in ("fista", "thomas"):
        cfg = biconvex.BiconvexConfig(rho=5e4, x_solver=xs)
        res[xs] = biconvex.solve(
            plan, M_ROBOT, x_init, cost_x, W_F, X_wm, F_wm, P_wm, cfg
        )
        assert float(res[xs].viol_norm) < cfg.exit_tol
    # both converge to viol < 1e-3 but the minimizer is only determined to
    # ~1e-2 in the weakly-weighted (W=1e-5) coordinates at that tolerance
    np.testing.assert_allclose(
        np.asarray(res["thomas"].X), np.asarray(res["fista"].X), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(res["thomas"].F), np.asarray(res["fista"].F), atol=2e-1
    )
    assert int(res["thomas"].admm_iters) <= int(res["fista"].admm_iters) + 2
