"""Fused Pallas TPU kernel for the biconvex centroidal ADMM.

The XLA version (`solvers/biconvex.py`) runs the ADMM as nested masked
`while_loop`s: every FISTA iteration is its own tiny fused kernel, so one
solve issues O(10^3) sequential micro-dispatches. This kernel runs the
ENTIRE ADMM — both projected-FISTA subproblems, power-iteration step sizing,
dual updates, convergence masking — inside one `pallas_call`, with all solver
state resident in VMEM.

Layout: batch on the 128-lane axis. Every per-problem tensor is stored
``(..., T)`` with ``T = 128`` lanes per grid step; variable dimensions live on
the leading/sublane axes (9-row state blocks and 3-vector forces pad to the
8-sublane tile — a few KB of waste against a ~16 MB VMEM budget). All
centroidal operators are the same matrix-free stencils as
``mpc/centroidal.py``, re-expressed in this layout.

Semantics match ``biconvex.solve(step_mode='power')`` — fixed-step FISTA with
a power-iteration Lipschitz estimate, reference-variant momentum, exact
friction-cone projection — and are cross-validated against it in
tests/test_pallas_admm.py (CPU interpreter) and on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..mpc.centroidal import ContactPlan

_G = 9.81
LANES = 128


@dataclasses.dataclass(frozen=True)
class PallasAdmmConfig:
    rho: float = 1e5
    max_admm_iters: int = 100
    fista_max_iters: int = 150
    fista_tol: float = 1e-5
    exit_tol: float = 1e-3
    mu: float = 1.0
    power_iters: int = 8
    power_safety: float = 1.25
    # Jacobi-preconditioned FISTA (diagonal metric from the closed-form
    # stencil diagonals, per-contact isotropic for the cone) — mirrors
    # biconvex.BiconvexConfig.precondition. Measured perf-neutral here
    # (scripts/ab_precondition.py: 1.00x, caps dominate), default OFF.
    precondition: bool = False
    # Outer-loop acceleration (mirrors biconvex.BiconvexConfig; DEFAULT-ON
    # since round 3 — see the rationale there): dual over-relaxation +
    # geometric rho escalation with dual rescaling + divergence backoff.
    dual_relax: float = 1.8
    rho_growth: float = 3.0
    rho_growth_every: int = 10
    rho_max_scale: float = 81.0
    # Stall-gated escalation + divergence backoff (round-3, makes the
    # accelerated schedule safe to default-on across robots): at each
    # growth check, a lane only escalates rho if its violation failed to
    # improve by rho_stall_improve since the last check, and a lane whose
    # violation GREW by more than rho_backoff_thresh de-escalates one step
    # (dual rescaled both ways). With rho_stall_gate=False the growth is
    # the round-2 fixed cadence.
    rho_stall_gate: bool = True
    rho_stall_improve: float = 0.0  # 0 = always escalate on cadence unless diverged
    rho_backoff_thresh: float = 2.0
    # X-subproblem backend (mirrors biconvex.BiconvexConfig.x_solver):
    # "thomas" (DEFAULT) = EXACT block-tridiagonal normal-equation solve
    # (block-Thomas sweep of 9x9 Cholesky blocks, see solvers/
    # block_thomas.py) + clip to the kinematic box — replaces up to 150
    # sequential FISTA iterations AND the X power iteration with one
    # ~H-step sweep; "fista" = projected FISTA (reference
    # biconvex.cpp:90-96), pinned by iterate-level parity tests.
    x_solver: str = "thomas"
    interpret: bool = False  # CPU interpreter mode (tests)


def _kernel(
    cnt_ref,  # (H, ne, T)
    r_ref,  # (H, ne, 3, T)
    dt_ref,  # (H, T)
    x_init_ref,  # (9, T)
    W_ref,  # (Hp1, 9, T)
    q_ref,  # (Hp1, 9, T)   linear cost = -2 W X_ref
    WF_ref,  # (H, ne, 3, T)
    qF_ref,  # (H, ne, 3, T)  linear F cost = -2 W_F F_reg (mass-normalized
    # f_reg_style="weight"; zeros for the reference's pull-to-zero)
    lb_ref,  # (Hp1, 9, T) state box
    ub_ref,  # (Hp1, 9, T)
    X_ref,  # out/in: (Hp1, 9, T)
    F_ref,  # out/in: (H, ne, 3, T)
    viol_ref,  # out: (1, T)
    iters_ref,  # out: (1, T)
    *,
    cfg: PallasAdmmConfig,
    m: float,
    H: int,
    ne: int,
):
    X, F, viol, iters = _admm_core(
        cnt_ref[:], r_ref[:], dt_ref[:], x_init_ref[:], W_ref[:], q_ref[:],
        WF_ref[:], qF_ref[:], lb_ref[:], ub_ref[:], X_ref[:], F_ref[:],
        cfg=cfg, m=m, H=H, ne=ne,
    )
    X_ref[:] = X
    F_ref[:] = F
    viol_ref[:] = viol
    iters_ref[:] = iters


def _admm_core(
    cnt, r, dt, x_init, W, qlin, WF, qF, lb, ub, X0_in, F0_in,
    *,
    cfg: PallasAdmmConfig,
    m: float,
    H: int,
    ne: int,
):
    """The full ADMM on VMEM-resident values in (.., T) lane layout; shared
    by the plain kernel (inputs streamed from HBM) and the fused-prep kernel
    (inputs built in the prologue). Returns (X, F, viol (1, T), iters (1, T))."""
    mu = cfg.mu

    dtc = dt[:, None, :]  # (H, 1, T) broadcast over 9/3 rows
    dtc4 = dt[:, None, None, :]  # (H, 1, 1, T)
    cnt4 = cnt[:, :, None, :]  # (H, ne, 1, T)

    def cross3(a, b):
        """Cross product over the 3-length axis at position -2 (..., 3, T)."""
        a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
        return jnp.stack(
            [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2
        )

    # ---- centroidal operators in (.., T) layout (mpc/centroidal.py twins) ----

    def ax_apply(X, F):
        """(Hp1, 9, T) <- A_x(X) F ; F (H, ne, 3, T)"""
        cF = cnt4 * F
        lin = dtc * jnp.sum(cF, axis=1) / m  # (H, 3, T)
        arm = r - X[:H, 0:3, :][:, None, :, :]  # (H, ne, 3, T)
        ang = dtc * jnp.sum(cross3(arm, cF), axis=1)
        zeros3 = jnp.zeros_like(lin)
        rows = jnp.concatenate([zeros3, lin, ang], axis=1)  # (H, 9, T)
        return jnp.concatenate([rows, jnp.zeros_like(rows[:1])], axis=0)

    def ax_applyT(X, Y):
        """(H, ne, 3, T) <- A_x^T Y ; Y (Hp1, 9, T)"""
        y_lin = Y[:H, 3:6, :][:, None, :, :]
        y_ang = Y[:H, 6:9, :][:, None, :, :]
        arm = r - X[:H, 0:3, :][:, None, :, :]
        out = dtc4 * (y_lin / m + cross3(jnp.broadcast_to(y_ang, arm.shape), arm))
        return cnt4 * out

    def bx_vec(X):
        dX = X[1:] - X[:H]
        z2 = jnp.zeros_like(dX[:, 0:2, :])
        grav = jnp.concatenate(
            [z2, (_G * dt)[:, None, :], jnp.zeros_like(dX[:, 0:3, :])], axis=1
        )  # rows 3..8: gravity only on the z-velocity row (Mosaic: no scatter)
        rows = jnp.concatenate([jnp.zeros_like(dX[:, 0:3, :]), dX[:, 3:9, :] + grav], axis=1)
        return jnp.concatenate([rows, jnp.zeros_like(rows[:1])], axis=0)

    def af_apply(F, X):
        Xt, Xt1 = X[:H], X[1:]
        cF_tot = jnp.sum(cnt4 * F, axis=1)  # (H, 3, T)
        com_rows = Xt[:, 0:3, :] - Xt1[:, 0:3, :] + dtc * Xt1[:, 3:6, :]
        vel_rows = Xt[:, 3:6, :] - Xt1[:, 3:6, :]
        ang_rows = Xt[:, 6:9, :] - Xt1[:, 6:9, :] + dtc * cross3(cF_tot, Xt[:, 0:3, :])
        rows = jnp.concatenate([com_rows, vel_rows, ang_rows], axis=1)
        pin = X[0:1]
        return jnp.concatenate([rows, pin], axis=0)

    def af_applyT(F, Y):
        yt = Y[:H]  # (H, 9, T)
        cF_tot = jnp.sum(cnt4 * F, axis=1)
        contrib_t = jnp.concatenate(
            [
                yt[:, 0:3, :] + dtc * cross3(yt[:, 6:9, :], cF_tot),
                yt[:, 3:6, :],
                yt[:, 6:9, :],
            ],
            axis=1,
        )
        contrib_t1 = jnp.concatenate(
            [
                -yt[:, 0:3, :],
                dtc * yt[:, 0:3, :] - yt[:, 3:6, :],
                -yt[:, 6:9, :],
            ],
            axis=1,
        )
        z1 = jnp.zeros_like(Y[:1])
        zH = jnp.zeros_like(Y[:H])
        # out[:H] += contrib_t ; out[1:] += contrib_t1 ; out[0] += Y[H]
        return (
            jnp.concatenate([contrib_t, z1], axis=0)
            + jnp.concatenate([z1, contrib_t1], axis=0)
            + jnp.concatenate([Y[H : H + 1], zH], axis=0)
        )

    def bf_vec(F):
        cF = cnt4 * F
        lin = -dtc * jnp.sum(cF, axis=1) / m
        lin = lin + jnp.concatenate(
            [jnp.zeros_like(lin[:, 0:2, :]), (_G * dt)[:, None, :]], axis=1
        )
        ang = dtc * jnp.sum(cross3(cF, jnp.broadcast_to(r, cF.shape)), axis=1)
        rows = jnp.concatenate([jnp.zeros_like(lin), lin, ang], axis=1)
        return jnp.concatenate([rows, x_init[None]], axis=0)

    # ---- projections ----

    def soc_project(F):
        fx, fy, fz = F[:, :, 0, :], F[:, :, 1, :], F[:, :, 2, :]
        s = jnp.sqrt(fx * fx + fy * fy + 1e-30)
        inside = s <= mu * fz
        polar = mu * s <= -fz
        coef = (mu * mu * s + mu * fz) / ((mu * mu + 1.0) * s)
        fz_surf = (mu * s + fz) / (mu * mu + 1.0)
        fx_n = jnp.where(inside, fx, jnp.where(polar, 0.0, fx * coef))
        fy_n = jnp.where(inside, fy, jnp.where(polar, 0.0, fy * coef))
        fz_n = jnp.where(inside, fz, jnp.where(polar, 0.0, fz_surf))
        return jnp.stack([fx_n, fy_n, fz_n], axis=2)

    def box_project(X):
        return jnp.clip(X, lb, ub)

    # ---- generic fixed-step FISTA over either subproblem ----

    SUB = 8  # per-lane scalars live as (8, T) tiles: Mosaic's (1, T) loop
    # carries hit "invalid relayout" bugs (replicated-sublane layouts)

    def anchored(val):
        """Force a natural (non-replicated) register layout on a constant.

        Constant-initialized fori carries get a fully replicated layout which
        Mosaic cannot reconcile with the loop body's natural-layout outputs
        ("invalid relayout: natural -> replicated"); adding 0*iota pins the
        initial value to the natural layout."""
        it_s = jax.lax.broadcasted_iota(jnp.int32, val.shape, val.ndim - 2)
        it_l = jax.lax.broadcasted_iota(jnp.int32, val.shape, val.ndim - 1)
        return val + (it_s + it_l).astype(val.dtype) * 0.0

    def vnorm2(a):
        """Sum of squares over all but the lane axis -> (SUB, T)."""
        s = jnp.sum(a * a, axis=tuple(range(a.ndim - 1)))[None, :]
        return anchored(jnp.broadcast_to(s, (SUB, a.shape[-1])))

    def power_L(quad_op, shape):
        z = anchored(jnp.ones(shape, jnp.float32))

        def body(_, z):
            w = quad_op(z)
            nrm = jnp.sqrt(vnorm2(w)[0:1]) + 1e-30
            return w / nrm.reshape((1,) * (w.ndim - 1) + (z.shape[-1],))

        z = jax.lax.fori_loop(0, cfg.power_iters, body, z)
        w = quad_op(z)
        num = jnp.sum(z * w, axis=tuple(range(z.ndim - 1)))[None, :]
        num = jnp.concatenate([num] * SUB, axis=0)
        den = vnorm2(z) + 1e-30
        return cfg.power_safety * num / den  # (SUB, T)

    def fista(x0, grad_fn, proj_fn, D):
        """Projected FISTA with step y <- proj(y - grad / D); D broadcastable
        to x0 (a (1, T)-shaped scalar Lipschitz, or a full per-coordinate
        Jacobi metric). Returns solution.

        All per-lane scalars are float 0/1 masks combined arithmetically —
        Mosaic's (1, 128) select/bool layouts are fragile in loop carries."""
        Dr = jnp.broadcast_to(D, x0.shape)
        bshape = (1,) * (x0.ndim - 1) + (x0.shape[-1],)

        def body(_, carry):
            x_k, y_k, t_k, act = carry  # act: 1.0 while active, 0.0 once converged
            grad = grad_fn(y_k)
            y_next = proj_fn(y_k - grad / Dr)
            g2 = vnorm2(y_next - y_k)  # (SUB, T)
            t_next = 1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k) / 2.0
            y_mom = y_next + ((t_k[0:1] - 1.0) / t_next[0:1]).reshape(bshape) * (y_next - x_k)
            a = act[0:1].reshape(bshape)
            x_k = a * y_next + (1.0 - a) * x_k
            y_k = a * y_mom + (1.0 - a) * y_k
            t_k = act * t_next + (1.0 - act) * t_k
            still = (g2 >= cfg.fista_tol * cfg.fista_tol).astype(jnp.float32)
            act = act * still
            return x_k, y_k, t_k, act

        t0 = anchored(jnp.ones((SUB, x0.shape[-1]), jnp.float32))
        act0 = anchored(jnp.ones((SUB, x0.shape[-1]), jnp.float32))

        def cond(carry):
            i = carry[0]
            act = carry[-1]
            return jnp.logical_and(i < cfg.fista_max_iters, jnp.sum(act[0]) > 0.0)

        def wbody(carry):
            i = carry[0]
            out = body(i, carry[1:])
            return (i + 1,) + out

        carry = jax.lax.while_loop(cond, wbody, (jnp.int32(0), x0, x0, t0, act0))
        return carry[1]

    # ---- exact block-tridiagonal X-solve (x_solver="thomas") ----
    # Lane-layout twin of solvers/block_thomas.py: the X-subproblem normal
    # matrix 2(W + rho A_f'A_f) is block tridiagonal in the knot index
    # (9x9 blocks), so one forward Cholesky sweep + back-substitution solves
    # it exactly. All 9x9 linear algebra is unrolled on (9, [m,] T) tiles.

    def _chol9(A):
        """(9, 9, T) SPD -> lower Cholesky factor, right-looking unrolled.

        All row masks are full-shape iotas — replicated (broadcast-from-
        sublane) layouts hit Mosaic relayout bugs (see ``anchored``)."""
        row2 = jax.lax.broadcasted_iota(jnp.int32, (9, A.shape[-1]), 0)
        Acur = A
        cols = []
        for j in range(9):
            d = jnp.sqrt(jnp.maximum(Acur[j : j + 1, j, :], 1e-30))  # (1, T)
            colj = Acur[:, j, :] / d  # (9, T)
            colj = jnp.where(row2 > j, colj, 0.0)
            colj = jnp.where(row2 == j, jnp.broadcast_to(d, colj.shape), colj)
            cols.append(colj)
            Acur = Acur - colj[:, None, :] * colj[None, :, :]
        return jnp.stack(cols, axis=1)  # L[i, j] at [i, j, :]

    def _chol_solve9(L, B):
        """Solve (L L') Y = B for B (9, m, T) given lower L (9, 9, T)."""
        row2 = jax.lax.broadcasted_iota(jnp.int32, (9, L.shape[-1]), 0)
        row3 = jax.lax.broadcasted_iota(jnp.int32, B.shape, 0)
        Y = B
        for j in range(9):  # forward: L Z = B
            dj = L[j : j + 1, j, :]  # (1, T)
            yj = Y[j] / dj  # (m, T)
            colj = jnp.where(row2 > j, L[:, j, :], 0.0)  # (9, T)
            Y = Y - colj[:, None, :] * yj[None]
            Y = jnp.where(row3 == j, jnp.broadcast_to(yj[None], Y.shape), Y)
        for j in range(8, -1, -1):  # backward: L' Y = Z
            dj = L[j : j + 1, j, :]
            yj = Y[j] / dj
            rowj = jnp.where(row2 < j, L[j, :, :], 0.0)  # (9, T): L[j, k]
            Y = Y - rowj[:, None, :] * yj[None]
            Y = jnp.where(row3 == j, jnp.broadcast_to(yj[None], Y.shape), Y)
        return Y

    _eye9 = jnp.eye(9, dtype=jnp.float32)[None, :, :, None]  # (1, 9, 9, 1)

    def _x_normal_blocks(F, rho4):
        """M (Hp1, 9, 9, T), U (H, 9, 9, T) of the X normal system
        (block structure derived in solvers/block_thomas.py)."""
        cF = jnp.sum(cnt4 * F, axis=1)  # (H, 3, T)
        c0, c1, c2 = cF[:, 0, :], cF[:, 1, :], cF[:, 2, :]
        z = jnp.zeros_like(c0)
        G = dt[:, None, None, :] * jnp.stack(
            [
                jnp.stack([z, -c2, c1], axis=1),
                jnp.stack([c2, z, -c0], axis=1),
                jnp.stack([-c1, c0, z], axis=1),
            ],
            axis=1,
        )  # (H, 3, 3, T) = dt * skew(cF)
        Gt = jnp.swapaxes(G, 1, 2)
        # GtG[i, k] = sum_r G[r, i] G[r, k]; slice-then-broadcast (int+newaxis
        # mixed indexing lowers to >2D gather, unsupported in Mosaic)
        GtG = sum(
            G[:, r : r + 1, :, :].swapaxes(1, 2) * G[:, r : r + 1, :, :]
            for r in range(3)
        )
        I3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None, :, :, None], G.shape)
        Z3 = jnp.zeros_like(G)
        dtI = dt[:, None, None, :] * I3
        dt2I = (dt * dt)[:, None, None, :] * I3

        def b9(b00, b01, b02, b10, b11, b12, b20, b21, b22):
            top = jnp.concatenate([b00, b01, b02], axis=2)
            mid = jnp.concatenate([b10, b11, b12], axis=2)
            bot = jnp.concatenate([b20, b21, b22], axis=2)
            return jnp.concatenate([top, mid, bot], axis=1)  # (H, 9, 9, T)

        DtD = b9(I3 + GtG, Z3, Gt, Z3, I3, Z3, G, Z3, I3)
        EtE = b9(I3, -dtI, Z3, -dtI, I3 + dt2I, Z3, Z3, Z3, I3)
        DtE = b9(-I3, dtI, -Gt, Z3, -I3, Z3, Z3, Z3, -I3)

        zpad = jnp.zeros_like(DtD[:1])
        AtA = (
            jnp.concatenate([DtD, zpad], axis=0)
            + jnp.concatenate([zpad, EtE], axis=0)
            + jnp.concatenate(
                [jnp.broadcast_to(_eye9, zpad.shape), jnp.zeros_like(DtD)], axis=0
            )
        )
        Wdiag = W[:, :, None, :] * _eye9
        M = 2.0 * Wdiag + 2.0 * rho4[None] * AtA
        U = 2.0 * rho4[None] * DtE
        return M, U

    def thomas_x(F, P, rho_k):
        """Exact X-subproblem minimizer, clipped to the kinematic box."""
        rho4 = rho_k[0:1].reshape(1, 1, -1)  # (1, 1, T)
        bf = bf_vec(F)
        rhs = -qlin + 2.0 * rho4 * af_applyT(F, bf - P)  # (Hp1, 9, T)
        M, U = _x_normal_blocks(F, rho4)
        # forward sweep: keep Wk = Ck^{-1} Uk and dk = Ck^{-1} yk per knot
        Ws, ds = [], []
        Ck = M[0]
        yk = rhs[0]
        for k in range(H + 1):
            L = _chol9(Ck)
            if k < H:
                # solve against [U_k | y_k] in one pass: (9, 10, T)
                sol = _chol_solve9(
                    L, jnp.concatenate([U[k], yk[:, None, :]], axis=1)
                )
                Wk, dk = sol[:, :9, :], sol[:, 9, :]
                Ws.append(Wk)
                ds.append(dk)
                # C_{k+1} = M_{k+1} - U_k' Wk ; y_{k+1} = rhs_{k+1} - U_k' dk
                Ck = M[k + 1] - sum(
                    U[k][j][:, None, :] * Wk[j][None, :, :] for j in range(9)
                )
                yk = rhs[k + 1] - sum(U[k][j] * dk[j : j + 1, :] for j in range(9))
            else:
                dk = _chol_solve9(L, yk[:, None, :])[:, 0, :]
                ds.append(dk)
        # back-substitution
        xs = [None] * (H + 1)
        xs[H] = ds[H]
        for k in range(H - 1, -1, -1):
            xs[k] = ds[k] - sum(
                Ws[k][:, j, :] * xs[k + 1][j : j + 1, :] for j in range(9)
            )
        X = jnp.stack(xs, axis=0)  # (Hp1, 9, T)
        return box_project(X)

    # ---- the ADMM loop ----

    def _dual_and_mask(i, X_new, F_new, X, F, P, rho_k, viol2, viol2_chk, iters, act):
        """Shared ADMM tail: dual update, convergence masking, rho schedule."""
        v = af_apply(F_new, X_new) - bf_vec(F_new)
        P_new = P + cfg.dual_relax * v
        v2 = vnorm2(v)  # (SUB, T)

        a9 = act[0:1].reshape(1, 1, -1)
        aF = act[0:1].reshape(1, 1, 1, -1)
        X = a9 * X_new + (1.0 - a9) * X
        F = aF * F_new + (1.0 - aF) * F
        P = a9 * P_new + (1.0 - a9) * P
        viol2 = act * v2 + (1.0 - act) * viol2
        iters = iters + act
        good = (viol2 >= cfg.exit_tol * cfg.exit_tol).astype(jnp.float32)
        not_nan = (viol2 == viol2).astype(jnp.float32)
        act = act * good * not_nan
        if cfg.rho_growth != 1.0:
            # geometric rho escalation + dual rescaling, unconverged lanes only
            cond_f = jnp.where(
                jnp.mod(i + 1, cfg.rho_growth_every) == 0, 1.0, 0.0
            ).astype(jnp.float32)
            capok = (rho_k * cfg.rho_growth <= cfg.rho * cfg.rho_max_scale).astype(
                jnp.float32
            )
            if cfg.rho_stall_gate:
                si = cfg.rho_stall_improve
                bt = cfg.rho_backoff_thresh
                stalled = (viol2 > si * si * viol2_chk).astype(jnp.float32)
                diverged = (viol2 > bt * bt * viol2_chk).astype(jnp.float32)
                flook = (rho_k >= cfg.rho * cfg.rho_growth * 0.999).astype(
                    jnp.float32
                )
                grow = cond_f * act * stalled * (1.0 - diverged) * capok
                back = cond_f * act * diverged * flook
                g = (1.0 + (cfg.rho_growth - 1.0) * grow) * (
                    1.0 + (1.0 / cfg.rho_growth - 1.0) * back
                )
                # refresh the per-lane checkpoint at every check
                viol2_chk = cond_f * viol2 + (1.0 - cond_f) * viol2_chk
            else:
                g = 1.0 + (cfg.rho_growth - 1.0) * cond_f * capok * act
            rho_k = rho_k * g
            P = P / g[0:1].reshape(1, 1, -1)
        # seed the stall checkpoint with the first measured violation
        first = jnp.where(i == 0, 1.0, 0.0).astype(jnp.float32)
        viol2_chk = jnp.minimum(viol2_chk, viol2) * first + viol2_chk * (1.0 - first)
        return X, F, P, rho_k, viol2, viol2_chk, iters, act

    def admm_body(i, carry):
        # act: 1.0 while unconverged
        X, F, P, rho_k, viol2, viol2_chk, iters, act = carry
        rho_f4 = rho_k[0:1].reshape(1, 1, 1, -1)  # F-space broadcast
        rho_x3 = rho_k[0:1].reshape(1, 1, -1)  # X-space broadcast

        # F subproblem
        bx = bx_vec(X)
        bP = P - bx

        def quad_f(y):
            return 2.0 * (WF * y + rho_f4 * ax_applyT(X, ax_apply(X, y)))

        def grad_f(y):
            return 2.0 * (WF * y + rho_f4 * ax_applyT(X, ax_apply(X, y) + bP)) + qF

        if cfg.precondition:
            # per-contact isotropic Jacobi diag of 2(W_F + rho A_x^T A_x)
            # (centroidal.ax_diag_iso in the (.., T) layout)
            arm_d = r - X[:H, 0:3, :][:, None, :, :]
            arm2 = jnp.sum(arm_d * arm_d, axis=2, keepdims=True)
            dt2 = (dt * dt)[:, None, None, :]
            wf_iso = jnp.mean(WF, axis=2, keepdims=True)
            d0f = 2.0 * (wf_iso + rho_f4 * cnt4 * dt2 * (1.0 / (m * m) + 2.0 * arm2 / 3.0)) + 1e-12
            sqf = jnp.sqrt(d0f)
            lam_f = power_L(lambda z: quad_f(z / sqf) / sqf, F.shape)
            D_f = lam_f[0:1].reshape(1, 1, 1, -1) * d0f
        else:
            D_f = power_L(quad_f, F.shape)[0:1].reshape(1, 1, 1, -1)
        F_new = fista(F, grad_f, soc_project, D_f)

        # X subproblem
        if cfg.x_solver == "thomas":
            X_new = thomas_x(F_new, P, rho_k)
            return _dual_and_mask(
                i, X_new, F_new, X, F, P, rho_k, viol2, viol2_chk, iters, act
            )
        bf = bf_vec(F_new)
        bPx = P - bf

        def quad_x(y):
            return 2.0 * (W * y + rho_x3 * af_applyT(F_new, af_apply(F_new, y)))

        def grad_x(y):
            return 2.0 * (W * y + rho_x3 * af_applyT(F_new, af_apply(F_new, y) + bPx)) + qlin

        if cfg.precondition:
            # closed-form diag(A_f^T A_f) (centroidal.af_diag, (.., T) layout)
            cF_tot_d = jnp.sum(cnt4 * F_new, axis=1)  # (H, 3, T)
            cf2 = jnp.sum(cF_tot_d * cF_tot_d, axis=1, keepdims=True)  # (H, 1, T)
            dt2x = (dt * dt)[:, None, :]  # (H, 1, T)
            T_l = X.shape[-1]
            one3 = jnp.ones((H + 1, 3, T_l), jnp.float32)
            z3 = jnp.zeros((1, 3, T_l), jnp.float32)
            k_lt_H = jnp.concatenate([one3[:H], z3], axis=0)
            k_ge_1 = jnp.concatenate([z3, one3[:H]], axis=0)
            k_eq_0 = jnp.concatenate([one3[:1], jnp.zeros((H, 3, T_l), jnp.float32)], axis=0)
            cross_sq = dt2x * (cf2 - cF_tot_d * cF_tot_d)  # (H, 3, T)
            cross_sq = jnp.concatenate([cross_sq, jnp.zeros((1, 3, T_l), jnp.float32)], axis=0)
            d_com = k_lt_H * (1.0 + cross_sq) + k_ge_1 + k_eq_0
            dt2_prev = jnp.concatenate([jnp.zeros((1, 1, T_l), jnp.float32), dt2x], axis=0)
            d_vel = k_lt_H + k_ge_1 * (1.0 + dt2_prev) + k_eq_0
            d_ang = k_lt_H + k_ge_1 + k_eq_0
            d0x = 2.0 * (W + rho_x3 * jnp.concatenate([d_com, d_vel, d_ang], axis=1)) + 1e-12
            sqx = jnp.sqrt(d0x)
            lam_x = power_L(lambda z: quad_x(z / sqx) / sqx, X.shape)
            D_x = lam_x[0:1].reshape(1, 1, -1) * d0x
        else:
            D_x = power_L(quad_x, X.shape)[0:1].reshape(1, 1, -1)
        X_new = fista(X, grad_x, box_project, D_x)
        return _dual_and_mask(
            i, X_new, F_new, X, F, P, rho_k, viol2, viol2_chk, iters, act
        )

    X0 = X0_in
    F0 = F0_in
    P0 = anchored(jnp.zeros_like(X0))
    viol0 = anchored(jnp.full((SUB, X0.shape[-1]), 3.0e38, jnp.float32))
    it0 = anchored(jnp.zeros((SUB, X0.shape[-1]), jnp.float32))
    act0 = anchored(jnp.ones((SUB, X0.shape[-1]), jnp.float32))
    rho0 = anchored(jnp.full((SUB, X0.shape[-1]), cfg.rho, jnp.float32))
    def admm_cond(carry):
        i = carry[0]
        act = carry[-1]
        return jnp.logical_and(i < cfg.max_admm_iters, jnp.sum(act[0]) > 0.0)

    def admm_wbody(carry):
        i = carry[0]
        out = admm_body(i, carry[1:])
        return (i + 1,) + out

    chk0 = anchored(jnp.full((SUB, X0.shape[-1]), 3.0e38, jnp.float32))
    _, X, F, P, _, viol2, _, iters, _ = jax.lax.while_loop(
        admm_cond, admm_wbody, (jnp.int32(0), X0, F0, P0, rho0, viol0, chk0, it0, act0)
    )
    return X, F, jnp.sqrt(viol2[0:1]), iters[0:1]


def solve(
    plan: ContactPlan,  # batched: cnt (B, H, ne), r (B, H, ne, 3), dt (B, H)
    m: float,
    x_init,  # (B, 9)
    W,  # (B, Hp1, 9)
    X_ref_target,  # (B, Hp1, 9)
    W_F,  # (B, H, ne, 3)
    X_wm,  # (B, Hp1, 9)
    F_wm,  # (B, H, ne, 3)
    x_bounds,  # (lb, ub): (B, Hp1, 9) each
    cfg: PallasAdmmConfig,
    F_reg_ref=None,  # optional (B, H, ne, 3) force regularization reference
    # point (f_reg_style="weight"); None = reference pull-to-zero
):
    """Batched biconvex ADMM via the fused kernel. Returns (X, F, viol, iters).

    Batches that are not a multiple of the 128-lane width are zero-padded
    internally (padding replicates row 0 so the extra lanes stay well-posed)."""
    B, H, ne = plan.cnt.shape
    Hp1 = H + 1
    if B % LANES != 0:
        pad = LANES - B % LANES

        def _pad(a):
            return jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)

        out = solve(
            jax.tree_util.tree_map(_pad, plan),
            m,
            _pad(x_init),
            _pad(W),
            _pad(X_ref_target),
            _pad(W_F),
            _pad(X_wm),
            _pad(F_wm),
            jax.tree_util.tree_map(_pad, x_bounds),
            cfg,
            F_reg_ref=None if F_reg_ref is None else _pad(F_reg_ref),
        )
        return tuple(a[:B] for a in out)
    G = B // LANES
    f32 = jnp.float32

    def to_lanes(a):
        # (B, ...) -> (G, ..., T): split batch into (G, T) and move T last
        a = jnp.asarray(a, f32).reshape((G, LANES) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    cnt = to_lanes(plan.cnt)
    r = to_lanes(plan.r)
    dt = to_lanes(plan.dt)
    x_init_l = to_lanes(x_init)
    W_l = to_lanes(W)
    q_l = to_lanes(-2.0 * jnp.asarray(W, f32) * jnp.asarray(X_ref_target, f32))
    WF_l = to_lanes(W_F)
    if F_reg_ref is None:
        qF_l = jnp.zeros_like(WF_l)
    else:
        qF_l = to_lanes(-2.0 * jnp.asarray(W_F, f32) * jnp.asarray(F_reg_ref, f32))
    big = jnp.float32(3.4e38)
    lb_l = to_lanes(jnp.clip(x_bounds[0], -big, big))
    ub_l = to_lanes(jnp.clip(x_bounds[1], -big, big))
    X0_l = to_lanes(X_wm)
    F0_l = to_lanes(F_wm)

    kern = functools.partial(_kernel, cfg=cfg, m=float(m), H=H, ne=ne)
    grid = (G,)

    def spec_for(a):
        blk = a.shape[1:]
        return pl.BlockSpec((1,) + blk, lambda i: (i,) + (0,) * len(blk))

    in_specs = [
        spec_for(a) for a in (cnt, r, dt, x_init_l, W_l, q_l, WF_l, qF_l, lb_l, ub_l)
    ]
    io_specs = [spec_for(X0_l), spec_for(F0_l)]
    out_shape = [
        jax.ShapeDtypeStruct(X0_l.shape, f32),
        jax.ShapeDtypeStruct(F0_l.shape, f32),
        jax.ShapeDtypeStruct((G, 1, LANES), f32),
        jax.ShapeDtypeStruct((G, 1, LANES), f32),
    ]
    out_specs = io_specs + [spec_for(jnp.zeros((G, 1, LANES))), spec_for(jnp.zeros((G, 1, LANES)))]

    def kernel_wrap(cnt, r, dt, x_init, W, q, WF, qF, lb, ub, Xio, Fio, Xo, Fo, viol, iters):
        # copy warm starts into the outputs, then run in-place on the outputs
        Xo[:] = Xio[:]
        Fo[:] = Fio[:]
        _squeeze_kernel(
            kern, cnt, r, dt, x_init, W, q, WF, qF, lb, ub, Xo, Fo, viol, iters
        )

    X_l, F_l, viol_l, iters_l = pl.pallas_call(
        kernel_wrap,
        grid=grid,
        in_specs=in_specs + io_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(cnt, r, dt, x_init_l, W_l, q_l, WF_l, qF_l, lb_l, ub_l, X0_l, F0_l)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)  # (G, T, ...)
        return a.reshape((B,) + a.shape[2:])

    return (
        from_lanes(X_l),
        from_lanes(F_l),
        from_lanes(viol_l)[:, 0],
        from_lanes(iters_l)[:, 0].astype(jnp.int32),
    )


class _SqueezeRef:
    """View of a Ref with the leading grid-block axis (length 1) removed."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        if idx is Ellipsis or (isinstance(idx, slice) and idx == slice(None)):
            return self._ref[:][0]
        if not isinstance(idx, tuple):
            idx = (idx,)
        return self._ref[(0,) + idx]

    def __setitem__(self, idx, val):
        if idx is Ellipsis or (isinstance(idx, slice) and idx == slice(None)):
            self._ref[:] = val[None]
            return
        if not isinstance(idx, tuple):
            idx = (idx,)
        self._ref[(0,) + idx] = val


def _squeeze_kernel(kern, *refs):
    kern(*[_SqueezeRef(r) for r in refs])


# ---------------------------------------------------------------------------
# Fused problem assembly (round-5 perf task: the vmapped XLA prep is the
# largest single cost of the batched solve — ~25 ms standalone at B=512,
# fusion-granularity bound, scripts/profile_prep.py). The contact plan,
# dynamics costs, kinematic box and warm starts are rebuilt INSIDE the
# kernel from ~30 floats/sample (vs ~1.5k floats of prep outputs streamed
# from HBM), eliminating the XLA micro-fusion soup. Twin of
# kino_dyn._prepare_problem + gait.create_cnt_plan + biconvex.
# kinematic_box_bounds (flat ground, no touchdown noise — callers needing
# terrain/fault-injection use the XLA prep). Parity:
# tests/test_fused_prep.py.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PrepConsts:
    """Static per-(robot, gait) constants of the fused prep prologue."""

    gait_period: float
    gait_dt: float
    stance_percent: tuple  # (ne,)
    phase_offset: tuple  # (ne,)
    foot_size: float
    nom_ht: float
    ori_correction: tuple  # (3,)
    gait_horizon: float
    izz_yaw: float  # (I_comp @ e_z)[2] — yaw-rate momentum target coefficient
    W_X: tuple  # (9,)
    W_X_ter: tuple  # (9,)
    W_F: tuple  # (ne*3,)
    bx: float
    by: float
    bz: float
    warm_start_vdes: bool  # CyclicMpcSpec.warm_start_style == "vdes"
    f_reg_weight: bool  # BiconvexMotionParams.f_reg_style == "weight"


def prep_values(t, vdes, wdes, x_init, ee, hip, amom, *, pc: PrepConsts, m, H, ne):
    """Problem assembly on (.., T)-layout values (plain jnp — runs identically
    inside the Pallas kernel and as a host-side function, which is how the
    parity test pins it against kino_dyn._prepare_problem).

    Inputs: t (1, T), vdes (3, T) world-frame v_des, wdes (1, T),
    x_init (9, T), ee (ne, 3, T) measured foot positions (origin-reset
    frame), hip (ne, 3, T) yaw-frame hip offsets (R_yaw @ hip_offsets),
    amom (3, T) orientation-correction angular momentum.

    Returns (cnt, r, dtarr, swing, W, qlin, WF, qF, lb, ub, X0, F0)."""
    f32 = jnp.float32
    T = t.shape[-1]
    BIG = f32(3.4e38)
    t1 = t[0]
    w = wdes[0]
    vx, vy = vdes[0], vdes[1]
    com = x_init[0:3]
    P = pc.gait_period
    gdt = pc.gait_dt

    # dt schedule with the shrunk first knot (abstract_cyclic_gen.py:385-390)
    dt0 = gdt - jnp.round(jnp.mod(t1, gdt) * 100.0) / 100.0
    dt0 = jnp.where(dt0 == 0.0, gdt, dt0)
    # int iota then cast (Mosaic: tpu.iota must produce integers)
    ki = jax.lax.broadcasted_iota(jnp.int32, (H, T), 0).astype(f32)  # knot index
    dtarr = jnp.where(ki == 0.0, dt0[None, :], gdt)  # (H, T)

    knot_t = t1[None, :] + ki * gdt  # (H, T)
    zero_h = jnp.zeros((H, T), f32)
    # Raibert angular-step term (gait.create_cnt_plan:132-136)
    ang_c = 0.5 * jnp.sqrt(com[2] / _G)
    ang_step_x = ang_c * vy * w  # (T,)
    ang_step_y = -(ang_c * vx) * w

    cnt_l, per_l, tdx_l, tdy_l, swx_l, swy_l = [], [], [], [], [], []
    for e in range(ne):
        st = pc.stance_percent[e] * P
        ph = jnp.mod(knot_t + pc.phase_offset[e] * P, P)
        stance = ph <= st + 1e-4  # gait_planner.cpp:48-49 tolerance
        cnt_e = stance.astype(f32)
        per_e = jnp.where(stance, ph / st, (ph - st) / (P - st))
        hipx = com[0][None, :] + hip[e, 0][None, :] + ki * gdt * vx[None, :]
        hipy = com[1][None, :] + hip[e, 1][None, :] + ki * gdt * vy[None, :]
        rbx = 0.5 * vx * P * pc.stance_percent[e]  # (T,)
        rby = 0.5 * vy * P * pc.stance_percent[e]
        tdx = hipx + (rbx + ang_step_x)[None, :]
        tdy = hipy + (rby + ang_step_y)[None, :]
        early = per_e < 0.5
        swx = jnp.where(early, hipx + ang_step_x[None, :], tdx)
        swy = jnp.where(early, hipy + ang_step_y[None, :], tdy)
        cnt_l.append(cnt_e)
        per_l.append(per_e)
        tdx_l.append(tdx)
        tdy_l.append(tdy)
        swx_l.append(swx)
        swy_l.append(swy)
    cnt = jnp.stack(cnt_l, axis=1)  # (H, ne, T)

    # swing via mask: first half of swing, never knot 0
    swing = jnp.stack(
        [
            jnp.where(
                ki == 0.0,
                zero_h,
                ((cnt_l[e] == 0.0) & (per_l[e] - 0.5 < 0.02)).astype(f32),
            )
            for e in range(ne)
        ],
        axis=1,
    )  # (H, ne, T)

    # sequential location carry, unrolled over the horizon
    fs3 = jnp.full((1, T), f32(pc.foot_size))
    r_feet = []
    for e in range(ne):
        rows = [ee[e]]  # knot 0 keeps the measured foot pose
        r_prev = ee[e]
        prev_c = cnt_l[e][0]
        for i in range(1, H):
            c = cnt_l[e][i]
            landed = c * (1.0 - prev_c)
            td3 = jnp.concatenate(
                [tdx_l[e][i][None, :], tdy_l[e][i][None, :], fs3], axis=0
            )
            sw3 = jnp.concatenate(
                [swx_l[e][i][None, :], swy_l[e][i][None, :], fs3], axis=0
            )
            stay = jnp.where(landed[None, :] > 0.0, td3, r_prev)
            r_i = jnp.where(c[None, :] > 0.0, stay, sw3)
            rows.append(r_i)
            r_prev = r_i
            prev_c = c
        r_feet.append(jnp.stack(rows, axis=0))  # (H, 3, T)
    r = jnp.stack(r_feet, axis=1)  # (H, ne, 3, T)

    # --- dynamics costs (kino_dyn._prepare_problem create_costs block) ---
    # prefix sum unrolled over the horizon (Mosaic has no cumsum lowering)
    _rows, _acc = [], jnp.zeros((T,), f32)
    for i in range(H):
        _acc = _acc + dtarr[i]
        _rows.append(_acc)
    cum = jnp.stack(_rows, axis=0)  # (H, T)
    xy_nom_x = com[0][None, :] + vx[None, :] * (cum - dt0[None, :])
    xy_nom_y = com[1][None, :] + vy[None, :] * (cum - dt0[None, :])
    oc = pc.ori_correction
    yaw_mom = f32(pc.izz_yaw) * w  # (T,)
    amom_z_nom = jnp.where(w == 0.0, amom[2] * oc[2], yaw_mom)

    def bcast(row):  # (T,) -> (H, T)
        return jnp.broadcast_to(row[None, :], (H, T))

    X_nom = jnp.stack(
        [
            xy_nom_x,
            xy_nom_y,
            jnp.full((H, T), f32(pc.nom_ht)),
            bcast(vdes[0]),
            bcast(vdes[1]),
            bcast(vdes[2]),
            bcast(amom[0] * oc[0]),
            bcast(amom[1] * oc[1]),
            bcast(amom_z_nom),
        ],
        axis=1,
    )  # (H, 9, T)
    hz = f32(pc.gait_horizon * pc.gait_period)
    X_ter = jnp.stack(
        [
            com[0] + hz * vdes[0],
            com[1] + hz * vdes[1],
            jnp.full((T,), f32(pc.nom_ht)),
            vdes[0],
            vdes[1],
            vdes[2],
            amom[0],
            amom[1],
            jnp.where(w == 0.0, amom[2], yaw_mom),
        ],
        axis=0,
    )  # (9, T)
    X_ref_full = jnp.concatenate([X_nom, X_ter[None]], axis=0)  # (Hp1, 9, T)

    # static weights built from SCALAR constants (Pallas kernels may not
    # capture trace-time arrays; scalars inline fine)
    kfull = jax.lax.broadcasted_iota(jnp.int32, (H + 1, T), 0).astype(f32)
    W = jnp.stack(
        [
            jnp.where(kfull < H, f32(pc.W_X[j]), f32(pc.W_X_ter[j]))
            for j in range(9)
        ],
        axis=1,
    )  # (Hp1, 9, T)
    qlin = -2.0 * W * X_ref_full

    WF = jnp.stack(
        [
            jnp.stack(
                [jnp.full((H, T), f32(pc.W_F[3 * e + a])) for a in range(3)], axis=1
            )
            for e in range(ne)
        ],
        axis=1,
    )  # (H, ne, 3, T)
    if pc.f_reg_weight:
        n_act = jnp.maximum(jnp.sum(cnt, axis=1), 1.0)  # (H, T)
        fz_ref = cnt * (f32(m * _G) / n_act)[:, None, :]  # (H, ne, T)
        zero_f = jnp.zeros((H, ne, 1, T), f32)
        F_reg = jnp.concatenate([zero_f, zero_f, fz_ref[:, :, None, :]], axis=2)
        qF = -2.0 * WF * F_reg
    else:
        qF = jnp.zeros((H, ne, 3, T), f32)

    # --- kinematic CoM box (biconvex.kinematic_box_bounds) ---
    any_cnt = jnp.sum(cnt, axis=1) > 0.0  # (H, T)
    r_max = jnp.max(r, axis=1)  # (H, 3, T)
    r_min = jnp.min(r, axis=1)
    blo = (-pc.bx, -pc.by, 0.0)
    bhi = (pc.bx, pc.by, pc.bz)
    lb_com = jnp.stack(
        [jnp.where(any_cnt, r_max[:, a, :] + f32(blo[a]), -BIG) for a in range(3)],
        axis=1,
    )
    ub_com = jnp.stack(
        [jnp.where(any_cnt, r_min[:, a, :] + f32(bhi[a]), BIG) for a in range(3)],
        axis=1,
    )
    pad6_lo = jnp.full((H, 6, T), -BIG)
    pad6_hi = jnp.full((H, 6, T), BIG)
    lb = jnp.concatenate(
        [jnp.concatenate([lb_com, pad6_lo], axis=1), jnp.full((1, 9, T), -BIG)], axis=0
    )
    ub = jnp.concatenate(
        [jnp.concatenate([ub_com, pad6_hi], axis=1), jnp.full((1, 9, T), BIG)], axis=0
    )

    # --- warm starts (kino_dyn.cpp:83-99 tiled; "vdes" ramp per spec) ---
    Hp1 = H + 1
    if pc.warm_start_vdes:
        tgrid = jnp.concatenate([jnp.zeros((1, T), f32), cum], axis=0)  # (Hp1, T)
        rows0 = x_init[0][None, :] + tgrid * vx[None, :]
        rows1 = x_init[1][None, :] + tgrid * vy[None, :]
        X0 = jnp.stack(
            [
                rows0,
                rows1,
                jnp.broadcast_to(x_init[2][None, :], (Hp1, T)),
                jnp.broadcast_to(vdes[0][None, :], (Hp1, T)),
                jnp.broadcast_to(vdes[1][None, :], (Hp1, T)),
                jnp.broadcast_to(vdes[2][None, :], (Hp1, T)),
                jnp.broadcast_to(x_init[6][None, :], (Hp1, T)),
                jnp.broadcast_to(x_init[7][None, :], (Hp1, T)),
                jnp.broadcast_to(x_init[8][None, :], (Hp1, T)),
            ],
            axis=1,
        )
    else:
        X0 = jnp.broadcast_to(x_init[None, :, :], (Hp1, 9, T))
    F0 = jnp.zeros((H, ne, 3, T), f32)
    return cnt, r, dtarr, swing, W, qlin, WF, qF, lb, ub, X0, F0


def _kernel_fused(
    t_ref,  # (1, T)
    vdes_ref,  # (3, T)
    wdes_ref,  # (1, T)
    x_init_ref,  # (9, T)
    ee_ref,  # (ne, 3, T)
    hip_ref,  # (ne, 3, T)
    amom_ref,  # (3, T)
    X_ref,  # out (Hp1, 9, T)
    F_ref,  # out (H, ne, 3, T)
    viol_ref,  # out (1, T)
    iters_ref,  # out (1, T)
    cnt_ref,  # out (H, ne, T)
    r_ref,  # out (H, ne, 3, T)
    dt_ref,  # out (H, T)
    swing_ref,  # out (H, ne, T)
    *,
    cfg: PallasAdmmConfig,
    pc: PrepConsts,
    m: float,
    H: int,
    ne: int,
):
    cnt, r, dtarr, swing, W, qlin, WF, qF, lb, ub, X0, F0 = prep_values(
        t_ref[:], vdes_ref[:], wdes_ref[:], x_init_ref[:], ee_ref[:],
        hip_ref[:], amom_ref[:], pc=pc, m=m, H=H, ne=ne,
    )
    X, F, viol, iters = _admm_core(
        cnt, r, dtarr, x_init_ref[:], W, qlin, WF, qF, lb, ub, X0, F0,
        cfg=cfg, m=m, H=H, ne=ne,
    )
    X_ref[:] = X
    F_ref[:] = F
    viol_ref[:] = viol
    iters_ref[:] = iters
    cnt_ref[:] = cnt
    r_ref[:] = r
    dt_ref[:] = dtarr
    swing_ref[:] = swing


def solve_from_state(
    t,  # (B,)
    v_des_w,  # (B, 3) desired CoM velocity, world frame
    w_des,  # (B,)
    x_init,  # (B, 9) current centroidal state
    ee_pos,  # (B, ne, 3) measured foot positions (origin-reset frame)
    hip_world,  # (B, ne, 3) yaw-frame hip offsets
    amom,  # (B, 3) orientation-correction angular momentum
    m: float,
    pc: PrepConsts,
    cfg: PallasAdmmConfig,
    H: int,
    ne: int,
):
    """Fused prep + ADMM: one `pallas_call` from compact per-sample state to
    the centroidal solution AND the contact plan the IK stage consumes.

    Returns (X, F, viol, iters, cnt, r, dts, swing_mask)."""
    B = t.shape[0]
    if B % LANES != 0:
        pad = LANES - B % LANES

        def _pad(a):
            return jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)

        out = solve_from_state(
            _pad(t), _pad(v_des_w), _pad(w_des), _pad(x_init), _pad(ee_pos),
            _pad(hip_world), _pad(amom), m, pc, cfg, H, ne,
        )
        return tuple(a[:B] for a in out)
    G = B // LANES
    f32 = jnp.float32
    Hp1 = H + 1

    def to_lanes(a):
        a = jnp.asarray(a, f32).reshape((G, LANES) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    ins = [
        to_lanes(t[:, None]),
        to_lanes(v_des_w),
        to_lanes(w_des[:, None]),
        to_lanes(x_init),
        to_lanes(ee_pos),
        to_lanes(hip_world),
        to_lanes(amom),
    ]
    kern = functools.partial(_kernel_fused, cfg=cfg, pc=pc, m=float(m), H=H, ne=ne)

    def spec_for_shape(shape):
        return pl.BlockSpec((1,) + shape, lambda i, _s=len(shape): (i,) + (0,) * _s)

    in_specs = [spec_for_shape(a.shape[1:]) for a in ins]
    out_shapes = [
        (Hp1, 9, LANES),
        (H, ne, 3, LANES),
        (1, LANES),
        (1, LANES),
        (H, ne, LANES),
        (H, ne, 3, LANES),
        (H, LANES),
        (H, ne, LANES),
    ]
    out_shape = [jax.ShapeDtypeStruct((G,) + s, f32) for s in out_shapes]
    out_specs = [spec_for_shape(s) for s in out_shapes]

    def kernel_wrap(*refs):
        _squeeze_kernel(kern, *refs)

    outs = pl.pallas_call(
        kernel_wrap,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(*ins)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((B,) + a.shape[2:])

    X, F, viol, iters, cnt, r, dts, swing = (from_lanes(a) for a in outs)
    return (
        X,
        F,
        viol[:, 0],
        iters[:, 0].astype(jnp.int32),
        cnt,
        r,
        dts,
        swing > 0.5,
    )
