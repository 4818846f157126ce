"""Fused Pallas TPU kernel for the kinematic Gauss-Newton DDP (the IK).

The XLA DDP (`solvers/ddp.py` + `mpc/ik.py`) is correct but latency-bound on
TPU: its FK/centroidal chains are thousands of tiny (3,3) ops over a
batch-leading layout, and the Riccati/rollout scans dispatch per knot — at
B=256 the IK costs ~160 ms of the ~210 ms MPC solve. This kernel runs the
ENTIRE DDP solve — forward rollouts, residuals, analytic Gauss-Newton
Jacobians, the Riccati sweep, Cholesky, and a per-lane parallel line search —
inside one `pallas_call`, batch on the 128-lane axis (same layout as
`solvers/pallas_admm.py`).

Replaces (TPU-natively) the reference's crocoddyl SolverDDP IK
(reference src/ik/inverse_kinematics.cpp:54-71, src/ik/action_model.cpp).

Key in-kernel techniques (no autodiff inside Pallas — everything is
hand-derived and cross-validated against the XLA path in
tests/test_pallas_ddp.py):

* FK / body velocities / centroidal momentum as unrolled per-body recursions
  on (..., T) lane tensors (T = 128 problems per VPU op).
* Gauss-Newton Jacobian rows from ONE tangent-propagation pass: the FK
  recursion is repeated with a leading D=nv tangent axis carrying
  (rotation tangent w~, position/velocity tangents) — the hand-written
  equivalent of 18 simultaneous JVPs, sharing all primal quantities.
* dh/dv (the centroidal momentum matrix) from a velocity-tangent pass.
* SE(3) chart blocks (state-reg rows, Fx/Fu base blocks) in closed form
  (utils/quat.py se3_{left,right}_jacobian[_inv], se3_adjoint_exp — verified
  vs autodiff in tests/test_se3_jacobians.py) re-expressed in lane layout.
* Riccati products exploiting Fx = [[A,B],[0,I]], Fu = [[C],[dt I]] with
  A,B,C block-diagonal (6x6 dense + scaled identity) — no 36^3 contractions.
* Unrolled 18x18 Cholesky + triangular solves (columnwise, rank-1 updates).
* Line search: cost-only rollouts per alpha, then one storing rollout with
  the per-lane best alpha (crocoddyl's sequential backtracking becomes a
  data-parallel argmin).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .pallas_admm import _SqueezeRef

LANES = 128


@dataclasses.dataclass(frozen=True)
class PallasDdpConfig:
    n_iters: int = 6
    alphas: tuple = (1.0, 0.7, 0.3, 0.1, 0.03)
    reg: float = 1e-9
    interpret: bool = False


# ---------------------------------------------------------------------------
# lane-layout math helpers: vectors (3, T), quats (4, T), matrices (3, 3, T);
# a leading tangent axis D broadcasts through all of them.
# ---------------------------------------------------------------------------


def _cross(a, b):
    """Cross product over axis -2 of (..., 3, T)."""
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack([a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2)


def _m3v(M, v):
    """(..., 3, 3, T) @ (..., 3, T) -> (..., 3, T)."""
    return jnp.sum(M * v[..., None, :, :], axis=-2)


def _m3tv(M, v):
    """M^T v."""
    return jnp.sum(M * v[..., :, None, :], axis=-3)


def _m3m(A, B):
    """(..., 3, 3, T) @ (..., 3, 3, T)."""
    return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)


def _m3c(M, c):
    """Matrix (..., 3, 3, T) times a static numpy 3-vector.

    Built from python-scalar multiplies (zero terms skipped at trace time):
    Pallas TPU rejects kernels that capture array constants, so all static
    model data must enter as folded scalars."""
    c = np.asarray(c, np.float64)
    out = None
    for j in range(3):
        if c[j] == 0.0:
            continue
        t = M[..., :, j, :] * float(c[j])
        out = t if out is None else out + t
    return out if out is not None else jnp.zeros_like(M[..., :, 0, :])


def _m3m_const_r(M, C):
    """M @ C with C a static numpy (3, 3), as scalar-folded column sums
    (no captured array constants — see _m3c)."""
    C = np.asarray(C, np.float64)
    cols = []
    for j in range(3):
        acc = None
        for k in range(3):
            if C[k, j] == 0.0:
                continue
            t = M[..., :, k, :] * float(C[k, j])
            acc = t if acc is None else acc + t
        cols.append(acc if acc is not None else jnp.zeros_like(M[..., :, 0, :]))
    return jnp.stack(cols, axis=-2)


def _skew_apply(w, M):
    """w^ @ M for w (..., 3, T), M (..., 3, 3, T): cross each column."""
    cols = [_cross(w, M[..., :, j, :]) for j in range(3)]
    return jnp.stack(cols, axis=-2)


def _quat_to_rot(q):
    """(4, T) xyzw -> (3, 3, T)."""
    x, y, z, w = q[0, :], q[1, :], q[2, :], q[3, :]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=0)
    r1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=0)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


def _quat_mul(a, b):
    ax, ay, az, aw = a[0, :], a[1, :], a[2, :], a[3, :]
    bx, by, bz, bw = b[0, :], b[1, :], b[2, :], b[3, :]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=0,
    )


def _quat_conj(q):
    return jnp.concatenate([-q[0:3], q[3:4]], axis=0)


def _quat_normalize(q):
    n = jnp.sqrt(jnp.sum(q * q, axis=0, keepdims=True)) + 1e-30
    return q / n


def _exp3(w):
    """(3, T) rotation vector -> quaternion (4, T)."""
    sq = jnp.sum(w * w, axis=0, keepdims=True)
    small = sq < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, sq))
    s = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(0.5 * theta) / theta)
    c = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(0.5 * theta))
    return jnp.concatenate([w * s, c], axis=0)


# atan(u)/u as a polynomial in u^2 on [0,1] (Chebyshev fit; max f32 error
# ~1e-7) — Mosaic TC has no atan/atan2 primitive.
_ATAN_POLY = (
    0.9999999996154998, -0.33333323672256887, 0.19999595986303575,
    -0.1427904961590342, 0.11053790683823699, -0.08796135011665891,
    0.06710145782384905, -0.04427402813038919, 0.0222036994399019,
    -0.007166255243105625, 0.0010845064682338036,
)


def _atan01(u):
    """atan(u) for u in [0, 1]."""
    s = u * u
    acc = jnp.full_like(u, _ATAN_POLY[-1])
    for c in _ATAN_POLY[-2::-1]:
        acc = acc * s + c
    return u * acc


def _log3(q):
    """Quaternion (4, T) -> rotation vector (3, T).

    angle = 2 atan2(|v|, w); with the sign flip w >= 0 and |q| = 1 the
    half-angle identity gives atan2(|v|, w) = 2 atan(|v| / (1 + w)) with
    argument in [0, 1] — evaluated by _atan01."""
    q = jnp.where(q[3:4] < 0, -q, q)
    sq = jnp.sum(q[0:3] * q[0:3], axis=0, keepdims=True)
    w = q[3:4]
    small = sq < 1e-12
    vnorm = jnp.sqrt(jnp.where(small, 1.0, sq))
    angle = 4.0 * _atan01(vnorm / (1.0 + w))
    w_safe = jnp.maximum(w, 1e-8)
    scale = jnp.where(small, (2.0 / w_safe) * (1.0 - sq / (3.0 * w_safe * w_safe)), angle / vnorm)
    return q[0:3] * scale


def _skew(w):
    """(..., 3, T) -> (..., 3, 3, T)."""
    z = jnp.zeros_like(w[..., 0, :])
    w0, w1, w2 = w[..., 0, :], w[..., 1, :], w[..., 2, :]
    r0 = jnp.stack([z, -w2, w1], axis=-2)
    r1 = jnp.stack([w2, z, -w0], axis=-2)
    r2 = jnp.stack([-w1, w0, z], axis=-2)
    return jnp.stack([r0, r1, r2], axis=-3)


def _eye_lane(n, dtype=jnp.float32):
    """(n, n, 1) identity built from iota (broadcasts over lanes; Pallas
    forbids captured array constants)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    return (r == c).astype(dtype)


def _eye3(T, dtype=jnp.float32):
    return _eye_lane(3, dtype)


def _so3_V(w):
    """SO(3) left Jacobian V(w): (3, T) -> (3, 3, T)."""
    sq = jnp.sum(w * w, axis=0, keepdims=True)[None]  # (1, 1, T)
    small = sq < 1e-10
    sq_safe = jnp.where(small, 1.0, sq)
    t = jnp.sqrt(sq_safe)
    K = _skew(w)
    K2 = _m3m(K, K)
    a = jnp.where(small, 0.5 - sq / 24.0, (1 - jnp.cos(t)) / sq_safe)
    b = jnp.where(small, 1.0 / 6.0 - sq / 120.0, (t - jnp.sin(t)) / (sq_safe * t))
    return _eye3(w.shape[-1]) + a * K + b * K2


def _so3_V_inv(w):
    sq = jnp.sum(w * w, axis=0, keepdims=True)[None]
    small = sq < 1e-10
    sq_safe = jnp.where(small, 1.0, sq)
    t = jnp.sqrt(sq_safe)
    K = _skew(w)
    K2 = _m3m(K, K)
    cot_term = (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t))
    b = jnp.where(small, 1.0 / 12.0 + sq / 720.0, 1.0 / sq_safe - cot_term)
    return _eye3(w.shape[-1]) - 0.5 * K + b * K2


def _se3_Q(rho, w):
    """Barfoot Q block (3, 3, T) — lane twin of utils/quat._se3_Q."""
    sq = jnp.sum(w * w, axis=0, keepdims=True)[None]
    small = sq < 1e-8
    sq_safe = jnp.where(small, 1.0, sq)
    t = jnp.sqrt(sq_safe)
    rx = _skew(rho)
    wx = _skew(w)
    wxrx = _m3m(wx, rx)
    rxwx = _m3m(rx, wx)
    wxrxwx = _m3m(wxrx, wx)
    c1 = jnp.where(small, 1.0 / 6.0 - sq / 120.0, (t - jnp.sin(t)) / (sq_safe * t))
    c2 = jnp.where(
        small, 1.0 / 24.0 - sq / 720.0, (sq / 2.0 + jnp.cos(t) - 1.0) / (sq_safe * sq_safe)
    )
    c3 = jnp.where(
        small,
        -1.0 / 120.0 + sq / 5040.0,
        (t - jnp.sin(t) - t * sq / 6.0) / (sq_safe * sq_safe * t),
    )
    return (
        0.5 * rx
        + c1 * (wxrx + rxwx + wxrxwx)
        + c2 * (_m3m(wx, wxrx) + _m3m(rxwx, wx) - 3.0 * wxrxwx)
        + 0.5 * (c2 + 3.0 * c3) * (_m3m(wxrxwx, wx) + _m3m(wx, wxrxwx))
    )


def _block6(A, B, C, D):
    """Assemble [[A, B], [C, D]] from (3, 3, T) blocks -> (6, 6, T)."""
    top = jnp.concatenate([A, B], axis=1)
    bot = jnp.concatenate([C, D], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _se3_Jl(rho, w):
    Jl = _so3_V(w)
    Q = _se3_Q(rho, w)
    return _block6(Jl, Q, jnp.zeros_like(Q), Jl)


def _se3_Jl_inv(rho, w):
    Ji = _so3_V_inv(w)
    Q = _se3_Q(rho, w)
    return _block6(Ji, -_m3m(_m3m(Ji, Q), Ji), jnp.zeros_like(Q), Ji)


def _se3_Jr(rho, w):
    return _se3_Jl(-rho, -w)


def _se3_Jr_inv(rho, w):
    return _se3_Jl_inv(-rho, -w)


def _se3_adjoint_exp(rho, w):
    """Ad(Exp([rho, w])) (6, 6, T), twist ordering [linear, angular]."""
    R = _quat_to_rot(_exp3(w))
    t = _m3v(_so3_V(w), rho)
    return _block6(R, _m3m(_skew(t), R), jnp.zeros_like(R), R)


def _se3_integrate(p, q, dv, dw):
    """(3,T),(4,T),(3,T),(3,T) -> (p', q')."""
    R = _quat_to_rot(q)
    p_new = p + _m3v(R, _m3v(_so3_V(dw), dv))
    q_new = _quat_normalize(_quat_mul(q, _exp3(dw)))
    return p_new, q_new


def _se3_difference(p1, q1, p2, q2):
    q_rel = _quat_mul(_quat_conj(q1), q2)
    dw = _log3(q_rel)
    R1 = _quat_to_rot(q1)
    dp_local = _m3tv(R1, p2 - p1)
    dv = _m3v(_so3_V_inv(dw), dp_local)
    return dv, dw


def _mm(A, B):
    """Generic small matmul on lane tensors: (m, k, T) @ (k, n, T) via a
    static loop over k (sums of outer products)."""
    k = A.shape[1]
    # pure-slice indexing: mixed int+newaxis indexing lowers to an ND gather,
    # which Mosaic TC rejects
    acc = A[:, 0:1, :] * B[0:1, :, :]
    for i in range(1, k):
        acc = acc + A[:, i : i + 1, :] * B[i : i + 1, :, :]
    return acc


def _mv(A, v):
    """(m, k, T) @ (k, T) -> (m, T)."""
    return jnp.sum(A * v[None, :, :], axis=1)


def _mtv(A, v):
    """(k, m, T)^T @ (k, T) -> (m, T)."""
    return jnp.sum(A * v[:, None, :], axis=0)


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------


def _build_kernel(model, eff_frames, H: int, cfg: PallasDdpConfig):
    nj = model.n_joints
    nq, nv = model.nq, model.nv
    ndx = 2 * nv
    ne = len(eff_frames)
    nr = 3 * ne + 9 + ndx  # stage residual rows
    nrt = 9 + ndx  # terminal rows
    parent = [int(b) for b in model.parent]
    jrot = [np.asarray(model.joint_rot[j], np.float32) for j in range(nj)]
    jpos = [np.asarray(model.joint_pos[j], np.float32) for j in range(nj)]
    axes = [np.asarray(model.axis[j], np.float32) for j in range(nj)]
    masses = [float(m) for m in model.mass]
    coms = [np.asarray(model.com[b], np.float32) for b in range(model.n_bodies)]
    inertias = [np.asarray(model.inertia[b], np.float32) for b in range(model.n_bodies)]
    feet = [model.frames[n] for n in eff_frames]
    M_tot = float(model.total_mass)
    nb = model.n_bodies

    def fk_vel(q, v):
        """Primal FK + body velocities. q (nq, T), v (nv, T).

        Returns lists (per body) of R (3,3,T), p (3,T), omega (3,T), vel (3,T),
        plus a_w (3,T) per joint."""
        R0 = _quat_to_rot(q[3:7])
        Rs, ps = [R0], [q[0:3]]
        for j in range(nj):
            b = parent[j]
            # Rrot about static axis by theta_j
            th = q[7 + j : 8 + j, :]  # (1, T)
            c, s = jnp.cos(th)[0], jnp.sin(th)[0]  # (T,)
            K = np.array(
                [
                    [0.0, -axes[j][2], axes[j][1]],
                    [axes[j][2], 0.0, -axes[j][0]],
                    [-axes[j][1], axes[j][0], 0.0],
                ],
                np.float64,
            )
            outer = np.outer(axes[j], axes[j]).astype(np.float64)
            I3 = np.eye(3)
            # Rodrigues entrywise from scalar coefficients (no captured
            # array constants allowed inside a Pallas kernel)
            rows = []
            for a_ in range(3):
                row = []
                for b_ in range(3):
                    e = jnp.zeros_like(c)
                    if I3[a_, b_] != 0.0:
                        e = e + float(I3[a_, b_]) * c
                    if K[a_, b_] != 0.0:
                        e = e + float(K[a_, b_]) * s
                    if outer[a_, b_] != 0.0:
                        e = e + float(outer[a_, b_]) * (1.0 - c)
                    row.append(e)
                rows.append(jnp.stack(row, axis=0))
            Rrot = jnp.stack(rows, axis=0)  # (3, 3, T)
            Rs.append(_m3m(_m3m_const_r(Rs[b], jrot[j]), Rrot))
            ps.append(ps[b] + _m3c(Rs[b], jpos[j]))
        v_lin0 = _m3v(R0, v[0:3])
        om0 = _m3v(R0, v[3:6])
        oms, vels, aws = [om0], [v_lin0], []
        for j in range(nj):
            b = parent[j]
            body = j + 1
            a_w = _m3c(Rs[body], axes[j])
            aws.append(a_w)
            r = ps[body] - ps[b]
            oms.append(oms[b] + a_w * v[6 + j : 7 + j, :])
            vels.append(vels[b] + _cross(oms[b], r))
        return Rs, ps, oms, vels, aws

    def centroidal(Rs, ps, oms, vels):
        """(com, h_lin, h_ang), each (3, T), plus per-body caches."""
        c_offs, c_ws, v_coms, I_ws = [], [], [], []
        com = 0.0
        for b in range(nb):
            c_off = _m3c(Rs[b], coms[b])
            c_w = ps[b] + c_off
            v_com = vels[b] + _cross(oms[b], c_off)
            I_w = _m3m(_m3m_const_r(Rs[b], inertias[b]), jnp.swapaxes(Rs[b], 0, 1))
            # note: R I R^T with R (3,3,T): swapaxes(0,1) transposes sublanes
            c_offs.append(c_off)
            c_ws.append(c_w)
            v_coms.append(v_com)
            I_ws.append(I_w)
            com = com + masses[b] * c_w
        com = com / M_tot
        h_lin = 0.0
        h_ang = 0.0
        for b in range(nb):
            h_lin = h_lin + masses[b] * v_coms[b]
            h_ang = h_ang + _m3v(I_ws[b], oms[b]) + masses[b] * _cross(
                c_ws[b] - com, v_coms[b]
            )
        return com, h_lin, h_ang, (c_offs, c_ws, v_coms, I_ws)

    def foot_positions(Rs, ps):
        return [ps[f.body] + _m3c(Rs[f.body], f.pos) for f in feet]

    def residuals(x, k_ee_t, k_com, k_mom, k_xreg):
        """Stage residual r (nr, T) given targets for one knot."""
        q, v = x[:nq], x[nq:]
        Rs, ps, oms, vels, _ = fk_vel(q, v)
        com, h_lin, h_ang, _ = centroidal(Rs, ps, oms, vels)
        pf = foot_positions(Rs, ps)
        r_ee = jnp.concatenate([pf[i] - k_ee_t[i] for i in range(ne)], axis=0)
        r_com = com - k_com
        r_mom = jnp.concatenate([h_lin, h_ang], axis=0) - k_mom
        dv_b, dw_b = _se3_difference(k_xreg[0:3], k_xreg[3:7], q[0:3], q[3:7])
        sdiff = jnp.concatenate(
            [dv_b, dw_b, q[7:] - k_xreg[7:nq], v - k_xreg[nq:]], axis=0
        )
        return jnp.concatenate([r_ee, r_com, r_mom, sdiff], axis=0)

    def step(x, u, dt):
        """Semi-implicit Euler; dt (1, T)."""
        q, v = x[:nq], x[nq:]
        v_next = v + u * dt
        p_new, q_new = _se3_integrate(
            q[0:3], q[3:7], v_next[0:3] * dt, v_next[3:6] * dt
        )
        th_new = q[7:] + v_next[6:] * dt
        return jnp.concatenate([p_new, q_new, th_new, v_next], axis=0)

    def state_diff(x1, x2):
        dv_b, dw_b = _se3_difference(x1[0:3], x1[3:7], x2[0:3], x2[3:7])
        return jnp.concatenate(
            [dv_b, dw_b, x2[7:nq] - x1[7:nq], x2[nq:] - x1[nq:]], axis=0
        )

    # --- tangent propagation: all Gauss-Newton Jacobian q-rows in one pass ---

    def q_tangent_rows(q, v, Rs, ps, oms, vels, aws, cent_cache):
        """Returns (J_ee_rows (3ne, nv, T), J_com (3, nv, T), J_h (6, nv, T))
        — derivatives wrt the configuration tangent (hand-written 18-wide JVP
        of fk_vel + centroidal + foot_positions)."""
        T = q.shape[-1]
        D = nv
        R0 = Rs[0]
        zero3 = jnp.zeros((D, 3, T), jnp.float32)
        # seeds: w~_0[d] = R0 e_{d-3} for d in 3..6; dp_0[d] = R0 e_d for d < 3
        cols = [R0[:, i, :] for i in range(3)]  # (3, T) columns of R0
        zpad = jnp.zeros((nj, 3, T), jnp.float32)
        dp0 = jnp.concatenate(
            [jnp.stack(cols, axis=0), jnp.zeros((3, 3, T), jnp.float32), zpad], axis=0
        )
        wt0 = jnp.concatenate(
            [jnp.zeros((3, 3, T), jnp.float32), jnp.stack(cols, axis=0), zpad], axis=0
        )
        wts, dps = [wt0], [dp0]
        for j in range(nj):
            b = parent[j]
            body = j + 1
            # one-hot joint tangent enters the child rotation
            wt_b = wts[b]
            aw_row = aws[j][None]  # (1, 3, T)
            segs = [wt_b[: 6 + j], wt_b[6 + j : 7 + j] + aw_row]
            if 7 + j < D:  # Mosaic rejects 0-sized vectors in concat
                segs.append(wt_b[7 + j :])
            wt_body = jnp.concatenate(segs, axis=0)
            dp_body = dps[b] + _cross(wts[b], _m3c(Rs[b], jpos[j])[None])
            wts.append(wt_body)
            dps.append(dp_body)
        # velocity tangents
        dom0 = _cross(wt0, oms[0][None])
        dvel0 = _cross(wt0, vels[0][None])
        doms, dvels = [dom0], [dvel0]
        for j in range(nj):
            b = parent[j]
            body = j + 1
            daw = _cross(wts[body], aws[j][None])
            r = (ps[body] - ps[b])[None]
            dom = doms[b] + daw * v[6 + j : 7 + j, :][None]
            dvel = dvels[b] + _cross(doms[b], r) + _cross(oms[b][None], dps[body] - dps[b])
            doms.append(dom)
            dvels.append(dvel)
        # centroidal tangents
        c_offs, c_ws, v_coms, I_ws = cent_cache
        dcom = 0.0
        dc_ws, dv_coms = [], []
        for b in range(nb):
            dc_off = _cross(wts[b], c_offs[b][None])
            dc_w = dps[b] + dc_off
            dv_com = dvels[b] + _cross(doms[b], c_offs[b][None]) + _cross(
                oms[b][None], dc_off
            )
            dc_ws.append(dc_w)
            dv_coms.append(dv_com)
            dcom = dcom + masses[b] * dc_w
        dcom = dcom / M_tot
        dh_lin = 0.0
        dh_ang = 0.0
        for b in range(nb):
            dh_lin = dh_lin + masses[b] * dv_coms[b]
            # dI_w = w~^ I_w - I_w w~^  (applied to om) + I_w dom
            Iw = I_ws[b][None]
            Iom = _m3v(I_ws[b], oms[b])[None]
            dI_om = _cross(wts[b], Iom) - _m3v(Iw, _cross(wts[b], oms[b][None]))
            dh_ang = (
                dh_ang
                + dI_om
                + _m3v(Iw, doms[b])
                + masses[b] * _cross(dc_ws[b] - dcom, v_coms[b][None])
                + masses[b] * _cross((c_ws[b])[None] - _sum_com(c_ws)[None], dv_coms[b])
            )
        # foot-position tangents
        dpf = []
        for f in feet:
            dpf.append(dps[f.body] + _cross(wts[f.body], _m3c(Rs[f.body], f.pos)[None]))
        # rows: component i across tangents d -> (D, T) slices
        J_ee = jnp.concatenate([jnp.swapaxes(d, 0, 1) for d in dpf], axis=0)
        J_com = jnp.swapaxes(dcom, 0, 1)
        J_h = jnp.concatenate(
            [jnp.swapaxes(dh_lin, 0, 1), jnp.swapaxes(dh_ang, 0, 1)], axis=0
        )
        return J_ee, J_com, J_h

    def _sum_com(c_ws):
        com = 0.0
        for b in range(nb):
            com = com + masses[b] * c_ws[b]
        return com / M_tot

    def v_tangent_rows(v, Rs, ps, oms, vels, aws, cent_cache):
        """Ag rows: dh/dv (6, nv, T) (linear in v; no FK tangents)."""
        T = v.shape[-1]
        D = nv
        R0 = Rs[0]
        cols = [R0[:, i, :] for i in range(3)]
        zpad = jnp.zeros((nj, 3, T), jnp.float32)
        dvel0 = jnp.concatenate(
            [jnp.stack(cols, axis=0), jnp.zeros((3, 3, T), jnp.float32), zpad], axis=0
        )
        dom0 = jnp.concatenate(
            [jnp.zeros((3, 3, T), jnp.float32), jnp.stack(cols, axis=0), zpad], axis=0
        )
        doms, dvels = [dom0], [dvel0]
        for j in range(nj):
            b = parent[j]
            body = j + 1
            r = (ps[body] - ps[b])[None]
            aw_row = aws[j][None]
            dom_b = doms[b]
            segs = [dom_b[: 6 + j], dom_b[6 + j : 7 + j] + aw_row]
            if 7 + j < D:  # Mosaic rejects 0-sized vectors in concat
                segs.append(dom_b[7 + j :])
            dom = jnp.concatenate(segs, axis=0)
            dvel = dvels[b] + _cross(doms[b], r)
            doms.append(dom)
            dvels.append(dvel)
        c_offs, c_ws, v_coms, I_ws = cent_cache
        com = _sum_com(c_ws)
        dh_lin = 0.0
        dh_ang = 0.0
        for b in range(nb):
            dv_com = dvels[b] + _cross(doms[b], c_offs[b][None])
            dh_lin = dh_lin + masses[b] * dv_com
            dh_ang = dh_ang + _m3v(I_ws[b][None], doms[b]) + masses[b] * _cross(
                (c_ws[b] - com)[None], dv_com
            )
        return jnp.concatenate(
            [jnp.swapaxes(dh_lin, 0, 1), jnp.swapaxes(dh_ang, 0, 1)], axis=0
        )

    n_alpha = len(cfg.alphas)
    alphas_np = np.asarray(cfg.alphas, np.float32)

    def kernel(
        x0_ref,  # (nq+nv, T)
        ee_t_ref,  # (H, ne, 3, T)
        com_ref_ref,  # (H+1, 3, T)
        mom_ref_ref,  # (H+1, 6, T)
        xreg_ref,  # (H+1, nq+nv, T)
        wstage_ref,  # (H, nr, T)
        wterm_ref,  # (nrt, T)
        wu_ref,  # (H, nv, T)
        dts_ref,  # (H, T)
        xs_ref,  # out (H+1, nq+nv, T)
        us_ref,  # out (H, nv, T)
        cost_ref,  # out (1, T)
        kff_ref,  # scratch (H, nv, T)
        kfb_ref,  # scratch (H, nv, ndx, T)
        xs2_ref,  # scratch (H+1, nq+nv, T)
        us2_ref,  # scratch (H, nv, T)
    ):
        T = LANES
        x0 = x0_ref[:]
        com_t = com_ref_ref[:]
        mom_t = mom_ref_ref[:]
        xreg = xreg_ref[:]
        wterm = wterm_ref[:]

        def knot_targets(k):
            # dynamic per-knot reads go through the refs (Mosaic TC has no
            # value-level dynamic_slice; ref indexing with pl.ds lowers to
            # dynamic VMEM loads)
            e = ee_t_ref[pl.ds(k, 1)][0]  # (ne, 3, T)
            c = com_ref_ref[pl.ds(k, 1)][0]
            m = mom_ref_ref[pl.ds(k, 1)][0]
            xr = xreg_ref[pl.ds(k, 1)][0]
            w = wstage_ref[pl.ds(k, 1)][0]
            wu = wu_ref[pl.ds(k, 1)][0]
            dt = dts_ref[pl.ds(k, 1)]  # (1, T)
            return [e[i] for i in range(ne)], c, m, xr, w, wu, dt

        def stage_cost(x, u, k):
            e, c, m, xr, w, wu, dt = knot_targets(k)
            r = residuals(x, e, c, m, xr)
            return dt * 0.5 * (
                jnp.sum(w * r * r, axis=0, keepdims=True)
                + jnp.sum(wu * u * u, axis=0, keepdims=True)
            )

        def term_residual(x):
            q, v = x[:nq], x[nq:]
            Rs, ps, oms, vels, _ = fk_vel(q, v)
            com, h_lin, h_ang, _ = centroidal(Rs, ps, oms, vels)
            xr = xreg[H]
            dv_b, dw_b = _se3_difference(xr[0:3], xr[3:7], q[0:3], q[3:7])
            sdiff = jnp.concatenate(
                [dv_b, dw_b, q[7:] - xr[7:nq], v - xr[nq:]], axis=0
            )
            return jnp.concatenate(
                [com - com_t[H], jnp.concatenate([h_lin, h_ang], axis=0) - mom_t[H], sdiff],
                axis=0,
            )

        def term_cost(x):
            r = term_residual(x)
            return 0.5 * jnp.sum(wterm * r * r, axis=0, keepdims=True)

        # ---- forward rollout (alpha (1, T); store=True writes xs2/us2) ----

        def rollout(alpha, store):
            def body(k, carry):
                x, c = carry
                x_ref_k = xs_ref[pl.ds(k, 1)][0]
                u_ref_k = us_ref[pl.ds(k, 1)][0]
                kff = kff_ref[pl.ds(k, 1)][0]
                kfb = kfb_ref[pl.ds(k, 1)][0]
                dx = state_diff(x_ref_k, x)
                u = u_ref_k + alpha * kff + _mv(kfb, dx)
                c = c + stage_cost(x, u, k)
                _, _, _, _, _, _, dt = knot_targets(k)
                x_next = step(x, u, dt)
                if store:
                    us2_ref[pl.ds(k, 1)] = u[None]
                    xs2_ref[pl.ds(k + 1, 1)] = x_next[None]
                return (x_next, c)

            c0 = jnp.zeros((1, T), jnp.float32)
            if store:
                xs2_ref[pl.ds(0, 1)] = x0[None]
            xN, c = jax.lax.fori_loop(0, H, body, (x0, c0))
            return c + term_cost(xN)

        # ---- Gauss-Newton stage data + Riccati backward ----

        def backward():
            # terminal Vx, Vxx from terminal rows
            xN = xs_ref[:][H]
            qN, vN = xN[:nq], xN[nq:]
            Rs, ps, oms, vels, aws = fk_vel(qN, vN)
            com, h_lin, h_ang, cache = centroidal(Rs, ps, oms, vels)
            _, J_com, J_h = q_tangent_rows(qN, vN, Rs, ps, oms, vels, aws, cache)
            Ag = v_tangent_rows(vN, Rs, ps, oms, vels, aws, cache)
            rt = term_residual(xN)
            xrN = xreg[H]
            dN = state_diff(xrN, xN)
            B6 = _se3_Jr_inv(dN[0:3], dN[3:6])  # (6, 6, T)

            # rows of Jt: [com(3), h(6), sdiff(ndx)] — build Vx, Vxx directly
            Vx, Vxx = _gn_accumulate(
                None,
                J_com,
                J_h,
                Ag,
                B6,
                rt,
                wterm,
                jnp.ones((1, T), jnp.float32),
                terminal=True,
            )

            def body(i, carry):
                Vx, Vxx = carry
                k = H - 1 - i
                x = xs_ref[pl.ds(k, 1)][0]
                u = us_ref[pl.ds(k, 1)][0]
                e, c_t, m_t, xr, w, wu, dt = knot_targets(k)
                q, v = x[:nq], x[nq:]
                Rs, ps, oms, vels, aws = fk_vel(q, v)
                com, h_lin, h_ang, cache = centroidal(Rs, ps, oms, vels)
                J_ee, J_com, J_h = q_tangent_rows(q, v, Rs, ps, oms, vels, aws, cache)
                Ag = v_tangent_rows(v, Rs, ps, oms, vels, aws, cache)
                pf = foot_positions(Rs, ps)
                r_ee = jnp.concatenate([pf[i2] - e[i2] for i2 in range(ne)], axis=0)
                dv_b, dw_b = _se3_difference(xr[0:3], xr[3:7], q[0:3], q[3:7])
                sdiff = jnp.concatenate(
                    [dv_b, dw_b, q[7:] - xr[7:nq], v - xr[nq:]], axis=0
                )
                r = jnp.concatenate(
                    [
                        r_ee,
                        com - c_t,
                        jnp.concatenate([h_lin, h_ang], axis=0) - m_t,
                        sdiff,
                    ],
                    axis=0,
                )
                d_sd = jnp.concatenate([sdiff[0:nv], jnp.zeros((nv, T), jnp.float32)], 0)
                B6 = _se3_Jr_inv(sdiff[0:3], sdiff[3:6])
                Lx, Lxx = _gn_accumulate(J_ee, J_com, J_h, Ag, B6, r, w, dt)

                # dynamics base blocks
                v_next = v + u * dt
                w6 = v_next[0:6] * dt
                A6 = _se3_adjoint_exp(-w6[0:3], -w6[3:6])
                Jr6 = _se3_Jr(w6[0:3], w6[3:6])
                B6d = Jr6 * dt[None]
                C6 = Jr6 * (dt * dt)[None]

                Lu = dt * wu * u
                Luu_d = dt * wu  # diagonal (nv, T)

                Vx_new, Vxx_new, kff, Kfb = _riccati_step(
                    Lx, Lxx, Lu, Luu_d, A6, B6d, C6, dt, Vx, Vxx
                )
                kff_ref[pl.ds(k, 1)] = kff[None]
                kfb_ref[pl.ds(k, 1)] = Kfb[None]
                return (Vx_new, Vxx_new)

            jax.lax.fori_loop(0, H, body, (Vx, Vxx))

        # ---- Gauss-Newton accumulation helpers (defined inline for closure) --

        def _gn_accumulate(J_ee, J_com, J_h, Ag, B6, r, w, dt, terminal=False):
            """Lx (ndx, T) and Lxx (ndx, ndx, T) = dt * (J' W r, J' W J) using
            the row structure: [ee(3ne) | com(3) | h(6) | sdiff(ndx)] (stage)
            or [com | h | sdiff] (terminal). q-rows of sdiff: base = B6 cols,
            joints = identity; v-rows identity. h has both q-rows (J_h) and
            v-rows (Ag)."""
            T = r.shape[-1]
            off = 0 if terminal else 3 * ne
            gq = jnp.zeros((nv, T), jnp.float32)
            gv = jnp.zeros((nv, T), jnp.float32)
            Hqq = jnp.zeros((nv, nv, T), jnp.float32)
            Hqv = jnp.zeros((nv, nv, T), jnp.float32)
            Hvv = jnp.zeros((nv, nv, T), jnp.float32)

            def outer(a, b):
                return a[:, None, :] * b[None, :, :]

            if not terminal:
                for i in range(3 * ne):
                    wr = w[i : i + 1]
                    row = J_ee[i]  # (nv, T)
                    gq = gq + row * (wr * r[i : i + 1])
                    Hqq = Hqq + outer(row * wr, row)
            for i in range(3):  # com rows
                wr = w[off + i : off + i + 1]
                row = J_com[i]
                gq = gq + row * (wr * r[off + i : off + i + 1])
                Hqq = Hqq + outer(row * wr, row)
            for i in range(6):  # momentum rows: q-part J_h, v-part Ag
                wr = w[off + 3 + i : off + 4 + i]
                rq = J_h[i]
                rv = Ag[i]
                rr = r[off + 3 + i : off + 4 + i]
                gq = gq + rq * (wr * rr)
                gv = gv + rv * (wr * rr)
                Hqq = Hqq + outer(rq * wr, rq)
                Hqv = Hqv + outer(rq * wr, rv)
                Hvv = Hvv + outer(rv * wr, rv)
            # sdiff rows
            so = off + 9
            ws_q = w[so : so + nv]  # (nv, T)
            ws_v = w[so + nv : so + 2 * nv]
            r_q = r[so : so + nv]
            r_v = r[so + nv : so + 2 * nv]
            # base block: rows i<6 have q-cols = B6[i]; joints identity
            for i in range(6):
                row6 = B6[i]  # (6, T)
                row = jnp.concatenate([row6, jnp.zeros((nj, T), jnp.float32)], axis=0)
                gq = gq + row * (ws_q[i : i + 1] * r_q[i : i + 1])
                Hqq = Hqq + outer(row * ws_q[i : i + 1], row)
            # joint identity rows: diagonal adds (identity via iota — Pallas
            # forbids captured array constants)
            eyev = _eye_lane(nv)
            gq = gq + jnp.concatenate(
                [jnp.zeros((6, T), jnp.float32), ws_q[6:] * r_q[6:]], axis=0
            )
            wq_diag = jnp.concatenate(
                [jnp.zeros((6, T), jnp.float32), ws_q[6:]], axis=0
            )
            Hqq = Hqq + eyev * wq_diag[:, None, :]
            # v identity rows
            gv = gv + ws_v * r_v
            Hvv = Hvv + eyev * ws_v[:, None, :]

            if terminal:
                Vx = jnp.concatenate([gq, gv], axis=0)
                Vxx = jnp.concatenate(
                    [
                        jnp.concatenate([Hqq, Hqv], axis=1),
                        jnp.concatenate([jnp.swapaxes(Hqv, 0, 1), Hvv], axis=1),
                    ],
                    axis=0,
                )
                return Vx, Vxx
            Lx = dt * jnp.concatenate([gq, gv], axis=0)
            Lxx = dt[None] * jnp.concatenate(
                [
                    jnp.concatenate([Hqq, Hqv], axis=1),
                    jnp.concatenate([jnp.swapaxes(Hqv, 0, 1), Hvv], axis=1),
                ],
                axis=0,
            )
            return Lx, Lxx

        def _blk_mulT_left(M6, s, X):
            """blkdiag(M6, s*I)^T @ X for X (nv, n, T): rows 0..5 mix via M6."""
            top = _mm(jnp.swapaxes(M6, 0, 1), X[0:6])
            return jnp.concatenate([top, s * X[6:]], axis=0)

        def _blk_mul_right(X, M6, s):
            """X @ blkdiag(M6, s*I) for X (n, nv, T): cols 0..5 mix via M6."""
            # two-step indexing: slice+newaxis in one bracket lowers to an ND
            # gather, which Mosaic TC rejects
            left = jnp.sum(X[:, 0:6][:, :, None, :] * M6[None, :, :, :], axis=1)
            return jnp.concatenate([left, s * X[:, 6:]], axis=1)

        def _blkT_vec(M6, s, x):
            """blkdiag(M6, s*I)^T @ x for x (nv, T)."""
            top = _mtv(M6, x[0:6])
            return jnp.concatenate([top, s * x[6:]], axis=0)

        def _riccati_step(Lx, Lxx, Lu, Luu_d, A6, B6d, C6, dt, Vx, Vxx):
            """One structured Riccati update. Fx = [[A, B],[0, I]],
            Fu = [[C],[dt I]], A/B/C = blkdiag(6x6, s*I) with s = 1/dt/dt^2."""
            T = Lx.shape[-1]
            V11 = Vxx[0:nv, 0:nv]
            V12 = Vxx[0:nv, nv:]
            V21 = Vxx[nv:, 0:nv]
            V22 = Vxx[nv:, nv:]
            Vx1, Vx2 = Vx[0:nv], Vx[nv:]

            # A^T V11, B^T V11, C^T V11 (nv, nv, T)
            AtV11 = _blk_mulT_left(A6, 1.0, V11)
            BtV11 = _blk_mulT_left(B6d, dt, V11)
            CtV11 = _blk_mulT_left(C6, dt * dt, V11)

            Qxx_qq = _blk_mul_right(AtV11, A6, 1.0)
            Qxx_qv = _blk_mul_right(AtV11, B6d, dt) + _blk_mulT_left(A6, 1.0, V12)
            Qxx_vv = (
                _blk_mul_right(BtV11, B6d, dt)
                + _blk_mulT_left(B6d, dt, V12)
                + _blk_mul_right(V21, B6d, dt)
                + V22
            )
            Qxx = Lxx + jnp.concatenate(
                [
                    jnp.concatenate([Qxx_qq, Qxx_qv], axis=1),
                    jnp.concatenate([jnp.swapaxes(Qxx_qv, 0, 1), Qxx_vv], axis=1),
                ],
                axis=0,
            )
            # Qu, Quu, Qux
            FuTVx = _blkT_vec(C6, dt * dt, Vx1) + dt * Vx2
            Qu = Lu + FuTVx
            CtV11_dtV21 = CtV11 + dt * V21  # (nv, nv, T) == Fu^T [V11; V21]
            Quu = (
                _blk_mul_right(CtV11, C6, dt * dt)
                + dt * _blk_mulT_left(C6, dt * dt, V12)
                + dt * _blk_mul_right(V21, C6, dt * dt)
                + (dt * dt) * V22
            )
            Quu = Quu + _eye_lane(nv) * (Luu_d[:, None, :] + cfg.reg)
            Qux_q = _blk_mul_right(CtV11_dtV21, A6, 1.0)
            Qux_v = _blk_mul_right(CtV11_dtV21, B6d, dt) + (
                _blk_mulT_left(C6, dt * dt, V12) + dt * V22
            )
            Qux = jnp.concatenate([Qux_q, Qux_v], axis=1)  # (nv, ndx, T)
            Qx = Lx + jnp.concatenate(
                [_blkT_vec(A6, 1.0, Vx1), _blkT_vec(B6d, dt, Vx1) + Vx2], axis=0
            )

            # Cholesky of Quu (nv x nv), columnwise with rank-1 updates
            Mq = Quu
            Lcols = []
            for j in range(nv):
                cj = Mq[:, j]  # (nv, T)
                djj = cj[j : j + 1]
                inv_sqrt = jax.lax.rsqrt(jnp.maximum(djj, 1e-20))
                l = cj * inv_sqrt
                mask = (
                    jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0) >= j
                ).astype(jnp.float32)
                l = l * mask
                Lcols.append(l)
                Mq = Mq - l[:, None, :] * l[None, :, :]
            Lmat = jnp.stack(Lcols, axis=1)  # (nv, nv, T) lower-triangular

            # solve L y = rhs (forward), L^T z = y (backward) for
            # rhs = [Qu (nv,T) | Qux (nv,ndx,T)] together
            rhs = jnp.concatenate([Qu[:, None, :], Qux], axis=1)  # (nv, 1+ndx, T)
            ys = []
            for i2 in range(nv):
                acc = rhs[i2]
                for k2 in range(i2):
                    acc = acc - Lmat[i2, k2][None] * ys[k2]
                ys.append(acc / Lmat[i2, i2][None])
            zs = [None] * nv
            for i2 in reversed(range(nv)):
                acc = ys[i2]
                for k2 in range(i2 + 1, nv):
                    acc = acc - Lmat[k2, i2][None] * zs[k2]
                zs[i2] = acc / Lmat[i2, i2][None]
            sol = jnp.stack(zs, axis=0)  # (nv, 1+ndx, T)
            kff = -sol[:, 0, :]
            Kfb = -sol[:, 1:, :]

            Vx_new = Qx + jnp.sum(Kfb * Qu[:, None, :], axis=0)
            # K^T Qux as an accumulated loop of (ndx, ndx, T) outer products:
            # the one-shot broadcast would materialize (nv, ndx, ndx, T)
            # = 11.9 MB and blow the ~16 MB VMEM budget
            KtQux = Qxx
            for k3 in range(nv):
                KtQux = KtQux + Kfb[k3 : k3 + 1].swapaxes(0, 1) * Qux[k3 : k3 + 1]
            Vxx_new = KtQux
            Vxx_new = 0.5 * (Vxx_new + jnp.swapaxes(Vxx_new, 0, 1))
            return Vx_new, Vxx_new, kff, Kfb

        # ---- main DDP loop ----

        # zero gains, nominal rollout (us_ref starts at zero)
        us_ref[:] = jnp.zeros((H, nv, LANES), jnp.float32)
        xs_ref[:] = jnp.concatenate(
            [x0[None], jnp.zeros((H, nq + nv, LANES), jnp.float32)], axis=0
        )
        kff_ref[:] = jnp.zeros((H, nv, LANES), jnp.float32)
        kfb_ref[:] = jnp.zeros((H, nv, ndx, LANES), jnp.float32)
        cost = rollout(jnp.zeros((1, LANES), jnp.float32), store=True)
        xs_ref[:] = xs2_ref[:]
        us_ref[:] = us2_ref[:]

        def ddp_iter(_, cost):
            backward()
            # cost-only line search over the alpha grid
            def try_alpha(j, best):
                best_cost, best_alpha = best
                # select alphas[j] by scalar folding (no captured const array)
                a_sel = jnp.zeros((), jnp.float32)
                for i3, a3 in enumerate(alphas_np):
                    a_sel = jnp.where(j == i3, float(a3), a_sel)
                alpha = jnp.broadcast_to(a_sel, (1, LANES))
                c = rollout(alpha, store=False)
                better = (c < best_cost).astype(jnp.float32)
                return (
                    better * c + (1.0 - better) * best_cost,
                    better * alpha + (1.0 - better) * best_alpha,
                )

            big = jnp.full((1, LANES), 3.0e38, jnp.float32)
            best_cost, best_alpha = jax.lax.fori_loop(
                0, n_alpha, try_alpha, (big, jnp.zeros((1, LANES), jnp.float32))
            )
            # one storing rollout at the per-lane best alpha
            c_store = rollout(best_alpha, store=True)
            improved = (c_store < cost).astype(jnp.float32)
            m3 = improved[None]
            xs_ref[:] = m3 * xs2_ref[:] + (1.0 - m3) * xs_ref[:]
            us_ref[:] = m3 * us2_ref[:] + (1.0 - m3) * us_ref[:]
            return jnp.minimum(cost, c_store)

        cost = jax.lax.fori_loop(0, cfg.n_iters, ddp_iter, cost)
        cost_ref[:] = cost

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------


def solve_ik_batch(
    model,
    eff_frames,
    x0,  # (B, nq+nv)
    ee_targets,  # (B, H, ne, 3)
    com_ref,  # (B, H+1, 3)
    mom_ref,  # (B, H+1, 6)
    x_reg,  # (B, H+1, nq+nv)
    w_stage,  # (B, H, nr) full stage residual weights
    w_term,  # (B, nrt)
    ctrl_weight,  # (B, H, nv)
    dts,  # (B, H)
    cfg: PallasDdpConfig = PallasDdpConfig(),
):
    """Batched kinematic GN-DDP via the fused kernel.

    Returns (xs (B, H+1, nq+nv), us (B, H, nv), cost (B,)). Batches that are
    not a multiple of the 128-lane width are zero-padded internally."""
    B, H = dts.shape
    nq, nv = model.nq, model.nv
    if B % LANES != 0:
        pad = LANES - B % LANES
        padded = solve_ik_batch(
            model,
            eff_frames,
            *(
                jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], 0)
                for a in (
                    x0, ee_targets, com_ref, mom_ref, x_reg,
                    w_stage, w_term, ctrl_weight, dts,
                )
            ),
            cfg=cfg,
        )
        return tuple(a[:B] for a in padded)
    G = B // LANES
    f32 = jnp.float32

    def to_lanes(a):
        a = jnp.asarray(a, f32).reshape((G, LANES) + a.shape[1:])
        return jnp.moveaxis(a, 1, -1)

    ins = [
        to_lanes(x0),
        to_lanes(ee_targets),
        to_lanes(com_ref),
        to_lanes(mom_ref),
        to_lanes(x_reg),
        to_lanes(w_stage),
        to_lanes(w_term),
        to_lanes(ctrl_weight),
        to_lanes(dts),
    ]

    kern = _build_kernel(model, eff_frames, H, cfg)
    grid = (G,)

    def spec_for(a):
        blk = a.shape[1:]
        return pl.BlockSpec((1,) + blk, lambda i: (i,) + (0,) * len(blk))

    out_shape = [
        jax.ShapeDtypeStruct((G, H + 1, nq + nv, LANES), f32),
        jax.ShapeDtypeStruct((G, H, nv, LANES), f32),
        jax.ShapeDtypeStruct((G, 1, LANES), f32),
    ]
    out_specs = [spec_for(jnp.zeros(s.shape)) for s in out_shape]

    from jax.experimental.pallas import tpu as pltpu

    scratch_shapes = [
        pltpu.VMEM((H, nv, LANES), f32),  # kff
        pltpu.VMEM((H, nv, 2 * nv, LANES), f32),  # Kfb
        pltpu.VMEM((H + 1, nq + nv, LANES), f32),  # xs candidate
        pltpu.VMEM((H, nv, LANES), f32),  # us candidate
    ]

    def kernel_wrap(*refs):
        kern(*[_SqueezeRef(r) for r in refs[: len(ins) + 3]], *refs[len(ins) + 3 :])

    xs_l, us_l, cost_l = pl.pallas_call(
        kernel_wrap,
        grid=grid,
        in_specs=[spec_for(a) for a in ins],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=cfg.interpret,
    )(*ins)

    def from_lanes(a):
        a = jnp.moveaxis(a, -1, 1)
        return a.reshape((B,) + a.shape[2:])

    return from_lanes(xs_l), from_lanes(us_l), from_lanes(cost_l)[:, 0]
