"""Kinematic-IK cost assembly for the DDP sweep.

TPU-native twin of the reference IK task API (reference
src/ik/inverse_kinematics.cpp + src/ik/{com_tasks,end_effector_tasks,
regularization_costs}.cpp, driven from examples/mpc/abstract_cyclic_gen.py:
545-562 and src/motion_planner/kino_dyn.cpp:53-56).

Instead of mutable cost containers populated by ``add_*`` calls, the stage
cost is one fixed-shape weighted residual vector per knot:

    r_k = [ ee-position residuals (n_eff*3) — weight swing_wt[0] on contact
            knots (target = planned contact location) or swing_wt[1] on
            via knots (target z lifted to step height), 0 otherwise;
            CoM tracking (3)        — weight cent_wt[0], target from ADMM;
            momentum tracking (6)   — weight cent_wt[1], target from ADMM;
            state regularization (2nv) — weight reg_wt[0]*state_wt ]

which reproduces crocoddyl's CostModelSum of CostModelResidual terms exactly
(Gauss-Newton, weighted-quad activations) while keeping every shape static.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..kin import algorithms as K
from ..robots.model import RobotModel
from ..solvers import ddp


@dataclasses.dataclass(frozen=True)
class IkTasks:
    """Per-solve IK task data (all arrays, single sample; vmap for batches).

    ``state_wt``/``x_reg``/``reg_wt_state``/``ctrl_wt``/``reg_wt_ctrl`` may be
    single vectors/scalars (cyclic gaits) or per-knot arrays with a leading
    (H+1,) / (H,) axis (acyclic motions with time-windowed regularization,
    reference abstract_acyclic_gen.py:222-283)."""

    ee_targets: jnp.ndarray  # (H, n_eff, 3) tracked foot positions
    ee_wts: jnp.ndarray  # (H, n_eff) per-knot per-foot weights
    com_ref: jnp.ndarray  # (H+1, 3) from the dynamics solve
    mom_ref: jnp.ndarray  # (H+1, 6) [lin(3), ang(3)] momentum targets
    com_wt: jnp.ndarray  # () cent_wt[0]
    mom_wt: jnp.ndarray  # () cent_wt[1]
    state_wt: jnp.ndarray  # (2nv,) or (H+1, 2nv)
    x_reg: jnp.ndarray  # (nq+nv,) or (H+1, nq+nv)
    reg_wt_state: float | jnp.ndarray  # scalar or (H+1,)
    reg_wt_ctrl: float | jnp.ndarray  # scalar or (H,)
    ctrl_wt: jnp.ndarray  # (nv,) or (H, nv)
    dts: jnp.ndarray  # (H,)


def build_residual_fns(model: RobotModel, eff_frames, tasks: IkTasks):
    """Returns (stage_residuals(x, k), term_residuals(x), ctrl_weight (H, nv))."""
    H = tasks.ee_targets.shape[0]
    nq, nv = model.nq, model.nv

    state_wt = jnp.broadcast_to(tasks.state_wt, (H + 1, 2 * nv))
    x_reg = jnp.broadcast_to(tasks.x_reg, (H + 1, nq + nv))
    reg_wt_state = jnp.broadcast_to(jnp.asarray(tasks.reg_wt_state), (H + 1,))
    reg_wt_ctrl = jnp.broadcast_to(jnp.asarray(tasks.reg_wt_ctrl), (H,))
    ctrl_wt = jnp.broadcast_to(tasks.ctrl_wt, (H, nv))

    def split(x):
        return x[:nq], x[nq:]

    def common(x, k):
        q, v = split(x)
        com, h_lin, h_ang, ee = K.centroidal_state_and_frames(model, q, v, eff_frames)
        sdiff = ddp._state_diff(model, x_reg[k], x)
        return com, jnp.concatenate([h_lin, h_ang]), ee, sdiff

    def stage_residuals(x, k):
        com, h, ee, sdiff = common(x, k)
        r_ee = (ee - tasks.ee_targets[k]).reshape(-1)
        w_ee = jnp.repeat(tasks.ee_wts[k], 3)
        r_com = com - tasks.com_ref[k]
        r_mom = h - tasks.mom_ref[k]
        r = jnp.concatenate([r_ee, r_com, r_mom, sdiff])
        w = jnp.concatenate(
            [
                w_ee,
                jnp.full(3, tasks.com_wt, x.dtype),
                jnp.full(6, tasks.mom_wt, x.dtype),
                reg_wt_state[k] * state_wt[k],
            ]
        )
        return r, w

    def term_residuals(x):
        com, h, _, sdiff = common(x, H)
        r = jnp.concatenate([com - tasks.com_ref[H], h - tasks.mom_ref[H], sdiff])
        w = jnp.concatenate(
            [
                jnp.full(3, tasks.com_wt, x.dtype),
                jnp.full(6, tasks.mom_wt, x.dtype),
                reg_wt_state[H] * state_wt[H],
            ]
        )
        return r, w

    ctrl_weight = reg_wt_ctrl[:, None] * ctrl_wt
    return stage_residuals, term_residuals, ctrl_weight


def solve_ik(
    model: RobotModel,
    eff_frames,
    x0: jnp.ndarray,  # (nq+nv,)
    tasks: IkTasks,
    cfg: ddp.DdpConfig = ddp.DdpConfig(),
) -> ddp.DdpResult:
    """One kinematic DDP solve (reference InverseKinematics::optimize,
    src/ik/inverse_kinematics.cpp:54-71); us0 = 0 like crocoddyl's default."""
    stage, term, ctrl_w = build_residual_fns(model, eff_frames, tasks)
    H = tasks.dts.shape[0]
    us0 = jnp.zeros((H, model.nv), x0.dtype)
    return ddp.solve(model, x0, us0, tasks.dts, stage, ctrl_w, term, cfg)
