"""Acyclic motion planner tests (reference SoloAcyclicGen / motions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import acyclic as AC
from bunmpc_tpu.mpc.motions.solo12_acyclic import MOTIONS, jump_fwd, stand
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.solvers import biconvex, ddp


def _start_state():
    # acyclic motions are authored in the x=0.2 frame (reference
    # robot_properties config q0, plan_jump.py:15)
    q = jnp.asarray(Solo12Config.q0()).at[0].set(0.2)
    return q, jnp.zeros(18)


def test_motion_tables():
    for name, m in MOTIONS.items():
        assert m.n_col > 0
        assert len(m.dt_arr) == m.n_col
        cnt = np.asarray(m.cnt_plan)
        assert cnt.shape[1:] == (4, 6)
        # time windows tile [0, T] contiguously
        assert cnt[0, 0, 4] == 0.0
        for k in range(1, len(cnt)):
            assert cnt[k, 0, 4] == pytest.approx(cnt[k - 1, 0, 5])


def test_stand_solve_converges():
    model = Solo12Config.load_model()
    spec = AC.make_acyclic_spec(model, stand)
    q, v = _start_state()
    plan = jax.jit(
        lambda q, v: AC.solve_acyclic_mpc(
            spec, q, v, jnp.asarray(0.0),
            admm_cfg=biconvex.BiconvexConfig(rho=stand.rho, max_admm_iters=60),
            ddp_cfg=ddp.DdpConfig(n_iters=3),
        )
    )(q, v)
    assert float(plan.dyn_violation) < 2e-3
    X = np.asarray(plan.X_opt)
    # standing: com stays near (0.2, 0, 0.22)
    assert np.all(np.abs(X[:, 2] - 0.22) < 0.03)
    F = np.asarray(plan.F_opt)
    fz = F[..., 2].sum(-1)
    np.testing.assert_allclose(fz.mean(), 2.5 * 9.81, atol=3.0)


def test_jump_flight_phase():
    """During the flight window the contact plan is empty and the dyn plan
    ballistically loses upward momentum."""
    model = Solo12Config.load_model()
    spec = AC.make_acyclic_spec(model, jump_fwd)
    q, v = _start_state()
    plan = jax.jit(
        lambda q, v: AC.solve_acyclic_mpc(
            spec, q, v, jnp.asarray(0.0),
            admm_cfg=biconvex.BiconvexConfig(rho=jump_fwd.rho, max_admm_iters=80),
            ddp_cfg=ddp.DdpConfig(n_iters=3),
        )
    )(q, v)
    cnt = np.asarray(plan.cnt_plan[..., 0])
    # knots in [0.4, 0.7) s are flight (plan_jump.py cnt_plan)
    dt = jump_fwd.dt_arr[0]
    knot_times = np.arange(spec.horizon) * dt
    flight = (knot_times >= 0.4) & (knot_times < 0.7)
    assert cnt[flight].sum() == 0
    assert cnt[~flight].sum() > 0
    assert float(plan.dyn_violation) < 5e-3
