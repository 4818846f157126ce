"""Go2 robot support tests — the reference's second robot family
(robot_properties_go2) through the robot-agnostic MPC path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.kin import algorithms as K
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.go2_cyclic import trot as go2_trot
from bunmpc_tpu.robots.go2 import Go2Config
from bunmpc_tpu.solvers import biconvex, ddp


@pytest.fixture(scope="module")
def model():
    return Go2Config.load_model()


def test_go2_constants(model):
    assert model.n_joints == 12
    assert abs(model.total_mass - 15.097) < 0.01  # trunk + 4 legs + feet
    for name in Go2Config.eff_names:
        assert name in model.frames


def test_go2_dynamics_invariants(model):
    rng = np.random.default_rng(0)
    q = np.concatenate([rng.normal(size=3), [0.1, -0.2, 0.3, 0.9], rng.normal(size=12) * 0.4])
    q[3:7] /= np.linalg.norm(q[3:7])
    q = jnp.asarray(q)
    v = jnp.asarray(rng.normal(size=18) * 0.5)
    a = jnp.asarray(rng.normal(size=18))
    M = K.mass_matrix(model, q)
    assert float(jnp.max(jnp.abs(M - M.T))) < 1e-10
    assert float(jnp.linalg.eigvalsh(M).min()) > 0
    tau = K.rnea(model, q, v, a)
    bias = K.nonlinear_effects(model, q, v)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(M @ a + bias), atol=1e-10)


def test_go2_symmetry(model):
    """Left/right mirrored configurations give mirrored foot positions."""
    q0 = jnp.asarray(Go2Config.q0())
    feet = np.asarray(K.frame_positions(model, q0, Go2Config.eff_names))
    # FR vs FL mirror in y
    np.testing.assert_allclose(feet[0, [0, 2]], feet[1, [0, 2]], atol=1e-9)
    np.testing.assert_allclose(feet[0, 1], -feet[1, 1], atol=1e-9)
    # front vs rear mirror in x
    np.testing.assert_allclose(feet[0, 0], -feet[2, 0], atol=1e-9)


def test_go2_trot_mpc_solve(model):
    """The robot-agnostic kino-dyn MPC (reference abstract_cyclic_gen1.py
    path) must converge for the Go2."""
    spec = KD.make_cyclic_spec(
        model,
        go2_trot,
        Go2Config.q0(),
        eff_frames=tuple(Go2Config.eff_names),
        hip_frames=tuple(Go2Config.hip_names),
        foot_size=Go2Config.foot_size,
    )
    q = jnp.asarray(Go2Config.q0())
    v = jnp.zeros(18)
    plan = jax.jit(
        lambda q, v: KD.solve_mpc(
            spec, q, v, jnp.asarray(0.0), jnp.asarray([0.3, 0.0, 0.0]), jnp.asarray(0.0),
            admm_cfg=biconvex.BiconvexConfig(rho=go2_trot.rho, max_admm_iters=200),
            ddp_cfg=ddp.DdpConfig(n_iters=4),
        )
    )(q, v)
    # exit_tol is absolute; residual magnitudes scale with the 6x mass
    assert float(plan.dyn_violation) < 1e-2
    F = np.asarray(plan.F_opt)
    cnt = np.asarray(plan.cnt_plan[..., 0])
    fz_mean = (cnt * F[..., 2]).sum(-1).mean()
    # vertical force supports the 15 kg robot on average
    assert abs(fz_mean - 15.097 * 9.81) < 40.0


def test_default_schedule_converges_solo12_and_go2(model):
    """Round-3 'safe accelerated ADMM default-on' acceptance: the DEFAULT
    solver config (accelerated schedule + divergence backoff + exact
    X-solve, no per-robot opt-in) must reach the reference's 1e-3 exit tol
    on nominal trot windows of BOTH Solo12 and the 6x-heavier Go2 (which
    diverged under the round-2 fixed-cadence escalation)."""
    from bunmpc_tpu.mpc.motions.solo12_cyclic import trot as solo_trot
    from bunmpc_tpu.robots.solo12 import Solo12Config

    cases = []
    solo_model = Solo12Config.load_model()
    cases.append(
        ("solo12", KD.make_cyclic_spec(solo_model, solo_trot, Solo12Config.q0()),
         Solo12Config.q0())
    )
    cases.append(
        ("go2", KD.make_cyclic_spec(
            model, go2_trot, Go2Config.q0(),
            eff_frames=tuple(Go2Config.eff_names),
            hip_frames=tuple(Go2Config.hip_names),
            foot_size=Go2Config.foot_size), Go2Config.q0())
    )
    for name, spec, q0 in cases:
        q = jnp.asarray(q0, jnp.float32)
        v = jnp.zeros(18, jnp.float32)
        vd = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
        cfg = biconvex.BiconvexConfig(rho=spec.params.rho, x_solver="thomas")
        for tt in (0.0, 0.07):
            pr = KD._prepare_problem(
                spec, q, v, jnp.asarray(tt, jnp.float32), vd,
                jnp.asarray(0.0, jnp.float32),
            )
            res = biconvex.solve(
                pr["plan"], spec.model.total_mass, pr["x_init"],
                biconvex.CostX(W=pr["W"], X_ref=pr["X_ref"]), pr["W_F"],
                pr["X_wm"], pr["F_wm"],
                jnp.zeros((spec.horizon + 1, 9), jnp.float32), cfg,
                x_bounds=pr["x_bounds"],
            )
            assert float(res.viol_norm) < cfg.exit_tol, (name, tt)


@pytest.mark.parametrize("gait_name", ["bound", "trot_extended"])
def test_go2_bound_and_extended_horizon_solve(model, gait_name):
    """BASELINE.json configs[1]: Go2 trot/bound with extended horizon. The
    centroidal ADMM must converge on nominal windows of both new tables
    (default accelerated schedule, no per-robot opt-in)."""
    from bunmpc_tpu.mpc.motions import go2_cyclic

    params = getattr(go2_cyclic, gait_name)
    spec = KD.make_cyclic_spec(
        model, params, Go2Config.q0(),
        eff_frames=tuple(Go2Config.eff_names),
        hip_frames=tuple(Go2Config.hip_names),
        foot_size=Go2Config.foot_size,
    )
    q = jnp.asarray(Go2Config.q0(), jnp.float32)
    v = jnp.zeros(18, jnp.float32)
    vd = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
    cfg = biconvex.BiconvexConfig(rho=spec.params.rho, x_solver="thomas",
                                  max_admm_iters=200)
    for tt in (0.0, 0.07):
        pr = KD._prepare_problem(
            spec, q, v, jnp.asarray(tt, jnp.float32), vd, jnp.asarray(0.0, jnp.float32)
        )
        res = biconvex.solve(
            pr["plan"], spec.model.total_mass, pr["x_init"],
            biconvex.CostX(W=pr["W"], X_ref=pr["X_ref"]), pr["W_F"],
            pr["X_wm"], pr["F_wm"],
            jnp.zeros((spec.horizon + 1, 9), jnp.float32), cfg,
            x_bounds=pr["x_bounds"],
        )
        # absolute residuals scale with the 6x mass; mass-scaled gate
        assert float(res.viol_norm) < 1e-2, (gait_name, tt, float(res.viol_norm))
        F = np.asarray(res.F)
        cnt = np.asarray(pr["plan"].cnt)
        fz_mean = (cnt * F[..., 2]).sum(-1).mean()
        # per-knot total stance Fz must average ~the robot's weight (148 N):
        # a sustained gait carries mg. The round-3 tables (W_F copied from
        # Solo12) starved this to ~mg/2 — the Go2 collapse root cause fixed
        # in round 4 by force-scale^2 W_F scaling (go2_cyclic.py).
        assert abs(fz_mean - 15.097 * 9.81) < 40.0, fz_mean
