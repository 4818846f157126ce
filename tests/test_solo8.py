"""Solo8 robot support tests — the reference's third robot family
(robot_properties_solo solo8wrapper.py, config.py:73-138) through the
robot-agnostic MPC path. Solo8 = Solo12 without the hip-abduction joints
(leg.xacro has_side_motion=false branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.kin import algorithms as K
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo8_cyclic import trot as solo8_trot
from bunmpc_tpu.robots.solo8 import Solo8Config
from bunmpc_tpu.solvers import biconvex, ddp


@pytest.fixture(scope="module")
def model():
    return Solo8Config.load_model()


def _standing_q0():
    """q0 with the base height dropped so the feet rest on the ground (the
    reference's 0.4 m initial height is a drop pose)."""
    q = Solo8Config.q0()
    q[0] = 0.0
    q[2] = 0.241
    return q


def test_solo8_constants(model):
    assert model.n_joints == 8
    # base 1.43315 + 4 x (0.14737 + 0.02318)
    assert abs(model.total_mass - 2.1154) < 1e-3
    for name in Solo8Config.eff_names + Solo8Config.hip_names:
        assert name in model.frames
    assert model.nq == 15 and model.nv == 14


def test_solo8_dynamics_invariants(model):
    rng = np.random.default_rng(0)
    q = np.concatenate([rng.normal(size=3), [0.1, -0.2, 0.3, 0.9], rng.normal(size=8) * 0.4])
    q[3:7] /= np.linalg.norm(q[3:7])
    q = jnp.asarray(q)
    v = jnp.asarray(rng.normal(size=14) * 0.5)
    a = jnp.asarray(rng.normal(size=14))
    M = K.mass_matrix(model, q)
    assert float(jnp.max(jnp.abs(M - M.T))) < 1e-10
    assert float(jnp.linalg.eigvalsh(M).min()) > 0
    tau = K.rnea(model, q, v, a)
    bias = K.nonlinear_effects(model, q, v)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(M @ a + bias), atol=1e-10)


def test_solo8_symmetry(model):
    """Left/right and front/hind mirrored feet at the symmetric q0."""
    q0 = jnp.asarray(_standing_q0())
    feet = np.asarray(K.frame_positions(model, q0, Solo8Config.eff_names))
    # FL vs FR and HL vs HR mirror in y (eff_names order: FL, FR, HL, HR)
    for l, r in ((0, 1), (2, 3)):
        np.testing.assert_allclose(feet[l, [0, 2]], feet[r, [0, 2]], atol=1e-9)
        np.testing.assert_allclose(feet[l, 1], -feet[r, 1], atol=1e-9)
    # front/hind symmetry: every foot sits at the same offset from its own
    # hip (hips are x-mirrored; q0 uses the same joint pose for all legs)
    hips = np.asarray(K.frame_positions(model, q0, Solo8Config.hip_names))
    rel = feet - hips
    flip_y = np.array([1.0, -1.0, 1.0])
    np.testing.assert_allclose(rel[0], rel[2], atol=1e-9)           # FL vs HL
    np.testing.assert_allclose(rel[0], rel[1] * flip_y, atol=1e-9)  # FL vs FR
    np.testing.assert_allclose(rel[2], rel[3] * flip_y, atol=1e-9)  # HL vs HR
    # feet on the ground at the standing pose
    np.testing.assert_allclose(feet[:, 2], Solo8Config.foot_size, atol=2e-3)


def test_solo8_trot_mpc_solve(model):
    """The robot-agnostic kino-dyn MPC (reference abstract_cyclic_gen1.py
    path) must converge for the Solo8."""
    spec = KD.make_cyclic_spec(
        model,
        solo8_trot,
        _standing_q0(),
        eff_frames=tuple(Solo8Config.eff_names),
        hip_frames=tuple(Solo8Config.hip_names),
        foot_size=Solo8Config.foot_size,
    )
    q = jnp.asarray(_standing_q0())
    v = jnp.zeros(14)
    plan = jax.jit(
        lambda q, v: KD.solve_mpc(
            spec, q, v, jnp.asarray(0.0), jnp.asarray([0.2, 0.0, 0.0]), jnp.asarray(0.0),
            admm_cfg=biconvex.BiconvexConfig(rho=solo8_trot.rho),
            ddp_cfg=ddp.DdpConfig(n_iters=4),
        )
    )(q, v)
    assert float(plan.dyn_violation) < 1e-3
    F = np.asarray(plan.F_opt)
    cnt = np.asarray(plan.cnt_plan[..., 0])
    fz_mean = (cnt * F[..., 2]).sum(-1).mean()
    # vertical force supports the 2.12 kg robot on average
    assert abs(fz_mean - 2.1154 * 9.81) < 6.0
    assert plan.xs_int.shape[1] == 15 + 14
