"""Rollout-engine and simulator tests (reduced solver budgets for speed).

Covers the reference's de-facto smoke tests (reference test_mpc.py,
test_mpc_with_pertubation.py) with actual assertions: physics sanity,
MPC rollout survival, featurization shapes, policy/gated rollouts, and
fault-injection (pushes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import controllers, physics, rollout
from bunmpc_tpu.solvers import biconvex, ddp

FAST_ADMM = biconvex.BiconvexConfig(rho=trot.rho, max_admm_iters=60)
FAST_DDP = ddp.DdpConfig(n_iters=4)


@pytest.fixture(scope="module")
def spec():
    return KD.make_cyclic_spec(Solo12Config.load_model(), trot, Solo12Config.q0())


@pytest.fixture(scope="module")
def sim_params():
    return physics.SimParams(contact=physics.ContactParams(mu=1.0))


def _state0():
    return physics.SimState(q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(18))


def test_sim_standing_pd(sim_params):
    """PD hold at q0 must settle with total normal force == weight."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    q0 = jnp.asarray(Solo12Config.q0())

    def body(state, _):
        tau = 25.0 * (q0[7:] - state.q[7:]) - 0.5 * state.v[6:]
        state, cinfo = physics.step(model, eff, sim_params, state, tau)
        return state, jnp.sum(cinfo.forces[..., 2])

    state, fz = jax.jit(lambda s: jax.lax.scan(body, s, None, length=2000))(_state0())
    assert abs(float(fz[-1]) - 2.5 * 9.81) < 0.1
    assert abs(float(state.q[2]) - 0.235) < 0.02
    assert float(jnp.max(jnp.abs(state.v))) < 0.05


def test_sim_momentum_conservation_in_flight(sim_params):
    """With no contact and no torque, linear momentum follows gravity only."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    q = jnp.asarray(Solo12Config.q0()).at[2].set(1.0)  # airborne
    state = physics.SimState(q=q, v=jnp.zeros(18))

    def body(state, _):
        state, _ = physics.step(model, eff, sim_params, state, jnp.zeros(12))
        return state, None

    state, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, length=100))(state)
    # v_z ~ -g t
    assert abs(float(state.v[2]) + 9.81 * 0.1) < 1e-3


@pytest.mark.slow
def test_rollout_mpc_short(spec, sim_params):
    """A 0.5 s MPC rollout must not fail and must collect reference-shaped data."""
    cfg = rollout.RolloutConfig(
        episode_length=500, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )
    res = jax.jit(
        lambda s, vd, wd: rollout.rollout_mpc(
            spec, sim_params, cfg, s, vd, wd, admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP
        )
    )(_state0(), jnp.asarray([0.2, 0.0, 0.0]), jnp.asarray(0.0))
    assert not bool(res.failed)
    assert res.states.shape == (500, 43)
    assert res.actions.shape == (500, 12)
    assert res.vc_goals.shape == (500, 5)
    # vc goal fields (simulation.py:492-495)
    goals = np.asarray(res.vc_goals)
    np.testing.assert_allclose(goals[:, 1], 0.2, atol=1e-6)
    np.testing.assert_allclose(goals[:, 4], 1.0, atol=1e-6)  # trot id
    assert goals[:, 0].min() >= 0.0 and goals[:, 0].max() <= 1.0
    # robot walked forward
    assert float(res.base[-1, 0]) > 0.02
    # actions are plausible pd targets near the joint configuration
    q0 = Solo12Config.q0()
    assert np.abs(np.asarray(res.actions) - q0[7:]).max() < 2.0


def test_rollout_policy_runs(spec, sim_params):
    """A zero-intelligence policy (constant q0 target) keeps the robot alive
    briefly and the featurization pipeline works."""
    q0 = jnp.asarray(Solo12Config.q0())
    cfg = rollout.RolloutConfig(
        episode_length=300, kp=3.0, kd=0.1, gait_period=trot.gait_period
    )

    def policy_fn(feat, goal):
        return q0[7:]

    res = jax.jit(
        lambda s, vd, wd: rollout.rollout_policy(
            spec, sim_params, cfg, s, vd, wd, policy_fn
        )
    )(_state0(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.0))
    assert not bool(res.failed)
    assert float(jnp.max(jnp.abs(res.actions - q0[7:]))) < 1e-9
    assert float(res.mpc_usage.sum()) == 0.0


@pytest.mark.slow
def test_rollout_safedagger_gating(spec, sim_params):
    """With an intentionally bad policy the safety gate must hand control to
    the MPC (mpc_usage > 0) and keep the episode alive longer."""
    cfg = rollout.RolloutConfig(
        episode_length=400, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )

    def bad_policy(feat, goal):
        return jnp.full(12, 2.0)  # drives joints toward the limits

    res = jax.jit(
        lambda s, vd, wd: rollout.rollout_safedagger(
            spec, sim_params, cfg, s, vd, wd, bad_policy,
            num_steps_to_block=100, admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP,
        )
    )(_state0(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.0))
    assert float(res.mpc_usage.mean()) > 0.3  # expert took over


@pytest.mark.slow
def test_push_fault_injection(spec, sim_params):
    """External pushes must perturb the trajectory (fault injection, reference
    pybullet_env.apply_external_force / simulation.py:805-807)."""
    cfg = rollout.RolloutConfig(
        episode_length=200, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )
    push = jnp.zeros((200, 3)).at[100:150, 1].set(8.0)
    run = jax.jit(
        lambda s, vd, wd, p: rollout.rollout_mpc(
            spec, sim_params, cfg, s, vd, wd, push_force=p,
            admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP,
        )
    )
    res_push = run(_state0(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.0), push)
    res_free = run(_state0(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.0), jnp.zeros((200, 3)))
    dy = abs(float(res_push.base[-1, 1]) - float(res_free.base[-1, 1]))
    assert dy > 0.005  # the push moved the robot laterally


def test_safety_predicates():
    q_safe = jnp.asarray(Solo12Config.q0())
    assert not bool(rollout.state_is_dangerous(q_safe))
    q_low = q_safe.at[2].set(0.1)
    assert bool(rollout.state_is_dangerous(q_low))
    q_joint = q_safe.at[7].set(2.0)  # FL HAA beyond box
    assert bool(rollout.state_is_dangerous(q_joint))


def test_id_controller_gravity_comp():
    """Feed-forward-only ID torques at equilibrium reproduce the holding
    torques (robot_id_controller.py semantics)."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    q0 = jnp.asarray(Solo12Config.q0())
    from bunmpc_tpu.kin import algorithms as K

    # static force distribution: weight equally on 4 feet
    f = jnp.tile(jnp.asarray([0.0, 0.0, 2.5 * 9.81 / 4]), 4)
    gains = controllers.IdControllerGains(kp=0.0, kd=0.0)
    tau_ff, tau_fb = controllers.id_joint_torques(
        model, eff, gains, q0, jnp.zeros(18), q0, jnp.zeros(18), jnp.zeros(18), f
    )
    assert float(jnp.max(jnp.abs(tau_fb))) == 0.0
    # torque must be small (weight is carried by the contact forces)
    assert float(jnp.max(jnp.abs(tau_ff))) < 1.5


def test_id_controller_force_gating():
    """f_scale gates each leg's J^T f_ff term independently: scale 0 on every
    leg reproduces the zero-force torques, and gating one leg changes only
    torques on that leg's joints (sim/rollout.py force_gate path)."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    q0 = jnp.asarray(Solo12Config.q0())
    z = jnp.zeros(18)
    f = jnp.tile(jnp.asarray([0.0, 0.0, 2.5 * 9.81 / 4]), 4)
    gains = controllers.IdControllerGains(kp=0.0, kd=0.0)

    tau_all, _ = controllers.id_joint_torques(
        model, eff, gains, q0, z, q0, z, z, f, f_scale=jnp.ones(4)
    )
    tau_ref, _ = controllers.id_joint_torques(model, eff, gains, q0, z, q0, z, z, f)
    np.testing.assert_allclose(np.asarray(tau_all), np.asarray(tau_ref), atol=1e-6)

    tau_none, _ = controllers.id_joint_torques(
        model, eff, gains, q0, z, q0, z, z, f, f_scale=jnp.zeros(4)
    )
    tau_zero_f, _ = controllers.id_joint_torques(
        model, eff, gains, q0, z, q0, z, z, jnp.zeros_like(f)
    )
    np.testing.assert_allclose(np.asarray(tau_none), np.asarray(tau_zero_f), atol=1e-6)

    # gate only leg 0 (FL): legs 1-3 keep their force-compensated torques
    one_off = jnp.asarray([0.0, 1.0, 1.0, 1.0])
    tau_g, _ = controllers.id_joint_torques(
        model, eff, gains, q0, z, q0, z, z, f, f_scale=one_off
    )
    np.testing.assert_allclose(
        np.asarray(tau_g)[3:], np.asarray(tau_all)[3:], atol=1e-6
    )
    assert float(jnp.max(jnp.abs(tau_g[:3] - tau_all[:3]))) > 0.05


def test_swing_blend_scale():
    """swing_blend joint scaling (sim/rollout.py): the leg incidence mask
    covers exactly 3 joints per Solo12 leg, and the scale releases precisely
    the planned-swing legs that are measured grounded."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    mask = rollout.leg_joint_mask(model, eff)
    assert mask.shape == (4, 12)
    # each leg drives exactly its own 3 serial joints; legs are disjoint
    np.testing.assert_array_equal(mask.sum(axis=1), np.full(4, 3.0))
    np.testing.assert_array_equal(mask.sum(axis=0), np.ones(12))

    mask_j = jnp.asarray(mask)
    planned_st = jnp.asarray([1, 0, 0, 1])  # legs 1,2 planned swing
    meas_cnt = jnp.asarray([True, True, False, True])  # leg 1 still grounded
    sb = jnp.asarray(0.25, jnp.float32)
    scale = np.asarray(rollout.swing_blend_scale(mask_j, planned_st, meas_cnt, sb))
    # only leg 1 (planned swing AND measured contact) is released to sb
    expected = np.ones(12)
    expected[mask[1] > 0] = 0.25
    np.testing.assert_allclose(scale, expected, atol=1e-7)
    # sb=1 is identity regardless of contact state
    ones = np.asarray(
        rollout.swing_blend_scale(mask_j, planned_st, meas_cnt, jnp.asarray(1.0, jnp.float32))
    )
    np.testing.assert_allclose(ones, np.ones(12), atol=1e-7)
    # sb=0 fully releases; stance legs and airborne swing legs untouched
    zero = np.asarray(
        rollout.swing_blend_scale(mask_j, planned_st, meas_cnt, jnp.asarray(0.0, jnp.float32))
    )
    expected0 = np.ones(12)
    expected0[mask[1] > 0] = 0.0
    np.testing.assert_allclose(zero, expected0, atol=1e-7)


@pytest.mark.slow
def test_rollout_mpc_swing_blend_changes_torques():
    """swing_blend plumbed through rollout_mpc: a grounded planned-swing leg
    gets scaled feedback — the episode must differ from the reference path
    (sb=None) while staying finite."""
    model = Solo12Config.load_model()
    from bunmpc_tpu.mpc import kino_dyn as KD
    from bunmpc_tpu.mpc.motions.solo12_cyclic import trot

    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
    sim_params = physics.SimParams()
    cfg = rollout.RolloutConfig(episode_length=100, gait_period=trot.gait_period)
    state0 = physics.SimState(
        q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(model.nv)
    )
    vd, wd = jnp.asarray([0.2, 0.0, 0.0]), jnp.asarray(0.0)
    run = jax.jit(
        lambda sb: rollout.rollout_mpc(
            spec, sim_params, cfg, state0, vd, wd, swing_blend=sb
        ).actions
    )
    a_ref = np.asarray(run(jnp.asarray(1.0)))  # sb=1 == reference behavior
    a_blend = np.asarray(run(jnp.asarray(0.0)))
    assert np.isfinite(a_blend).all()
    # at episode start the feet all touch down during planned swing phases
    # of two legs -> the gate must fire somewhere in the first 100 ms
    assert np.max(np.abs(a_ref - a_blend)) > 1e-5


def test_action_encodings_round_trip():
    """All three reference action types (simulation.py:525-531, 760-777):
    extraction and decode are mutually consistent."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(np.concatenate([rng.normal(size=3), [0, 0, 0, 1], rng.normal(size=12)]))
    v = jnp.asarray(rng.normal(size=18))
    tau = jnp.asarray(rng.normal(size=12))
    tau_ff = jnp.asarray(rng.normal(size=12))
    q_des = jnp.asarray(np.concatenate([rng.normal(size=7), rng.normal(size=12)]))
    v_des = jnp.asarray(rng.normal(size=18))

    cfg_t = rollout.RolloutConfig(episode_length=100, action_type="torque")
    a = rollout._extract_action(cfg_t, tau, q, v)
    np.testing.assert_allclose(rollout._decode_action(cfg_t, a, q, v), tau)

    cfg_p = rollout.RolloutConfig(episode_length=100, action_type="pd_target", kp=3.0, kd=0.05)
    a = rollout._extract_action(cfg_p, tau, q, v)
    np.testing.assert_allclose(rollout._decode_action(cfg_p, a, q, v), tau, rtol=1e-6)

    cfg_s = rollout.RolloutConfig(episode_length=100, action_type="structured", kp=3.0, kd=0.05)
    a = rollout._extract_action(cfg_s, tau, q, v, tau_ff=tau_ff, q_des=q_des, v_des_traj=v_des)
    assert a.shape == (36,)  # [tau_ff, q_des_joints, dq_des_joints]
    expect = tau_ff + 3.0 * (q_des[7:] - q[7:]) + 0.05 * (v_des[6:] - v[6:])
    np.testing.assert_allclose(rollout._decode_action(cfg_s, a, q, v), expect, rtol=1e-6)


def test_rollout_policy_structured(spec, sim_params):
    """A structured-action policy (gravity-free tau_ff=0, PD toward q0) holds
    the robot up, exercising the structured decode path in-graph."""
    q0 = jnp.asarray(Solo12Config.q0())
    cfg = rollout.RolloutConfig(
        episode_length=300, action_type="structured", kp=3.0, kd=0.1,
        gait_period=trot.gait_period,
    )

    def policy_fn(feat, goal):
        return jnp.concatenate([jnp.zeros(12), q0[7:], jnp.zeros(12)])

    res = jax.jit(
        lambda s, vd, wd: rollout.rollout_policy(
            spec, sim_params, cfg, s, vd, wd, policy_fn
        )
    )(_state0(), jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray(0.0))
    assert not bool(res.failed)
    assert res.actions.shape == (300, 36)
