"""Eval-suite tests: velocity-grid tracking and max-force search (tiny
budgets; the reference's quantitative behavioral evaluation tier,
SURVEY.md §4.3)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.eval import max_force, velocity_grid
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics, rollout
from bunmpc_tpu.solvers import biconvex, ddp

FAST_ADMM = biconvex.BiconvexConfig(rho=trot.rho, max_admm_iters=40)
FAST_DDP = ddp.DdpConfig(n_iters=3, alphas=(1.0, 0.5, 0.1))


@pytest.fixture(scope="module")
def spec():
    return KD.make_cyclic_spec(Solo12Config.load_model(), trot, Solo12Config.q0())


@pytest.fixture(scope="module")
def sim_params():
    return physics.SimParams(contact=physics.ContactParams(mu=1.0))


@pytest.mark.slow
def test_velocity_grid_eval(spec, sim_params, tmp_path):
    cfg = rollout.RolloutConfig(
        episode_length=400, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )
    state0 = physics.SimState(q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(18))
    res = velocity_grid.eval_mpc_grid(
        spec, sim_params, cfg, state0, vx_values=(0.0, 0.2),
        admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP,
    )
    s = res.summary()
    assert s["survival_rate"] == 1.0
    # standing command tracks ~0; walking command produces forward speed
    assert abs(res.mean_speed[0]) < 0.1
    assert res.mean_speed[1] > 0.05
    csv_path = os.path.join(tmp_path, "grid.csv")
    res.to_csv(csv_path)
    assert os.path.getsize(csv_path) > 50


@pytest.mark.slow
def test_max_force_search(spec, sim_params):
    cfg = rollout.RolloutConfig(
        episode_length=400, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )
    state0 = physics.SimState(q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(18))
    directions = np.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    f_max, history = max_force.max_force_search(
        spec, sim_params, cfg, state0,
        v_des=np.array([0.0, 0.0, 0.0]), w_des=0.0,
        f_low=0.0, f_high=40.0, n_bisect=2,
        directions=directions, push_start=150, push_duration=100,
        admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP,
    )
    assert 0.0 <= f_max <= 40.0
    assert len(history) == 2
    # tiny pushes are survivable: the first bisection midpoint (20 N on a
    # 2.5 kg robot) may fail, but the search must report sane fractions
    for mag, frac in history:
        assert 0.0 <= frac <= 1.0


def test_cc_replanning_comparison(spec, sim_params, tmp_path):
    """All three variants (vc / cc_static / cc_replanned) run, produce
    per-command MSE tables, and the goal dimensionality matches
    3*n_eff*goal_horizon (reference effects_of_cc_replanning ablation)."""
    from bunmpc_tpu.eval import cc_replanning

    cfg = rollout.RolloutConfig(
        episode_length=300, kp=3.0, kd=0.1, gait_period=trot.gait_period
    )
    state0 = physics.SimState(q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(18))
    q0j = jnp.asarray(Solo12Config.q0())[7:]

    def vc_policy(feat, goal):
        assert goal.shape == (5,)
        return q0j

    def cc_policy(feat, goal):
        assert goal.shape == (12,)  # 3 * n_eff * goal_horizon
        return q0j

    res = cc_replanning.compare_cc_replanning(
        spec, sim_params, cfg, state0, vc_policy, cc_policy,
        v_des_batch=np.array([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0]]),
        w_des_batch=np.array([0.0, 0.0]),
    )
    s = res.summary()
    assert set(s) == {"vc", "cc_static", "cc_replanned"}
    for name in s:
        assert np.isfinite(res.vx_mse[name]).all()
    path = os.path.join(tmp_path, "cc.csv")
    res.to_csv(path)
    assert sum(1 for _ in open(path)) == 1 + 3 * 2


@pytest.mark.slow
def test_past_goals_forgetting_matrix(spec):
    """Past-goals policy eval (reference test_policy_rollout_with_past_goals
    :481-660): sequential goals, each iteration's policy re-evaluated on all
    past goals -> lower-triangular vx/vy MSE matrices."""
    from bunmpc_tpu.eval.past_goals import run_past_goals_eval
    from bunmpc_tpu.learning.bc import BcConfig
    from bunmpc_tpu.sim import physics, rollout
    from bunmpc_tpu.solvers import biconvex, ddp

    rcfg = rollout.RolloutConfig(episode_length=300, gait_period=spec.params.gait_period)
    goals = np.array([[0.1, 0.0, 0.0, 0.0], [0.2, 0.0, 0.0, 0.0]], np.float32)
    res = run_past_goals_eval(
        spec, physics.SimParams(), rcfg,
        Solo12Config.q0(), np.zeros(18), goals,
        bc_cfg=BcConfig(n_epoch=3, batch_size=64),
        admm_cfg=biconvex.BiconvexConfig(rho=spec.params.rho, max_admm_iters=40),
        ddp_cfg=ddp.DdpConfig(n_iters=2, alphas=(1.0, 0.3)),
    )
    # lower-triangular structure: row 0 has goal 0 only; row 1 has both
    assert np.isfinite(res.error_vx[0, 0])
    assert np.isnan(res.error_vx[0, 1])
    assert np.isfinite(res.error_vx[1, :2]).all()
    assert res.error_vx.shape == (2, 2)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "pg.csv")
        res.to_csv(p)
        assert sum(1 for _ in open(p)) == 1 + 3  # header + 3 triangular rows
