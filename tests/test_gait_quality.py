"""In-sim gait-quality gates: the sweep-validated walking configs must keep
walking (VERDICT round-3 task 2; artifacts/stability_sweep_{go2,solo12}.json
are the committed sweep evidence these tests pin).

Criteria (round-2 task 2's done-criteria): survive >= 3 s at 0.3 m/s with
max roll < 15 deg and |z - nom_ht| < 0.05 m (Go2); Solo12 additionally must
hold max roll < 10 deg over the gait window.

These run full 3000-step MPC-in-the-loop episodes — minutes each on CPU —
and are marked ``slow`` (quick tier: ``pytest -m "not slow"``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.sim import controllers, physics, rollout
from bunmpc_tpu.utils.quat import quat_to_rot, rot_to_rpy

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True, scope="module")
def _product_precision():
    """Run the gait gates at PRODUCT precision (f32). The suite default
    enables x64 for numeric golden tests, but the closed-loop trot is
    chaotic: measured round 5, solo12 trot_sim walks the full 3 s on f32
    (CPU roll_max 7.9 deg, TPU 5.2 deg) while the identical program under
    x64 falls at 825 ms. The deployable path is f32 on TPU (matmul
    precision pinned HIGHEST since round 3); gating quality on the
    non-product f64 semantics made the gate flip with the host machine."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", old)


def _settle(model, eff, sp, state0, kp, kd, ms=500):
    q0j = state0.q[7:]

    def step(s, _):
        tau = -6.0 * kp * (s.q[7:] - q0j) - 6.0 * kd * s.v[6:]
        s2, _ = physics.step(model, eff, sp, s, tau)
        return s2, None

    s, _ = jax.lax.scan(step, state0, None, length=ms)
    return s

def _run(spec, sp, state0, vx, T, sb, fg):
    cfg = rollout.RolloutConfig(episode_length=T, gait_period=spec.params.gait_period)
    run = jax.jit(
        lambda s: rollout.rollout_mpc(
            spec, sp, cfg, s, jnp.asarray([vx, 0.0, 0.0], jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            swing_blend=None if sb is None else jnp.asarray(sb, jnp.float32),
            force_gate=None if fg is None else jnp.asarray(fg, jnp.float32),
        )
    )
    return jax.block_until_ready(run(state0))


def _attitude(spec, res, T):
    nv = spec.model.nv
    quat = jnp.asarray(res.states[..., nv + 8 + 1 : nv + 8 + 5])
    rpy = np.asarray(rot_to_rpy(quat_to_rot(quat)))
    z = np.asarray(res.states[..., nv + 8])
    gait_win = slice(500, T)  # post-settle steady gait (sweep criterion)
    return rpy[gait_win], z


def test_go2_trot_walks():
    """The sweep winner (kp=60/kd=3, kn=6e4, swing_blend 0.5) survives 3 s at
    0.3 m/s: max roll < 15 deg, |z_end - nom| < 0.05 m, forward progress."""
    from bunmpc_tpu.mpc.motions.go2_cyclic import trot_sim
    from bunmpc_tpu.robots.go2 import Go2Config as C

    model = C.load_model()
    spec = KD.make_cyclic_spec(
        model, trot_sim, C.q0(), eff_frames=tuple(C.eff_names),
        hip_frames=tuple(C.hip_names), foot_size=C.foot_size,
    )
    sp = physics.SimParams(
        contact=physics.ContactParams(
            foot_radius=C.foot_size, kn=6e4, dn=3000.0, kt=3000.0, mu=1.0
        ),
        torque_limit=23.7,
    )
    eff = tuple(spec.eff_frames)
    state0 = physics.SimState(q=jnp.asarray(C.q0()), v=jnp.zeros(model.nv))
    state0 = _settle(model, eff, sp, state0, trot_sim.kp, trot_sim.kd)
    T = 3000
    res = _run(spec, sp, state0, 0.3, T, sb=0.5, fg=1.0)
    assert not bool(res.failed), f"Go2 fell at {int(res.fail_step)} ms"
    rpy, z = _attitude(spec, res, T)
    roll_max = np.rad2deg(np.abs(rpy[:, 0]).max())
    assert roll_max < 15.0, roll_max
    z_end = z[-1000:].mean()
    assert abs(z_end - trot_sim.nom_ht) < 0.05, z_end
    vx_end = np.asarray(res.states[-1000:, 0]).mean()
    assert vx_end > 0.15, vx_end  # walking forward, not in place


def test_solo12_reference_gains_contact_calibration_artifact():
    """Round-3 task 6 / round-4 task 3 closure: the committed 36-point
    ContactParams sweep (artifacts/contact_calibration_solo12.json, run
    with the reference's verbatim kp=3/kd=0.05 + W_F=1e1 trot table,
    solo12_trot.py:41-42) shows the reference configuration completing
    3 s @ 0.3 m/s in-graph at calibrated contact params (kn=1e4, dn=150,
    kt=150) with contact duty ~0.63 vs the planned 0.60 and ~1 mm mean
    penetration — AND that the walk is marginal (roll_max ~26 deg, 2/36
    rows survive, within 4 deg of the 30-deg failure line), so survival
    flips across backends/precisions and is pinned here via the artifact
    rather than a knife-edge re-rollout. Root cause in PARITY.md: the soft
    reference PD leans on PyBullet's LCP hard-contact stiction, which the
    implicit viscous tangential model approximates; the product path ships
    sim-validated gains (gates below)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "contact_calibration_solo12.json",
    )
    with open(path) as fh:
        doc = json.load(fh)
    assert doc["meta"]["reference_gains"] == {"kp": 3.0, "kd": 0.05}
    best = doc["best"]
    assert not best["failed"] and best["survival_ms"] >= 3000
    assert abs(best["duty_factor"] - 0.6) < 0.08
    assert best["penetration_mean"] < 0.005
    # marginality is part of the finding: quality clearly below trot_sim's
    assert best["roll_max_deg"] > 15.0
    survivors = [r for r in doc["grid_rows"] if not r["failed"]]
    assert 1 <= len(survivors) <= 6  # reproducibly rare, not robust
    # the shipped sim-validated config stays the quality recommendation
    base = doc["trot_sim_baseline"]
    assert not base["failed"] and base["roll_max_deg"] < 10.0


def test_solo12_trot_walks():
    """Solo12 sim-validated trot (artifacts/stability_sweep_solo12_wf01.json
    row kp=12/kd=0.5/kn=1e4, W_F x0.1): survives 3 s @ 0.3 m/s with max
    roll < 10 deg over the gait window (round-3 verdict target) and the CoM
    height within 3 cm of nominal (sweep evidence: roll_max 5.4 deg, z_end
    dev 0.012 m)."""
    from bunmpc_tpu.mpc.motions.solo12_cyclic import trot_sim
    from bunmpc_tpu.robots.solo12 import Solo12Config as C

    model = C.load_model()
    spec = KD.make_cyclic_spec(model, trot_sim, C.q0())
    sp = physics.SimParams(
        contact=physics.ContactParams(kn=1e4, dn=500.0, kt=500.0, mu=1.0)
    )
    eff = tuple(spec.eff_frames)
    state0 = physics.SimState(q=jnp.asarray(C.q0()), v=jnp.zeros(model.nv))
    state0 = _settle(model, eff, sp, state0, trot_sim.kp, trot_sim.kd)
    T = 3000
    res = _run(spec, sp, state0, 0.3, T, sb=None, fg=None)
    assert not bool(res.failed), f"Solo12 fell at {int(res.fail_step)} ms"
    rpy, z = _attitude(spec, res, T)
    roll_max = np.rad2deg(np.abs(rpy[:, 0]).max())
    assert roll_max < 10.0, roll_max
    assert abs(z[-1000:].mean() - trot_sim.nom_ht) < 0.03
