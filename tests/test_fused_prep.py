"""Parity of the fused-prep prologue against the XLA problem assembly.

`pallas_admm.prep_values` rebuilds the contact plan, dynamics costs,
kinematic box and warm starts inside the ADMM kernel (round-5 perf task:
the vmapped XLA prep was the largest single cost of the batched solve).
The prologue is plain jnp code on (.., T)-layout values, so it runs
bit-identically outside Pallas — this test pins it against
`kino_dyn._prepare_problem` (reference semantics twin:
abstract_cyclic_gen.py create_cnt_plan/create_costs, biconvex.cpp:48-56
bounds, kino_dyn.cpp:83-99 warm starts) on random states for both the
tiled/zero and vdes/weight (Go2-style) configurations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.solvers import pallas_admm as PA

BIG = 3.4e38


def _rand_batch(B, seed=0):
    rng = np.random.default_rng(seed)
    q = np.tile(Solo12Config.q0(), (B, 1)).astype(np.float32)
    q[:, 7:] += rng.normal(size=(B, 12)).astype(np.float32) * 0.05
    # random base orientation (yaw-dominant, like mid-episode states)
    yaw = rng.uniform(-0.6, 0.6, B)
    q[:, 3] = np.sin(yaw / 2) * 0.1
    q[:, 5] = np.sin(yaw / 2)
    q[:, 6] = np.cos(yaw / 2)
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    v = (rng.normal(size=(B, 18)) * 0.1).astype(np.float32)
    t = rng.uniform(0, 0.6, B).astype(np.float32)
    v_des = np.stack(
        [rng.uniform(-0.3, 0.5, B), rng.uniform(-0.2, 0.2, B), np.zeros(B)], -1
    ).astype(np.float32)
    w_des = np.where(rng.uniform(size=B) < 0.5, 0.0, rng.uniform(-0.3, 0.3, B)).astype(
        np.float32
    )
    return map(jnp.asarray, (q, v, t, v_des, w_des))


def _lanes(a):
    """(B, ...) -> (..., B)"""
    return jnp.moveaxis(jnp.asarray(a, jnp.float32), 0, -1)


def _unlanes(a):
    return np.moveaxis(np.asarray(a), -1, 0)


@pytest.mark.parametrize("style", ["tiled_zero", "vdes_weight"])
def test_prep_values_matches_prepare_problem(style):
    model = Solo12Config.load_model()
    params = trot
    spec = KD.make_cyclic_spec(model, params, Solo12Config.q0())
    if style == "vdes_weight":
        spec = dataclasses.replace(
            spec,
            warm_start_style="vdes",
            params=dataclasses.replace(spec.params, f_reg_style="weight"),
        )
    B = 8
    q, v, t, v_des, w_des = _rand_batch(B, seed=3)

    prob = jax.vmap(lambda q, v, t, vd, wd: KD._prepare_problem(spec, q, v, t, vd, wd))(
        q, v, t, v_des, w_des
    )
    qr, t_, vdw, x_init, ee, hip, amom = jax.vmap(
        lambda q, v, t, vd, wd: KD._compact_inputs(spec, q, v, t, vd, wd)
    )(q, v, t, v_des, w_des)

    pc = KD.make_prep_consts(spec)
    cnt, r, dts, swing, W, qlin, WF, qF, lb, ub, X0, F0 = PA.prep_values(
        _lanes(t_)[None],
        _lanes(vdw),
        _lanes(w_des)[None],
        _lanes(x_init),
        _lanes(ee),
        _lanes(hip),
        _lanes(amom),
        pc=pc,
        m=float(model.total_mass),
        H=spec.horizon,
        ne=spec.n_eff,
    )

    np.testing.assert_allclose(np.asarray(x_init), np.asarray(prob["x_init"]), atol=1e-5)
    np.testing.assert_allclose(_unlanes(cnt), np.asarray(prob["plan"].cnt), atol=0)
    np.testing.assert_allclose(_unlanes(dts), np.asarray(prob["plan"].dt), atol=1e-6)
    np.testing.assert_allclose(_unlanes(r), np.asarray(prob["plan"].r), atol=1e-5)
    np.testing.assert_allclose(
        _unlanes(swing) > 0.5, np.asarray(prob["swing_mask"]), atol=0
    )
    np.testing.assert_allclose(_unlanes(W), np.asarray(prob["W"]), rtol=1e-6)
    qlin_ref = -2.0 * np.asarray(prob["W"]) * np.asarray(prob["X_ref"])
    np.testing.assert_allclose(_unlanes(qlin), qlin_ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(_unlanes(WF), np.asarray(prob["W_F"]), rtol=1e-6)
    if style == "vdes_weight":
        qF_ref = -2.0 * np.asarray(prob["W_F"]) * np.asarray(prob["F_ref"])
        np.testing.assert_allclose(_unlanes(qF), qF_ref, rtol=1e-5, atol=1e-4)
    else:
        assert np.all(np.asarray(qF) == 0.0)
    lb_ref = np.clip(np.asarray(prob["x_bounds"][0]), -BIG, BIG)
    ub_ref = np.clip(np.asarray(prob["x_bounds"][1]), -BIG, BIG)
    np.testing.assert_allclose(_unlanes(lb), lb_ref, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(_unlanes(ub), ub_ref, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(_unlanes(X0), np.asarray(prob["X_wm"]), atol=1e-5)
    assert np.all(np.asarray(F0) == 0.0)


def test_fused_batch_solve_interpret():
    """End-to-end fused-prep solve (interpret mode) matches the unfused
    pallas path on the plan outputs and converges identically."""
    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
    B = 4
    q, v, t, v_des, w_des = _rand_batch(B, seed=11)
    cfg = PA.PallasAdmmConfig(rho=spec.params.rho, max_admm_iters=4, interpret=True)

    qr, t_, vdw, x_init, ee, hip, amom = jax.vmap(
        lambda q, v, t, vd, wd: KD._compact_inputs(spec, q, v, t, vd, wd)
    )(q, v, t, v_des, w_des)
    X, F, viol, iters, cnt, r, dts, swing = PA.solve_from_state(
        t_, vdw, w_des, x_init, ee, hip, amom,
        float(model.total_mass), KD.make_prep_consts(spec), cfg,
        spec.horizon, spec.n_eff,
    )

    prob = jax.vmap(lambda q, v, t, vd, wd: KD._prepare_problem(spec, q, v, t, vd, wd))(
        q, v, t, v_des, w_des
    )
    X2, F2, viol2, iters2 = PA.solve(
        prob["plan"], float(model.total_mass), prob["x_init"], prob["W"],
        prob["X_ref"], prob["W_F"], prob["X_wm"], prob["F_wm"],
        prob["x_bounds"], cfg, F_reg_ref=prob.get("F_ref"),
    )
    np.testing.assert_allclose(np.asarray(cnt), np.asarray(prob["plan"].cnt), atol=0)
    np.testing.assert_allclose(np.asarray(r), np.asarray(prob["plan"].r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F2), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(viol), np.asarray(viol2), rtol=1e-3, atol=1e-5)
