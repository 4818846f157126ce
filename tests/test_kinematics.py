"""Golden-value and invariant tests for the batched rigid-body stack.

Mirrors the reference's C++-vs-Python equivalence strategy (reference
examples/dynamics/cpp_centroidal.py:27-31) with physics invariants instead of
a Pinocchio oracle (not available in this image): energy consistency, momentum
conservation, analytic-vs-autodiff Jacobians, all at float64 precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.kin import algorithms as K
from bunmpc_tpu.robots.solo12 import Solo12Config


@pytest.fixture(scope="module")
def model():
    return Solo12Config.load_model()


@pytest.fixture()
def state(model):
    rng = np.random.default_rng(42)
    q = np.concatenate([rng.normal(size=3), [0.1, -0.2, 0.3, 0.9], rng.normal(size=12) * 0.5])
    q[3:7] /= np.linalg.norm(q[3:7])
    v = rng.normal(size=model.nv) * 0.5
    return jnp.asarray(q), jnp.asarray(v)


def test_model_constants(model):
    assert model.n_joints == 12
    assert model.nq == 19 and model.nv == 18
    assert abs(model.total_mass - 2.50) < 0.01  # Solo12 is ~2.5 kg
    for name in Solo12Config.eff_names:
        assert name in model.frames


def test_fk_initial_configuration(model):
    q0 = jnp.asarray(Solo12Config.q0())
    feet = K.frame_positions(model, q0, Solo12Config.eff_names)
    # symmetric stance, feet near the ground
    np.testing.assert_allclose(np.abs(feet[:, 0]), 0.1946, atol=1e-3)
    np.testing.assert_allclose(np.abs(feet[:, 1]), 0.147, atol=1e-3)
    assert np.all(np.asarray(feet[:, 2]) < 0.05)


def test_mass_matrix_symmetric_pd(model, state):
    q, _ = state
    M = K.mass_matrix(model, q)
    assert float(jnp.max(jnp.abs(M - M.T))) < 1e-12
    assert float(jnp.linalg.eigvalsh(M).min()) > 0


def test_kinetic_energy_consistency(model, state):
    q, v = state
    M = K.mass_matrix(model, q)
    omega, vel, R, p = K.body_velocities(model, q, v)
    ke = 0.0
    for b in range(model.n_bodies):
        c_off = R[b] @ model.com[b]
        vc = vel[b] + jnp.cross(omega[b], c_off)
        Iw = R[b] @ model.inertia[b] @ R[b].T
        ke += 0.5 * model.mass[b] * vc @ vc + 0.5 * omega[b] @ Iw @ omega[b]
    assert abs(float(0.5 * v @ M @ v - ke)) < 1e-12


def test_rnea_equals_lagrangian_form(model, state):
    q, v = state
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=model.nv))
    tau = K.rnea(model, q, v, a)
    M = K.mass_matrix(model, q)
    bias = K.nonlinear_effects(model, q, v)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(M @ a + bias), atol=1e-12)


def test_free_fall_momentum_rate(model, state):
    """Unactuated dynamics: dh_lin/dt = m*g, dh_ang/dt (about com) = 0."""
    q, v = state
    M = K.mass_matrix(model, q)
    bias = K.nonlinear_effects(model, q, v)
    a_ff = jnp.linalg.solve(M, -bias)
    dt = 1e-7
    qn = K.integrate(model, q, v * dt)
    vn = v + a_ff * dt
    _, hl0, ha0 = K.centroidal_momentum(model, q, v)
    _, hl1, ha1 = K.centroidal_momentum(model, qn, vn)
    dh_lin = np.asarray((hl1 - hl0) / dt)
    dh_ang = np.asarray((ha1 - ha0) / dt)
    np.testing.assert_allclose(dh_lin, [0, 0, -9.81 * model.total_mass], atol=1e-4)
    np.testing.assert_allclose(dh_ang, 0, atol=1e-4)


def test_gravity_compensation_at_rest(model):
    """RNEA(q, 0, 0) must exactly support the weight."""
    q0 = jnp.asarray(Solo12Config.q0())
    tau = K.rnea(model, q0, jnp.zeros(model.nv), jnp.zeros(model.nv))
    # base force rows (local frame == world at q0): weight on z
    np.testing.assert_allclose(float(tau[2]), 9.81 * model.total_mass, rtol=1e-10)


def test_frame_jacobian_vs_autodiff(model, state):
    q, _ = state
    for name in Solo12Config.eff_names:
        J = K.frame_jacobian(model, q, name)

        def pos(dq, name=name):
            return K.frame_position(model, K.integrate(model, q, dq), name)

        Jfd = jax.jacfwd(pos)(jnp.zeros(model.nv))
        np.testing.assert_allclose(np.asarray(J), np.asarray(Jfd), atol=1e-12)


def test_frame_jacobian_maps_velocity(model, state):
    """J(q) v must equal the analytic frame velocity."""
    q, v = state
    J = K.frame_jacobian(model, q, "HR_FOOT")
    dt = 1e-7
    p0 = K.frame_position(model, q, "HR_FOOT")
    p1 = K.frame_position(model, K.integrate(model, q, v * dt), "HR_FOOT")
    np.testing.assert_allclose(np.asarray(J @ v), np.asarray((p1 - p0) / dt), atol=1e-5)


def test_centroidal_momentum_linear_in_v(model, state):
    q, v = state
    _, hl1, ha1 = K.centroidal_momentum(model, q, v)
    _, hl2, ha2 = K.centroidal_momentum(model, q, 2.0 * v)
    np.testing.assert_allclose(np.asarray(hl2), 2 * np.asarray(hl1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ha2), 2 * np.asarray(ha1), atol=1e-12)


def test_integrate_difference_roundtrip(model, state):
    q, _ = state
    rng = np.random.default_rng(3)
    dq = jnp.asarray(rng.normal(size=model.nv) * 0.4)
    q2 = K.integrate(model, q, dq)
    np.testing.assert_allclose(np.asarray(K.difference(model, q, q2)), np.asarray(dq), atol=1e-12)


def test_batched_consistency(model, state):
    """Batched FK/RNEA must equal per-sample results (broadcast correctness)."""
    q, v = state
    rng = np.random.default_rng(7)
    B = 4
    qs = jnp.asarray(np.tile(np.asarray(q), (B, 1)) + 0.0)
    qs = qs.at[:, 7:].add(jnp.asarray(rng.normal(size=(B, 12)) * 0.2))
    vs = jnp.asarray(rng.normal(size=(B, model.nv)))
    a = jnp.asarray(rng.normal(size=(B, model.nv)))
    tau_b = K.rnea(model, qs, vs, a)
    for i in range(B):
        tau_i = K.rnea(model, qs[i], vs[i], a[i])
        np.testing.assert_allclose(np.asarray(tau_b[i]), np.asarray(tau_i), atol=1e-12)
