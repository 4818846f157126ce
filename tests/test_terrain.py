"""Terrain-aware contact planning: touchdown/nominal heights follow the
heightfield (the reference plans flat ground only — its Perlin terrain
generator is broken, reference examples/envs/pybullet_env.py:154-201 — so
this is capability beyond parity; flat ground must stay bit-identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.kin import algorithms as K
from bunmpc_tpu.mpc import gait as G
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics


@pytest.fixture(scope="module")
def spec():
    model = Solo12Config.load_model()
    return KD.make_cyclic_spec(model, trot, Solo12Config.q0())


def _flat_terrain(h0, extent=4.0, cell=0.5):
    n = int(2 * extent / cell)
    return physics.Terrain(
        heights=jnp.full((n, n), h0), origin=(-extent, -extent), cell=cell
    )


def _slope_terrain(grade, extent=4.0, cell=0.1):
    """height = grade * x."""
    n = int(2 * extent / cell)
    x = -extent + jnp.arange(n) * cell
    return physics.Terrain(
        heights=jnp.tile((grade * x)[:, None], (1, n)), origin=(-extent, -extent), cell=cell
    )


def _plan(spec, terrain=None, terrain_offset=None, t=0.12, vx=0.3):
    model = spec.model
    q = jnp.asarray(Solo12Config.q0())
    v = jnp.asarray(Solo12Config.v0())
    com = K.com(model, q)
    ee = K.frame_positions(model, q, spec.eff_frames)
    return G.create_cnt_plan(
        spec.gait, spec.planner, spec.horizon, q, jnp.asarray(t),
        jnp.asarray([vx, 0.0, 0.0]), jnp.asarray(0.0), com, ee,
        terrain=terrain, terrain_offset=terrain_offset,
    )


def test_flat_terrain_matches_no_terrain(spec):
    """A zero-height terrain reproduces the flat-ground plan exactly."""
    plan0, mask0 = _plan(spec, terrain=None)
    plan1, mask1 = _plan(spec, terrain=_flat_terrain(0.0))
    np.testing.assert_allclose(np.asarray(plan1.r), np.asarray(plan0.r), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(mask1), np.asarray(mask0))


# Feet in stance at knot 0 carry the *measured* (flat-ground) position until
# their next planned touchdown; after one full gait period every foot has
# re-touched, so assertions window on knots >= _SETTLED.
_SETTLED = 12  # trot: period 0.5 / gait_dt 0.05 + margin


def test_constant_height_offsets_touchdowns(spec):
    """On a raised plateau every re-planned touchdown sits foot_size above it."""
    h0 = 0.10
    plan, _ = _plan(spec, terrain=_flat_terrain(h0))
    r = np.asarray(plan.r)
    np.testing.assert_allclose(
        r[_SETTLED:, :, 2], h0 + spec.planner.foot_size, atol=1e-6
    )


def test_slope_touchdown_follows_local_height(spec):
    """On a 10% slope, planned z equals grade * planned x + foot_size."""
    grade = 0.1
    plan, _ = _plan(spec, terrain=_slope_terrain(grade))
    r = np.asarray(plan.r)
    np.testing.assert_allclose(
        r[_SETTLED:, :, 2],
        grade * r[_SETTLED:, :, 0] + spec.planner.foot_size,
        atol=1e-3,
    )


def test_terrain_offset_maps_plan_frame_to_world(spec):
    """The origin-reset plan frame is mapped back onto the world heightfield
    through terrain_offset (solve_mpc passes the pre-reset base xy)."""
    grade = 0.1
    off = jnp.asarray([1.0, 0.0])
    plan, _ = _plan(spec, terrain=_slope_terrain(grade), terrain_offset=off)
    r = np.asarray(plan.r)
    np.testing.assert_allclose(
        r[_SETTLED:, :, 2],
        grade * (r[_SETTLED:, :, 0] + 1.0) + spec.planner.foot_size,
        atol=1e-3,
    )


def test_solve_mpc_on_plateau(spec):
    """Full kino-dynamic solve on a raised plateau: the optimized CoM height
    and swing via targets track nom_ht / step_ht above the local ground."""
    h0 = 0.08
    terrain = _flat_terrain(h0)
    q = jnp.asarray(Solo12Config.q0()).at[2].add(h0)  # start on the plateau
    v = jnp.asarray(Solo12Config.v0())
    plan = jax.jit(
        lambda q, v: KD.solve_mpc(
            spec, q, v, jnp.asarray(0.0), jnp.asarray([0.2, 0.0, 0.0]),
            jnp.asarray(0.0), terrain=terrain,
        )
    )(q, v)
    assert float(plan.dyn_violation) < 1e-2
    com_z = np.asarray(plan.X_opt)[:, 2]
    # terminal CoM rides nom_ht above the plateau, not above z=0
    assert abs(com_z[-1] - (spec.params.nom_ht + h0)) < 0.03
    assert not np.any(np.isnan(np.asarray(plan.xs_int)))
