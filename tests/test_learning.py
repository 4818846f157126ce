"""Learning-substrate tests: database ring buffer + normalization, BC
training convergence, policy checkpointing, goals, Bayesian grid, GP-BO,
perturbations — the L7/L8 layer of the reference (database.py, networks.py,
behavioral_cloning_train.py, locosafedagger_modified.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bunmpc_tpu.learning import bayes, bc, goals, gp_bo, perturbations
from bunmpc_tpu.learning.database import Database
from bunmpc_tpu.robots.solo12 import Solo12Config


def _toy_data(n, rng, goal_dim=5):
    states = rng.normal(size=(n, 43)).astype(np.float32)
    goals_ = rng.normal(size=(n, goal_dim)).astype(np.float32)
    W = rng.normal(size=(43 + goal_dim, 12)).astype(np.float32) * 0.3
    actions = np.concatenate([states, goals_], -1) @ W
    return states, goals_, actions.astype(np.float32)


def test_database_ring_buffer():
    rng = np.random.default_rng(0)
    db = Database(limit=100, goal_type="vc")
    s, g, a = _toy_data(60, rng)
    db.append(s, a, vc_goals=g)
    assert len(db) == 60
    # overflow overwrites the oldest entries (database.py:104-146)
    s2, g2, a2 = _toy_data(60, rng)
    db.append(s2, a2, vc_goals=g2)
    assert len(db) == 100
    np.testing.assert_allclose(db.states[-1], s2[-1])
    np.testing.assert_allclose(db.states[0], s[20])  # first 20 overwritten


def test_database_normalization():
    rng = np.random.default_rng(1)
    db = Database(limit=1000, goal_type="cc")
    s, g, a = _toy_data(500, rng, goal_dim=12)
    db.append(s, a, cc_goals=g)
    x, y = db.xy()
    # normalized state features ~ zero mean unit std
    assert np.abs(x[:, :43].mean(0)).max() < 0.1
    assert np.abs(x[:, :43].std(0) - 1).max() < 0.1
    # vc goals pass through unnormalized (database.py:201-206)
    db2 = Database(limit=1000, goal_type="vc")
    db2.append(s, a, vc_goals=g[:, :5])
    x2, _ = db2.xy()
    np.testing.assert_allclose(x2[:, 43:], g[:, :5], atol=1e-6)


def test_bc_training_learns_linear_map():
    """BC on a linear teacher must reach low loss quickly."""
    rng = np.random.default_rng(2)
    db = Database(limit=5000, goal_type="vc")
    s, g, a = _toy_data(2000, rng)
    db.append(s, a, vc_goals=g)
    cfg = bc.BcConfig(n_epoch=30, batch_size=256, num_hidden_layer=2, hidden_dim=64)
    bundle, report = bc.train_policy(db, cfg, rng_seed=0)
    assert report.valid_losses[-1] < 0.4 * report.valid_losses[0]
    # bundle call normalizes + concatenates like the rollout path
    out = bundle(jnp.asarray(s[0]), jnp.asarray(g[0]))
    assert out.shape == (12,)


def test_bc_training_sharded_mesh():
    """The data-parallel train step must work over the 8-device mesh and give
    the same kind of convergence."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(3)
    db = Database(limit=5000, goal_type="vc")
    s, g, a = _toy_data(1000, rng)
    db.append(s, a, vc_goals=g)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("batch",))
    cfg = bc.BcConfig(n_epoch=5, batch_size=256, num_hidden_layer=2, hidden_dim=64)
    bundle, report = bc.train_policy(db, cfg, rng_seed=0, mesh=mesh)
    assert report.train_losses[-1] < report.train_losses[0]


def test_policy_checkpoint_roundtrip(tmp_path):
    from bunmpc_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(4)
    db = Database(limit=1000, goal_type="vc")
    s, g, a = _toy_data(300, rng)
    db.append(s, a, vc_goals=g)
    cfg = bc.BcConfig(n_epoch=2, batch_size=64, num_hidden_layer=2, hidden_dim=32)
    bundle, _ = bc.train_policy(db, cfg, rng_seed=0)
    path = os.path.join(tmp_path, "policy")
    ckpt.save_policy(bundle, path)
    loaded = ckpt.load_policy(path)
    x_s, x_g = jnp.asarray(s[0]), jnp.asarray(g[0])
    np.testing.assert_allclose(
        np.asarray(bundle(x_s, x_g)), np.asarray(loaded(x_s, x_g)), atol=1e-6
    )


def test_cc_goal_construction():
    """cc goals measure steps-to-contact and planar offsets (utils.py:36-102)."""
    schedule = np.zeros((2, 3, 4))
    schedule[0, :, 0] = [100, 300, 500]
    schedule[0, :, 1] = [0.1, 0.2, 0.3]
    schedule[1, :, 0] = [200, 400, 600]
    schedule[1, :, 1] = [0.15, 0.25, 0.35]
    com = np.zeros((500, 3))
    com[:, 0] = np.linspace(0, 0.5, 500)
    goal = goals.construct_cc_goal(500, 2, schedule, com, goal_horizon=1)
    assert goal.shape == (500, 6)
    # at t=150 the next contact of foot 0 is at step 300
    assert goal[150, 0] == 300 - 150
    # planar offset = com_x - contact_x
    np.testing.assert_allclose(goal[150, 1], com[150, 0] - 0.2, atol=1e-9)


def test_contact_schedule_from_rollout():
    in_contact = np.zeros((100, 2), bool)
    in_contact[10:40, 0] = True
    in_contact[60:90, 0] = True
    in_contact[30:70, 1] = True
    pos = np.zeros((100, 2, 3))
    pos[:, 0, 0] = 1.0
    events = goals.contact_events_from_rollout(in_contact, pos)
    assert len(events) == 3
    sched = goals.construct_contact_schedule(events, 2)
    assert sched[0, 0, 0] == 10 and sched[0, 1, 0] == 60
    assert sched[1, 0, 0] == 30


def test_bayes_grid_update():
    grid = bayes.GoalGrid.make((-0.5, 0.5), (-0.2, 0.2), (-0.3, 0.3), n=20)
    prior = grid.uniform_prior()
    like = bayes.compute_likelihood(grid, np.array([0.3, 0.0, 0.0]), sigma=0.1)
    post = bayes.update_goal_distribution(prior, like)
    assert abs(post.sum() - 1.0) < 1e-9
    # posterior mass concentrates near the observed goal
    i, j, k = np.unravel_index(np.argmax(post), grid.shape)
    assert abs(grid.vx[i] - 0.3) < 0.1
    rng = np.random.default_rng(0)
    g = bayes.random_sample_from_distribution(rng, grid, post)
    assert g.shape == (3,)


def test_gp_bo_finds_minimum():
    def objective(x):
        return float((x[0] - 0.2) ** 2 + (x[1] + 0.1) ** 2)

    best_x, best_y = gp_bo.gp_minimize(objective, [(-1, 1), (-1, 1)], n_calls=25, seed=0)
    assert best_y < 0.05


def test_nullspace_perturbation_keeps_stance_feet():
    """Nullspace-projected perturbations must not move feet in contact
    (data_collection.py:243-247)."""
    model = Solo12Config.load_model()
    eff = tuple(Solo12Config.eff_names)
    q0 = jnp.asarray(Solo12Config.q0())
    cnt = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    key = jax.random.PRNGKey(0)
    q_p, v_p, ok = perturbations.sample_perturbed_state(
        model, eff, key, q0, jnp.zeros(18), cnt
    )
    assert bool(ok)
    from bunmpc_tpu.kin import algorithms as K

    feet0 = np.asarray(K.frame_positions(model, q0, eff))
    feet1 = np.asarray(K.frame_positions(model, q_p, eff))
    # feet stay close (first-order nullspace projection on a nonlinear map)
    assert np.abs(feet1 - feet0).max() < 0.03
    # but the configuration did change
    assert np.abs(np.asarray(q_p - q0)).max() > 0.01
