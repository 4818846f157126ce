"""Multi-database BC benchmark tests (reference
behavioral_cloning_train_multi_database.py /
behavioral_cloning_vc_evaluation_multi_database.py)."""

import os

import jax.numpy as jnp
import numpy as np

from bunmpc_tpu.eval import multi_database as MD
from bunmpc_tpu.learning import bc
from bunmpc_tpu.learning.database import Database
from bunmpc_tpu.eval.velocity_grid import GridEvalResult
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics, rollout

TINY = bc.BcConfig(batch_size=64, n_epoch=3, num_hidden_layer=1, hidden_dim=32)


def _make_db_file(path, seed, n=256):
    rng = np.random.default_rng(seed)
    states = rng.normal(size=(n, 43)).astype(np.float32)
    goals = rng.normal(size=(n, 5)).astype(np.float32)
    W = rng.normal(size=(48, 12)).astype(np.float32) * 0.3
    actions = np.concatenate([states, goals], -1) @ W
    db = Database(limit=10 * n, goal_type="vc")
    db.append(states, actions, vc_goals=goals)
    db.save(path)
    return db


def test_train_from_databases(tmp_path):
    p1 = os.path.join(tmp_path, "database_256.hdf5")
    p2 = os.path.join(tmp_path, "database_512.hdf5")
    _make_db_file(p1, 0, 256)
    _make_db_file(p2, 1, 512)
    entries = MD.train_from_databases([p1, p2], goal_type="vc", cfg=TINY)
    assert [e.label for e in entries] == ["database_256", "database_512"]
    assert [e.db_size for e in entries] == [256, 512]
    for e in entries:
        assert np.isfinite(e.final_train_loss) and np.isfinite(e.final_valid_loss)
        # the targets are a linear map of the inputs: a few epochs must make
        # progress vs the ~|N(0,2)| initial L1 level
        assert e.final_train_loss < 2.0
        out = e.bundle(jnp.zeros(43), jnp.zeros(5))
        assert out.shape == (12,)


def test_comparison_table(tmp_path):
    def fake_grid(k):
        n = 3
        return GridEvalResult(
            v_des=np.tile([[0.1 * k, 0.0, 0.0]], (n, 1)),
            w_des=np.zeros(n),
            vx_mse=np.full(n, 0.01 * (k + 1)),
            vy_mse=np.full(n, 0.02),
            survived=np.array([True, True, k == 0]),
            mean_speed=np.full(n, 0.1),
        )

    entries = [
        MD.PolicyEntry(label=f"db_{k}", bundle=None, db_size=100 * (k + 1),
                       final_train_loss=0.1, final_valid_loss=0.2)
        for k in range(2)
    ]
    res = MD.ComparisonResult(entries=entries, grids={e.label: fake_grid(i) for i, e in enumerate(entries)})
    s = res.summary()
    assert s["db_0"]["survival_rate"] == 1.0
    assert s["db_1"]["survival_rate"] < 1.0
    assert s["db_1"]["db_size"] == 200
    csv_path = os.path.join(tmp_path, "cmp.csv")
    res.to_csv(csv_path)
    with open(csv_path) as fh:
        lines = fh.read().strip().splitlines()
    assert len(lines) == 1 + 2 * 3  # header + 2 policies x 3 commands


def test_compare_policies_integration(tmp_path):
    """End-to-end: one trained (untuned) policy swept over a 1-point grid —
    checks the vmapped rollout plumbing, not tracking quality."""
    p1 = os.path.join(tmp_path, "database_256.hdf5")
    _make_db_file(p1, 0, 256)
    entries = MD.train_from_databases([p1], goal_type="vc", cfg=TINY)
    spec = KD.make_cyclic_spec(Solo12Config.load_model(), trot, Solo12Config.q0())
    sim_params = physics.SimParams(contact=physics.ContactParams(mu=1.0))
    cfg = rollout.RolloutConfig(
        episode_length=200, kp=trot.kp, kd=trot.kd, gait_period=trot.gait_period
    )
    state0 = physics.SimState(q=jnp.asarray(Solo12Config.q0()), v=jnp.zeros(18))
    res = MD.compare_policies(spec, sim_params, cfg, state0, entries, vx_values=(0.0,))
    g = res.grids["database_256"]
    assert g.vx_mse.shape == (1,)
    assert np.isfinite(g.vx_mse).all()
