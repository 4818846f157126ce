"""Committed end-to-end learning-loop demonstration at real scale.

VERDICT round-3 task 3: one committed run showing the iterative safe-learning
loop actually LEARNING — >=3 SafeDagger iterations, >=32 rollouts/iteration,
2000-step episodes (reference scale: safedagger_modified.py:464-900,
episode_length 2000-5000, cfgs/safedagger_modified_config.yaml) — with
(a) the BC loss falling across iterations and (b) the learned policy's
velocity-grid tracking improving over the warmup (iteration-0) policy.

Setup: Solo12 trot with the sim-validated gains/contact params from the
round-2 stability sweep (trot_sim kp=8/kd=0.3 + kn=1e4/dn=500/kt=500 —
the reference's PyBullet-tuned kp=3 rolls over on the implicit contact
model, ROADMAP), so the expert rollouts the loop trains on actually walk.

After warmup and after every iteration the current policy is evaluated on a
fixed (vx, w=0) velocity grid (eval/velocity_grid.py — the twin of the
reference's per-iteration eval sweep, safedagger_modified.py:491-516).

Writes artifacts/learning_demo_safedagger.jsonl — one JSON line per stage —
gated by tests/test_learning_demo.py.

Usage: python scripts/run_learning_demo.py [out_path] [n_iterations]
        [rollouts_per_iter] [episode_ms]
Runs on the TPU (~tens of minutes); serialize with other TPU processes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pins jax_platforms
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bunmpc_tpu.eval.velocity_grid import eval_policy_grid
from bunmpc_tpu.learning.bc import BcConfig
from bunmpc_tpu.learning.dagger import DaggerConfig, SafeDagger
from bunmpc_tpu.learning.networks import policy_fn_from_tree, policy_tree
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot_sim
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics, rollout


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(root, "artifacts", "learning_demo_safedagger.jsonl")
    )
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_roll = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    ep_ms = int(sys.argv[4]) if len(sys.argv) > 4 else 2000

    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot_sim, Solo12Config.q0())
    sim_params = physics.SimParams(
        contact=physics.ContactParams(kn=1e4, dn=500.0, kt=500.0),
    )
    cfg = DaggerConfig(
        episode_length=ep_ms,
        n_iterations=n_iter,
        rollouts_per_iteration=n_roll,
        vx_range=(-0.2, 0.4),
        vy_range=(-0.1, 0.1),
        w_range=(-0.2, 0.2),
        warmup_bc_epochs=100,
        bc=BcConfig(n_epoch=40),
    )
    driver = SafeDagger(spec, cfg, sim_params=sim_params, seed=0)

    # fixed eval grid, shared across stages (reference eval sweep shape:
    # vx in linspace over the command envelope, safedagger config:491-516)
    vx_grid = np.linspace(0.0, 0.33, 12)
    ecfg = rollout.RolloutConfig(
        episode_length=ep_ms,
        action_type=cfg.action_type,
        kp=trot_sim.kp,
        kd=trot_sim.kd,
        gait_period=trot_sim.gait_period,
    )
    state0 = physics.SimState(
        q=jnp.asarray(Solo12Config.q0(), jnp.float32),
        v=jnp.zeros(model.nv, jnp.float32),
    )

    def eval_hook(drv):
        t0 = time.time()
        pol_fn = policy_fn_from_tree(drv.policy.module, policy_tree(drv.policy))
        res = eval_policy_grid(
            spec, sim_params, ecfg, state0, pol_fn, vx_grid, w_values=(0.0,)
        )
        s = res.summary()
        # scalar gates: (1) mean survival time (graded — binary survival
        # saturates at 0 early in learning), (2) tracking MSE with failed
        # commands charged the worst surviving error x2 (dying early can't
        # look "accurate"); inf while nothing survives
        mse = res.vx_mse + res.vy_mse
        if res.survived.any():
            penalty = 2.0 * float(mse[res.survived].max())
        else:
            penalty = float("inf")
        score = float(np.where(res.survived, mse, penalty).mean())
        return {
            "eval": {
                **s,
                "tracking_score": score,
                "per_vx": [
                    {
                        "vx_des": float(res.v_des[i, 0]),
                        "vx_mse": float(res.vx_mse[i]),
                        "survived": bool(res.survived[i]),
                        "survival_ms": int(res.fail_step[i]),
                        "mean_speed": float(res.mean_speed[i]),
                    }
                    for i in range(len(res.w_des))
                ],
                "eval_seconds": round(time.time() - t0, 1),
            }
        }

    t0 = time.time()
    logs = driver.run(Solo12Config.q0(), Solo12Config.v0(), eval_hook=eval_hook)
    wall = time.time() - t0

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "meta": {
                        "mode": "safedagger",
                        "robot": "solo12",
                        "gait": "trot_sim",
                        "n_iterations": n_iter,
                        "rollouts_per_iteration": n_roll,
                        "episode_length": ep_ms,
                        "warmup_bc_epochs": cfg.warmup_bc_epochs,
                        "bc_epochs": cfg.bc.n_epoch,
                        "device": str(jax.devices()[0]),
                        "wall_seconds": round(wall, 1),
                    }
                }
            )
            + "\n"
        )
        for entry in logs:
            fh.write(json.dumps(entry) + "\n")
    print(f"wrote {out} ({len(logs)} stages, {wall:.0f}s)")
    for entry in logs:
        it = entry.get("iteration")
        ev = entry.get("eval", {})
        print(
            f"  it={it} train_loss={entry.get('train_loss', float('nan')):.4f} "
            f"valid_loss={entry.get('valid_loss', float('nan')):.4f} "
            f"survival={ev.get('survival_rate')} "
            f"mean_survival_ms={ev.get('mean_survival_ms')} "
            f"score={ev.get('tracking_score')}"
        )


if __name__ == "__main__":
    main()
