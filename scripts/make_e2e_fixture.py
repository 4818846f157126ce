"""Generate the frozen end-to-end kino-dynamic trajectory fixture.

Solves one Solo12 trot window (t=0.07, vd=0.2 m/s) in the NATIVE f64 golden
library (`bunmpc_kinodyn_solve`: reference-schedule ADMM -> FD-Jacobian
GN-DDP IK, mirroring reference KinoDynMP::optimize kino_dyn.cpp:39-58) at a
tight exit tolerance, and stores inputs + outputs in
``tests/fixtures/solo12_trot_e2e.npz``.

Field names follow the reference ``save_plan`` npz schema
(examples/mpc/abstract_cyclic_gen.py:787-804: com_opt, mom_opt, F_opt, xs,
us, cnt_plan) plus the raw problem inputs so future rounds can re-solve and
regress against the frozen trajectories (tests/test_e2e_parity.py).

Usage: JAX_PLATFORMS=cpu python scripts/make_e2e_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bunmpc_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bunmpc_tpu.mpc import ik as IK  # noqa: E402
from bunmpc_tpu.mpc import kino_dyn as KD  # noqa: E402
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot  # noqa: E402
from bunmpc_tpu.native import bindings as NB  # noqa: E402
from bunmpc_tpu.robots.solo12 import Solo12Config  # noqa: E402

EXIT_TOL = 1e-6
MAX_ADMM = 1200


def main():
    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
    q = jnp.asarray(Solo12Config.q0(), jnp.float64)
    v = jnp.zeros(18, jnp.float64)
    vd = jnp.asarray([0.2, 0.0, 0.0], jnp.float64)
    wd = jnp.asarray(0.0, jnp.float64)
    tt = jnp.asarray(0.07, jnp.float64)
    prob = KD._prepare_problem(spec, q, v, tt, vd, wd)
    m = spec.model.total_mass

    tasks0, x0 = KD._build_ik_tasks(spec, prob, prob["X_wm"])
    w_stage, w_term, ctrl_w, x_reg = IK.dense_weights(
        spec.model, spec.eff_frames, tasks0
    )
    nv = model.nv
    w_sd = np.zeros((spec.ik_hor + 1, 2 * nv))
    w_sd[: spec.ik_hor] = np.asarray(w_stage)[:, -2 * nv :]
    w_sd[spec.ik_hor] = np.asarray(w_term)[-2 * nv :]

    nat = NB.kinodyn_solve(
        model, spec.eff_frames, m,
        np.asarray(prob["plan"].cnt), np.asarray(prob["plan"].r),
        np.asarray(prob["plan"].dt), np.asarray(prob["x_init"]),
        np.asarray(prob["W"]), np.asarray(prob["X_ref"]),
        np.asarray(prob["W_F"]), trot.rho,
        np.asarray(prob["X_wm"]), np.asarray(prob["F_wm"]),
        np.asarray(tasks0.dts), np.asarray(tasks0.ee_targets),
        np.asarray(tasks0.ee_wts), float(tasks0.com_wt), float(tasks0.mom_wt),
        w_sd, np.asarray(x_reg), np.asarray(ctrl_w), np.asarray(x0),
        max_admm=MAX_ADMM, exit_tol=EXIT_TOL, x_bounds=prob["x_bounds"],
    )
    print(f"native solve: viol {nat['viol']:.3e}  admm_iters {nat['admm_iters']}"
          f"  ik_cost {nat['ik_cost']:.12f}")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "solo12_trot_e2e.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    X = nat["X"]
    np.savez(
        out,
        # inputs
        q=np.asarray(q), v=np.asarray(v), t=float(tt),
        v_des=np.asarray(vd), w_des=float(wd),
        exit_tol=EXIT_TOL, max_admm=MAX_ADMM, rho=trot.rho,
        # outputs, raw
        X_opt=X, F_opt=nat["F"], xs=nat["xs"], us=nat["us"],
        dyn_violation=nat["viol"], ik_cost=nat["ik_cost"],
        # reference save_plan schema (abstract_cyclic_gen.py:787-804)
        com_opt=X[:, 0:3],
        mom_opt=np.concatenate([m * X[:, 3:6], X[:, 6:9]], axis=1),
        cnt_plan=np.concatenate(
            [np.asarray(prob["plan"].cnt)[..., None], np.asarray(prob["plan"].r)],
            axis=-1,
        ),
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
