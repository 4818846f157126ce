"""Per-phase timing breakdown of the batched MPC solve on the real chip.

Times (a) problem assembly, (b) centroidal ADMM (pallas), (c) DDP IK,
(d) the full fused solve, at B=256 — to direct kernel optimization work
(ROADMAP item 2: the IK share dominates).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

import os as _os

if _os.environ.get("JAX_PLATFORMS"):  # sitecustomize pins jax_platforms; re-apply
    jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.solvers import ddp, pallas_admm


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())

    B = 256
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.tile(Solo12Config.q0(), (B, 1)), dtype)
    q = q.at[:, 7:].add(jnp.asarray(rng.normal(size=(B, 12)) * 0.05, dtype))
    v = jnp.asarray(rng.normal(size=(B, 18)) * 0.05, dtype)
    t = jnp.asarray(rng.uniform(0, 0.5, size=B), dtype)
    v_des = jnp.asarray(
        np.stack([rng.uniform(-0.3, 0.5, B), rng.uniform(-0.2, 0.2, B), np.zeros(B)], -1), dtype
    )
    w_des = jnp.asarray(rng.uniform(-0.3, 0.3, size=B), dtype)

    # (a) problem assembly
    prep = jax.jit(
        lambda q, v, t, vd, wd: jax.vmap(
            lambda q, v, t, vd, wd: KD._prepare_problem(spec, q, v, t, vd, wd)
        )(q, v, t, vd, wd)
    )
    dt_prep, prob = timeit(prep, q, v, t, v_des, w_des)

    # (b) pallas ADMM
    cfg = pallas_admm.PallasAdmmConfig(rho=spec.params.rho)

    def admm(prob):
        return pallas_admm.solve(
            prob["plan"], spec.model.total_mass, prob["x_init"], prob["W"], prob["X_ref"],
            prob["W_F"], prob["X_wm"], prob["F_wm"], prob["x_bounds"], cfg,
        )

    admm_j = jax.jit(admm)
    dt_admm, (X, F, viol, iters) = timeit(admm_j, prob)

    # (c) IK from fixed dynamics solution — XLA (vmapped DDP) vs pallas kernel
    def ik_only(prob, X, F, viol, iters):
        return jax.vmap(
            lambda prob, X, F, viol, iters: KD._finish_solve(
                spec, prob, X, F, viol, iters, ddp.DdpConfig()
            )
        )(prob, X, F, viol, iters)

    ik_j = jax.jit(ik_only)
    dt_ik, _ = timeit(ik_j, prob, X, F, viol, iters)

    dt_ik_pallas = float("nan")
    if jax.devices()[0].platform == "tpu":
        from bunmpc_tpu.mpc import ik as IKmod
        from bunmpc_tpu.solvers import pallas_ddp

        def ik_pallas(prob, X):
            def build_one(pr, Xi):
                tk, x0 = KD._build_ik_tasks(spec, pr, Xi)
                ws, wt_, cw, xr = IKmod.dense_weights(spec.model, spec.eff_frames, tk)
                return x0, tk.ee_targets, tk.com_ref, tk.mom_ref, xr, ws, wt_, cw, tk.dts

            args = jax.vmap(build_one)(prob, X)
            return pallas_ddp.solve_ik_batch(
                spec.model, spec.eff_frames, *args, cfg=pallas_ddp.PallasDdpConfig()
            )

        dt_ik_pallas, _ = timeit(jax.jit(ik_pallas), prob, X)

    # (d) full fused batch solve
    full = jax.jit(lambda q, v, t, vd, wd: KD.solve_mpc_batch(spec, q, v, t, vd, wd))
    dt_full, plans = timeit(full, q, v, t, v_des, w_des)
    ok = float(jnp.mean((plans.dyn_violation < 1e-2).astype(jnp.float32)))

    print(f"B={B}")
    print(f"prep      : {dt_prep*1e3:8.2f} ms")
    print(f"admm      : {dt_admm*1e3:8.2f} ms")
    print(f"ik (xla)  : {dt_ik*1e3:8.2f} ms")
    print(f"ik (pallas): {dt_ik_pallas*1e3:7.2f} ms")
    print(f"full      : {dt_full*1e3:8.2f} ms  ({B/dt_full:.0f} solves/s, conv={ok:.2f})")


if __name__ == "__main__":
    main()
