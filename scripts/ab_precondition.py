"""A/B the Jacobi-preconditioned pallas ADMM against the scalar-step kernel.

One process, identical inputs (the verify rule: never compare perf across
runs on the tunneled chip). Reports wall time, iteration counts, final
violation, and solution agreement for both kernels plus the full fused solve.

Usage: python scripts/ab_precondition.py [batch=256]
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

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.solvers import pallas_admm


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("batch", 256))

    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
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
    prob = jax.jit(jax.vmap(lambda *a: KD._prepare_problem(spec, *a)))(q, v, t, v_des, w_des)

    results = {}
    for precond in (False, True):
        cfg = pallas_admm.PallasAdmmConfig(rho=spec.params.rho, precondition=precond)

        def admm(prob, cfg=cfg):
            return pallas_admm.solve(
                prob["plan"], spec.model.total_mass, prob["x_init"], prob["W"],
                prob["X_ref"], prob["W_F"], prob["X_wm"], prob["F_wm"],
                prob["x_bounds"], cfg,
            )

        dt_k, (X, F, viol, iters) = timeit(jax.jit(admm), prob)
        results[precond] = (dt_k, X, F, viol, iters)
        print(
            f"precondition={precond}: {dt_k*1e3:8.2f} ms  "
            f"viol mean={float(jnp.mean(viol)):.2e} max={float(jnp.max(viol)):.2e}  "
            f"outer iters mean={float(jnp.mean(iters)):.1f}"
        )

    dX = float(jnp.max(jnp.abs(results[True][1] - results[False][1])))
    dF = float(jnp.max(jnp.abs(results[True][2] - results[False][2])))
    speedup = results[False][0] / results[True][0]
    print(f"max|dX|={dX:.2e} max|dF|={dF:.2e}  speedup={speedup:.2f}x")

    # end-to-end fused solve with the preconditioned kernel
    full = jax.jit(lambda q, v, t, vd, wd: KD.solve_mpc_batch(spec, q, v, t, vd, wd))
    dt_f, plans = timeit(full, q, v, t, v_des, w_des)
    ok = float(jnp.mean((plans.dyn_violation < 1e-2).astype(jnp.float32)))
    print(f"full solve: {dt_f*1e3:.2f} ms ({B/dt_f:.0f} solves/s, conv={ok:.2f})")


if __name__ == "__main__" and "mode=accel" not in sys.argv:
    main()


def ab_acceleration():
    """A/B the outer-loop acceleration (dual over-relaxation + rho
    escalation) against plain dual ascent, one process, identical inputs.
    Invoked with mode=accel."""
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("batch", 256))

    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
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

    variants = {
        "plain": pallas_admm.PallasAdmmConfig(
            rho=spec.params.rho, dual_relax=1.0, rho_growth=1.0
        ),
        "accel": pallas_admm.PallasAdmmConfig(rho=spec.params.rho),
    }
    outs = {}
    for name, cfg in variants.items():
        full = jax.jit(
            lambda q, v, t, vd, wd, cfg=cfg: KD.solve_mpc_batch(
                spec, q, v, t, vd, wd, admm_cfg=cfg
            )
        )
        dt_f, plans = timeit(full, q, v, t, v_des, w_des)
        ok = float(jnp.mean((plans.dyn_violation < 1e-2).astype(jnp.float32)))
        strict = float(jnp.mean((plans.dyn_violation < 1e-3).astype(jnp.float32)))
        outs[name] = (dt_f, plans)
        print(
            f"{name}: {dt_f*1e3:7.2f} ms ({B/dt_f:5.0f} solves/s) "
            f"viol mean={float(jnp.mean(plans.dyn_violation)):.2e} "
            f"iters mean={float(jnp.mean(plans.admm_iters)):.1f} "
            f"conv@1e-2={ok:.2f} conv@1e-3={strict:.2f}"
        )
    dx = float(jnp.max(jnp.abs(outs["accel"][1].xs_int - outs["plain"][1].xs_int)))
    df = float(jnp.max(jnp.abs(outs["accel"][1].f_int - outs["plain"][1].f_int)))
    print(
        f"speedup={outs['plain'][0]/outs['accel'][0]:.2f}x  "
        f"max|d xs_int|={dx:.2e}  max|d f_int|={df:.2e}"
    )


if __name__ == "__main__" and "mode=accel" in sys.argv:
    ab_acceleration()
    sys.exit(0)
