"""Headline benchmark: batched Solo12 trot MPC solves/s on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference BiConMP solves ONE MPC at a time inside a 50 ms
replanning budget on a desktop CPU, i.e. ~20 solves/s per process
(reference simulation.py:44, BASELINE.md). ``vs_baseline`` reports our
batched solves/s against that 20/s figure. The north-star target in
BASELINE.json is >= 1000 solves/s per host.
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bunmpc_tpu.mpc import kino_dyn as KD
    from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
    from bunmpc_tpu.robots.solo12 import Solo12Config

    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())

    B = 512  # throughput-optimal on one v5e chip (B=256 compiles faster but
    # leaves ~15% on the table; see scripts/profile_breakdown.py)
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

    # fully-fused batched path: pallas ADMM + pallas DDP-IK kernels
    # (falls back to the vmapped XLA path on non-TPU backends), with the
    # accelerated outer-ADMM schedule validated for Solo12 trot (dual
    # over-relaxation + rho escalation; scripts/ab_precondition.py mode=accel:
    # ~30 outer iters instead of the 100-iteration cap, conv@1e-3 = 1.00)
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "xla"
    # Defaults carry the accelerated outer schedule (dual over-relaxation +
    # rho escalation w/ divergence backoff, default-on since round 3).
    # x_solver="thomas": exact block-tridiagonal X-subproblem solve (one
    # ~H-step Cholesky sweep instead of <=150 FISTA iterations per ADMM
    # iteration; solvers/block_thomas.py) — measured +18% end-to-end at
    # B=512 (3688 -> 4368 solves/s, same trajectories, conv@1e-3 = 1.0).
    # fista_max_iters=30 caps the remaining F-subproblem FISTA: validated
    # conv@1e-3 = 1.0 across the B=512 Solo12 command envelope with
    # trajectory drift within the ADMM's own solution tolerance (~1e-2);
    # heavier robots keep the 150 default.
    if on_tpu:
        from bunmpc_tpu.solvers.pallas_admm import PallasAdmmConfig

        admm_cfg = PallasAdmmConfig(rho=trot.rho, x_solver="thomas", fista_max_iters=30)
    else:
        from bunmpc_tpu.solvers.biconvex import BiconvexConfig

        admm_cfg = BiconvexConfig(rho=trot.rho, x_solver="thomas", fista_max_iters=30)
    solve = jax.jit(
        lambda q, v, t, vd, wd: KD.solve_mpc_batch(
            spec, q, v, t, vd, wd, admm_cfg=admm_cfg,
            admm_backend=backend, ik_backend=backend,
        )
    )

    # warm-up / compile
    plans = jax.block_until_ready(solve(q, v, t, v_des, w_des))
    # converged = at the solver's own exit tolerance (reference exit_tol 1e-3,
    # biconvex.hpp:160) — NOT a looser headline gate
    ok = float(jnp.mean((plans.dyn_violation < 1e-3).astype(jnp.float32)))

    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        plans = jax.block_until_ready(solve(q, v, t, v_des, w_des))
    dt = (time.perf_counter() - t0) / n_rep
    solves_per_sec = B / dt

    print(
        json.dumps(
            {
                "metric": "trot_mpc_solves_per_sec",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 20.0, 2),
                "batch": B,
                "sec_per_batch": round(dt, 4),
                "converged_frac": round(ok, 3),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
