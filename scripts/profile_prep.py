"""Sub-stage timing of batched problem assembly (ROADMAP perf lever 1).

Splits `_prepare_problem` (the ~25 ms standalone prep at B=512,
fusion-granularity bound per scripts/roofline.py) into its three compute
stages to direct the fusion work:

  (a) FK + centroidal state + foot positions (kin.centroidal_state_and_frames)
  (b) contact-plan construction (gait.create_cnt_plan)
  (c) cost/bound/warm-start assembly (the remainder, by subtraction)

plus the full prep and the full fused solve, at B=512 on the current device.
Writes artifacts/profile_prep.json.

Usage: python scripts/profile_prep.py [B]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bunmpc_tpu.kin import algorithms as K
from bunmpc_tpu.mpc import gait as G
from bunmpc_tpu.mpc import kino_dyn as KD
from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.utils import jsonio
from bunmpc_tpu.utils import quat as Q


def timeit(fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    model = Solo12Config.load_model()
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(np.tile(Solo12Config.q0(), (B, 1)), dtype)
    q = q.at[:, 7:].add(jnp.asarray(rng.normal(size=(B, 12)) * 0.05, dtype))
    v = jnp.asarray(rng.normal(size=(B, 18)) * 0.05, dtype)
    t = jnp.asarray(rng.uniform(0, 0.5, size=B), dtype)
    v_des = jnp.asarray(
        np.stack([rng.uniform(-0.3, 0.5, B), rng.uniform(-0.2, 0.2, B), np.zeros(B)], -1),
        dtype,
    )
    w_des = jnp.asarray(rng.uniform(-0.3, 0.3, size=B), dtype)

    # (a) FK + centroidal + frames
    kin = jax.jit(
        jax.vmap(lambda q, v: K.centroidal_state_and_frames(model, q, v, spec.eff_frames))
    )
    dt_kin, (com, h_lin, h_ang, ee_pos) = timeit(kin, q, v)

    # (b) contact plan, from precomputed kin quantities
    def cnt_one(q, t, vd, wd, com, ee):
        qr = q.at[0:2].set(0.0)
        R = Q.quat_to_rot(qr[3:7])
        return G.create_cnt_plan(
            spec.gait, spec.planner, spec.horizon, qr, t, R @ vd, wd, com, ee
        )

    cnt = jax.jit(jax.vmap(cnt_one))
    dt_cnt, _ = timeit(cnt, q, t, v_des, w_des, com, ee_pos)

    # full prep
    prep = jax.jit(
        jax.vmap(lambda q, v, t, vd, wd: KD._prepare_problem(spec, q, v, t, vd, wd))
    )
    dt_prep, _ = timeit(prep, q, v, t, v_des, w_des)

    # full fused solve (pallas backends on TPU, XLA twins elsewhere)
    on_tpu = jax.devices()[0].platform == "tpu"
    be = "pallas" if on_tpu else "xla"
    full = jax.jit(
        lambda q, v, t, vd, wd: KD.solve_mpc_batch(
            spec, q, v, t, vd, wd, admm_backend=be, ik_backend=be
        )
    )
    dt_full, plans = timeit(full, q, v, t, v_des, w_des, n=5)
    ok = float(jnp.mean((plans.dyn_violation < 1e-2).astype(jnp.float32)))

    # A/B in ONE process (±15% day-to-day chip variance): fused problem
    # assembly (prep built inside the ADMM kernel, fuse_prep=True)
    dt_fused, ok_fused, fused_dx = float("nan"), float("nan"), float("nan")
    if on_tpu:
        fullf = jax.jit(
            lambda q, v, t, vd, wd: KD.solve_mpc_batch(
                spec, q, v, t, vd, wd, admm_backend="pallas", ik_backend="pallas",
                fuse_prep=True,
            )
        )
        dt_fused, plans_f = timeit(fullf, q, v, t, v_des, w_des, n=5)
        ok_fused = float(jnp.mean((plans_f.dyn_violation < 1e-2).astype(jnp.float32)))
        fused_dx = float(
            jnp.max(jnp.abs(plans_f.X_opt - plans.X_opt))
        )  # on-chip parity of the dynamics solution

    out = {
        "B": B,
        "device": str(jax.devices()[0]),
        "kin_ms": round(dt_kin * 1e3, 3),
        "cnt_plan_ms": round(dt_cnt * 1e3, 3),
        "prep_ms": round(dt_prep * 1e3, 3),
        "assembly_remainder_ms": round((dt_prep - dt_kin - dt_cnt) * 1e3, 3),
        "full_ms": round(dt_full * 1e3, 3),
        "prep_share": round(dt_prep / dt_full, 3),
        "solves_per_s": round(B / dt_full, 1),
        "converged_frac": ok,
        "fused_full_ms": round(dt_fused * 1e3, 3) if dt_fused == dt_fused else None,
        "fused_solves_per_s": round(B / dt_fused, 1) if dt_fused == dt_fused else None,
        "fused_converged_frac": ok_fused if ok_fused == ok_fused else None,
        "fused_max_dX": fused_dx if fused_dx == fused_dx else None,
    }
    print(json.dumps(out))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jsonio.write_json(os.path.join(root, "artifacts", "profile_prep.json"), out)


if __name__ == "__main__":
    main()
