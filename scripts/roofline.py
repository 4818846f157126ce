"""Roofline / speed-of-light analysis of the batched MPC hot path.

BASELINE.md's last measurement point: "kernels profiled vs speed-of-light".
For each stage (problem assembly, pallas ADMM, pallas DDP-IK, full fused
solve) this reports XLA's own cost model (FLOPs, HBM bytes accessed) against
measured wall time, i.e. achieved FLOP/s and HBM bandwidth as a fraction of
the chip's peaks — which of compute or memory is the binding roof.

    python scripts/roofline.py [batch=512]

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU,
819 GB/s HBM; override with peak_tflops= / peak_gbs= for other chips.
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


def analyze(name, fn, args, n=5):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else (ca or {})
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    out = jax.block_until_ready(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(compiled(*args))
    dt = (time.perf_counter() - t0) / n
    return dict(name=name, sec=dt, flops=flops, bytes=bytes_acc), out


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    B = int(args.get("batch", 512))
    peak_tflops = float(args.get("peak_tflops", 49.0))  # f32 MXU, v5e
    peak_gbs = float(args.get("peak_gbs", 819.0))

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

    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "xla"

    rows = []

    r, prob = analyze(
        "prep",
        lambda q, v, t, vd, wd: jax.vmap(
            lambda *a: KD._prepare_problem(spec, *a)
        )(q, v, t, vd, wd),
        (q, v, t, v_des, w_des),
    )
    rows.append(r)

    if on_tpu:
        from bunmpc_tpu.solvers import pallas_admm

        cfg = pallas_admm.PallasAdmmConfig(rho=spec.params.rho)
        r, _ = analyze(
            "admm(pallas)",
            lambda prob: pallas_admm.solve(
                prob["plan"], spec.model.total_mass, prob["x_init"], prob["W"],
                prob["X_ref"], prob["W_F"], prob["X_wm"], prob["F_wm"],
                prob["x_bounds"], cfg,
            ),
            (prob,),
        )
        rows.append(r)

    r, _ = analyze(
        "full solve",
        lambda q, v, t, vd, wd: KD.solve_mpc_batch(
            spec, q, v, t, vd, wd, admm_backend=backend, ik_backend=backend
        ),
        (q, v, t, v_des, w_des),
    )
    rows.append(r)

    print(f"B={B}  device={jax.devices()[0]}  peaks: {peak_tflops} TFLOP/s, {peak_gbs} GB/s")
    print(f"{'stage':<14}{'ms':>9}{'GFLOP':>10}{'GB':>9}{'%peak FLOP':>12}{'%peak BW':>10}  roof")
    for r in rows:
        tf = r["flops"] / r["sec"] / 1e12
        gbs = r["bytes"] / r["sec"] / 1e9
        fu = 100 * tf / peak_tflops
        bu = 100 * gbs / peak_gbs
        roof = "compute" if fu > bu else "memory"
        print(
            f"{r['name']:<14}{r['sec']*1e3:>9.2f}{r['flops']/1e9:>10.2f}"
            f"{r['bytes']/1e9:>9.3f}{fu:>11.1f}%{bu:>9.1f}%  {roof}"
        )
    print(
        "NOTE: pallas_call FLOPs are opaque to XLA's cost model (counted 0); "
        "for those stages %peak BW over kernel operand bytes is the meaningful roof."
    )


if __name__ == "__main__":
    main()
