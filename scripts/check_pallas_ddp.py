"""Full-size validation + timing of the fused Pallas DDP-IK kernel on real
TPU: compiled pallas vs vmapped-XLA DDP on the same problems, plus the fused
end-to-end MPC (pallas ADMM + pallas IK) vs the XLA path.

Run: python scripts/check_pallas_ddp.py (needs a TPU device).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pins jax_platforms; re-apply
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bunmpc_tpu.mpc import ik as IK
    from bunmpc_tpu.mpc import kino_dyn as KD
    from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
    from bunmpc_tpu.robots.solo12 import Solo12Config
    from bunmpc_tpu.solvers import ddp
    from bunmpc_tpu.solvers import pallas_ddp as PD

    model = Solo12Config.load_model()
    eff = Solo12Config.eff_names
    H, B = 10, 256
    nq, nv = model.nq, model.nv
    f32 = jnp.float32
    rng = np.random.default_rng(3)
    x_reg = np.concatenate([Solo12Config.q0(), np.zeros(nv)])
    tasks = IK.IkTasks(
        ee_targets=jnp.asarray(rng.normal(size=(H, 4, 3)) * 0.1, f32),
        ee_wts=jnp.asarray(rng.uniform(0.5, 2.0, size=(H, 4)), f32),
        com_ref=jnp.asarray(rng.normal(size=(H + 1, 3)) * 0.05, f32),
        mom_ref=jnp.asarray(rng.normal(size=(H + 1, 6)) * 0.05, f32),
        com_wt=jnp.asarray(3.0, f32),
        mom_wt=jnp.asarray(2.0, f32),
        state_wt=jnp.asarray(rng.uniform(0.1, 1.0, size=2 * nv), f32),
        x_reg=jnp.asarray(x_reg, f32),
        reg_wt_state=0.7,
        reg_wt_ctrl=1e-4,
        ctrl_wt=jnp.asarray(rng.uniform(0.1, 1.0, size=nv), f32),
        dts=jnp.full(H, 0.05, f32),
    )
    q0 = np.tile(Solo12Config.q0(), (B, 1))
    q0[:, 7:] += rng.normal(size=(B, 12)) * 0.03
    x0b = jnp.asarray(np.concatenate([q0, rng.normal(size=(B, nv)) * 0.05], 1), f32)

    xla = jax.jit(jax.vmap(lambda x: IK.solve_ik(model, eff, x, tasks).xs))
    o = jax.block_until_ready(xla(x0b))
    t0 = time.time()
    for _ in range(5):
        o = jax.block_until_ready(xla(x0b))
    t_xla = (time.time() - t0) / 5

    w_stage, w_term, ctrl_w, x_reg_d = IK.dense_weights(model, eff, tasks)
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    pal = jax.jit(
        lambda xb: PD.solve_ik_batch(
            model, eff, xb, tile(tasks.ee_targets), tile(tasks.com_ref),
            tile(tasks.mom_ref), tile(x_reg_d), tile(w_stage), tile(w_term),
            tile(ctrl_w), tile(tasks.dts),
        )[0]
    )
    o2 = jax.block_until_ready(pal(x0b))
    t0 = time.time()
    for _ in range(5):
        o2 = jax.block_until_ready(pal(x0b))
    t_pal = (time.time() - t0) / 5
    err = np.abs(np.asarray(o2) - np.asarray(o)).max()
    print(f"IK B={B} H={H}: xla {t_xla*1e3:.1f} ms, pallas {t_pal*1e3:.1f} ms "
          f"({t_xla/t_pal:.2f}x), max|xs diff| {err:.2e}")

    # end-to-end MPC
    spec = KD.make_cyclic_spec(model, trot, Solo12Config.q0())
    qb = jnp.asarray(q0, f32)
    vb = jnp.asarray(rng.normal(size=(B, nv)) * 0.05, f32)
    tb = jnp.asarray(rng.uniform(0, 0.5, size=B), f32)
    vd = jnp.asarray(np.stack([rng.uniform(-0.3, 0.5, B), rng.uniform(-0.2, 0.2, B), np.zeros(B)], -1), f32)
    wd = jnp.asarray(rng.uniform(-0.3, 0.3, size=B), f32)
    for name, ab, ib in (("xla+xla", "xla", "xla"), ("pallas+pallas", "pallas", "pallas")):
        fn = jax.jit(lambda q, v, t, a, w, _ab=ab, _ib=ib: KD.solve_mpc_batch(
            spec, q, v, t, a, w, admm_backend=_ab, ik_backend=_ib))
        p = jax.block_until_ready(fn(qb, vb, tb, vd, wd))
        t0 = time.time()
        for _ in range(5):
            p = jax.block_until_ready(fn(qb, vb, tb, vd, wd))
        dt = (time.time() - t0) / 5
        conv = float(jnp.mean((p.dyn_violation < 1e-2).astype(f32)))
        print(f"MPC {name}: {B/dt:.1f} solves/s ({dt*1e3:.1f} ms/batch, conv {conv:.2f})")


if __name__ == "__main__":
    main()
