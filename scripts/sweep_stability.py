"""In-sim trot stability sweep over PD gains x ground stiffness — ONE compile.

Exploits the pytree-ness of SimParams/ContactParams/IdControllerGains: a
single vmapped rollout program evaluates every (kp, kd, kn, dn, kt) combo in
parallel on the chip (the reference would need one PyBullet process per
combo). Drives the ROADMAP gait-quality items: Solo12 roll envelope and Go2
forward-walk tuning.

Usage: python scripts/sweep_stability.py [solo12|go2] [vx] [episode_ms]

Round 3: the sweep axes include ``swing_blend`` (contact-adaptive release of
planned-swing legs that are measured grounded, rollout.py) — the round-2
diagnosis was that the ID controller pushing against grounded "swing" feet
is what ratchets/rolls the heavier Go2.
"""

import os
import sys

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
from bunmpc_tpu.sim import controllers, physics, rollout
from bunmpc_tpu.utils.quat import quat_to_rot, rot_to_rpy


def main():
    robot = sys.argv[1] if len(sys.argv) > 1 else "solo12"
    vx = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 3000

    if robot == "solo12":
        from bunmpc_tpu.mpc.motions.solo12_cyclic import trot
        from bunmpc_tpu.robots.solo12 import Solo12Config as C

        spec = KD.make_cyclic_spec(C.load_model(), trot, C.q0())
        base_contact = (0.018, 1.0)  # foot_radius, mu
        tq_lim = 2.7
        # round-2 refinement around the coarse-sweep winner (kp=8, kd=0.3,
        # kn=1e4: survives 3 s @ 0.3 m/s, roll_rms 8.6 deg; the reference's
        # soft kp=3/kd=0.05 rolls over on the implicit soft ground)
        gains_grid = [(6.0, 0.2), (8.0, 0.3), (8.0, 0.5), (10.0, 0.4)]
        contact_grid = [(1e4, 500.0, 500.0), (1.6e4, 650.0, 650.0)]
        # (swing_blend, force_gate) pairs: 1.0 = reference behavior on that axis
        blend_grid = [(1.0, 1.0), (0.5, 1.0), (0.5, 0.0)]
    else:
        from bunmpc_tpu.mpc.motions.go2_cyclic import trot
        from bunmpc_tpu.robots.go2 import Go2Config as C

        spec = KD.make_cyclic_spec(
            C.load_model(), trot, C.q0(),
            eff_frames=tuple(C.eff_names), hip_frames=tuple(C.hip_names),
            foot_size=C.foot_size,
        )
        base_contact = (C.foot_size, 1.0)
        tq_lim = 23.7
        gains_grid = [(15.0, 0.8), (25.0, 1.0), (40.0, 2.0), (60.0, 3.0)]
        contact_grid = [(6e4, 3000.0, 3000.0), (1.2e5, 5000.0, 5000.0)]
        # (swing_blend, force_gate) pairs: 1.0 = reference behavior on that axis
        blend_grid = [(1.0, 1.0), (0.5, 1.0), (0.5, 0.0), (1.0, 0.0), (0.2, 0.0)]

    combos = [
        (kp, kd, kn, dn, kt, sb, fg)
        for kp, kd in gains_grid
        for kn, dn, kt in contact_grid
        for sb, fg in blend_grid
    ]
    B = len(combos)
    arr = lambda i: jnp.asarray([c[i] for c in combos], jnp.float32)
    gains = controllers.IdControllerGains(kp=arr(0), kd=arr(1))
    sim_params = physics.SimParams(
        contact=physics.ContactParams(
            foot_radius=jnp.full(B, base_contact[0], jnp.float32),
            kn=arr(2), dn=arr(3), kt=arr(4),
            mu=jnp.full(B, base_contact[1], jnp.float32),
        ),
        joint_damping=jnp.full(B, 0.02, jnp.float32),
        torque_limit=jnp.full(B, tq_lim, jnp.float32),
    )

    cfg = rollout.RolloutConfig(episode_length=T, gait_period=spec.params.gait_period)
    state0 = physics.SimState(
        q=jnp.asarray(C.q0(), jnp.float32), v=jnp.zeros(spec.model.nv, jnp.float32)
    )
    settle_ms = int(sys.argv[4]) if len(sys.argv) > 4 else 500
    v_des = jnp.asarray([vx, 0.0, 0.0], jnp.float32)
    w_des = jnp.asarray(0.0, jnp.float32)

    blend, fgate = arr(5), arr(6)

    def one(sp, g, sb, fg):
        # pre-settle: hold q0 joints with PD until the base rests on its feet
        # (q0 starts the feet above the ground; the drop transient otherwise
        # kicks the gait during its first diagonal-support phase)
        q0j = state0.q[7:]

        def settle_step(s, _):
            # stiff hold (6x): the gait PD is sized for ff-carried loads and
            # sags ~0.2 rad under raw gravity
            tau = -6.0 * g.kp * (s.q[7:] - q0j) - 6.0 * g.kd * s.v[6:]
            s2, _ = physics.step(spec.model, tuple(spec.eff_frames), sp, s, tau)
            return s2, None

        s0, _ = jax.lax.scan(settle_step, state0, None, length=settle_ms)
        return rollout.rollout_mpc(
            spec, sp, cfg, s0, v_des, w_des, gains=g, swing_blend=sb,
            force_gate=fg,
        )

    run = jax.jit(jax.vmap(one))
    res = jax.block_until_ready(run(sim_params, gains, blend, fgate))

    # states layout: [v(nv), base_wrt_foot(8), q[2:]]; q[3:7] = quat
    nv = spec.model.nv
    quat = jnp.asarray(res.states[..., nv + 8 + 1 : nv + 8 + 5])
    rpy = np.asarray(rot_to_rpy(quat_to_rot(quat)))  # (B, T, 3)
    z = np.asarray(res.states[..., nv + 8])  # q[2]
    vx_act = np.asarray(res.states[..., 0])
    last = slice(T - 1000, T)

    print(f"robot={robot} vx={vx} T={T}ms  ({B} combos, one compile)")
    print(f"{'kp':>5} {'kd':>5} {'kn':>8} {'dn':>6} {'kt':>6} {'sb':>4} {'fg':>4} | {'fail@':>6} "
          f"{'roll_rms':>8} {'roll_max':>8} {'pit_mean':>8} {'pit_max':>8} "
          f"{'z_end':>6} {'z_min':>6} {'vx_end':>6}")
    for i, (kp, kd, kn, dn, kt, sb, fg) in enumerate(combos):
        failed = bool(res.failed[i])
        fs = int(res.fail_step[i]) if failed else -1
        rr = np.rad2deg(np.sqrt((rpy[i, last, 0] ** 2).mean()))
        rm = np.rad2deg(np.abs(rpy[i, :, 0]).max())
        pm = np.rad2deg(rpy[i, :, 1].mean())
        px = np.rad2deg(np.abs(rpy[i, :, 1]).max())
        print(
            f"{kp:5.1f} {kd:5.2f} {kn:8.0f} {dn:6.0f} {kt:6.0f} {sb:4.1f} {fg:4.1f} | "
            f"{fs:6d} {rr:8.2f} {rm:8.2f} {pm:8.2f} {px:8.2f} "
            f"{z[i, last].mean():6.3f} {z[i].min():6.3f} "
            f"{vx_act[i, last].mean():6.3f}"
        )


if __name__ == "__main__":
    main()
