"""Rollout visualization — headless observability for episodes.

The reference captures PyBullet camera frames and encodes mp4 videos
(reference simulation.py:114-132, pybullet_env.capture_image_frame). This
image has no renderer or ffmpeg, so observability is provided as matplotlib
figure exports: trajectory strips (base pose / velocities / contact states /
forces) and a 2D top-down "comic strip" of robot + feet poses over time —
everything a human needs to judge a rollout at a glance.
"""

from __future__ import annotations

import numpy as np


def rollout_strip(result, path: str, title: str = "rollout", sim_dt: float = 0.001):
    """Multi-panel trajectory strip from a RolloutResult (single episode)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    base = np.asarray(result.base)
    vel = np.asarray(result.states[:, 0:3])
    forces = np.asarray(result.contact_forces)
    incnt = np.asarray(result.in_contact)
    T = len(base)
    t = np.arange(T) * sim_dt

    fig, axes = plt.subplots(5, 1, figsize=(10, 12), sharex=True)
    axes[0].plot(t, base[:, 0], label="x")
    axes[0].plot(t, base[:, 1], label="y")
    axes[0].plot(t, base[:, 2], label="z")
    axes[0].set_ylabel("base [m]")
    axes[0].legend(loc="upper left", fontsize=8)

    axes[1].plot(t, vel[:, 0], label="vx")
    axes[1].plot(t, vel[:, 1], label="vy")
    axes[1].plot(t, vel[:, 2], label="vz")
    goals = np.asarray(result.vc_goals)
    axes[1].plot(t, goals[:, 1], "k--", lw=0.8, label="vx des")
    axes[1].set_ylabel("base vel [m/s]")
    axes[1].legend(loc="upper left", fontsize=8)

    fz = forces[..., 2]
    for j in range(fz.shape[1]):
        axes[2].plot(t, fz[:, j], lw=0.7, label=f"foot {j}")
    axes[2].set_ylabel("fz [N]")
    axes[2].legend(loc="upper left", fontsize=8)

    # gait diagram
    for j in range(incnt.shape[1]):
        axes[3].fill_between(
            t, j, j + 0.8, where=incnt[:, j] > 0, step="pre", alpha=0.7
        )
    axes[3].set_ylabel("contacts")
    axes[3].set_yticks([0.4, 1.4, 2.4, 3.4])
    axes[3].set_yticklabels(["FL", "FR", "HL", "HR"])

    usage = np.asarray(result.mpc_usage)
    axes[4].fill_between(t, 0, usage, step="pre", alpha=0.6)
    axes[4].set_ylabel("MPC in control")
    axes[4].set_xlabel("time [s]")
    failed = bool(np.asarray(result.failed))
    fig.suptitle(f"{title}  (failed={failed})")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def reconstruct_q(result):
    """Recover the full configuration trajectory (T, 19) from a
    RolloutResult: base xy from ``base``, z + quat + joints from the state
    featurization (states[:, 26:43] = q[2:], simulation.py:487-489)."""
    base = np.asarray(result.base)
    states = np.asarray(result.states)
    return np.concatenate([base[:, 0:2], states[:, 26:43]], axis=-1)


def render_rollout_video(
    model,
    result,
    path: str,
    fps: int = 25,
    stride: int = 20,
    title: str = "rollout",
):
    """Animated skeleton video of a rollout (GIF via PIL — the ffmpeg-less
    twin of the reference's camera capture, simulation.py:114-132): side (xz)
    and front (yz) projections of base + HAA->HFE->KFE->FOOT leg chains,
    with contact markers and the base path.

    ``stride`` subsamples the 1 kHz trajectory (20 -> 50 fps of sim time at
    fps=25 -> 0.5x slow motion).
    """
    import io

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from ..kin import algorithms as K

    # Leg chains auto-derived from the model: group frames by their leg
    # prefix (FL/FR/HL/HR for Solo, FL/FR/RL/RR for Go2) and order each
    # chain by kinematic depth — robot-agnostic, unlike hardcoded
    # HAA/HFE/KFE/FOOT names.
    from collections import defaultdict

    groups = defaultdict(list)
    for name, fr in model.frames.items():
        groups[name.split("_")[0]].append((fr.body, name))
    chains = [
        [n for _, n in sorted(v)] for _, v in sorted(groups.items())
    ][:4]
    chain_names = [n for chain in chains for n in chain]
    chain_slices = []
    off = 0
    for chain in chains:
        chain_slices.append((off, off + len(chain)))
        off += len(chain)
    qs = reconstruct_q(result)[::stride]
    incnt = np.asarray(result.in_contact).astype(bool)[::stride]
    # one batched FK over all sampled frames
    pts = np.asarray(
        K.frame_positions(model, jnp.asarray(qs), chain_names)
    )  # (T, n_chain_pts, 3)
    base = qs[:, 0:3]

    x_lo, x_hi = base[:, 0].min() - 0.35, base[:, 0].max() + 0.35
    frames = []
    fig, (ax_side, ax_front) = plt.subplots(1, 2, figsize=(9, 3.2), width_ratios=[2, 1])
    for k in range(len(qs)):
        for ax, (i, j) in ((ax_side, (0, 2)), (ax_front, (1, 2))):
            ax.clear()
            ax.axhline(0.0, color="0.4", lw=1.0)
            ax.plot(base[: k + 1, i], base[: k + 1, j], "b-", lw=0.7, alpha=0.6)
            ax.plot(base[k, i], base[k, j], "ko", ms=5)
            for l, (s0, s1) in enumerate(chain_slices):
                seg = pts[k, s0:s1]
                ax.plot(seg[:, i], seg[:, j], "-o", color=f"C{l}", ms=2.5, lw=1.6)
                if l < incnt.shape[1] and incnt[k, l]:
                    ax.plot(seg[-1, i], seg[-1, j], "gs", ms=5)
            ax.set_ylim(-0.05, 0.55)
            ax.set_aspect("equal")
            ax.grid(alpha=0.25)
        ax_side.set_xlim(x_lo, x_hi)
        ax_front.set_xlim(base[k, 1] - 0.35, base[k, 1] + 0.35)
        ax_side.set_title(f"{title}  t={k * stride} ms", fontsize=9)
        ax_front.set_title("front", fontsize=9)
        fig.tight_layout()
        buf = io.BytesIO()
        fig.savefig(buf, format="png", dpi=80)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    plt.close(fig)
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return path


def topdown_strip(result, path: str, n_frames: int = 8, title: str = "top-down"):
    """Top-down xy comic strip: base path + foot contact locations."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    base = np.asarray(result.base)
    cpos = np.asarray(result.contact_pos)
    incnt = np.asarray(result.in_contact).astype(bool)
    T = len(base)
    idxs = np.linspace(0, T - 1, n_frames).astype(int)

    fig, axes = plt.subplots(1, n_frames, figsize=(2.2 * n_frames, 2.6), sharey=True)
    for ax, i in zip(np.atleast_1d(axes), idxs):
        ax.plot(base[: i + 1, 0], base[: i + 1, 1], "b-", lw=0.8)
        ax.plot(base[i, 0], base[i, 1], "bo", ms=5)
        for j in range(cpos.shape[1]):
            color = "g" if incnt[i, j] else "0.7"
            ax.plot(cpos[i, j, 0], cpos[i, j, 1], "s", color=color, ms=4)
        ax.set_title(f"t={i} ms", fontsize=8)
        ax.set_aspect("equal")
        ax.grid(alpha=0.3)
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
