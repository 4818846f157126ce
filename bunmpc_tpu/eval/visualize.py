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
