"""Visual-observability tests (C15 video capture / §5.5): strip plots and the
skeleton-animation renderer, on a synthetic trajectory (no rollout needed)."""

import os

import jax.numpy as jnp
import numpy as np

from bunmpc_tpu.eval import visualize as V
from bunmpc_tpu.robots.solo12 import Solo12Config
from bunmpc_tpu.sim import physics, rollout


def _fake_result(T=80):
    model = Solo12Config.load_model()
    q0 = np.asarray(Solo12Config.q0())
    qs = np.tile(q0, (T, 1))
    qs[:, 0] = np.linspace(0, 0.2, T)  # walk forward
    qs[:, 7] += 0.1 * np.sin(np.linspace(0, 4 * np.pi, T))  # wiggle a joint
    v = np.zeros((T, 18), np.float32)
    states = np.asarray(
        rollout.state_features(model, Solo12Config.eff_names, jnp.asarray(qs), jnp.asarray(v))
    )
    ne = 4
    return rollout.RolloutResult(
        states=jnp.asarray(states),
        actions=jnp.zeros((T, 12)),
        vc_goals=jnp.zeros((T, 5)),
        base=jnp.asarray(qs[:, 0:3]),
        com=jnp.asarray(qs[:, 0:3]),
        contact_forces=jnp.zeros((T, ne, 3)),
        contact_pos=jnp.zeros((T, ne, 3)),
        in_contact=jnp.asarray(np.tile([1, 0, 0, 1], (T, 1))),
        failed=jnp.asarray(False),
        fail_step=jnp.asarray(T),
        final_state=physics.SimState(q=jnp.asarray(qs[-1]), v=jnp.asarray(v[-1])),
        mpc_usage=jnp.ones(T),
    ), model


def test_reconstruct_q():
    res, model = _fake_result()
    q = V.reconstruct_q(res)
    assert q.shape == (80, 19)
    np.testing.assert_allclose(q[:, 0], np.linspace(0, 0.2, 80), atol=1e-6)
    np.testing.assert_allclose(q[0, 2], Solo12Config.q0()[2], atol=1e-6)


def test_strip_plots(tmp_path):
    res, model = _fake_result()
    p1 = V.rollout_strip(res, os.path.join(tmp_path, "strip.png"))
    p2 = V.topdown_strip(res, os.path.join(tmp_path, "top.png"), n_frames=4)
    assert os.path.getsize(p1) > 10_000
    assert os.path.getsize(p2) > 5_000


def test_render_rollout_video(tmp_path):
    res, model = _fake_result()
    path = V.render_rollout_video(
        model, res, os.path.join(tmp_path, "roll.gif"), stride=20
    )
    from PIL import Image

    im = Image.open(path)
    assert im.format == "GIF"
    im.seek(3)  # 80/20 = 4 frames; frame 3 must exist
    assert os.path.getsize(path) > 20_000
