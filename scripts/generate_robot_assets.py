"""Generate the framework's robot constant assets (.npz) from URDF sources.

Run once at build time (outputs are committed):
    python scripts/generate_robot_assets.py

The .npz assets make the framework standalone — no URDF parsing at import
time, no dependency on the reference checkout being mounted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bunmpc_tpu.robots.assets_io import save_model  # noqa: E402
from bunmpc_tpu.robots.urdf import build_model  # noqa: E402

ASSETS = os.path.join(os.path.dirname(__file__), "..", "bunmpc_tpu", "robots", "assets")

SOURCES = {
    "solo12": "/root/reference/iterative_supervised_learning/robots/solo12/urdf/solo12.urdf",
}


def main():
    os.makedirs(ASSETS, exist_ok=True)
    # Go2 is built programmatically from the xacro constants (no pre-generated
    # URDF in the reference snapshot) — see bunmpc_tpu/robots/go2.py
    from bunmpc_tpu.robots.go2 import build_go2_model

    go2 = build_go2_model()
    out = os.path.join(ASSETS, "go2_model.npz")
    save_model(go2, out)
    print(f"wrote {out}: {go2.n_joints} joints, mass {go2.total_mass:.4f} kg")
    # Solo8 is likewise built from its xacro constants (no pre-generated URDF
    # in the reference snapshot) — see bunmpc_tpu/robots/solo8.py
    from bunmpc_tpu.robots.solo8 import build_solo8_model

    solo8 = build_solo8_model()
    out = os.path.join(ASSETS, "solo8_model.npz")
    save_model(solo8, out)
    print(f"wrote {out}: {solo8.n_joints} joints, mass {solo8.total_mass:.4f} kg")
    for name, urdf in SOURCES.items():
        if not os.path.exists(urdf):
            print(f"skip {name}: source {urdf} not present")
            continue
        model = build_model(urdf, name=name)
        out = os.path.join(ASSETS, f"{name}_model.npz")
        save_model(model, out)
        print(f"wrote {out}: {model.n_joints} joints, mass {model.total_mass:.4f} kg")


if __name__ == "__main__":
    main()
