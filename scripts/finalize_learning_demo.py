"""Reconstruct artifacts/learning_demo_safedagger.jsonl from the elastic
checkpoint of an interrupted scripts/run_learning_demo.py run.

The demo driver checkpoints the full driver state + stage logs after warmup
and after every iteration (.ckpt_learning_demo/state.json); the final
artifact is normally written by the script itself. If the run is killed
(round clock, crash), this helper emits the same artifact shape from the
stages completed so far, so the committed evidence never lags the compute
actually spent. Meta fields that only the live process knows (wall seconds)
are recorded as null.

Usage: python scripts/finalize_learning_demo.py [ckpt_dir] [out_path]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bunmpc_tpu.utils import jsonio


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".ckpt_learning_demo")
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(root, "artifacts", "learning_demo_safedagger.jsonl")
    )
    with open(os.path.join(ckpt, "state.json")) as fh:
        state = json.load(fh)
    logs = state["logs"]
    iters = [e for e in logs if isinstance(e.get("iteration"), int)]
    if not iters:
        raise SystemExit("checkpoint holds no completed iterations; nothing to finalize")
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "run_learning_demo", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "run_learning_demo.py")
    )
    _demo = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_demo)  # single source of truth for cfg + meta

    # run settings (argv mirrors run_learning_demo's tail args)
    n_cmd = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    ep_ms = int(sys.argv[4]) if len(sys.argv) > 4 else 3000
    skip_failed = bool(int(sys.argv[5])) if len(sys.argv) > 5 else False
    cfg = _demo.make_cfg(len(iters), n_cmd, ep_ms, skip_failed)

    best = max(
        iters,
        key=lambda s: (
            s["eval"]["survival_rate"],
            s["eval"].get("mean_survival_ms", 0),
        ),
    )
    meta = _demo.build_meta(
        cfg, len(iters), n_cmd, ep_ms,
        finalized_from_checkpoint=True,
        wall_seconds=None,
    )
    entries = [{"meta": meta}] + logs + [
        {
            "best_iteration": best["iteration"],
            "survival_rate": best["eval"]["survival_rate"],
            "mean_survival_ms": best["eval"]["mean_survival_ms"],
            "tracking_score": best["eval"]["tracking_score"],
        }
    ]
    jsonio.write_jsonl(out, entries)
    print(f"wrote {out} from {len(iters)} completed iterations (best: {best['iteration']})")


if __name__ == "__main__":
    main()
