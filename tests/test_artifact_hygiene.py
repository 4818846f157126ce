"""Committed artifacts must be strict JSON (round-4 verdict task 9): no bare
``NaN`` / ``Infinity`` tokens — Python tolerates them, strict parsers and
dashboards do not. Non-finite values are emitted as ``null`` via
``utils.jsonio`` (eval summaries, learning-demo JSONL)."""

import glob
import json
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _strict_loads(text):
    def _reject(tok):
        raise ValueError(f"non-strict JSON constant {tok!r}")

    return json.loads(text, parse_constant=_reject)


def _artifact_files():
    pats = ["artifacts/*.json", "artifacts/*.jsonl", "*.json"]
    out = []
    for p in pats:
        out.extend(sorted(glob.glob(os.path.join(REPO, p))))
    return out


@pytest.mark.parametrize("path", _artifact_files(), ids=os.path.basename)
def test_artifact_is_strict_json(path):
    with open(path) as fh:
        text = fh.read()
    if path.endswith(".jsonl"):
        for i, line in enumerate(filter(None, map(str.strip, text.splitlines()))):
            _strict_loads(line)
    else:
        _strict_loads(text)


def test_sanitize_maps_nonfinite_to_null():
    from bunmpc_tpu.utils import jsonio

    s = jsonio.dumps({"a": float("nan"), "b": [1.0, float("inf")], "c": 2})
    obj = json.loads(s)
    assert obj == {"a": None, "b": [1.0, None], "c": 2}
    assert "NaN" not in s and "Infinity" not in s
    assert math.isfinite(json.loads(jsonio.dumps(1.5)))
