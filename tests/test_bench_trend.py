"""Round-over-round bench trend guard.

The driver records ``BENCH_r{N}.json`` per round. Local[32] timings on a
shared machine carry ±30-50% noise on sub-second queries, so this guard
is deliberately generous: it compares only the shared-key subset of the
two most recent records, ignores queries under 0.5 s in the older one,
and fails only past a 2× slowdown — a real plan regression (a lost
broadcast, a new shuffle, an all-pairs fallback), not machine noise.

(bench.py itself prints a 1.5× stderr warning against the newest record
at run time; this test is the hard CI floor over the recorded history.)
"""

from __future__ import annotations

import glob
import json
import os

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    # "parsed" may be recorded as null (round 5's overlong stdout line)
    return (d.get("parsed") or {}).get("queries") or {}


def test_no_2x_regression_between_recorded_rounds():
    records = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    if len(records) < 2:
        pytest.skip("fewer than two recorded bench rounds")
    prev, cur = (_bench_queries(p) for p in records[-2:])
    if not prev or not cur:
        pytest.skip("bench records carry no parsed query timings")
    offenders = {
        name: (prev[name], t)
        for name, t in cur.items()
        if name in prev and prev[name] >= 0.5 and t > prev[name] * 2.0
    }
    assert not offenders, (
        f"{os.path.basename(records[-1])} regressed >2x vs "
        f"{os.path.basename(records[-2])} on: "
        + ", ".join(f"{n} {p:.2f}s -> {t:.2f}s" for n, (p, t) in offenders.items())
    )
