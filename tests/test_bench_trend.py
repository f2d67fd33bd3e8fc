"""Round-over-round bench trend guard.

The driver records ``BENCH_r{N}.json`` per round. Local[32] timings on a
shared machine carry ±30-50% noise on sub-second queries, so this guard
is deliberately generous: it compares only the shared-key subset of the
two most recent records THAT CARRY parsed timings, ignores queries under
0.5 s in the older one, and fails only past a 2× slowdown — a real plan
regression (a lost broadcast, a new shuffle, an all-pairs fallback), not
machine noise.

Records with ``"parsed": null`` (round 5's overlong stdout line) are
skipped, not treated as an empty baseline — the original
newest-record-only logic silently compared nothing for a whole round
when the newest record happened to be null (ADVICE/VERDICT r6).

(bench.py itself prints a 1.5× stderr warning against the newest parsed
record at run time; this test is the hard CI floor over the recorded
history. Both share bench.regression_offenders, unit-tested below with a
synthetic 2×-inflated record.)
"""

from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import recorded_history, regression_offenders  # noqa: E402


def test_no_2x_regression_between_recorded_rounds():
    # the FULL history: driver rounds (stdout-truncated to ~30 slowest)
    # then the rotated local records (all headliners) — comparing the
    # freshest two keeps coverage at the full query spread whenever two
    # local runs exist (VERDICT r11 #8), and degrades to the driver
    # subset otherwise
    rounds = recorded_history(_REPO)
    if len(rounds) < 2:
        pytest.skip("fewer than two recorded bench rounds with parsed timings")
    (prev_path, prev), (cur_path, cur) = rounds[-2:]
    offenders = regression_offenders(prev, cur, factor=2.0)
    assert offenders == {}, (
        f"{os.path.basename(cur_path)} regressed >2x vs "
        f"{os.path.basename(prev_path)} on: "
        + ", ".join(f"{n} {p:.2f}s -> {t:.2f}s" for n, (p, t) in offenders.items())
    )


def test_history_skips_null_parsed_records(tmp_path):
    """A "parsed": null round must be skipped (compare across it), never
    read as an empty baseline that silently disables the guard."""
    import json

    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"parsed": {"queries": {"q": 1.0}}})
    )
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({"parsed": None}))
    hist = recorded_history(str(tmp_path))
    assert [os.path.basename(p) for p, _ in hist] == ["BENCH_r01.json"]
    assert hist[0][1] == {"q": 1.0}


def test_synthetic_2x_inflation_is_flagged():
    """The comparator itself: a 2×-inflated record fails; sub-floor and
    under-threshold deltas pass."""
    prev = {"big": 2.0, "tiny": 0.1, "ok": 1.0, "gone": 3.0}
    cur = {"big": 4.1, "tiny": 5.0, "ok": 1.9, "new": 9.0}
    off = regression_offenders(prev, cur, factor=2.0)
    assert off == {"big": (2.0, 4.1)}  # tiny: below 0.5s floor; ok: <2x
    assert regression_offenders(prev, {"big": 3.9}, factor=2.0) == {}
