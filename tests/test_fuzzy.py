"""Fuzzy edit-distance join + MAD anomaly detection (round 8 operators).

Oracle parity for the registered queries runs in test_oracle_parity.py;
here we pin the properties parity can't see: the plan never degenerates
into a cross join, the short-string fallback path actually fires, and
the recall guarantee holds on adversarial near-miss corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.anomaly import mad_anomalies
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.fuzzy import edit_distance_pairs

from conftest import SF_SMOKE


def _pairs(spark, rows, max_dist=1, q=3, method="auto"):
    df = spark.createDataFrame(rows, "id LONG, t STRING")
    out = edit_distance_pairs(df, "t", "id", max_dist=max_dist, q=q, method=method)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    return {(r.a, r.b): r.dist for r in out.collect()}


def _brute(rows, max_dist):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1 :]:
            d = lev(ta, tb)
            if d <= max_dist:
                out[(min(ia, ib), max(ia, ib))] = d
    return out


def test_fuzzy_recall_long_strings(spark):
    """Near-miss corpus where every pair shares the hot prefix: the
    rarest-first prefix filter must still find exactly the true pairs."""
    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000002"),   # d=1 vs 1
        (3, "Customer#000000011"),   # d=1 vs 1, d=2 vs 2
        (4, "Customer#999999999"),   # far from all
        (5, "Customer#000000001"),   # exact dup of 1
        (6, "Xustomer#000000001"),   # d=1 vs 1/5
    ]
    assert _pairs(spark, rows) == _brute(rows, 1)


def test_fuzzy_short_string_path(spark):
    """Strings below the prefix-guarantee bound (len < (k+1)·q) must pair
    via the length-band block — including short×short and the exact-dup
    short pair."""
    rows = [(1, "ab"), (2, "ac"), (3, "ab"), (4, "abcd"), (5, "zz"), (6, "abc")]
    assert _pairs(spark, rows) == _brute(rows, 1)


def test_fuzzy_mixed_short_long_boundary(spark):
    """A short string one edit from a long one straddles the two blocking
    paths (the long side has m > k·q, the short side doesn't): the
    uniform min(m, k·q+1) prefix must still catch it."""
    rows = [(1, "abcdef"), (2, "abcde"), (3, "abcdefg"), (4, "bbcdef"), (5, "x")]
    assert _pairs(spark, rows, max_dist=1, q=3) == _brute(rows, 1)


def test_fuzzy_k2_wider_radius(spark):
    """max_dist=2 widens the prefix to 2q+1 tokens; verify against brute
    force on a mixed corpus."""
    rows = [
        (1, "hello world"),
        (2, "hella warld"),   # d=2
        (3, "hello worlds"),  # d=1
        (4, "goodbye"),
        (5, "hillo world"),   # d=1 vs 1, d=3 vs 2
    ]
    assert _pairs(spark, rows, max_dist=2) == _brute(rows, 2)


def test_fuzzy_customer_parity_smoke(spark):
    """sf0.001 customer self-join matches a brute-force python check —
    the same corpus shape the registered sf0.01 oracle certifies."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    rows = [(r.c_custkey, r.c_name) for r in cust.collect()]
    got = _pairs(spark, rows)
    assert got == _brute(rows, 1)
    assert len(got) > 0  # non-vacuous


def test_fuzzy_both_methods_agree_with_brute(spark):
    """symdel and prefix are different blockings over the same exact
    verify — both must match brute force on the same corpus, k=1 and
    k=2."""
    rows = [
        (1, "Customer#000000001"),
        (2, "Customer#000000011"),
        (3, "Xustomer#000000001"),
        (4, "abc"), (5, "abd"), (6, "abcd"), (7, "zzz"),
        (8, "hello world"), (9, "hella warld"),
    ]
    for k in (1, 2):
        expect = _brute(rows, k)
        assert _pairs(spark, rows, max_dist=k, method="symdel") == expect
        assert _pairs(spark, rows, max_dist=k, method="prefix") == expect


def test_fuzzy_auto_routes_long_strings_to_prefix(spark):
    """auto must not explode C(len,2) deletion variants on long text:
    strings past SYMDEL_MAX_LEN flip the whole call to the prefix path,
    which remains exact."""
    long_a = "x" * 80 + "abcdefgh"
    long_b = "x" * 80 + "abcdefgi"
    rows = [(1, long_a), (2, long_b), (3, "short"), (4, "shore")]
    assert _pairs(spark, rows) == _brute(rows, 1)


def test_fuzzy_auto_hybrid_covers_boundary_pairs(spark):
    """r9 scan-free auto: pairs straddling SYMDEL_MAX_LEN must not fall
    between the two blocking sets — (64,65) rides symdel (both ≤ L+k),
    (65,66) rides prefix (both > L), and overlap dedups."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.fuzzy import SYMDEL_MAX_LEN

    L = SYMDEL_MAX_LEN
    rows = [
        (1, "y" * L), (2, "y" * (L + 1)), (3, "y" * (L + 2)),
        (4, "z" * (L - 1) + "ab"), (5, "z" * (L - 1) + "ac"),  # len L+1 twins
        (6, "unrelated"),
    ]
    got = _pairs(spark, rows, max_dist=1)
    assert got == _brute(rows, 1) == {(1, 2): 1, (2, 3): 1, (4, 5): 1}


def test_mad_single_and_even_groups(spark):
    """Lower-median discipline: a 1-row group flags nothing (ad=0, mad=0);
    an even-count group takes rank n/2 under (value, id) order."""
    rows = [
        (1, "a", 10.0),
        (2, "b", 1.0), (3, "b", 2.0), (4, "b", 3.0), (5, "b", 100.0),
    ]
    ev = spark.createDataFrame(rows, "event_id LONG, event_type STRING, value DOUBLE")
    out = {r.event_id: (r.med, r.mad) for r in mad_anomalies(ev).collect()}
    # group b: n=4 → med = value at rank 2 = 2.0; devs = [1,0,1,98] →
    # mad = dev at rank 2 (ordered by (ad, id): 0,1,1,98) = 1.0;
    # flagged: |100-2| = 98 > 3·1.
    assert out == {5: (2.0, 1.0)}


def test_mad_all_equal_group_flags_nothing(spark):
    ev = spark.createDataFrame(
        [(i, "k", 7.0) for i in range(6)], "event_id LONG, event_type STRING, value DOUBLE"
    )
    assert mad_anomalies(ev).count() == 0


def test_mad_null_keys_never_flag_and_never_poison_routing(spark):
    """Review-found: a NULL giant key in isin() three-valued logic would
    silently drop every OTHER key's anomalies. NULL-key rows can never
    flag (the stats join drops them in both engines) — pinned across
    both routing modes, with NULL as the dominant key."""
    rows = [(i, None, float(i % 5)) for i in range(200)]
    rows += [(500 + i, "real", float(i)) for i in range(9)] + [(600, "real", 1e5)]
    ev = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, value DOUBLE"
    )
    for gkr in (None, 50):
        got = {r.event_id for r in mad_anomalies(ev, giant_key_rows=gkr).collect()}
        assert got == {600}, (gkr, got)


@pytest.mark.slow
def test_mad_giant_key_bisection_matches_window_path(spark):
    """r9: a constant (or dominant) key auto-routes through the IEEE-bit
    histogram bisection instead of a one-task window — identical rows,
    medians, and MADs as the window spelling, including negatives,
    fractional doubles, and a mixed giant+normal keyset."""
    import random

    rnd = random.Random(7)
    rows = [(i, "giant", rnd.uniform(-50, 50)) for i in range(400)]
    rows += [(1000 + i, "giant", 900.0 + i) for i in range(3)]  # outliers
    rows += [(2000 + i, "small", float(i)) for i in range(9)]
    rows += [(3000, "small", 1e6)]
    ev = spark.createDataFrame(
        rows, "event_id LONG, event_type STRING, value DOUBLE"
    ).repartition(8)
    ref = {
        r.event_id: (r.med, r.mad)
        for r in mad_anomalies(ev, giant_key_rows=None).collect()
    }
    got = {
        r.event_id: (r.med, r.mad)
        for r in mad_anomalies(ev, giant_key_rows=100).collect()
    }
    assert got == ref and any(k >= 1000 for k in got) and 3000 in got
    # the degenerate single-key shape the advisor called out: EVERY row
    # in one group — the window path's worst case, bisection's home turf
    one = spark.createDataFrame(
        [(i, "k", float(i % 37) / 8) for i in range(500)] + [(999, "k", 4000.25)],
        "event_id LONG, event_type STRING, value DOUBLE",
    )
    r1 = {r.event_id: (r.med, r.mad) for r in mad_anomalies(one, giant_key_rows=50).collect()}
    r2 = {r.event_id: (r.med, r.mad) for r in mad_anomalies(one, giant_key_rows=None).collect()}
    assert r1 == r2 == {999: r2[999]}
