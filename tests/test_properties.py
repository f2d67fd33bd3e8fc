"""Property-based invariants (hypothesis): the reproducibility guarantees
SCALING.md claims — partitioning-independence of exact sums, hash splits,
and dedup — hold for arbitrary inputs, not just the driver testdata."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.aggregates import decimal_sum
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import hash_bucket

# chaos/fuzz/property suite: excluded from the fast per-batch sweep (r13)
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2-decimal money-like values
_money = st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0)


@given(vals=st.lists(_money, min_size=1, max_size=60), parts=st.integers(1, 7))
@settings(**_SETTINGS)
def test_decimal_sum_partitioning_independent(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.agg(decimal_sum(F.col("v"), 2).alias("s")).collect()[0]["s"]
    b = (
        df.repartition(parts)
        .agg(decimal_sum(F.col("v"), 2).alias("s"))
        .collect()[0]["s"]
    )
    assert a == b
    assert abs(a - round(sum(vals), 2)) < 1e-9


@given(ids=st.lists(st.integers(0, 2**40), min_size=1, max_size=50, unique=True))
@settings(**_SETTINGS)
def test_hash_bucket_stable_and_in_range(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    out1 = {r["k"]: r["b"] for r in df.select("k", hash_bucket(F.col("k")).alias("b")).collect()}
    out2 = {
        r["k"]: r["b"]
        for r in df.repartition(5).select("k", hash_bucket(F.col("k")).alias("b")).collect()
    }
    assert out1 == out2
    assert all(0 <= b < 100 for b in out1.values())


@given(
    texts=st.lists(
        st.text(alphabet="abc d", min_size=0, max_size=40), min_size=1, max_size=20
    )
)
@settings(**_SETTINGS)
def test_exact_dedup_partition_counts(spark, texts):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["text"]: r["n_dupes"] for r in exact_dedup(df, ["text"]).collect()}
    expected: dict[str, int] = {}
    for t in texts:
        expected[t] = expected.get(t, 0) + 1
    assert out == expected


@given(
    pts=st.lists(st.integers(0, 500), min_size=1, max_size=30),
    ivs=st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 120)), min_size=1, max_size=15
    ),
    bin_width=st.sampled_from([7, 50, 128]),
)
@settings(**_SETTINGS)
def test_interval_join_matches_bruteforce(spark, pts, ivs, bin_width):
    """Bucketed interval join == brute-force BETWEEN filter for any bin
    width (bins are a physical plan choice, never a semantics change)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.temporal import interval_join

    p = spark.createDataFrame([(i, v) for i, v in enumerate(pts)], "pid long, x long")
    iv = spark.createDataFrame(
        [(j, s, s + l) for j, (s, l) in enumerate(ivs)], "iid long, lo long, hi long"
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(p, iv, "x", "lo", "hi", bin_width=bin_width).collect()
    }
    want = {
        (i, j)
        for i, v in enumerate(pts)
        for j, (s, l) in enumerate(ivs)
        if s <= v <= s + l
    }
    assert got == want


_words = st.lists(
    st.sampled_from(["a", "b", "cc", "dd", "e1", "f2", "gg", "hh"]),
    min_size=0,
    max_size=40,
)


@given(words=_words, chunk=st.integers(2, 8), overlap=st.integers(0, 3))
@settings(**_SETTINGS)
def test_chunking_covers_and_reconstructs(spark, words, chunk, overlap):
    """Every chunk is exactly the token-stream slice its (idx, step)
    arithmetic claims, with contiguous chunk ids — for arbitrary streams,
    chunk sizes, and overlaps."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.corpus import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    if not words:
        assert rows == []
        return
    # chunk k must be exactly words[k*step : k*step+chunk], ids contiguous
    for r in rows:
        start = r.chunk_idx * step
        assert r.chunk_text.split(" ") == words[start : start + chunk]
        assert r.chunk_len == len(words[start : start + chunk])
    assert {r.chunk_idx for r in rows} == set(range(len(rows)))


@given(words=st.lists(st.sampled_from(["x", "y", "z"]), min_size=2, max_size=30))
@settings(**_SETTINGS)
def test_repetition_metrics_match_python(spark, words):
    """dup_token_frac / top_bigram_frac equal a direct Python computation."""
    from collections import Counter

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.corpus import repetition_metrics

    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    r = repetition_metrics(df).collect()[0]
    assert r.n_tokens == len(words)
    assert abs(r.dup_token_frac - (1 - len(set(words)) / len(words))) < 1e-12
    bigrams = Counter(zip(words, words[1:]))
    expect = max(bigrams.values()) / sum(bigrams.values())
    assert abs(r.top_bigram_frac - expect) < 1e-12


@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=30, unique=True
    ),
    parts=st.integers(1, 6),
    salt=st.integers(0, 1000),
)
@settings(**_SETTINGS)
def test_deterministic_shuffle_is_permutation_and_layout_stable(spark, ids, parts, salt):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "k long")
    a = deterministic_shuffle(df, "k", partitions=2, salt=salt)
    b = deterministic_shuffle(df.repartition(parts), "k", partitions=3, salt=salt)
    order_a = [r["k"] for r in a.orderBy("_shuffle_key").collect()]
    order_b = [r["k"] for r in b.orderBy("_shuffle_key").collect()]
    assert order_a == order_b  # layout-independent global order
    assert sorted(order_a) == sorted(ids)  # a permutation, nothing lost


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=30, unique=True
    ),
    parts=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_weighted_sample_deterministic_and_monotone(spark, ids, parts):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i,) for i in ids], "k long")
    kept_60 = {r["k"] for r in weighted_sample(df, "k", F.lit(60)).collect()}
    kept_60b = {
        r["k"] for r in weighted_sample(df.repartition(parts), "k", F.lit(60)).collect()
    }
    assert kept_60 == kept_60b  # partitioning-independent
    kept_90 = {r["k"] for r in weighted_sample(df, "k", F.lit(90)).collect()}
    assert kept_60 <= kept_90  # raising the weight only adds rows
    kept_0 = {r["k"] for r in weighted_sample(df, "k", F.lit(0)).collect()}
    assert kept_0 == set()


def test_deterministic_shuffle_breaks_mod_p_collisions(spark):
    """Keys ≡ (mod P) share a shuffle_key; the key tie-break must keep
    the order total and layout-independent."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import _P, deterministic_shuffle

    ids = [0, _P, 2 * _P, 5, 5 + _P]
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    orders = []
    for parts in (1, 3, 5):
        out = deterministic_shuffle(df.repartition(parts), "k", partitions=2)
        orders.append([r["k"] for r in out.orderBy("_shuffle_key", "k").collect()])
    assert orders[0] == orders[1] == orders[2]
    assert sorted(orders[0]) == sorted(ids)
