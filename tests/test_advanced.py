"""Semantic edge cases for the advanced operators (temporal, sampling,
IVF) that the oracle hash-match can't pin down on synthetic data alone."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import hash_split
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.temporal import asof_join, sessionize


def _ts(s: int):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(seconds=s)


def test_asof_equal_timestamp_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(100))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(100), 77)], "user_id long, ts timestamp, p long"
    )
    out = asof_join(left, right, "user_id", "ts", "ts", ["p"]).collect()
    assert out[0]["p_matched"] == 77


def test_asof_takes_latest_prior_and_leaves_unmatched_null(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(100)), (2, 10, _ts(10)), (3, 99, _ts(100))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts(50), 1), (10, _ts(90), 2), (10, _ts(101), 3)],
        "user_id long, ts timestamp, p long",
    )
    rows = {
        r["event_id"]: r["p_matched"]
        for r in asof_join(left, right, "user_id", "ts", "ts", ["p"]).collect()
    }
    assert rows == {1: 2, 2: None, 3: None}


def test_sessionize_gap_boundary(spark):
    # events at t=0, t=gap (same session: not > gap), t=2*gap+1 (new session)
    gap = 60
    df = spark.createDataFrame(
        [(1, 5, _ts(0)), (2, 5, _ts(gap)), (3, 5, _ts(2 * gap + 1))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(df, gap=gap, order_tiebreak="event_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2}


def test_hash_split_is_partitioning_invariant(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(7, "doc_id"), "doc_id").collect()
    }
    assert a == b
    # rough proportions
    n_train = sum(1 for v in a.values() if v == "train")
    assert 700 < n_train < 900


def test_topk_ivf_shape(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import topk_ivf
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 4)
    out = topk_ivf(emb, queries, k=3, centroid_stride=16).collect()
    by_q: dict[int, list[int]] = {}
    for r in out:
        assert r["nbr"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_resize_media_payload_and_meta(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import documents_as_media, resize_media
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    media = documents_as_media(load_table(spark, "/root/testdata/sf0.001", "documents"))
    out = resize_media(media, 8, 4).limit(10).collect()
    for r in out:
        assert len(r["payload"]) == 32
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4


def test_sample_frames_covers_payload(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import documents_as_media, sample_frames
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(5)
    media = documents_as_media(docs)
    frames = sample_frames(media, frame_bytes=64, stride=4).collect()
    assert frames, "expected at least one frame"
    for r in frames:
        assert r["frame_idx"] % 4 == 0
        assert 0 < r["frame_len"] <= 64


def test_salted_join_matches_plain_join(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.joins import salted_join
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    sf = "/root/testdata/sf0.001"
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
    )
    salted = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salt=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import io as _io
    import contextlib

    from pyspark.sql import functions as F

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table, write_bucketed

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "t_li_b", ["k"], 8)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"), "t_ord_b", ["k"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-based path so the bucketed layout is what
        # removes the exchange (tiny test tables would broadcast otherwise)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_b").join(spark.table("t_ord_b"), "k")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it still computes the right thing
        expected = li.join(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_connected_components_known_graph(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.graph import connected_components

    # two chains (1-2-3-4), (10-11), one isolate pair (20-21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "a long, b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_survivors_keeps_unpaired(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.graph import dedup_survivors

    df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, t string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "a long, b long")
    kept = sorted(r["doc_id"] for r in dedup_survivors(df, pairs).collect())
    assert kept == [0, 1, 2, 4]


def test_agg_approx_within_tolerance(spark):
    from pyspark.sql import functions as F

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_agg_approx
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    sf = "/root/testdata/sf0.01"
    approx = {r["l_returnflag"]: r for r in q_agg_approx(spark, sf).collect()}
    li = load_table(spark, sf, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.10
        assert abs(a["approx_median_price"] - e["median_price"]) / e["median_price"] < 0.10


def test_zorder_key_known_values(spark):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    # interleave: x bits at even positions, y bits at odd
    assert out == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 5): 39}


def test_zorder_k_ary_keys_and_sql(spark):
    """r14 (VERDICT r13 #3): ZORDER generalizes to 1..k columns. Known
    values for k=1 and k=3 (bit i of column j lands at position k*i+j),
    and the DuckDB-twin SQL spelling stays bit-identical."""
    import duckdb

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.layout import zorder_key, zorder_key_sql

    df = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 5, 2)],
        "x long, y long, w long",
    )
    out = {
        (r["x"], r["y"], r["w"]): r["z"]
        for r in df.select(
            "x", "y", "w",
            zorder_key(F.col("x"), F.col("y"), F.col("w")).alias("z"),
        ).collect()
    }
    # k=3: x at 3i, y at 3i+1, w at 3i+2
    # (3,5,2) = x bits {0,1} -> positions 0,3 = 1+8; y bits {0,2} ->
    #   positions 1,7 = 2+128; w bit {1} -> position 5 = 32; total 171
    assert out == {
        (0, 0, 0): 0, (1, 0, 0): 1, (0, 1, 0): 2, (0, 0, 1): 4,
        (3, 5, 2): 171,
    }
    # 1-ary degenerates to the low bits of the column itself
    one = {
        r["x"]: r["z1"]
        for r in df.select("x", zorder_key(F.col("x")).alias("z1")).collect()
    }
    assert one == {0: 0, 1: 1, 3: 3}
    # exactness above the double mantissa (r14 review): k=1 at 60 bits
    # must reproduce the value itself for inputs > 2^53
    import duckdb as _duck

    big = spark.createDataFrame(
        [((1 << 54) + 3,), ((1 << 59) + 12345,), (7,)], "x long"
    )
    got_big = {
        r["x"]: r["z"]
        for r in big.select(
            "x", zorder_key(F.col("x"), bits=60).alias("z")
        ).collect()
    }
    assert got_big == {v: v for v in got_big}
    sql_big = dict(
        _duck.sql(
            f"SELECT x, {zorder_key_sql('x', bits=60)} AS z FROM (VALUES "
            f"({(1 << 54) + 3}), ({(1 << 59) + 12345}), (7)) t(x)"
        ).fetchall()
    )
    assert sql_big == got_big

    # SQL twin: same values, every arity
    for cols in (("x",), ("x", "y"), ("x", "y", "w")):
        expr = zorder_key_sql(*cols)
        want = {
            tuple(r[c] for c in cols): r["z"]
            for r in df.select(
                *cols, zorder_key(*[F.col(c) for c in cols]).alias("z")
            ).collect()
        }
        got = {
            tuple(row[: len(cols)]): row[len(cols)]
            for row in duckdb.sql(
                f"SELECT {', '.join(cols)}, {expr} AS z FROM "
                "(VALUES (0,0,0),(1,0,0),(0,1,0),(0,0,1),(3,5,2)) t(x,y,w)"
            ).fetchall()
        }
        assert got == want, cols


def test_optimize_zorder_arity_sql(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY parses 1 and 3 keys (Delta's 1..n), the
    rewritten layout keeps every row, and per-file min/max stay
    selective enough to prune on the leading key; 0 keys is a loud
    parse error, and an empty tuple at the API is a loud ValueError."""
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning import stats as stats_mod
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.sql import LakeSQL

    repo = LakeRepo.init(str(tmp_path / "lake"))
    sql = LakeSQL(spark, repo, "main")
    sql.sql(
        "CREATE TABLE t AS SELECT CAST(id % 32 AS LONG) AS x, "
        "CAST(id / 32 AS LONG) AS y, CAST(id % 7 AS LONG) AS w, id AS v "
        "FROM range(512)"
    )
    r1 = sql.sql("OPTIMIZE t ZORDER BY (x) INTO 4 FILES").first()
    assert r1.file_groups >= 1
    assert sql.sql("SELECT COUNT(*) AS n FROM t").first().n == 512
    # 1-ary zorder = range cluster on x: files have disjoint x ranges,
    # so a point predicate prunes to at most one candidate group
    entries = repo.current_files("main", "t")
    res = stats_mod.prune_file_list(repo.root, entries, "x = 31")
    assert res is not None
    safe, cand, _ = res
    assert len(safe) >= 1  # most groups proved unmatching

    r3 = sql.sql("OPTIMIZE t ZORDER BY (x, y, w) INTO 4 FILES").first()
    assert sql.sql("SELECT COUNT(*) AS n FROM t").first().n == 512
    assert r3.version > r1.version

    with _pytest.raises(Exception):  # 0 keys: parse error, never a no-op
        sql.sql("OPTIMIZE t ZORDER BY ()")
    with _pytest.raises(ValueError, match="at least one column"):
        repo.compact(spark, "main", "t", zorder_by=())


def test_compact_zorder_layout(spark, tmp_path):
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.versioning.repo import LakeRepo

    repo = LakeRepo.init(str(tmp_path / "lake"))
    df = spark.range(0, 512).selectExpr(
        "CAST(id % 32 AS LONG) AS x", "CAST(id / 32 AS LONG) AS y", "id AS v"
    )
    repo.write_table("main", "t", df.repartition(8))
    repo.commit("main", "v0")
    repo.compact(spark, "main", "t", target_files=4, zorder_by=("x", "y"))
    out = repo.read_table(spark, "t", "main")
    assert out.count() == 512
    assert sorted(r["v"] for r in out.collect()) == list(range(512))


def test_partitioned_write_prunes_scan(spark, tmp_path):
    import io as _io
    import contextlib

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table, write_parquet

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "ev_parted")
    write_parquet(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120], plan
    assert back.count() == ev.where(F.col("event_type") == "click").count()


def test_q6_predicates_and_projection_reach_the_scan(spark):
    """TPC-H Q6 is the pushdown probe: all filter columns must appear in
    PushedFilters and the scan's ReadSchema must be the 4 referenced
    columns, not the full 11-column lineitem schema."""
    import contextlib
    import io as _io

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_tpch_q6

    df = q_tpch_q6(spark, "/root/testdata/sf0.001")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed[0], pushed[0]
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    assert "l_extendedprice" in read[0]
    for absent in ("l_orderkey", "l_returnflag", "l_tax"):
        assert absent not in read[0], read[0]


def test_q10_dims_broadcast_no_sort_merge(spark):
    """SCALING.md claims customer/nation broadcast in tpch_q10 — enforce
    it so a threshold or hint regression can't silently turn the dims
    into fact-sized shuffles."""
    import contextlib
    import io as _io

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_tpch_q10

    df = q_tpch_q10(spark, "/root/testdata/sf0.001")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q8_all_dims_broadcast_no_cartesian(spark):
    """tpch_q8's 7 joins: every dim side (part, customer-nation, region,
    supplier, supplier-nation) must plan as BroadcastHashJoin — and the
    symmetric nation-pair OR in q7 / 8-way chain in q8 must never fall
    back to a product."""
    import contextlib
    import io as _io

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_tpch_q7, q_tpch_q8

    for fn, min_bhj in ((q_tpch_q8, 4), (q_tpch_q7, 3)):
        df = fn(spark, "/root/testdata/sf0.001")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
        assert plan.count("BroadcastHashJoin") >= min_bhj, (fn.__name__, plan)
        assert "CartesianProduct" not in plan, (fn.__name__, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (fn.__name__, plan)


def test_q19_disjunction_prunes_part_scan(spark):
    """tpch_q19's OR-of-ANDs: Catalyst must still derive the single-side
    disjunction (p_brand IN ...) for the part scan — a broadcast join
    with the raw mixed predicate would scan every part row."""
    import contextlib
    import io as _io

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_tpch_q19

    df = q_tpch_q19(spark, "/root/testdata/sf0.001")
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "p_brand" in ln]
    assert pushed, plan


def test_bench_headliners_resolve():
    """Every name bench.py times must exist in the registry — a renamed
    query must fail here, not in the driver's per-round bench run."""
    import ast
    import pathlib

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries

    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    names = {
        node.value
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.Constant) and isinstance(node.value, str)
    }
    registry = set(all_queries())
    missing = {
        n for n in names if n.startswith(("tpch_", "dedup_", "sim_", "window_", "join_", "agg_", "text_"))
        or n in ("flagship", "string_indexer", "sessionize", "sample_split")
    } - registry
    assert not missing, f"bench.py references unknown queries: {missing}"


def test_hash_split_negative_keys_route_correctly(spark):
    """pmod regression: negative keys must land in [0, 100) like positive
    ones — Spark's `%` keeps the dividend sign, which silently sent every
    negative-key row to the first split."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import hash_bucket, hash_split

    df = spark.range(-500, 500).withColumnRenamed("id", "k")
    buckets = df.select(hash_bucket(F.col("k")).alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    ).collect()[0]
    assert 0 <= buckets.lo and buckets.hi < 100
    splits = {r.split for r in hash_split(df, "k").select("split").distinct().collect()}
    assert splits == {"train", "valid", "test"}
    # negative keys alone must not collapse into a single split
    neg = hash_split(df.where(F.col("k") < 0), "k")
    assert neg.select("split").distinct().count() == 3


def test_load_table_events_conf_scoped(spark):
    """load_table('events') must not leave its parquet-reader conf
    changes behind: naive-timestamp handling for OTHER reads in the same
    session stays whatever it was (ADVICE r3: the conf leak silently
    changed how unrelated parquet reads surface naive timestamps)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    before = (
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled"),
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"),
    )
    df = load_table(spark, SF_SMOKE, "events")
    after = (
        spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled"),
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"),
    )
    assert before == after
    # and the events read itself still yields plain TimestampType
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(1).count() >= 0


def test_kmv_estimate_accuracy_and_exact_path(spark):
    """The portable KMV sketch: estimator error within the theoretical
    ~1/sqrt(k) band on the fixture, and the small-cardinality path (fewer
    than k distinct hashes) returns the EXACT count."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import q_agg_distinct_kmv

    r = q_agg_distinct_kmv(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.exact_distinct > 256, "fixture must exercise the estimator path"
    assert 0.8 <= r.est_ratio <= 1.2, r

    # small-cardinality path: distinct < k -> exact
    from pyspark.sql import functions as F

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

    small = spark.range(100).select(portable_hash(F.col("id").cast("string")).alias("h")).distinct()
    topk = small.orderBy("h").limit(256)
    got = topk.agg(F.count(F.lit(1)).alias("m")).collect()[0].m
    assert got == 100


def test_q21_aggregate_rewrite_plan(spark):
    """tpch_q21's EXISTS / NOT EXISTS pair is rewritten as one
    per-order aggregation: the plan must contain NO lineitem
    self-join residual (no CartesianProduct / BNLJ) and broadcast the
    supplier⋈nation dim. The oracle pins semantic equivalence to the
    literal correlated spelling; this pins the 100 TB shape — two
    full-lineitem shuffle self-joins collapsing into one groupBy."""
    import contextlib
    import io as _io

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.advanced import (
        q_tpch_q2,
        q_tpch_q9,
        q_tpch_q11,
        q_tpch_q16,
        q_tpch_q20,
        q_tpch_q21,
        q_tpch_q22,
    )

    for fn, min_bhj in (
        (q_tpch_q21, 1),
        (q_tpch_q9, 3),
        (q_tpch_q22, 1),
        (q_tpch_q2, 2),
        (q_tpch_q11, 2),
        (q_tpch_q16, 2),
        (q_tpch_q20, 2),
    ):
        df = fn(spark, "/root/testdata/sf0.001")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
        assert plan.count("BroadcastHashJoin") >= min_bhj, (fn.__name__, plan)
        assert "CartesianProduct" not in plan, (fn.__name__, plan)


def test_bm25_and_packing_invariants(spark):
    """BM25: a document containing a query term must outscore one with
    none (on equal length); packing: bins conserve the corpus token
    count and no bin starts beyond the bucket's total budget."""
    from pyspark.sql import functions as F

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.packing import pack_sequences
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.scoring import bm25_scores

    docs = spark.createDataFrame(
        [(1, "spark join vector"), (2, "alpha beta gamma"), (3, "spark spark spark")],
        "doc_id LONG, text STRING",
    )
    top = bm25_scores(docs, ["spark"], top_k=3).collect()
    scores = {r.doc_id: r.score for r in top}
    assert scores[3] > scores[2] == 0.0 and scores[1] > 0.0

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    corpus = load_table(spark, "/root/testdata/sf0.01", "documents")
    packed = pack_sequences(corpus, seq_len=512, buckets=8)
    total_packed = packed.agg(F.sum("tokens").alias("t")).collect()[0].t
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize

    total_docs = corpus.select(
        F.sum(F.size(tokenize(F.col("text")))).alias("t")
    ).collect()[0].t
    assert total_packed == total_docs


def test_gram_covariance_matches_numpy(spark):
    """The distributed Gram/cov pass equals a straight numpy computation
    over the same quantized vectors — on a deliberately multi-partition
    input, so partial-merge associativity is exercised."""
    import numpy as np

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.embeddings import gram_covariance

    rng = [
        (i, [round(((i * 31 + d * 7) % 13 - 6) / 7.0, 4) for d in range(5)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rng, "vec_id LONG, embedding ARRAY<FLOAT>").repartition(8)
    out = {(r.i, r.j): (r.gram, r.cov) for r in gram_covariance(df).collect()}
    Q = np.array(
        [[round(float(np.float32(x)) * 1e6) for x in v] for _, v in rng], dtype=np.int64
    )
    G = Q.T @ Q
    s = Q.sum(axis=0)
    n = len(rng)
    assert len(out) == 5 * 6 // 2
    for i in range(5):
        for j in range(i, 5):
            g, cov = out[(i + 1, j + 1)]
            assert g == G[i, j]
            expect = (float(G[i, j]) - float(s[i]) * float(s[j]) / n) / n
            assert abs(cov - expect) < 1e-9


def test_centroid_classify_separable_labels(spark):
    """On linearly separable clusters the confusion matrix is diagonal,
    and repartitioning must not change a single count (associative
    integer partials)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.embeddings import centroid_classify

    rows = []
    for i in range(30):
        lb = i % 3
        base = [0.0, 0.0, 0.0]
        base[lb] = 1.0
        base[(lb + 1) % 3] = 0.01 * (i % 5)  # within-cluster jitter
        rows.append((i, base, lb))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    for parts in (1, 7):
        conf = {
            (r.label, r.pred): r.cnt
            for r in centroid_classify(df.repartition(parts)).collect()
        }
        assert conf == {(0, 0): 10, (1, 1): 10, (2, 2): 10}


def test_bpe_train_learns_expected_merges(spark):
    """The driver-paced merge loop reproduces the classic Sennrich
    example: repeated 'lo' / 'low' dominate, and merges apply greedily
    left-to-right inside each word."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.tokenizer import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest")],
        "doc_id LONG, text STRING",
    )
    merges = bpe_train(docs, n_merges=3)
    assert merges[0] == ("l", "o")  # 'lo' appears in low×5 + lower×2 = 7
    assert merges[1] == ("lo", "w")  # then 'low' merges as a block
    assert len(merges) == 3


def test_bpe_vocab_collect_is_guarded(spark):
    """The vocab collect refuses silently unbounded driver materialization
    (VERDICT r7 #1 — the guard class r6 mandated for ANN batches): an
    over-cap vocabulary raises with the distributed-truncation hint, and
    min_count / max_vocab truncate on the DISTRIBUTED side so training
    still works under the cap."""
    import pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.tokenizer import (
        collect_vocab,
        bpe_train,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower newest newest newest")],
        "doc_id LONG, text STRING",
    )
    vocab_df = word_frequencies(docs)  # 3 distinct words
    with pytest.raises(ValueError, match="MAX_VOCAB_COLLECT.*min_count"):
        collect_vocab(vocab_df, bound=2)
    # min_count floor: 'lower' (wc=2) survives, nothing rarer exists
    assert {w for w, _ in collect_vocab(vocab_df, min_count=3, bound=2)} == {
        "low",
        "newest",
    }
    # max_vocab top-k is deterministic (wc DESC, w ASC) and under-cap
    assert collect_vocab(vocab_df, max_vocab=2, bound=2) == [
        ("low", 5),
        ("newest", 3),
    ]
    # truncation threads through the trainer: rare words can't vote, but
    # the dominant merges are unchanged
    merges = bpe_train(docs, n_merges=2, max_vocab=2)
    assert merges[0] == ("l", "o") and merges[1] == ("lo", "w")


def test_bpe_word_symbols_matches_trainer_application(spark):
    """The distributed encode (chained literal replaces over sentineled
    strings) must reproduce the trainer's own Python application loop
    exactly — including overlapping runs ('aaa' under (a,a)) and merged-
    block follow-ups ('lo'+'w')."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.tokenizer import (
        bpe_train_from_vocab,
        bpe_word_symbols,
    )

    vocab = [("low", 5), ("lower", 2), ("newest", 3), ("aaa", 4), ("aaaa", 1)]
    merges = bpe_train_from_vocab(vocab, n_merges=4)

    # python reference application (the trainer's loop, re-run per word)
    def ref(w):
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    words = spark.createDataFrame([(w,) for w, _ in vocab], "w string")
    got = {
        r.w: r.s.replace("|", "").split(" ")
        for r in bpe_word_symbols(words, merges).collect()
    }
    assert got == {w: ref(w) for w, _ in vocab}


def test_bpe_pair_counts_weights_by_word_frequency(spark):
    """pair_cnt is occurrence-weighted (a pair twice in one word counts
    twice per word occurrence) and n_words is distinct-vocab."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.tokenizer import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "aaa aaa banana")], "doc_id LONG, text STRING"
    )
    rows = {r.pair: (r.pair_cnt, r.n_words) for r in bpe_pair_counts(docs).collect()}
    # 'aa' twice inside 'aaa', word count 2 -> 4; appears in 1 vocab word
    assert rows["aa"] == (4, 1)
    # 'an' twice inside 'banana' (positions 2,4), word count 1 -> 2
    assert rows["an"] == (2, 1)


def test_jl_projection_preserves_relative_distances(spark):
    """JL sanity: for well-separated vs near-identical vector pairs, the
    projected distances keep the ordering (the guarantee the sketch is
    for), and the projection is exactly reproducible."""
    import numpy as np

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.embeddings import jl_basis, jl_project

    base = [0.5] * 64
    near = [0.5] * 63 + [0.501]
    far = [-0.5] * 64
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    out = jl_project(df, out_dims=16).collect()
    vecs = {}
    for r in out:
        vecs.setdefault(r.id, [0] * 16)[r.dim - 1] = r.val
    v = {k: np.array(x, dtype=np.int64) for k, x in vecs.items()}
    d_near = np.linalg.norm(v[0] - v[1])
    d_far = np.linalg.norm(v[0] - v[2])
    assert d_far > 10 * d_near
    # exact against numpy on the same quantized input
    B = np.array(jl_basis(16, 64), dtype=np.int64)
    q0 = np.array([round(float(np.float32(x)) * 1e6) for x in base], dtype=np.int64)
    assert (v[0] == B @ q0).all()
    # basis signs are balanced and unpatterned (Achlioptas assumption):
    # overall within 5% of 50/50, every row within binomial range, and
    # no two rows identical or anti-identical
    flat_signs = B.reshape(-1)
    assert abs(float((flat_signs == 1).mean()) - 0.5) < 0.05
    row_pos = (B == 1).sum(axis=1)
    assert ((row_pos >= 20) & (row_pos <= 44)).all(), row_pos
    for i in range(len(B)):
        for j in range(i + 1, len(B)):
            assert not (B[i] == B[j]).all() and not (B[i] == -B[j]).all()


def test_cosine_pairs_auto_switches_on_broadcast_horizon(spark):
    """cosine_pairs_auto picks flat-trained IVF under the broadcastable-k
    horizon and the hierarchical quantizer past it, and both branches
    return the same exact-verified pairs on a small separable corpus."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import cosine_pairs_auto
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    flat = {
        (r.a, r.b) for r in cosine_pairs_auto(emb, threshold=0.9).collect()
    }
    # force the hier branch by shrinking the horizon below adaptive k
    hier = {
        (r.a, r.b)
        for r in cosine_pairs_auto(emb, threshold=0.9, max_broadcast_k=1).collect()
    }
    # exact verify means no false positives on either path; at 0.9 the
    # true pair set is tiny and both blockings recover it
    assert flat == hier


def test_pagerank_ppb_properties(spark):
    """On a star graph the hub outranks leaves; total rank mass is
    conserved up to the documented <=1-ppb-per-hop floor loss; results
    are identical across partitionings (integer associativity)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.graph import pagerank_ppb

    # star: hub 0 <-> leaves 1..9
    rows = [(0, i) for i in range(1, 10)] + [(i, 0) for i in range(1, 10)]
    for parts in (1, 5):
        e = spark.createDataFrame(rows, "src LONG, dst LONG").repartition(parts)
        r = {x.node: x.rank for x in pagerank_ppb(e, iters=3).collect()}
        assert r[0] > r[1] and len(set(r[k] for k in range(1, 10))) == 1
        total = sum(r.values())
        assert abs(total - 10 * 1_000_000_000) < 10 * 3 * 100  # floor loss bound
        if parts == 1:
            first = r
    assert first == r


def test_pagerank_ppb_directed_sinks(spark):
    """ADVICE r5 (graph.py:122): on a general DIRECTED graph, sink nodes
    (appearing only as dst) must get a rank row, and the mass flowing
    into them must be redistributed, not silently dropped. Chain
    1→2→3 with sink 3: every node ranked, total mass conserved up to
    integer floor loss, and the sink (fed by 2) outranks the source."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.graph import pagerank_ppb

    e = spark.createDataFrame([(1, 2), (2, 3)], "src LONG, dst LONG")
    for parts in (1, 3):
        r = {
            x.node: x.rank
            for x in pagerank_ppb(e.repartition(parts), iters=3).collect()
        }
        assert set(r) == {1, 2, 3}  # sink 3 present
        total = sum(r.values())
        # dangling redistribution conserves mass (floor loss only);
        # without it the sink's absorbed mass would vanish each hop
        assert abs(total - 3 * 1_000_000_000) < 3 * 3 * 100
        assert r[3] > r[1]  # sink absorbs upstream mass, source has none
        if parts == 1:
            first = r
    assert first == r


def test_temperature_resample_rates(spark):
    """T=2 flattening: the smallest domain keeps everything, a 4x-larger
    domain keeps ~sqrt(1/4)=50%, and the result is a pure function of
    the key (identical across partitionings)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sampling import temperature_resample

    rows = [(i, "big" if i < 8000 else "small") for i in range(10000)]
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "k LONG, dom STRING").repartition(parts)
        out = temperature_resample(df, "k", "dom")
        got = {r.dom: r.n for r in out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert got["small"] == 2000  # nmin domain: keep-all
        # 8000 rows at rate sqrt(2000/8000)=0.5 -> ~4000 (hash granularity noise)
        assert abs(got["big"] - 4000) < 200
        if parts == 1:
            first = got
    assert first == got


def test_pq_adc_recall_and_compression(spark):
    """PQ (m=4, k=8): codes are m small ints per vector (32x smaller
    than the raw floats), ADC ranking is partitioning-independent, and
    recall@5 vs exact brute force clears a floor on the embeddings
    fixture. The floor is a regression tripwire, not a target."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import pq_encode, pq_topk_adc, pq_train
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import topk_bruteforce
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    cbs = pq_train(emb, m=4, k=8, iters=2)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    enc = pq_encode(emb, cbs)
    row = enc.first()
    assert len(row.codes) == 4 and all(0 <= c < 8 for c in row.codes)

    exact = {}
    for r in topk_bruteforce(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.nbr)
    got = {}
    for parts in (None, 7):
        e = emb if parts is None else emb.repartition(parts)
        out = {}
        for r in pq_topk_adc(e, queries, cbs, k=5).collect():
            out.setdefault(r.query_id, set()).add(r.nbr)
        if parts is None:
            got = out
    assert got == out  # layout-independent
    # raw ADC recall is intrinsically weak on this near-uniform-cosine
    # fixture (top-5 cosines sit in a dense band at p99; 12-bit codes
    # cannot separate them) — the production path is the ADC-shortlist
    # + exact-re-rank below, whose recall is the shortlist's
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import pq_topk_refined

    refined = {}
    for r in pq_topk_refined(emb, queries, cbs, k=5, shortlist=100).collect():
        refined.setdefault(r.query_id, set()).add(r.nbr)
    hits = sum(len(refined[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"PQ refined recall@5 collapsed: {hits}/{total}"


def test_ivfpq_topk_properties(spark):
    """IndexIVFPQ: probing all cells with residual codebooks must beat
    (or match) flat PQ on approximation quality, results are
    partitioning-independent, and nprobe bounds candidates."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import ivfpq_topk, ivfpq_train
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import topk_bruteforce
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    cents, cbs = ivfpq_train(emb, coarse_k=8, m=4, k=8, iters=2)
    assert len(cents) == 8 and len(cbs) == 4
    exact = {}
    for r in topk_bruteforce(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.nbr)
    for parts in (None, 7):
        e = emb if parts is None else emb.repartition(parts)
        got = {}
        for r in ivfpq_topk(e, queries, cents, cbs, k=5, nprobe=8).collect():
            got.setdefault(r.query_id, set()).add(r.nbr)
        if parts is None:
            first = got
    assert first == got  # layout-independent
    # probing every cell = flat ADC over residual codebooks. Raw ADC
    # recall is intrinsically weak on this near-uniform-cosine fixture
    # (see the flat-PQ test) — the testable property is RELATIVE:
    # residuals are smaller in magnitude than raw vectors, so the same
    # code budget must quantize at least as tightly as flat PQ.
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import pq_topk_adc, pq_train

    flat_cbs = pq_train(emb, m=4, k=8, iters=2)
    flat = {}
    for r in pq_topk_adc(emb, queries, flat_cbs, k=5).collect():
        flat.setdefault(r.query_id, set()).add(r.nbr)
    hits = sum(len(first[q] & exact[q]) for q in exact)
    flat_hits = sum(len(flat[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits >= flat_hits, f"IVFPQ {hits} < flat PQ {flat_hits} of {total}"
    assert hits / total >= 0.05, f"IVFPQ recall collapsed: {hits}/{total}"
    # nprobe=1 returns a subset drawn from single cells, still k-bounded
    n1 = ivfpq_topk(emb, queries, cents, cbs, k=5, nprobe=1)
    assert n1.groupBy("query_id").count().agg(F.max("count")).collect()[0][0] <= 5


@pytest.mark.slow
def test_scd2_apply_semantics(spark):
    """SCD2: equal-attribute changes are no-ops, differing ones close
    and reopen, new keys insert, history survives later rounds, and the
    as-of predicate reconstructs any past state exactly."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.mutations import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", 1, None), (2, "b", 1, None)],
        "k LONG, attr STRING, valid_from LONG, valid_to LONG",
    )
    # v2: k=1 unchanged (no-op), k=2 changes, k=3 new
    ch2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "k LONG, attr STRING")
    d2 = scd2_apply(dim, ch2, ["k"], version=2)
    rows = {(r.k, r.attr): (r.valid_from, r.valid_to) for r in d2.collect()}
    assert rows == {
        (1, "a"): (1, None),
        (2, "b"): (1, 2),
        (2, "B"): (2, None),
        (3, "c"): (2, None),
    }
    # v3: k=2 changes again; closed history passes through
    ch3 = spark.createDataFrame([(2, "BB")], "k LONG, attr STRING")
    d3 = scd2_apply(d2, ch3, ["k"], version=3)
    rows = {(r.k, r.attr): (r.valid_from, r.valid_to) for r in d3.collect()}
    assert rows[(2, "b")] == (1, 2) and rows[(2, "B")] == (2, 3)
    assert rows[(2, "BB")] == (3, None)
    # as-of version 2 reconstructs the v2 state
    asof2 = d3.where(
        (F.col("valid_from") <= 2)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 2))
    )
    assert {(r.k, r.attr) for r in asof2.collect()} == {(1, "a"), (2, "B"), (3, "c")}


def test_ivfpq_refined_recall(spark):
    """IVFPQ + refine: with generous probing and shortlist, exact
    re-rank recovers strong recall even on the unstructured fixture
    (the production stack's claim); results layout-independent."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import ivfpq_topk_refined, ivfpq_train
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import topk_bruteforce
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    cents, cbs = ivfpq_train(emb, coarse_k=8, m=4, k=8, iters=2)
    exact = {}
    for r in topk_bruteforce(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, set()).add(r.nbr)
    for parts in (None, 7):
        e = emb if parts is None else emb.repartition(parts)
        got = {}
        for r in ivfpq_topk_refined(
            e, queries, cents, cbs, k=5, nprobe=8, shortlist=100
        ).collect():
            got.setdefault(r.query_id, set()).add(r.nbr)
        if parts is None:
            first = got
    assert first == got
    hits = sum(len(first[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"ivfpq refined recall: {hits}/{total}"


def test_cms_overestimate_guarantee(spark):
    """CMS: estimates never underestimate (collisions only add), so an
    item whose true count clears the threshold is never missed; absent
    candidates estimate 0; results are layout-independent."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sketches import cms_heavy_hitters
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    words = docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
    exact = {
        r.word: r.c
        for r in words.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # tight width forces collisions; guarantee must hold anyway
    for parts in (None, 7):
        w = words if parts is None else words.repartition(parts)
        est = {
            r.item: r.est
            for r in cms_heavy_hitters(w, "word", width=16, depth=3, threshold=0).collect()
        }
        if parts is None:
            first = est
    assert first == est  # layout-independent sketch
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact), "CMS underestimated"
    # no false negatives at any threshold T: exact>=T implies est>=T
    t = max(exact.values())
    heavy_true = {k for k, v in exact.items() if v >= t}
    heavy_est = {k for k, v in est.items() if v >= t}
    assert heavy_true <= heavy_est
    # absent candidates estimate 0 (left join + coalesce)
    cand = spark.createDataFrame([("zzz-not-a-word",)], "item STRING")
    out = cms_heavy_hitters(
        words, "word", width=16, depth=3, threshold=0, candidates=cand
    ).collect()
    assert out[0].est == 0


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big") + tag + data
        + zlib.crc32(tag + data).to_bytes(4, "big")
    )


def _png_file(w: int, h: int, ct: int, raw: bytes, plte: bytes = b"") -> bytes:
    import struct
    import zlib

    png = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    )
    if ct == 3:
        png += _png_chunk(b"PLTE", plte)
    return png + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def test_resample_locf_edges(spark):
    """Grid boundaries, LOCF carry, span<step keys, and (key, ts) tie
    reduction."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.temporal import resample_locf

    rows = [
        (1, 0, 1.0),        # key 1: obs at 0s and 100s, 60s grid → [0, 60]
        (1, 100_000_000, 2.0),
        (2, 30_000_000, 9.0),   # key 2: span < step → no grid point
        (3, 0, 5.0),        # key 3: tie at ts 0 → max wins
        (3, 0, 7.0),
        (3, 60_000_000, 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, us LONG, value DOUBLE").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got = {
        (r.user_id, r.grid_us): r.value
        for r in resample_locf(df, "user_id", "ts", "value", 60).collect()
    }
    assert got == {
        (1, 0): 1.0,
        (1, 60_000_000): 1.0,  # carried: obs at 100s is after the point
        (3, 0): 7.0,           # tie reduced deterministically
        (3, 60_000_000): 4.0,
    }


def test_resample_locf_negative_micros(spark):
    """Pre-1970 timestamps (negative epoch micros): `div` truncates
    toward zero, so the old ceil/floor emitted a grid shifted past
    max(ts) and missing min(ts). The pmod arithmetic must keep every
    grid point inside [min(ts), max(ts)] for any sign."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.temporal import resample_locf

    rows = [
        (1, -300_000_000, 1.0),   # -300s: exactly on the 60s grid
        (1, -100_000_000, 2.0),   # -100s
        (2, -90_000_000, 3.0),    # key 2 straddles zero: [-90s, 30s]
        (2, 30_000_000, 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, us LONG, value DOUBLE").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )
    got = {
        (r.user_id, r.grid_us): r.value
        for r in resample_locf(df, "user_id", "ts", "value", 60).collect()
    }
    assert got == {
        (1, -300_000_000): 1.0,
        (1, -240_000_000): 1.0,
        (1, -180_000_000): 1.0,
        (1, -120_000_000): 1.0,  # largest multiple <= -100s
        (2, -60_000_000): 3.0,
        (2, 0): 3.0,
    }


def test_exact_rank_select_edges(spark):
    """Histogram-bisection selection: endpoints, heavy ties, negative
    values, and partitioning independence."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.aggregates import exact_rank_select

    data = [(float(v),) for v in [5] * 100 + [-1] * 3 + [9] * 7]
    df = spark.createDataFrame(data, "x double")
    res = dict(exact_rank_select(df, "x", [0.0, 0.5, 1.0]))
    # n=110: rank 0 → -1, rank floor(109*0.5)=54 → 5, rank 109 → 9
    assert res == {0.0: -1.0, 0.5: 5.0, 1.0: 9.0}
    assert res == dict(exact_rank_select(df.repartition(7), "x", [0.0, 0.5, 1.0]))
    # all-equal column terminates immediately (lo == hi after min/max)
    one = spark.createDataFrame([(2.5,)] * 9, "x double")
    assert dict(exact_rank_select(one, "x", [0.3])) == {0.3: 2.5}
    # empty input
    assert exact_rank_select(one.where(F.col("x") > 99), "x", [0.5]) == [(0.5, None)]
    # duplicate probs stay positionally aligned (dict-keyed state must
    # not collapse the returned list)
    assert exact_rank_select(df, "x", [0.5, 0.5, 0.0]) == [
        (0.5, 5.0), (0.5, 5.0), (0.0, -1.0)
    ]
    # first-round span beyond 2^53: bucket assignment must use integer
    # div (a double floor misplaces boundary-adjacent values)
    big = spark.createDataFrame(
        [(float(-(2**60)),), (0.0,), (float(2**60),)], "x double"
    )
    assert dict(exact_rank_select(big, "x", [0.5], decimals=0)) == {0.5: 0.0}


def test_png_unfilter_against_spec_vectors():
    """The unfilter path checked against HAND-DERIVED filtered bytes
    (computed from the RFC 2083 filter definitions, not with the
    repo's encoder) — a filter/unfilter pair that is wrong in a
    mutually-consistent way would pass every roundtrip test but fails
    here."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_png_codec

    _, decode_png = _make_png_codec()
    # gray 3x4, one row per filter type 1-4 (worked by hand)
    raw = bytes(
        [1, 0x0A, 0x0A, 0x0A]      # Sub:     [10,20,30]
        + [2, 0x1E, 0x1E, 0x1E]    # Up:      [40,50,60]
        + [3, 0xF1, 0x49, 0xB7]    # Average: [5,100,7]
        + [4, 0xC3, 0x39, 0x01]    # Paeth:   [200,1,2]
    )
    w, h, ct, rows = decode_png(_png_file(3, 4, 0, raw))
    assert (w, h, ct) == (3, 4, 0)
    assert [list(r) for r in rows] == [
        [10, 20, 30], [40, 50, 60], [5, 100, 7], [200, 1, 2],
    ]
    # RGB 2x2 — bpp=3 offsets for Sub's `a` and Paeth's neighbors
    raw_rgb = bytes(
        [1, 1, 2, 3, 9, 18, 27]                       # Sub
        + [4, 0x63, 0x6C, 0x75, 0x1E, 0x1E, 0x1E]     # Paeth
    )
    w, h, ct, rows = decode_png(_png_file(2, 2, 2, raw_rgb))
    assert (w, h, ct) == (2, 2, 2)
    assert [list(r) for r in rows] == [
        [1, 2, 3, 10, 20, 30], [100, 110, 120, 130, 140, 150],
    ]
    # palette: indices resolve through PLTE to RGB triples
    plte = bytes(v for j in range(4) for v in (10 * j, 10 * j + 1, 10 * j + 2))
    w, h, ct, rows = decode_png(_png_file(2, 1, 3, bytes([0, 3, 1]), plte))
    assert (w, h, ct) == (2, 1, 3)
    assert list(rows[0]) == [30, 31, 32, 10, 11, 12]


def test_png_features_real_without_stub(spark):
    """PNG is no longer behind the stub boundary: extract_features with
    allow_stub=False decodes real pixels (mean decoded channel byte),
    deterministically across partitionings."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        extract_features,
        synthesize_png_media,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_png_codec
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_synth_png

    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    media = synthesize_png_media(ids)
    rows = extract_features(media, allow_stub=False).orderBy("media_id").collect()
    assert len(rows) == 20
    # cross-check one image against a local decode
    build, (_, decode) = _make_synth_png(), _make_png_codec()
    flat = b"".join(decode(build(7))[3])
    assert [r.feat_mean for r in rows if r.media_id == 7] == [sum(flat) // len(flat)]
    again = extract_features(media.repartition(7), allow_stub=False)
    assert [tuple(r) for r in again.orderBy("media_id").collect()] == [
        tuple(r) for r in rows
    ]


def test_png_codec_roundtrip_rgba():
    """Encoder↔decoder roundtrip for RGBA (color type 6 — not covered
    by the oracle fixture) across all five filters."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_png_codec

    encode_png, decode_png = _make_png_codec()
    rows = [
        bytes((17 * y + 5 * i) % 256 for i in range(3 * 4)) for y in range(6)
    ]
    w, h, ct, back = decode_png(encode_png(rows, 3, 6))
    assert (w, h, ct) == (3, 6, 6)
    assert back == rows


def test_wav_decode_matches_local_reference(spark):
    """decode_wav_stats parses the fixture WAVs distributed and must
    match a local pure-python decode of the same payloads, at any
    partitioning."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        _make_synth_media,
        decode_wav_stats,
        synthesize_media,
    )

    ids = spark.range(1, 40).select(F.col("id").alias("doc_id"))
    media = synthesize_media(ids).where(F.col("kind") == "audio")
    rows = {r.media_id: r for r in decode_wav_stats(media.repartition(5)).collect()}
    build = _make_synth_media()
    import struct

    for mid in range(1, 40, 2):
        kind, payload = build(mid)
        assert kind == "audio"
        n = (len(payload) - 44) // 2
        xs = struct.unpack(f"<{n}h", payload[44:])
        r = rows[mid]
        assert (r.n_samples, r.s_sum, r.s_min, r.s_max) == (
            n, sum(xs), min(xs), max(xs)
        )
        assert r.s_sumsq == sum(x * x for x in xs)
        assert r.zero_crossings == sum(
            1 for a, b in zip(xs, xs[1:]) if a * b < 0
        )


def test_wav_decode_rejects_unsupported_encodings():
    """The decode boundary is loud: stereo or non-PCM payloads raise
    NotImplementedError naming the limitation, truncated payloads raise
    ValueError — never a silent wrong answer."""
    import pytest as _pytest

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        _make_synth_media,
        _make_wav_decoder,
    )

    decode = _make_wav_decoder()
    _, good = _make_synth_media()(3)
    # flip the channel count in the fmt chunk (offset 22 in the canonical
    # 44-byte header) to stereo
    stereo = bytearray(good)
    stereo[22] = 2
    with _pytest.raises(NotImplementedError, match="mono 16-bit PCM"):
        decode(bytes(stereo))
    with _pytest.raises(ValueError):
        decode(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        decode(b"not a wav")


@pytest.mark.slow
def test_classifier_learns_and_is_layout_independent(spark):
    """The trained quality classifier must (a) beat both trivial
    predictors on its training labels — the distillation actually
    learned the heuristic's shape — and (b) produce bit-identical
    weights under any partitioning (the fixed-point/128-bit-sum
    design's whole point)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.classifier import (
        FEATURE_COLS,
        quality_features,
        score_logreg,
        train_logreg,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    feats = quality_features(docs).select("doc_id", *FEATURE_COLS, "label").persist()
    try:
        w = train_logreg(feats)
        sc = score_logreg(feats, w)
        r = sc.select(
            F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
            F.avg("label").alias("base"),
        ).collect()[0]
        trivial = max(r.base, 1.0 - r.base)
        assert r.acc >= 0.75, f"train acc {r.acc}"
        assert r.acc > trivial, f"no better than always-{int(r.base >= 0.5)}"
        assert w == train_logreg(feats.repartition(7))
    finally:
        feats.unpersist()


@pytest.mark.slow
def test_classifier_early_stop_matches_frozen_sql_replay(spark):
    """VERDICT r7 #6: tol_micro early stop. The trainer breaks at its
    first frozen iteration (max |Δw| ≤ tol, weights NOT updated); the
    SQL oracle replays ALL iterations with the freeze CASE — absorbing,
    so both land on bit-identical weights and scores. Certified here by
    running the full DuckDB replay against the early-broken Spark run
    on a corpus small enough to saturate (σ̃ → 0/1) within the budget."""
    import duckdb

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.classifier import (
        FEATURE_COLS,
        quality_features,
        score_logreg,
        train_logreg,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.logreg_sql import oracle_classifier_quality
    from tests.oracle_utils import assert_frames_match

    good = (
        "the cat sat on the mat and it was a fine day for all of the "
        "animals in the big red barn that stood near to the old mill "
        "by the river where the children played in the sun for hours"
    )
    rows = [(i, good) for i in range(4)] + [
        (i, "zzz qqq 123") for i in range(4, 8)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    feats = quality_features(docs).select(
        "doc_id", *FEATURE_COLS, "label"
    ).persist()
    try:
        # high η saturates σ̃ fast; the post-saturation residual update
        # (~335 ppm · η) sits under tol, so the freeze fires mid-run
        iters, eta, tol = 12, 50_000_000, 20_000
        w, ran = train_logreg(
            feats, iters=iters, eta_ppm=eta, tol_micro=tol, return_iters=True
        )
        assert ran < iters, f"never froze ({ran} iterations)"
        sc = (
            score_logreg(feats, w)
            .select("doc_id", "label", "score_ppm", "pred")
            .orderBy("doc_id")
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        oracle = con.sql(
            oracle_classifier_quality(iters=iters, eta_ppm=eta, tol_micro=tol)
        )
        assert_frames_match(sc, oracle, "classifier_early_stop")
    finally:
        feats.unpersist()


def test_quality_features_regex_equals_token_array_build(spark):
    """r12: quality_features switched from token-array higher-order
    lambdas to three scalar regex passes. Value-identical by the
    maximal-run argument (module docstring); pinned here against the
    original array build over the fixture corpus PLUS adversarial rows
    (stopwords embedded in longer tokens, digit-adjacent stopwords,
    punctuation runs, empty and NULL text)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.classifier import (
        FEATURE_COLS,
        PPM,
        quality_features,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import STOPWORDS, tokenize
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    def array_features(df):
        toks = tokenize(F.col("text"))
        df = df.withColumn("_toks", toks)
        n_tok = F.size(F.col("_toks")).cast("long")
        n_char = F.coalesce(F.length("text"), F.lit(0)).cast("long")
        tok_chars = F.aggregate(
            F.transform(F.col("_toks"), lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        stop_hits = F.size(
            F.filter(F.col("_toks"), lambda t: t.isin(*STOPWORDS["en"]))
        ).cast("long")
        stop_ppm = F.when(
            n_tok > 0, F.floor((stop_hits * PPM) / n_tok)
        ).otherwise(F.lit(0))
        return (
            df.withColumn("f_bias", F.lit(PPM).cast("long"))
            .withColumn(
                "f_len",
                F.least(n_tok * 12_500, F.lit(PPM).cast("long")).cast("long"),
            )
            .withColumn(
                "f_stop",
                F.least(stop_ppm * 8, F.lit(PPM).cast("long")).cast("long"),
            )
            .withColumn(
                "f_alnum",
                F.when(n_char > 0, F.floor((tok_chars * PPM) / n_char))
                .otherwise(F.lit(0))
                .cast("long"),
            )
            .withColumn(
                "f_tlen",
                F.when(
                    n_tok > 0,
                    F.least(F.floor((tok_chars * PPM) / (n_tok * 8)), F.lit(PPM)),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
            .withColumn(
                "label",
                F.when((n_tok >= 40) & (stop_ppm >= 45_000), F.lit(1))
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .drop("_toks")
        )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    tricky = spark.createDataFrame(
        [
            (9001, "athea the0 0the the the-and a1 1a a"),
            (9002, "THE A of AND to IN is IT that FOR"),
            (9003, "...!!!   "),
            (9004, ""),
            (9005, None),
            (9006, "forthe thefor for the andand of9 9of of"),
        ],
        "doc_id LONG, text STRING",
    )
    docs = docs.unionByName(tricky)
    cols = ["doc_id", *FEATURE_COLS, "label"]
    got = sorted(map(tuple, quality_features(docs).select(*cols).collect()))
    want = sorted(map(tuple, array_features(docs).select(*cols).collect()))
    assert got == want


@pytest.mark.slow
def test_classifier_newton_converges_further_and_is_layout_independent(spark):
    """VERDICT r11 #2: the Newton/IRLS trainer. (a) 6 Newton iterations
    must reach a strictly better training fit than 24 fixed-step GD
    passes (the whole point of the second-order step); (b) weights are
    bit-identical under any partitioning (the 128-bit-sum + exact
    big-int adjugate solve design); (c) the accuracy bar the GD test
    pins still holds."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.classifier import (
        FEATURE_COLS,
        PPM,
        quality_features,
        score_logreg,
        train_logreg,
        train_logreg_newton,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    feats = quality_features(docs).select("doc_id", *FEATURE_COLS, "label").persist()
    try:
        w = train_logreg_newton(feats)
        assert w == train_logreg_newton(feats.repartition(7))

        def l1_residual(weights):
            sc = score_logreg(feats, weights)
            return sc.select(
                F.sum(
                    F.abs(F.col("score_ppm") - F.col("label") * PPM)
                ).alias("r")
            ).collect()[0].r

        assert l1_residual(w) < l1_residual(train_logreg(feats))
        acc = (
            score_logreg(feats, w)
            .select(F.avg((F.col("pred") == F.col("label")).cast("double")).alias("a"))
            .collect()[0]
            .a
        )
        assert acc >= 0.75, f"train acc {acc}"
    finally:
        feats.unpersist()


@pytest.mark.slow
def test_classifier_newton_early_stop_matches_frozen_sql_replay(spark):
    """The Newton trainer's tol_micro freeze is absorbing exactly like
    the GD one (unchanged weights recompute the identical below-tol
    step), so the full-length SQL replay with the freeze CASE must land
    bit-identical to the early-broken Spark run — certified end-to-end
    on a corpus small enough for Newton to converge inside the cap."""
    import duckdb

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.classifier import (
        FEATURE_COLS,
        quality_features,
        score_logreg,
        train_logreg_newton,
    )
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries.logreg_sql import (
        oracle_classifier_quality_newton,
    )
    from tests.oracle_utils import assert_frames_match

    good = (
        "the cat sat on the mat and it was a fine day for all of the "
        "animals in the big red barn that stood near to the old mill "
        "by the river where the children played in the sun for hours"
    )
    rows = [(i, good) for i in range(4)] + [
        (i, "zzz qqq 123") for i in range(4, 8)
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    feats = quality_features(docs).select(
        "doc_id", *FEATURE_COLS, "label"
    ).persist()
    try:
        # the tiny corpus is linearly separable, so the optimum is at
        # the clamp and the step decays slowly (~275k micro by it 10) —
        # the freeze is exercised with a correspondingly loose tol; the
        # absorbing-replay property under test is tol-independent
        iters, tol = 14, 300_000
        w, ran = train_logreg_newton(
            feats, iters=iters, tol_micro=tol, return_iters=True
        )
        assert ran < iters, f"never froze ({ran} iterations)"
        sc = (
            score_logreg(feats, w)
            .select("doc_id", "label", "score_ppm", "pred")
            .orderBy("doc_id")
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        oracle = con.sql(
            oracle_classifier_quality_newton(iters=iters, tol_micro=tol)
        )
        assert_frames_match(sc, oracle, "classifier_newton_early_stop")
    finally:
        feats.unpersist()


def test_ann_query_batch_bound(spark):
    """VERDICT r6 #4: closure-shipped ANN query batches are explicitly
    bounded — an oversized query frame raises a clear error naming the
    join-based alternative instead of silently blowing up the driver
    and every task closure."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.pq import _collect_query_batch

    qdf = spark.range(10).select(
        "id", F.array(F.lit(1).cast("long")).alias("q"), F.lit(1).cast("long").alias("n")
    )
    assert len(_collect_query_batch(qdf, "op", bound=10)) == 10
    with pytest.raises(ValueError, match="MAX_QUERY_BATCH"):
        _collect_query_batch(qdf, "op", bound=9)


def test_cms_rows_are_independent_hashes():
    """ADVICE r6: with ONE shared multiplier over a shifted input,
    bucket_r(h) is a constant shift of bucket_0(h) — row-0 colliders
    collide in essentially every row and min-over-depth amplifies
    nothing. The per-row (a_r, b_r) family must decorrelate rows: of
    the pairs colliding in row 0, only ~1/width may also collide in
    row 1 (we allow up to 5× the expectation; the broken scheme gives
    ~100%)."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.sketches import _P, row_coeffs

    width = 64
    a0, b0 = row_coeffs(0)
    a1, b1 = row_coeffs(1)
    assert a0 != a1  # genuinely distinct multipliers, not shifted inputs

    def bucket(h: int, a: int, b: int) -> int:
        return ((a * (h % _P) + b) % _P) % width

    # spread-out hash inputs (stand-ins for md5 portable hashes)
    hs = [(i * 2654435761) % (1 << 60) for i in range(4000)]
    by_b0: dict[int, list[int]] = {}
    for h in hs:
        by_b0.setdefault(bucket(h, a0, b0), []).append(h)
    pairs = both = 0
    for group in by_b0.values():
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                pairs += 1
                if bucket(group[i], a1, b1) == bucket(group[j], a1, b1):
                    both += 1
    assert pairs > 500  # enough row-0 colliders for the rate to mean something
    assert both / pairs < 5.0 / width, (
        f"row-1 re-collision rate {both / pairs:.3f} — rows not independent"
    )


def test_gif_lzw_roundtrip_boundaries():
    """r13: the GIF LZW codec across its hairy boundaries — code-width
    growth through every width up to 12 bits, the 4094-entry clear/reset,
    the KwKwK case, a 2-color palette (min code size floor of 2), and
    interlace. Each roundtrip decodes to exactly the palette-resolved
    source raster."""
    import random

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import _make_gif_codec

    enc, dec = _make_gif_codec()

    def check(idx, w, h, pal, interlace=False):
        got_w, got_h, rows = dec(enc(idx, w, h, pal, interlace=interlace))
        assert (got_w, got_h) == (w, h)
        assert b"".join(rows) == b"".join(pal[3 * k : 3 * k + 3] for k in idx)

    # KwKwK: runs of one symbol produce the code==len(table) case
    pal4 = bytes(range(12))
    check(bytes([1] * 40 + [2] * 3 + [1] * 17), 12, 5, pal4)
    # 2-color interlaced (min LZW code size is clamped to 2 per spec)
    pal2 = b"\x00\x00\x00\xff\xff\xff"
    check(bytes((x ^ y) & 1 for y in range(9) for x in range(7)), 7, 9, pal2, True)
    # 256-color random raster large enough to cross width 9..12 AND the
    # 4094 clear (each mismatch assigns one code; a random stream over
    # 256 symbols assigns nearly every step)
    rng = random.Random(1234)
    pal256 = bytes(rng.randrange(256) for _ in range(256 * 3))
    idx = bytes(rng.randrange(256) for _ in range(180 * 120))
    check(idx, 180, 120, pal256)
    # animated input raises loudly (the documented boundary)
    one = enc(bytes([0]), 1, 1, pal2)
    frame = one[one.index(b"\x2c") : -1]
    with pytest.raises(NotImplementedError, match="single-frame"):
        dec(one[:-1] + frame + b"\x3b")


def test_gif_features_real_without_stub(spark):
    """GIF joins PNG outside the stub boundary: extract_features with
    allow_stub=False decodes real GIF pixels, deterministically across
    partitionings, and probe_media reports the header dimensions."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import (
        _make_gif_codec,
        _make_synth_gif,
        extract_features,
        probe_media,
        synthesize_gif_media,
    )

    ids = spark.range(20).select(F.col("id").alias("doc_id"))
    media = synthesize_gif_media(ids)
    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert probed[7].detected_format == "gif"
    assert (probed[7].width, probed[7].height) == (2 + 7 % 6, 1 + 7 % 4)
    rows = extract_features(media, allow_stub=False).orderBy("media_id").collect()
    assert len(rows) == 20
    build, (_, decode) = _make_synth_gif(), _make_gif_codec()
    flat = b"".join(decode(build(7))[2])
    assert [r.feat_mean for r in rows if r.media_id == 7] == [sum(flat) // len(flat)]
    again = extract_features(media.repartition(7), allow_stub=False)
    assert [tuple(r) for r in again.orderBy("media_id").collect()] == [
        tuple(r) for r in rows
    ]
