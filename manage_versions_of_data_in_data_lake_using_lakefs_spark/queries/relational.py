"""Relational parity query suite (SURVEY.md §2.1-2.7).

Each query exists twice: a Spark DataFrame build (``QUERIES``) and an ANSI
SQL string the DuckDB oracle runs on the same parquet (``ORACLES``). Column
names/aliases are kept identical on both sides; floating-point aggregates
use exact fixed-point integer sums (``decimal_sum``) so results are
bit-identical regardless of partitioning; every window order includes a
unique tiebreaker so results are engine-order-independent.

Query shapes mirror the reference jobs via the FIXTURES.md role mapping:
students→customer, learning_courses→orders, content_access_logs→lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.aggregates import (
    decimal_sum,
    frequency_index,
    group_agg,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.joins import anti_join, equi_join, semi_join
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.transforms import (
    cast_all,
    horizontal_mean,
    with_condition_label,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.windows import (
    count_over_partition,
    global_rank,
    modal_value_per_group,
    top_n_per_group,
)
from manage_versions_of_data_in_data_lake_using_lakefs_spark.sources.io import load_table, load_tables


# ---------------------------------------------------------------------------
# Flagship (Phase 0): the vdt2 shape — scan → join → agg → derived → filter
# → join → window top-1 → sort (``jobs/vdt2.py:34-64``).
# ---------------------------------------------------------------------------

def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    revenue = group_agg(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        ["o_orderkey"],
        # exact fixed-point sum: price has 2 decimals, (1-disc) has 2 → 4
        revenue=decimal_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
        ),
    )
    enriched = (
        equi_join(t["orders"], revenue, on="o_orderkey")
        .where(F.col("revenue") >= F.lit(1000.0))
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    # customer is the small dim (students-shaped): broadcast, no shuffle.
    full = equi_join(enriched, t["customer"], on="c_custkey", broadcast_right=True)
    best = top_n_per_group(
        full,
        ["c_custkey", "o_orderpriority"],
        [F.col("revenue").desc(), F.col("o_orderkey").asc()],
    )
    return best.select(
        "c_name",
        "c_mktsegment",
        "o_orderpriority",
        "o_orderkey",
        "revenue",
    ).orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())


ORACLE_FLAGSHIP = """
WITH rev AS (
    SELECT l_orderkey AS o_orderkey,
           CAST(SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
    FROM lineitem GROUP BY l_orderkey
), enriched AS (
    SELECT o.o_orderkey, o.o_custkey AS c_custkey, o.o_orderpriority, r.revenue
    FROM orders o JOIN rev r USING (o_orderkey)
    WHERE r.revenue >= 1000.0
), full_j AS (
    SELECT c.c_name, c.c_mktsegment, e.o_orderpriority, e.o_orderkey, e.revenue,
           ROW_NUMBER() OVER (PARTITION BY e.c_custkey, e.o_orderpriority
                              ORDER BY e.revenue DESC, e.o_orderkey ASC) AS rn
    FROM enriched e JOIN customer c USING (c_custkey)
)
SELECT c_name, c_mktsegment, o_orderpriority, o_orderkey, revenue
FROM full_j WHERE rn = 1
ORDER BY revenue DESC, o_orderkey ASC
"""


# ---------------------------------------------------------------------------
# §2.2 projections / filters / column ops
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P3: projection + rename + numeric filter (``jobs/vdt1.py:42``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_quantity") > 25).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


ORACLE_SCAN_PROJECT = """
SELECT l_orderkey, l_linenumber, l_extendedprice AS price, l_returnflag AS flag
FROM lineitem WHERE l_quantity > 25
"""


def q_derived_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P3: derived arithmetic column then filter (``jobs/vdt2.py:49-50``)."""
    orders = load_table(spark, sf_dir, "orders")
    # no rounding: a single IEEE division is bit-identical across engines,
    # while ROUND half-boundary semantics differ (Spark HALF_UP vs DuckDB).
    return (
        orders.withColumn("price_k", F.col("o_totalprice") / F.lit(1000.0))
        .where(F.col("price_k") >= F.lit(2.0))
        .select("o_orderkey", "price_k")
    )


ORACLE_DERIVED_FILTER = """
SELECT o_orderkey, o_totalprice / 1000.0 AS price_k
FROM orders WHERE o_totalprice / 1000.0 >= 2.0
"""


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: conditional 0/1 label (``jobs/vdt4.py:50``)."""
    li = load_table(spark, sf_dir, "lineitem")
    labeled = with_condition_label(
        li, "label", F.col("l_quantity") <= F.lit(25.0), F.lit(0), F.lit(1)
    )
    return labeled.select("l_orderkey", "l_linenumber", "label")


ORACLE_CASE_WHEN = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity <= 25.0 THEN 0 ELSE 1 END AS label
FROM lineitem
"""


def q_cast_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9: whole-row cast via a single select (``jobs/vdt4.py:35-36``)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_suppkey"
    )
    return cast_all(li, "double", ["l_orderkey", "l_quantity", "l_suppkey"]).withColumn(
        "l_linenumber", F.col("l_linenumber").cast("string")
    )


ORACLE_CAST_COLUMNS = """
SELECT CAST(l_orderkey AS DOUBLE) AS l_orderkey,
       CAST(l_linenumber AS VARCHAR) AS l_linenumber,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_suppkey AS DOUBLE) AS l_suppkey
FROM lineitem
"""


def q_horizontal_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/P11: row-wise mean over a column family (``jobs/vdt4.py:53-60``)."""
    li = load_table(spark, sf_dir, "lineitem")
    fam = [F.col(c) for c in li.columns if c in ("l_quantity", "l_discount", "l_tax")]
    return li.select(
        "l_orderkey", "l_linenumber", horizontal_mean(fam).alias("fam_mean")
    )


ORACLE_HORIZONTAL_MEAN = """
SELECT l_orderkey, l_linenumber,
       (l_quantity + l_discount + l_tax) / 3 AS fam_mean
FROM lineitem
"""


def q_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+A3: quantile bucketing with quantiles as a relational subplan.

    The reference collects ``approxQuantile`` to the driver and bakes
    literals into ``when`` (``jobs/vdt4.py:68-73``); here the quantile subplan
    stays in-plan (broadcast cross join of a 1-row frame) — no eager action,
    oracle-expressible, and identical at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    qs = orders.select(
        F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("q")
    ).select(
        F.col("q")[0].alias("q1"), F.col("q")[1].alias("q2"), F.col("q")[2].alias("q3")
    )
    bucketed = orders.crossJoin(F.broadcast(qs)).withColumn(
        "bucket",
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4),
    )
    return bucketed.select("o_orderkey", "bucket")


ORACLE_BUCKETIZE = """
WITH qs AS (
    SELECT quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.50) AS q2,
           quantile_cont(o_totalprice, 0.75) AS q3
    FROM orders
)
SELECT o_orderkey,
       CASE WHEN o_totalprice <= q1 THEN 1
            WHEN o_totalprice <= q2 THEN 2
            WHEN o_totalprice <= q3 THEN 3
            ELSE 4 END AS bucket
FROM orders, qs
"""


# ---------------------------------------------------------------------------
# §2.3 joins — full strategy surface
# ---------------------------------------------------------------------------

def _cust_orders(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir, "customer", "orders")
    # Filtered dim creates non-matching rows on both sides so outer-join
    # semantics are actually exercised.
    cust = t["customer"].where(F.col("c_acctbal") > F.lit(5000.0)).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = t["orders"].select(
        F.col("o_orderkey"), F.col("o_custkey").alias("c_custkey"), F.col("o_totalprice")
    )
    return cust, orders


_ORACLE_CO = """
WITH cust AS (
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 5000.0
), ords AS (
    SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice FROM orders
)
"""


def _join_query(how: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        cust, orders = _cust_orders(spark, sf_dir)
        return equi_join(cust, orders, on="c_custkey", how=how).select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice"
        )

    return q


q_join_inner = _join_query("inner")
q_join_left = _join_query("left")
q_join_right = _join_query("right")
q_join_full = _join_query("full")

# Spark's name-form join coalesces the key column on outer joins; spell out
# the COALESCE'd key explicitly so the oracle agrees on NULL handling.
def _oracle_join(kw: str) -> str:
    return (
        _ORACLE_CO
        + f"""
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey,
       c.c_name, o.o_orderkey, o.o_totalprice
FROM cust c {kw} JOIN ords o ON c.c_custkey = o.c_custkey
"""
    )


ORACLE_JOIN_INNER = _oracle_join("INNER")
ORACLE_JOIN_LEFT = _oracle_join("LEFT")
ORACLE_JOIN_RIGHT = _oracle_join("RIGHT")
ORACLE_JOIN_FULL = _oracle_join("FULL")


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _cust_orders(spark, sf_dir)
    return semi_join(cust, orders, on="c_custkey")


ORACLE_JOIN_SEMI = _ORACLE_CO + """
SELECT c.* FROM cust c WHERE EXISTS (
    SELECT 1 FROM ords o WHERE o.c_custkey = c.c_custkey)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _cust_orders(spark, sf_dir)
    return anti_join(cust, orders, on="c_custkey")


ORACLE_JOIN_ANTI = _ORACLE_CO + """
SELECT c.* FROM cust c WHERE NOT EXISTS (
    SELECT 1 FROM ords o WHERE o.c_custkey = c.c_custkey)
"""


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with explicit broadcast of the dim — the 43-row-students pattern
    (``jobs/vdt1.py:41``) at cluster scale: dim ships to executors, the
    100TB fact side never shuffles."""
    t = load_tables(spark, sf_dir, "nation", "customer")
    return equi_join(
        t["customer"].withColumnRenamed("c_nationkey", "n_nationkey"),
        t["nation"],
        on="n_nationkey",
        broadcast_right=True,
    ).select("c_custkey", "c_name", F.col("n_name").alias("nation"))


ORACLE_JOIN_BROADCAST = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

def q_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 at TPC-H Q1 shape: multi-aggregate groupBy with date filter —
    partial+final agg, filter pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        group_agg(
            li.where(F.col("l_shipdate") <= F.lit("2024-09-01")),
            ["l_returnflag", "l_linestatus"],
            sum_qty=decimal_sum(F.col("l_quantity"), 0),
            sum_base_price=decimal_sum(F.col("l_extendedprice"), 2),
            sum_disc_price=decimal_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
            ),
            avg_qty=decimal_sum(F.col("l_quantity"), 0) / F.count(F.lit(1)),
            avg_disc=decimal_sum(F.col("l_discount"), 2) / F.count(F.lit(1)),
            count_order=F.count(F.lit(1)),
            # distinct aggregate alongside plain ones (partial-agg +
            # distinct expansion in one shuffle) — keeps COUNT(DISTINCT)
            # under driver verification with agg_count_distinct demoted
            distinct_parts=F.count_distinct(F.col("l_partkey")),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_AGG_SUM = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND((l_quantity) * 1.0) AS BIGINT)) AS BIGINT) / 1.0 AS sum_qty,
       CAST(SUM(CAST(ROUND((l_extendedprice) * 100.0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(SUM(CAST(ROUND((l_quantity) * 1.0) AS BIGINT)) AS BIGINT) / 1.0 / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(ROUND((l_discount) * 100.0) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return group_agg(
        ev,
        ["event_type"],
        users=F.count_distinct(F.col("user_id")),
        events=F.count(F.lit(1)),
        total_value=decimal_sum(F.col("value"), 2),
    ).orderBy("event_type")


ORACLE_AGG_COUNT_DISTINCT = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       CAST(COUNT(*) AS BIGINT) AS events,
       CAST(SUM(CAST(ROUND((value) * 100.0) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_string_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: frequency-ordered categorical encoding, pure-SQL StringIndexer
    (``jobs/vdt4.py:64-65``)."""
    orders = load_table(spark, sf_dir, "orders")
    return frequency_index(orders, "o_orderpriority", out="fe3").select(
        "o_orderkey", "o_orderpriority", "fe3"
    )


ORACLE_STRING_INDEXER = """
WITH freq AS (
    SELECT o_orderpriority, COUNT(*) AS f FROM orders GROUP BY o_orderpriority
), mapping AS (
    SELECT o_orderpriority,
           CAST(ROW_NUMBER() OVER (ORDER BY f DESC, o_orderpriority ASC) - 1 AS INT) AS fe3
    FROM freq
)
SELECT o.o_orderkey, o.o_orderpriority, m.fe3
FROM orders o JOIN mapping m USING (o_orderpriority)
"""


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

def q_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/A2: count over unordered partition frame (``jobs/vdt3.py:47-48``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return count_over_partition(li, ["l_orderkey"], out="cnt").select(
        "l_orderkey", "l_linenumber", "cnt"
    )


ORACLE_WINDOW_COUNT = """
SELECT l_orderkey, l_linenumber,
       CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS cnt
FROM lineitem
"""


def q_window_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: top-1 per group via row_number (``jobs/vdt2.py:55-57``)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_n_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    ).select("o_custkey", "o_orderkey", "o_totalprice")


ORACLE_WINDOW_TOP1 = """
WITH w AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
)
SELECT o_custkey, o_orderkey, o_totalprice FROM w WHERE rn = 1
"""


def q_window_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 composite: modal category per group (``jobs/vdt3.py:47-52``)."""
    li = load_table(spark, sf_dir, "lineitem")
    return modal_value_per_group(li, ["l_partkey"], "l_returnflag", out="main_flag")


ORACLE_WINDOW_MODE = """
WITH counts AS (
    SELECT l_partkey, l_returnflag, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_partkey, l_returnflag
), ranked AS (
    SELECT l_partkey, l_returnflag,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
                              ORDER BY cnt DESC, l_returnflag ASC) AS rn
    FROM counts
)
SELECT l_partkey, l_returnflag AS main_flag FROM ranked WHERE rn = 1
"""


def q_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: global rank ID (``jobs/vdt4.py:48-49``) — parity flavor. ``rank``
    gives ties equal IDs, so it is deterministic without a tiebreaker."""
    orders = load_table(spark, sf_dir, "orders")
    return global_rank(orders, [F.col("o_totalprice").asc()], out="id").select(
        "o_orderkey", "id"
    )


ORACLE_RANK_GLOBAL = """
SELECT o_orderkey, CAST(RANK() OVER (ORDER BY o_totalprice ASC) AS INT) AS id
FROM orders
"""


def q_rank_global_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4, scale flavor: global sequential ID without the single-partition
    window (``operators/windows.py:global_row_number_scalable``) — range
    partition + local number + offset join. The (o_totalprice, o_orderkey)
    key is a total order, so the result equals ROW_NUMBER() exactly."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.windows import global_row_number_scalable

    orders = load_table(spark, sf_dir, "orders")
    return global_row_number_scalable(
        orders, ["o_totalprice", "o_orderkey"], out="id"
    ).select("o_orderkey", "id")


ORACLE_RANK_GLOBAL_SCALABLE = """
SELECT o_orderkey,
       CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS id
FROM orders
"""


def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic extension beyond the reference: per-user event deltas."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id", 1).over(w).alias("prev_event"),
        F.lead("event_id", 1).over(w).alias("next_event"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("value_delta"),
    )


ORACLE_WINDOW_LEAD_LAG = """
SELECT user_id, event_id,
       LAG(event_id, 1) OVER w AS prev_event,
       LEAD(event_id, 1) OVER w AS next_event,
       value - LAG(value, 1) OVER w AS value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# ---------------------------------------------------------------------------
# §2.6 sorts / limits / set ops
# ---------------------------------------------------------------------------

def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1-O3 + top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    a per-partition top-k then a k-row driver merge; no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


ORACLE_SORT_LIMIT = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 4000.0).select("o_custkey")
    return a.union(b).distinct()


ORACLE_UNION = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 4000.0
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 4000.0).select("o_custkey")
    return a.intersect(b)


ORACLE_INTERSECT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 4000.0
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.where(F.col("o_totalprice") > 4000.0).select("o_custkey")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep rows whose
    # multiplicity in a exceeds that in b, which EXCEPT does not.
    return a.subtract(b)


ORACLE_EXCEPT = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 4000.0
"""


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


ORACLE_DISTINCT = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


# ---------------------------------------------------------------------------
# §2.7 scalar functions (extended surface)
# ---------------------------------------------------------------------------

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("name_upper"),
        F.length(F.col("c_name")).alias("name_len"),
        F.substring(F.col("c_mktsegment"), 1, 3).alias("seg3"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.abs(F.col("c_acctbal")).alias("abs_bal"),
        F.sqrt(F.abs(F.col("c_acctbal"))).alias("sqrt_bal"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
    )


ORACLE_SCALAR_FUNCS = """
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       CAST(LENGTH(c_name) AS INT) AS name_len,
       SUBSTRING(c_mktsegment, 1, 3) AS seg3,
       CONCAT_WS('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
       ABS(c_acctbal) AS abs_bal,
       SQRT(ABS(c_acctbal)) AS sqrt_bal,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
FROM customer
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return group_agg(
        ev.select(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            F.year(F.col("ts")).alias("yr"),
            F.month(F.col("ts")).alias("mo"),
            "value",
        ),
        ["day", "yr", "mo"],
        n=F.count(F.lit(1)),
        total=decimal_sum(F.col("value"), 2),
    ).orderBy("day")


ORACLE_DATE_FUNCS = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(EXTRACT(year FROM ts) AS INT) AS yr,
       CAST(EXTRACT(month FROM ts) AS INT) AS mo,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND((value) * 100.0) AS BIGINT)) AS BIGINT) / 100.0 AS total
FROM events
GROUP BY 1, 2, 3
ORDER BY day
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join benchmarks (bench headliners)
# ---------------------------------------------------------------------------

def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape: 3-way join, agg, top-k."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    joined = equi_join(
        t["orders"].withColumnRenamed("o_custkey", "c_custkey"),
        cust.select("c_custkey"),
        on="c_custkey",
        broadcast_right=True,
    )
    full = equi_join(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        joined.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        on="o_orderkey",
    )
    return (
        group_agg(
            full,
            ["o_orderkey", "o_orderdate", "o_orderpriority"],
            revenue=decimal_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
            ),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


ORACLE_TPCH_Q3 = """
SELECT l.l_orderkey AS o_orderkey, o.o_orderdate, o.o_orderpriority,
       CAST(SUM(CAST(ROUND((l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape: 6-way snowflake join with two broadcast
    dims; revenue per nation."""
    t = load_tables(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    nr = equi_join(
        t["nation"],
        t["region"].where(F.col("r_name") == "ASIA").withColumnRenamed(
            "r_regionkey", "n_regionkey"
        ),
        on="n_regionkey",
        broadcast_right=True,
    ).select("n_nationkey", "n_name")
    cust = equi_join(
        t["customer"].withColumnRenamed("c_nationkey", "n_nationkey"),
        nr,
        on="n_nationkey",
        broadcast_right=True,
    ).select("c_custkey", "n_nationkey", "n_name")
    supp = t["supplier"].select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("s_nationkey").alias("n_nationkey")
    )
    ord_cust = equi_join(
        t["orders"].withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        on="c_custkey",
    ).select("o_orderkey", "n_nationkey", "n_name")
    li = t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
    # same-nation constraint: join lineitem→supplier (broadcast) then match
    # the customer's nation from the order side.
    li_s = equi_join(li, supp, on="l_suppkey", broadcast_right=True)
    full = li_s.join(ord_cust, on=["o_orderkey", "n_nationkey"], how="inner")
    return group_agg(
        full,
        ["n_name"],
        revenue=decimal_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
        ),
    ).orderBy(F.col("revenue").desc(), F.col("n_name").asc())


ORACLE_TPCH_Q5 = """
SELECT n.n_name,
       CAST(SUM(CAST(ROUND((l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""


RELATIONAL_QUERIES = {
    "flagship": q_flagship,
    "scan_project": q_scan_project,
    "derived_filter": q_derived_filter,
    "case_when": q_case_when,
    "cast_columns": q_cast_columns,
    "horizontal_mean": q_horizontal_mean,
    "bucketize": q_bucketize,
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_right": q_join_right,
    "join_full": q_join_full,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_broadcast": q_join_broadcast,
    "agg_sum": q_agg_sum,
    "agg_count_distinct": q_agg_count_distinct,
    "string_indexer": q_string_indexer,
    "window_count": q_window_count,
    "window_top1": q_window_top1,
    "window_mode": q_window_mode,
    "rank_global": q_rank_global,
    "rank_global_scalable": q_rank_global_scalable,
    "window_lead_lag": q_window_lead_lag,
    "sort_limit": q_sort_limit,
    "union": q_union,
    "intersect": q_intersect,
    "except": q_except,
    "distinct": q_distinct,
    "scalar_funcs": q_scalar_funcs,
    "date_funcs": q_date_funcs,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
}

RELATIONAL_ORACLES = {
    "flagship": ORACLE_FLAGSHIP,
    "scan_project": ORACLE_SCAN_PROJECT,
    "derived_filter": ORACLE_DERIVED_FILTER,
    "case_when": ORACLE_CASE_WHEN,
    "cast_columns": ORACLE_CAST_COLUMNS,
    "horizontal_mean": ORACLE_HORIZONTAL_MEAN,
    "bucketize": ORACLE_BUCKETIZE,
    "join_inner": ORACLE_JOIN_INNER,
    "join_left": ORACLE_JOIN_LEFT,
    "join_right": ORACLE_JOIN_RIGHT,
    "join_full": ORACLE_JOIN_FULL,
    "join_semi": ORACLE_JOIN_SEMI,
    "join_anti": ORACLE_JOIN_ANTI,
    "join_broadcast": ORACLE_JOIN_BROADCAST,
    "agg_sum": ORACLE_AGG_SUM,
    "agg_count_distinct": ORACLE_AGG_COUNT_DISTINCT,
    "string_indexer": ORACLE_STRING_INDEXER,
    "window_count": ORACLE_WINDOW_COUNT,
    "window_top1": ORACLE_WINDOW_TOP1,
    "window_mode": ORACLE_WINDOW_MODE,
    "rank_global": ORACLE_RANK_GLOBAL,
    "rank_global_scalable": ORACLE_RANK_GLOBAL_SCALABLE,
    "window_lead_lag": ORACLE_WINDOW_LEAD_LAG,
    "sort_limit": ORACLE_SORT_LIMIT,
    "union": ORACLE_UNION,
    "intersect": ORACLE_INTERSECT,
    "except": ORACLE_EXCEPT,
    "distinct": ORACLE_DISTINCT,
    "scalar_funcs": ORACLE_SCALAR_FUNCS,
    "date_funcs": ORACLE_DATE_FUNCS,
    "tpch_q3": ORACLE_TPCH_Q3,
    "tpch_q5": ORACLE_TPCH_Q5,
}
