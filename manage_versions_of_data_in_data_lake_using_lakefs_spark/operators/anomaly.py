"""Robust anomaly detection: per-key median/MAD outlier flagging.

The reference pipelines clean event tables with static predicates
(``jobs/vdt3.py``-style filters); a curation engine at 100 TB needs a
*data-derived* outlier rule. Mean/stddev z-scores are the textbook
answer but are themselves dragged by the outliers they're meant to
catch; the robust form — median and MAD (median absolute deviation) —
has a 50% breakdown point and is the standard choice for dirty data.

Exactness discipline: both medians are *lower medians* — the element at
rank ⌈n/2⌉ under the total order (value, event_id) — so every reported
number is an actual data value picked deterministically, never an
interpolated average. That makes the whole operator bit-exact and
SQL-replayable in the DuckDB oracle (same spelling, same ranks), the
same portability rationale as operators/aggregates.py's exact quantiles.

Scale shape: two window passes partitioned by the group key (each one
shuffle of (key, value, id) triples — the payload never moves), a
broadcast-sized per-key stats frame joined back, and a map-side filter.
No global sort, no driver collect; per-key medians via rank-select
windows is exactly the plan that survives 1000 executors — EXCEPT for a
giant key (a low-cardinality key column funnels most rows through one
window partition). Those are auto-detected (one counting pass, r9) and
routed through histogram bisection instead: the per-key median is found
by iterating over the value's IEEE-754 bit space (monotone long
mapping), ≤ buckets counters shuffled per round, never a single-task
sort. The bisected median is the VALUE at rank ⌈n/2⌉ — identical to the
window spelling's, because the id tiebreak only picks *which row* among
equal values, never a different value — so the DuckDB oracle is
unchanged.
"""

from __future__ import annotations

import math
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: rows in one key above which the per-key window would funnel a
#: giant partition through one task — route that key through histogram
#: bisection instead (detected by one cheap counting aggregation)
GIANT_KEY_ROWS = 10_000_000


def _bits_to_double(m: int) -> float:
    """Invert the monotone long mapping built in ``_giant_medians``."""
    raw = m if m >= 0 else m ^ 0x7FFFFFFFFFFFFFFF
    return struct.unpack("<d", struct.pack("<Q", raw & 0xFFFFFFFFFFFFFFFF))[0]


def _giant_medians(
    sub: DataFrame, key: str, val: str, counts: dict, buckets: int = 1024
) -> dict:
    """Exact per-key lower-median VALUE of ``val`` for the (few) giant
    keys, via histogram bisection over the IEEE-754 bit space.

    Doubles map monotonically onto longs (raw bits; negative values flip
    their magnitude bits), so rank selection runs in exact integer
    space — no fixed-point scaling loss, any double domain. One scan per
    round shared by ALL giant keys (each key is one arm of a posexploded
    histogram); the value window narrows ×buckets per round, so 64-bit
    space resolves in ≤ 7 rounds. The shuffle per round carries at most
    keys·buckets counters regardless of data size."""
    bits = (
        F.expr(
            f"cast(reflect('java.lang.Double','doubleToRawLongBits',"
            f" cast(`{val}` as double)) as long)"
        )
    )
    mono = F.when(bits >= 0, bits).otherwise(
        bits.bitwiseXOR(F.lit(0x7FFFFFFFFFFFFFFF))
    )
    vals = sub.select(F.col(key).alias("k"), mono.alias("m")).persist()
    try:
        rng = {
            r["k"]: [int(r["lo"]), int(r["hi"])]
            for r in vals.groupBy("k")
            .agg(F.min("m").alias("lo"), F.max("m").alias("hi"))
            .collect()
        }
        # 0-indexed lower-median rank within the key's sorted values
        state = {
            k: [lo, hi, (counts[k] - 1) // 2] for k, (lo, hi) in rng.items()
        }
        # callers pre-filter NULL keys (mad_anomalies drops them up
        # front — they can never flag); a None here is a caller bug.
        # An explicit raise, not assert: the isin() routing downstream
        # three-value-poisons on NULL keys, and `python -O` strips asserts
        if any(k is None for k in state):
            raise ValueError("NULL key reached _giant_medians bisection")
        order = sorted(state)
        while True:
            specs = [
                (i, k, st[0], st[1], (st[1] - st[0] + buckets) // buckets)
                for i, (k, st) in enumerate((k, state[k]) for k in order)
                if st[1] > st[0]
            ]
            if not specs:
                break
            arms = [
                F.when(
                    (F.col("k") == F.lit(k))
                    & F.col("m").between(F.lit(lo), F.lit(hi)),
                    F.struct(
                        F.lit(i).alias("s"),
                        # decimal(38,0): the bit-space span between a
                        # negative lo and positive hi exceeds int64
                        F.expr(
                            f"(cast(m as decimal(38,0)) - {lo}) div {w}"
                        ).alias("b"),
                    ),
                )
                for (i, k, lo, hi, w) in specs
            ]
            hist = (
                vals.select(F.explode(F.array(*arms)).alias("e"))
                .where(F.col("e").isNotNull())
                .groupBy(F.col("e.s").alias("s"), F.col("e.b").alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            per: dict[int, dict[int, int]] = {}
            for r in hist:
                per.setdefault(int(r.s), {})[int(r.b)] = int(r.c)
            for i, k, lo, hi, w in specs:
                st = state[k]
                cum = 0
                for b in sorted(per.get(i, {})):
                    c = per[i][b]
                    if cum + c > st[2]:
                        st[0] = lo + b * w
                        st[1] = min(hi, lo + (b + 1) * w - 1)
                        st[2] -= cum
                        break
                    cum += c
        return {k: _bits_to_double(st[0]) for k, st in state.items()}
    finally:
        vals.unpersist(blocking=False)


def _lower_median(df: DataFrame, key: str, val: str, tie: str, out: str) -> DataFrame:
    """Per-``key`` lower median of ``val``: the value at rank ⌈n/2⌉ under
    ORDER BY (val, tie). One shuffle on ``key``."""
    w = Window.partitionBy(key).orderBy(val, tie)
    wn = Window.partitionBy(key)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .where(F.col("_rn") == F.floor((F.col("_n") + 1) / 2).cast("int"))
        .select(F.col(key), F.col(val).alias(out))
    )


def mad_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    nsigma: int = 3,
    giant_key_rows: int | None = GIANT_KEY_ROWS,
) -> DataFrame:
    """Rows whose |value − median(key)| exceeds ``nsigma`` × MAD(key).

    Returns (id, key, value, med, mad) for the flagged rows — med/mad are
    the per-key lower medians described in the module docstring.

    Keys holding more than ``giant_key_rows`` rows (one cheap counting
    aggregation detects them, r9) skip the per-key window — which would
    funnel the whole group through one task — and get their medians from
    the shared bisection in ``_giant_medians`` instead; identical values,
    identical oracle. ``giant_key_rows=None`` disables detection (saves
    the counting pass when the key cardinality is known-high)."""
    # NULL values carry no outlier signal and Spark/DuckDB disagree on
    # their ORDER BY placement (NULLS FIRST vs LAST) — exclude them up
    # front so the rank selects stay bit-identical across engines.
    # NULL KEYS are excluded too: the med/mad join-back drops them in
    # both engines (NULL never equi-joins), so they can never flag —
    # and filtering here keeps the giant-key isin() routing two-valued
    # (a NULL key in an isin list silently NULLs every other row's
    # predicate) and spares a NULL-giant the one-task window
    base = events.where(
        F.col(val_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key"), F.col(val_col).alias("v")
    )
    giants: dict = {}
    if giant_key_rows is not None:
        giants = {
            r["key"]: int(r["n"])
            for r in base.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > giant_key_rows)
            .collect()
        }
    if giants:
        gset = list(giants)
        gbase = base.where(F.col("key").isin(gset))
        base = base.where(~F.col("key").isin(gset))
        g_med = _giant_medians(gbase, "key", "v", giants)
        med_expr = F.coalesce(
            *[
                F.when(F.col("key") == F.lit(k), F.lit(v))
                for k, v in sorted(g_med.items())
            ]
        )
        g_dev = gbase.withColumn("med", med_expr).withColumn(
            "ad", F.abs(F.col("v") - F.col("med"))
        )
        g_mad = _giant_medians(g_dev, "key", "ad", giants)
        mad_expr = F.coalesce(
            *[
                F.when(F.col("key") == F.lit(k), F.lit(v))
                for k, v in sorted(g_mad.items())
            ]
        )
        g_out = (
            g_dev.withColumn("mad", mad_expr)
            .where(F.col("ad") > F.lit(nsigma) * F.col("mad"))
            .select("id", "key", "v", "med", "mad")
        )
    med = _lower_median(base, "key", "v", "id", "med")
    dev = base.join(med, "key").withColumn("ad", F.abs(F.col("v") - F.col("med")))
    mad = _lower_median(dev, "key", "ad", "id", "mad")
    out = dev.join(mad, "key").where(
        F.col("ad") > F.lit(nsigma) * F.col("mad")
    ).select("id", "key", "v", "med", "mad")
    if giants:
        out = out.unionByName(g_out)
    return out.select(
        F.col("id").alias(id_col),
        F.col("key").alias(key_col),
        F.col("v").alias(val_col),
        "med",
        "mad",
    )


def mad_anomalies_sql(
    table: str,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    nsigma: int = 3,
) -> str:
    """DuckDB twin of ``mad_anomalies`` (kept adjacent so the rank-select
    spelling never drifts from the Spark build)."""
    return f"""
WITH base AS (
    SELECT {id_col} AS id, {key_col} AS key, {val_col} AS v FROM {table}
    WHERE {val_col} IS NOT NULL
),
med AS (
    SELECT key, v AS med FROM (
        SELECT key, v,
               row_number() OVER (PARTITION BY key ORDER BY v, id) AS rn,
               count(*) OVER (PARTITION BY key) AS n
        FROM base
    ) WHERE rn = CAST(floor((n + 1) / 2) AS INT)
),
dev AS (
    SELECT b.id, b.key, b.v, m.med, abs(b.v - m.med) AS ad
    FROM base b JOIN med m USING (key)
),
mad AS (
    SELECT key, ad AS mad FROM (
        SELECT key, ad, id,
               row_number() OVER (PARTITION BY key ORDER BY ad, id) AS rn,
               count(*) OVER (PARTITION BY key) AS n
        FROM dev
    ) WHERE rn = CAST(floor((n + 1) / 2) AS INT)
)
SELECT d.id AS {id_col}, d.key AS {key_col}, d.v AS {val_col}, d.med, t.mad
FROM dev d JOIN mad t USING (key)
WHERE d.ad > {nsigma} * t.mad
"""
