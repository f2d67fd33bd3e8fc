"""Mergeable frequency sketches: Count-Min heavy hitters.

The third member of the engine's sketch family (KMV distinct-count and
HLL live in queries/advanced.py): a Count-Min Sketch (Cormode &
Muthukrishnan 2005) summarizes item frequencies in ``depth × width``
int64 counters — bounded memory at ANY corpus size, and the counters
are associative sums, so per-partition partial sketches merge by
elementwise addition (the property that makes the sketch shippable
across a 1000-executor shuffle as depth·width rows, never the items).

Engine fit: the row hashes are affine functions of the portable md5
hash — every bucket id, counter, and estimate is a pure integer
function of the data, bit-identical across partitionings AND engines,
so the sketch itself (not just its outputs) is DuckDB-oracle-checkable.

CMS guarantee: estimates only OVERESTIMATE (collisions add, never
subtract), so ``est ≥ true`` always — an item whose true count clears
the threshold can never be missed (no false negatives); collisions can
only add false positives, bounded by depth independent hash rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

_P = 2147483647
_A = 1103515245
_B = 12345
_SALT = 7919  # per-row salt stride (prime, well under P/depth)


def _bucket(h, row: int, width: int):
    """Row ``row``'s bucket for portable-hash value ``h`` — the same
    affine family as operators/sampling.hash_bucket, salted per row so
    the depth rows are independent hash functions."""
    return (
        (F.lit(_A) * ((h + F.lit(row * _SALT)) % F.lit(_P)) + F.lit(_B))
        % F.lit(_P)
    ) % F.lit(width)


def cms_sketch(
    df: DataFrame, col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Build the sketch: ≤ depth × width counter rows (r, b, cnt).
    One shuffle of (row, bucket) pairs — at 100 TB the groupBy's
    map-side partial aggregation collapses each partition to at most
    depth·width rows before anything moves."""
    base = df.select(portable_hash(F.col(col)).alias("_h"))
    pairs = None
    for i in range(depth):
        p = base.select(
            F.lit(i).alias("r"), _bucket(F.col("_h"), i, width).alias("b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    width: int = 64,
    depth: int = 4,
    threshold: int = 100,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Items whose CMS estimate clears ``threshold`` → (item, est).

    ``candidates`` supplies the item set to estimate (CMS alone cannot
    enumerate items); default is the input's distinct items — fine for
    bounded vocabularies, while a 100 TB pipeline passes a cheap
    sampled/pre-filtered candidate frame and keeps the full-distinct
    shuffle out of the plan. Estimation is one equi-join of
    candidates × depth rows against the depth·width-row sketch
    (broadcast), then a min per item."""
    sketch = F.broadcast(cms_sketch(df, col, width, depth))
    cand = (
        candidates
        if candidates is not None
        else df.select(F.col(col).alias("item")).distinct()
    )
    cand = cand.select("item", portable_hash(F.col("item")).alias("_h"))
    probes = None
    for i in range(depth):
        p = cand.select(
            "item", F.lit(i).alias("r"), _bucket(F.col("_h"), i, width).alias("b")
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        # left join: a candidate absent from the data may hit an empty
        # bucket — that row must contribute 0 (true count is 0), not
        # vanish from the min and inflate the estimate
        probes.join(sketch, ["r", "b"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    return est.where(F.col("est") >= F.lit(threshold))
