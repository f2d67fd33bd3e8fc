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

Hash family: row ``r`` uses its own affine pair
``(a_r, b_r) = (A^(r+1) mod P, (B + r·SALT) mod P)`` over the prime
``P = 2^31 − 1`` — genuinely distinct multipliers per row (the
classic universal family h(x) = ((a·x + b) mod P) mod width), not one
multiplier applied to a shifted input. With a single shared
multiplier, bucket_r(h) is a constant shift of bucket_0(h), so items
colliding in row 0 collide in essentially every row and min-over-depth
amplifies nothing; distinct a_r restores the per-row independence the
CMS ε–δ bound needs.

CMS guarantee: estimates only OVERESTIMATE (collisions add, never
subtract), so ``est ≥ true`` always — an item whose true count clears
the threshold can never be missed (no false negatives); collisions can
only add false positives, bounded by the depth independent hash rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

_P = 2147483647  # Mersenne prime 2^31 - 1
_A = 1103515245
_B = 12345
_SALT = 7919


def row_coeffs(row: int) -> tuple[int, int]:
    """Row ``row``'s affine pair (a_r, b_r): a_r = A^(r+1) mod P (P is
    prime and A < P, so a_r ≠ 0), b_r = (B + r·SALT) mod P. Exposed so
    the DuckDB oracle inlines the identical literals."""
    return pow(_A, row + 1, _P), (_B + row * _SALT) % _P


def _bucket(h, row: int, width: int):
    """Row ``row``'s bucket for portable-hash value ``h`` — the
    universal affine family ((a_r·h + b_r) mod P) mod width with
    per-row coefficients (see module docstring)."""
    a, b = row_coeffs(row)
    return ((F.lit(a) * (h % F.lit(_P)) + F.lit(b)) % F.lit(_P)) % F.lit(width)


def _pairs(df: DataFrame, col: str, width: int, depth: int) -> DataFrame:
    """All depth (r, bucket) pairs per row in ONE scan: the per-row
    buckets are packed into an array and posexploded, so the physical
    plan reads the input once — not the depth-way self-union of the
    same base frame, which re-scans the (100 TB) corpus once per
    sketch row."""
    keep = df.columns  # unused carried columns are pruned by Catalyst
    buckets = F.posexplode(
        F.array(*[_bucket(F.col("_h"), i, width) for i in range(depth)])
    )
    return df.select(*keep, portable_hash(F.col(col)).alias("_h")).select(
        *keep, buckets.alias("r", "b")
    )


def cms_sketch(
    df: DataFrame, col: str, width: int = 64, depth: int = 4
) -> DataFrame:
    """Build the sketch: ≤ depth × width counter rows (r, b, cnt).
    One scan, one shuffle of (row, bucket) pairs — at 100 TB the
    groupBy's map-side partial aggregation collapses each partition to
    at most depth·width rows before anything moves."""
    return (
        _pairs(df.select(col), col, width, depth)
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


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
    probes = _pairs(cand.select("item"), "item", width, depth)
    est = (
        # left join: a candidate absent from the data may hit an empty
        # bucket — that row must contribute 0 (true count is 0), not
        # vanish from the min and inflate the estimate
        probes.join(sketch, ["r", "b"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    return est.where(F.col("est") >= F.lit(threshold))
