"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerunning
after a repartition yields a different sample, which is poison for
reproducible training sets. These operators derive the split from a fixed
affine integer hash of a key column instead: the assignment is a pure
function of the row, identical on any cluster layout, any engine (the
DuckDB oracle runs the same arithmetic), and stable across reruns.

All map-only — zero shuffles at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 2147483647
_A = 1103515245
_B = 12345


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key.

    The key is reduced mod P before the multiply — (A·(k mod P) + B) mod P
    equals (A·k + B) mod P, but A·k itself overflows int64 for k ≳ 8.4e9
    while A·(k mod P) peaks at ~2.3e18, inside int64. ``pmod`` (not ``%``,
    which keeps the dividend's sign) so negative keys still land in
    [0, buckets) instead of all falling below every split threshold."""
    k = F.pmod(key.cast("long"), F.lit(_P))
    return ((F.lit(_A).cast("long") * k + F.lit(_B)) % F.lit(_P)) % F.lit(buckets)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    out: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket.

    ``weights`` maps split name → percentage (must sum to 100); default
    80/10/10 train/valid/test. Buckets are allocated to splits in the
    given order, so the assignment is stable when weights change only at
    the tail.
    """
    weights = weights or {"train": 80, "valid": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    b = hash_bucket(F.col(key_col))
    expr = None
    hi = 0
    for name, pct in weights.items():
        hi += pct
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, pct_by_stratum: dict[str, int]
) -> DataFrame:
    """Keep a deterministic pct of rows per stratum (e.g., downsample the
    dominant language, keep all of the rare one). Map-only."""
    b = hash_bucket(F.col(key_col))
    keep = None
    for stratum, pct in pct_by_stratum.items():
        cond = (F.col(strata_col) == F.lit(stratum)) & (b < F.lit(pct))
        keep = cond if keep is None else keep | cond
    return df.where(keep)


def shuffle_key(key: Column, salt: int = 0) -> Column:
    """Deterministic permutation key: an affine bijection of the
    (salted) key mod P. Keys that differ by a multiple of P collide, so
    ordering must ALWAYS tie-break on the key itself (as
    ``deterministic_shuffle`` does) — (shuffle_key, key) is a total
    order for any int64 keys. A different ``salt`` yields an unrelated
    permutation (fresh training order per epoch without
    re-materializing anything)."""
    k = F.pmod(key.cast("long") + F.lit(salt), F.lit(_P))
    return (F.lit(_A).cast("long") * k + F.lit(_B)) % F.lit(_P)


def deterministic_shuffle(
    df: DataFrame, key_col: str, partitions: int | None = None, salt: int = 0
) -> DataFrame:
    """Global training-order randomization, the last step before a corpus
    ships to a data loader. ``ORDER BY rand()`` is neither reproducible
    nor rerun-stable; this orders by ``shuffle_key`` instead and realizes
    the order with repartitionByRange + sortWithinPartitions — Spark's
    scalable global sort (range exchange, no single reducer; at 100 TB
    each partition sorts locally after a sampled-boundary exchange).
    Output files read in partition order yield the permuted corpus."""
    out = df.withColumn("_shuffle_key", shuffle_key(F.col(key_col), salt))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    # tie-break on the key: shuffle_key collides for keys ≡ (mod P), and
    # a tie left to physical layout would break run-to-run reproducibility
    return out.repartitionByRange(
        n, F.col("_shuffle_key"), F.col(key_col)
    ).sortWithinPartitions("_shuffle_key", key_col)


def weighted_sample(df: DataFrame, key_col: str, weight_pct: Column) -> DataFrame:
    """Quality-weighted downsampling: keep each row with probability
    ``weight_pct``/100, decided by the row's own hash — deterministic,
    map-only, rerun-stable (unlike ``df.sample``). ``weight_pct`` is any
    integer Column in [0, 100], typically derived from a quality score,
    so high-quality documents survive at a higher rate — the standard
    curriculum/quality-mixing primitive."""
    return df.where(hash_bucket(F.col(key_col)) < weight_pct)


def temperature_resample(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Temperature-flattened domain mixing at T=2 (exponent α=1/2), the
    standard multilingual/multi-domain rebalance (mBERT/XLM-R style):
    each domain keeps rate (n_min/n_d)^α, so the smallest domain keeps
    everything and a domain 100× larger keeps 10% — flattening the
    mixture toward uniform without upsampling.

    α is fixed at 1/2 because ``sqrt`` is IEEE-correctly-rounded in
    every engine (bit-identical Spark vs DuckDB), while ``pow`` with a
    general fractional exponent is not — reproducibility of the corpus
    beats exponent generality, and T=2 is the common published setting.
    Steeper flattening composes by applying the op twice (α=1/4).

    Scale shape: one tiny groupBy(domain) count, a 1-row min, a
    broadcast of the per-domain thresholds back onto the corpus, then
    the same map-only hash keep as ``weighted_sample`` — no shuffle of
    the corpus itself and no driver collect."""
    counts = df.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    rates = counts.crossJoin(nmin).select(
        "_dom",
        F.floor(
            F.lit(granularity)
            * F.sqrt(F.col("_nmin").cast("double") / F.col("_n").cast("double"))
        ).cast("long").alias("_thresh"),
    )
    # eqNullSafe: a NULL domain is a real (grouped) domain — a plain
    # equi-join would silently drop its rows while its count still set
    # n_min, collapsing every other domain's keep-rate
    keep = df.join(
        F.broadcast(rates), df[domain_col].eqNullSafe(F.col("_dom")), "inner"
    ).drop("_dom")
    return keep.where(
        hash_bucket(F.col(key_col), granularity) < F.col("_thresh")
    ).drop("_thresh")


def sample_k_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """Keep a deterministic pseudo-random ``k`` rows per group — the
    eval-set/few-shot-exemplar primitive (k examples per language /
    domain / task). Rows are ranked inside each group by
    (portable md5 hash of the key, key): a pure function of the row, so
    the picked set is identical on any layout, any engine, any rerun —
    ``df.sample`` and ``rand()``-ordered windows are neither. One
    window over a group-partitioned shuffle; no collect."""
    from pyspark.sql import Window

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

    w = Window.partitionBy(group_col).orderBy(
        portable_hash(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
