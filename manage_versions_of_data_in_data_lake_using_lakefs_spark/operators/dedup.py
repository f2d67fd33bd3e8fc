"""Deduplication operators for training-data pipelines (north-star ext.).

Five dedup families over a document corpus, all expressed as relational
plans (joins/aggs/windows) so Catalyst parallelizes and the DuckDB oracle
can verify them:

- exact           hash-groupBy on raw text
- fingerprint     groupBy on canonical token-set fingerprint
- n-gram Jaccard  shingle join → pairwise intersection/union
- MinHash + LSH   shingle ids → k min-hashes → banded buckets →
                  candidate pairs → exact-Jaccard verify
- SimHash         token-hash sign sums → hamming-ball pairs
- embedding       quantized-cosine near-dup pairs (see similarity.py)

Portability note: hash functions are *affine integer hashes over
vocabulary ids* (dense ranks), not engine hash builtins — both Spark and
DuckDB compute identical integer arithmetic, so results are bit-exact
cross-engine. At 100 TB the vocabulary dense_rank (a global sort) is the
scaling bottleneck; ``use_fast_hash=True`` swaps ids for ``xxhash64`` of
the shingle text — same plan shape, no vocab pass, Spark-only results
(engine-specific hash; verified by invariant tests instead of the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import fingerprint, tokenize

# Affine-hash constants (classic LCG multipliers; any fixed odd constants
# work — both engines evaluate the same arithmetic).
_P = 2147483647  # 2^31 - 1, Mersenne prime
_A = 1103515245
_B = 12345


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one surviving row id per duplicate group + group size.
    Map-side partial agg → tiny shuffle keyed by content."""
    return df.groupBy(*key_cols).agg(
        F.min(F.col(id_col)).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes")
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bag-of-words dedup: exact dedup over the sorted-distinct-token
    fingerprint — catches reordered / repeated-content duplicates."""
    fp = fingerprint(df, text_col, out="fp")
    return fp.groupBy("fp").agg(
        F.min(F.col(id_col)).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes")
    )


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct (id, n-token-shingle) pairs. ``transform`` over a token
    array → explode; distinct happens in the same shuffle as downstream
    groupBys."""
    base = df.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") >= n)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("_toks") - F.lit(n)),
        lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, n), " "),
    )
    return base.select("id", F.explode(sh).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    Pair generation is a self-equi-join on shingle (only docs sharing a
    shingle ever meet — no cartesian product); intersection counts come
    from the join, union sizes from per-doc shingle counts. Jaccard is an
    integer/integer division → bit-identical cross-engine.

    Scale: the join key is the shingle, so frequency-skewed shingles
    dominate; for production corpora drop ultra-common shingles first
    (a WHERE on shingle doc-frequency — same plan, one extra agg).
    """
    sh = shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def _shingle_vocab(sh: DataFrame) -> DataFrame:
    """Portable shingle→id map: dense_rank over the distinct shingle set.

    Global ordered window = single-partition sort at the vocab step; fine
    for oracle-checked runs. The fast path (xxhash64) skips this entirely.
    """
    vocab = sh.select("shingle").distinct()
    return vocab.withColumn(
        "sid", F.dense_rank().over(Window.orderBy("shingle")).cast("long")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    use_fast_hash: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature: rows (id, k, mh) — mh = min over the
    doc's shingles of hash_k(shingle).

    hash_k(s) = (a_k * sid(s) + b_k) mod P with a_k, b_k derived from k by
    fixed integer arithmetic — portable to the oracle. The k-expansion is
    an array literal + explode (no UDF); the min is a partial-aggregable
    groupBy, so the whole signature build is two narrow shuffles.
    """
    sh = shingles(df, text_col, id_col, n)
    if use_fast_hash:
        ids = sh.withColumn("sid", F.abs(F.xxhash64("shingle")) % F.lit(_P))
    else:
        ids = sh.join(_shingle_vocab(sh), "shingle")
    ks = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("k")
    expanded = ids.select("id", "sid", ks)
    # all 64-bit: the a_k derivation overflows int32 (A*(k+1) ~ 1.8e10) and
    # a_k*sid reaches ~4.6e18, just inside int64
    k1 = (F.col("k") + 1).cast("long")
    hashed = expanded.withColumn(
        "hk",
        (
            ((F.lit(_A).cast("long") * k1 + F.lit(_B)) % F.lit(_P)) * F.col("sid")
            + (F.lit(_B).cast("long") * k1) % F.lit(_P)
        )
        % F.lit(_P),
    )
    return hashed.groupBy("id", "k").agg(F.min("hk").alias("mh"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    use_fast_hash: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    Banding: ``num_hashes`` minhashes → ``bands`` bands of
    ``num_hashes/bands`` rows; docs colliding on any full band become
    candidates (the classic S-curve selectivity). Candidates then get
    *exact* n-gram Jaccard (via the shingle join, restricted by semi-join
    to candidates) and pairs ≥ threshold survive. Everything is
    groupBy/join — LSH is exactly the shuffle-key trick, so Spark executes
    it as intended at any scale.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, use_fast_hash)
    banded = sig.withColumn(
        "band", F.floor(F.col("k") / F.lit(float(rows_per_band))).cast("int")
    )
    band_sig = banded.groupBy("id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "mh"))),
                lambda s: s["mh"].cast("string"),
            ),
            "_",
        ).alias("sig")
    )
    left = band_sig.select(F.col("id").alias("a"), "band", "sig")
    right = band_sig.select(F.col("id").alias("b"), "band", "sig")
    candidates = (
        left.join(right, on=["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # exact verify on candidates only
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .join(candidates, ["a", "b"], "left_semi")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    use_fast_hash: bool = False,
) -> DataFrame:
    """Per-doc SimHash over token multiset: rows (id, simhash).

    Token → integer hash h; bit j of the signature is the sign of
    Σ_tokens count·(2·bit_j(h)−1). Bit expansion is sequence+explode,
    sign-sums are one groupBy — two shuffles total, no UDFs.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(F.col(text_col))).alias("tok")
    )
    counts = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    if use_fast_hash:
        hashed = counts.withColumn("h", F.abs(F.xxhash64("tok")) % F.lit(_P))
    else:
        vocab = counts.select("tok").distinct()
        vocab = vocab.withColumn(
            "tid", F.dense_rank().over(Window.orderBy("tok")).cast("long")
        )
        hashed = counts.join(vocab, "tok").withColumn(
            "h", (F.lit(_A) * F.col("tid") + F.lit(_B)) % F.lit(_P)
        )
    expanded = hashed.select(
        "id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    )
    # bit extraction via floor(h / 2^j) % 2 — shift-by-column isn't a thing
    # in either engine's function surface, and 2^j ≤ 2^15 is exact in double
    bit_j = F.floor(F.col("h") / F.pow(F.lit(2.0), F.col("j"))).cast("long") % 2
    contrib = expanded.withColumn("c", F.col("cnt") * (bit_j * 2 - 1))
    bitsums = contrib.groupBy("id", "j").agg(F.sum("c").alias("s"))
    return bitsums.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_hamming: int = 3,
    use_fast_hash: bool = False,
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ max_hamming.

    Pairing here is the O(n²) verify (fine for corpus slices / within LSH
    buckets); the scale path blocks on signature prefixes first — same
    banding idea as MinHash-LSH, one extra groupBy.
    """
    sig = simhash(df, text_col, id_col, bits, use_fast_hash)
    a = sig.select(F.col("id").alias("a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("id").alias("b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= F.lit(max_hamming))
        .select("a", "b", "hamming")
    )
