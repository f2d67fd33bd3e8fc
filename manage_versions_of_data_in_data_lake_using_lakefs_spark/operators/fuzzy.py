"""Fuzzy string matching: edit-distance self-join with prefix filtering.

The reference has no string-similarity joins at all (its four jobs are
exact-key pipelines, ``jobs/vdt1-4.py``); a training-data curation engine
needs them for entity resolution and near-duplicate keys (author names,
titles, URLs that differ by a typo). A naive edit-distance join is a
cross join — O(n²) ``levenshtein`` calls, instantly fatal at 100 TB. This
module implements the Ed-Join-style *prefix filter* (Xiao et al., VLDB
2008 — public algorithm) as pure DataFrame algebra:

1. **Tokens.** Each string is decomposed into its positional q-gram
   *occurrences* ``(gram, copy#)`` — the copy number disambiguates
   repeated grams so token sets behave like multisets (crucial for keys
   like ``Customer#000000123`` where ``000`` repeats). Copy numbers are
   computed map-side with higher-order array functions (O(m²) per row on
   the gram count m, zero shuffle) — the right trade for key-length
   strings; for book-length text you'd window over (id, gram) instead.
2. **Count filter.** One edit operation destroys at most q gram
   occurrences, so ed(a,b) ≤ k ⇒ the token multisets share at least
   max(m_a, m_b) − k·q tokens.
3. **Prefix filter.** Order every string's tokens by a global canonical
   order — ascending corpus frequency, ties by token — and keep only the
   first ``k·q + 1``. Two strings that share ≥ max(m)−k·q tokens MUST
   share one inside those prefixes (pigeonhole on the canonical order).
   Rarest-first ordering is what kills skew: the ``Cus``/``tom`` grams
   shared by every key never enter a prefix, so the candidate equi-join
   fans out only on rare grams.
4. **Candidates → verify.** Equi-join prefixes on (gram, copy#),
   de-duplicate pairs, re-attach the strings, then apply the *exact*
   predicate: length filter plus ``levenshtein(a, b, k)`` (Spark's
   bounded variant — banded DP, early-exit above k). The filter chain is
   exact, so the blocking is invisible in the result — which is what
   lets the DuckDB oracle be the plain quadratic spelling.

Pairs where BOTH strings are short (m ≤ k·q, i.e. len < (k+1)·q) have no
prefix guarantee (the count-filter bound goes non-positive); they are
routed through a separate length-band block over the short strings only.
Short strings are drawn from a bounded universe (length < (k+1)·q), so
this side stays small at any corpus scale.

Every stage is native DataFrame algebra — explode / groupBy / window /
equi-join — so the whole plan is shuffle-bounded and CI plan-gates it
against CartesianProduct/BroadcastNestedLoopJoin (tests/test_fuzzy.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_tokens(text, q: int):
    """Array of (gram, copy#) structs for ``text``'s positional q-grams.

    ``copy#`` is how many earlier positions carry the same gram —
    computed with filter() over the gram array, map-side.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - F.lit(q - 1), F.lit(0))),
        lambda p: text.substr(p, F.lit(q)),
    )
    return F.transform(
        grams,
        lambda g, i: F.struct(
            g.alias("gram"),
            F.size(F.filter(grams, lambda h, j: (h == g) & (j < i))).alias("copy"),
        ),
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All id pairs (a < b) whose strings are within ``max_dist`` edits.

    Returns (a, b, dist) — exact Levenshtein distance, ≤ ``max_dist``.
    Candidate generation is the prefix-filtered q-gram equi-join described
    in the module docstring; at no point does the plan form a cross join.
    """
    k, prefix_len = max_dist, max_dist * q + 1
    s = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("t"),
        F.length(text_col).alias("len"),
    )

    toks = (
        s.withColumn("tok", F.explode(_gram_tokens(F.col("t"), q)))
        .select("id", "len", F.col("tok.gram").alias("gram"), F.col("tok.copy").alias("copy"))
    )
    # global canonical order: corpus frequency per token, rarest first
    freq = toks.groupBy("gram", "copy").agg(F.count(F.lit(1)).alias("f"))
    ranked = toks.join(freq, ["gram", "copy"])
    w = Window.partitionBy("id").orderBy("f", "gram", "copy")
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("id", "gram", "copy")
    )

    cand_long = (
        prefix.alias("a")
        .join(prefix.alias("b"), ["gram", "copy"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )

    # short-short pairs: no prefix guarantee when m ≤ k·q  ⇔  len < (k+1)·q.
    # Band on length: a emits probe keys [len, len+k], b emits its own
    # length — the equi-join meets exactly the |Δlen| ≤ k pairs.
    short = s.where(F.col("len") < (k + 1) * q).select("id", "len")
    probe = short.withColumn(
        "key", F.explode(F.sequence(F.col("len"), F.col("len") + F.lit(k)))
    )
    cand_short = (
        probe.alias("a")
        .join(short.withColumnRenamed("len", "key").alias("b"), "key")
        .where(F.col("a.id") != F.col("b.id"))
        .select(
            F.least("a.id", "b.id").alias("a"),
            F.greatest("a.id", "b.id").alias("b"),
        )
        .distinct()
    )

    cand = cand_long.unionByName(cand_short).distinct()
    sa = s.select(F.col("id").alias("a"), F.col("t").alias("ta"), F.col("len").alias("la"))
    sb = s.select(F.col("id").alias("b"), F.col("t").alias("tb"), F.col("len").alias("lb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .where(F.abs(F.col("la") - F.col("lb")) <= k)
        .withColumn("dist", F.levenshtein("ta", "tb", k))
        .where(F.col("dist") >= 0)
        .select("a", "b", "dist")
    )


def edit_distance_pairs_sql(
    table: str, text_col: str, id_col: str, max_dist: int = 1
) -> str:
    """DuckDB oracle: the literal quadratic spelling. The Spark plan's
    exact verify step makes its blocking invisible, so the naive cross
    join (fine at oracle scale) is the ground truth."""
    return f"""
SELECT CAST(a.{id_col} AS BIGINT) AS a,
       CAST(b.{id_col} AS BIGINT) AS b,
       CAST(levenshtein(a.{text_col}, b.{text_col}) AS INT) AS dist
FROM {table} a JOIN {table} b
  ON a.{id_col} < b.{id_col}
 AND abs(length(a.{text_col}) - length(b.{text_col})) <= {max_dist}
WHERE levenshtein(a.{text_col}, b.{text_col}) <= {max_dist}
"""
