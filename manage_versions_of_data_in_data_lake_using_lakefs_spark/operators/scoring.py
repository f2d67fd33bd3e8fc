"""Ranked retrieval scoring (BM25) over the documents corpus.

Query-time scoring with a handful of terms is a MAP problem, not a join
problem: per-term term frequencies come from array HOFs over each row's
own token array (no explode, no shuffle of the corpus), and the only
non-map step is ONE tiny global aggregate — N, avgdl, and one document
frequency per query term — that broadcasts back as a single row. At
100 TB the corpus is scanned exactly once and nothing wide ever
shuffles. (An inverted-index formulation — explode → filter → groupBy —
only wins when the term set is large or reused across many queries;
both shapes are built from the same primitives.)

The idf uses the rational Robertson–Sparck-Jones odds form
``(N - df + 0.5) / (df + 0.5)`` WITHOUT the usual log: every input is
an exact integer count, so the odds (and hence the whole score) is the
same IEEE double in any engine, keeping the ranking fully
oracle-checkable. ``ln`` would reintroduce a cross-libm 1-ulp hazard
for zero ranking benefit (log is monotone — the ORDER is identical).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize


def bm25_scores(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 (odds-idf variant) for ``terms``.

    Plan: map pass (tokenize + per-term tf + doclen) → one global agg
    (N, Σdl, per-term df) broadcast as one row → map scoring → a
    distributed TakeOrdered for the top-k. Ties break on ``id_col`` so
    the cut is total-order deterministic."""
    toks = tokenize(F.col(text_col))

    def _tf(term: str):
        # closure via factory, NOT a default arg — pyspark's HOF lambda
        # introspection treats `term=term` as a second lambda parameter
        # (the element index) and breaks the comparison
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[_tf(term).alias(f"tf_{i}") for i, term in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (
            F.col(f"df_{i}") + F.lit(0.5)
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
        )
    return (
        scored.select(F.col(id_col), F.col("dl"), score.alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(top_k)
    )


def bm25_sql(
    terms: Sequence[str],
    toks_sql: str,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """DuckDB twin of ``bm25_scores`` over ``documents`` (kept adjacent
    so the two never drift). ``toks_sql`` is the SQL tokenizer
    expression (``queries/extensions._SQL_TOKS``)."""
    tf_cols = ",\n           ".join(
        f"len(list_filter(tk, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""
WITH base AS (
    SELECT doc_id, len(tk) AS dl,
           {tf_cols}
    FROM (SELECT doc_id, {toks_sql} AS tk FROM documents)
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl,
           {df_cols}
    FROM base
)
SELECT doc_id, dl, 0.0 + {score_terms} AS score
FROM base CROSS JOIN (
    SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM stats)
ORDER BY score DESC, doc_id
LIMIT {top_k}
"""


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document statistical-LM quality score: the corpus-trained
    add-one-smoothed bigram model's average per-bigram probability, in
    exact integer parts-per-million → (doc_id, n_bigrams, avg_ppm).

    This is the classic perplexity-style quality filter (CCNet/Gopher
    score against an LM, keep the predictable text) with one deliberate
    twist: the score stays in INTEGER arithmetic end to end —
    p(w2|w1) ≈ (C(w1,w2)+1)·10⁶ DIV (C(w1)+V) — so the result is
    bit-identical at any partitioning and replayable as SQL (a float
    log-prob sum is neither). log is monotone per term, and for
    filter-by-threshold use the probability scale ranks the same tail.

    Scale shape: bigram occurrences are built map-only from each row's
    own token array (an indexed ``transform``, no posexplode self-join);
    ONE groupBy counts bigrams; context counts derive from the bigram
    table (not a second corpus pass); V and the context table join back
    by key. The corpus shuffles once, counts tables scale with the
    vocabulary (Heaps-law sublinear), and the final score is a per-doc
    aggregate. Integer envelope: exact while the hottest bigram count
    stays below ~9.2·10¹² (int64 ÷ 10⁶ ppm scale) — beyond that, drop
    the scale a decade.
    """
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import _widen

    toks = _widen(docs, id_col).select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("tk")
    ).where(F.size("tk") >= 2)
    occ = toks.select(
        "id",
        F.explode(
            F.expr(
                "transform(slice(tk, 1, size(tk) - 1), (x, i) -> "
                "struct(x AS w1, tk[i + 1] AS w2))"
            )
        ).alias("bg"),
    ).select("id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bc = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cc = bc.groupBy("w1").agg(F.sum("cb").alias("cw"))
    vocab = cc.agg(F.count(F.lit(1)).alias("vocab"))
    scored = (
        occ.join(bc, ["w1", "w2"])
        .join(cc, "w1")
        .crossJoin(vocab)  # 1-row broadcast
        .select(
            "id",
            F.expr("(cb + 1) * 1000000 DIV (cw + vocab)").alias("s"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("sum(s) DIV count(1)").alias("avg_ppm"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "avg_ppm")
    )
