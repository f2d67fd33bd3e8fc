"""Corpus-preparation operators for LLM training-data pipelines.

Four additional stages every large-scale text pipeline runs before
training, complementing the dedup/quality/similarity families:

- ``chunk_documents``   split each document into overlapping token-window
                        chunks (the pretokenization sharding step)
- ``repetition_metrics``Gopher-style repetition signals (duplicate-token
                        fraction, top-bigram fraction)
- ``decontaminate``     flag documents sharing any n-gram with a benchmark
                        /eval corpus (test-set contamination check)
- ``pii_redact``        regex scrubbing of emails / long digit runs, with
                        per-document match counts

All four are relational/Column plans — no Python UDFs — so they stay in
whole-stage codegen, scale linearly, and are oracle-expressible in ANSI
SQL (see queries/extensions.py for the DuckDB twins). The reference
pipeline has no equivalent stage (its jobs stop at feature engineering,
``jobs/vdt4.py:29-77``); these extend the engine toward the 100 TB
training-corpus use case.

Scale notes:
- chunking is a map + explode — output rows ≈ tokens/step per doc, no
  shuffle; the explode is preceded by ``_widen`` so narrow local inputs
  parallelize (a no-op on a real multi-file scan).
- repetition's bigram mode needs a per-(doc, bigram) count → two hash
  aggregations keyed by doc id; partial aggregation makes the first
  map-side, and doc ids are unique so there is no skew.
- decontamination is a semi-join of corpus shingles against the (small)
  benchmark shingle set — the benchmark side broadcasts, so the 100 TB
  corpus streams map-side with zero shuffle.
- redaction is a pure per-row expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import _widen, shingles
from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize

# Redaction patterns: ASCII character classes only, spelled to parse
# identically under Java regex (Spark) and RE2 (DuckDB) — no \d, no
# backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
LONG_NUM_RE = "[0-9]{6,}"


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Chunk k covers tokens [1 + k*step, 1 + k*step + chunk_tokens) with
    step = chunk_tokens - overlap; the final chunk may be short. Window
    starts stop at n − overlap, so every chunk contributes at least one
    token beyond the previous chunk's overlap — a start inside the
    previous overlap region would emit a chunk that is a pure suffix of
    its predecessor (zero new tokens: duplicate text injected into a
    dedup pipeline). Returns (id, chunk_idx, chunk_len, chunk_text).
    chunk_idx is derived arithmetically from the window start — not from
    explode ordinality — so it is deterministic under any partitioning.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    base = _widen(df, id_col).select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("_toks")
    ).where(F.size("_toks") >= 1)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("_toks") - overlap, F.lit(1)), F.lit(step)
    )
    exploded = base.select("id", "_toks", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("_toks"), F.col("start"), chunk_tokens)
    return exploded.select(
        "id",
        ((F.col("start") - 1) / step).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("chunk_len"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_token_frac``: 1 − |distinct tokens| / |tokens| — array-local,
      no shuffle.
    - ``top_bigram_frac``: occurrences of the most frequent bigram /
      total bigrams — explode → per-(doc,bigram) count → per-doc max.
      Ties need no break: only the max count matters, not which bigram.

    Documents with < 2 tokens have no bigrams; their top_bigram_frac is
    0.0 (not null) so downstream filters compose without null guards.
    """
    base = _widen(df, id_col).select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("_toks")
    )
    n = F.size("_toks")
    dup_frac = F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct("_toks")) / n
    ).otherwise(F.lit(0.0))
    per_doc = base.select("id", n.alias("n_tokens"), dup_frac.alias("dup_token_frac"))

    bigram = F.zip_with(
        F.slice(F.col("_toks"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("_toks"), 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top = (
        base.where(n >= 2)
        .select("id", F.explode(bigram).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg((F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    return (
        per_doc.join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "dup_token_frac",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag training documents that share any n-token shingle with a
    benchmark/eval corpus (the standard test-set contamination check).

    Plan: distinct corpus shingles semi-join the benchmark's distinct
    shingle set. The benchmark side is the small one (eval suites are
    KBs-MBs) → broadcast, so at 100 TB the corpus streams through a
    map-side hash probe with no corpus shuffle. Returns every corpus row's
    id with a ``contaminated`` boolean (callers anti-join or filter).
    """
    doc_sh = shingles(docs, text_col, id_col, n=n)
    bench_sh = (
        shingles(benchmark, text_col, id_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "semi")
        .select("id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails and long digit runs, keeping per-document match counts
    for audit. Pure per-row expressions (regexp_extract_all +
    regexp_replace) — map-only at any scale. Order matters: count before
    replacing, and redact emails before digit runs so an address's
    numeric local-part isn't double-redacted.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))  # NULL-safe, see tokenize
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), LONG_NUM_RE, "<NUM>"
    )
    # count digit runs on the email-redacted text so both engines agree on
    # what a "remaining" digit run is
    n_nums = F.size(
        F.regexp_extract_all(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), F.lit(LONG_NUM_RE), F.lit(0)
        )
    )
    return df.withColumn("n_emails", n_emails).withColumn(
        "n_long_nums", n_nums
    ).withColumn("text_redacted", redacted)


def mix_corpus(
    docs: DataFrame,
    upweight_sources: list[str],
    upweight: float = 3.0,
    budget_frac: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Data mixing: deterministic weighted downsampling of each source to
    hit a global token budget (the "data mixture" step that sets domain
    proportions before pretraining).

    Each source s gets a token target ``budget · w_s / Σw`` (w_s =
    ``upweight`` for listed sources, 1 otherwise; budget =
    ``budget_frac`` × corpus tokens, so the mixture is scale-free).
    Acceptance is per-document via ``portable_hash(id) % 1e6 <
    rate_ppm`` with the rate floored to integer ppm — an exact integer
    compare, so membership is bit-reproducible across engines,
    partitionings, and reruns (re-running the mix on a grown corpus
    keeps previously-selected documents selected wherever rates didn't
    drop — hash sampling's consistency property).

    Plan shape: one map pass for token counts, one tiny per-source agg
    (|sources| rows → broadcast), acceptance as a map-side broadcast
    join + filter, then the per-source summary agg. The corpus shuffles
    exactly once (the final summary groupBy); at 100 TB the mix itself
    is embarrassingly parallel. Returns (source, rate_ppm, kept_docs,
    kept_tokens) ordered by source.
    """
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import portable_hash

    tok = docs.select(
        F.col(source_col).alias("src"),
        F.col(id_col).alias("id"),
        F.size(tokenize(F.col(text_col))).alias("n_tokens"),
    )
    src = tok.groupBy("src").agg(F.sum("n_tokens").alias("s_tokens"))
    w = (
        F.when(F.col("src").isin(*upweight_sources), F.lit(float(upweight)))
        .otherwise(F.lit(1.0))
        .alias("w")
    )
    src_w = src.select("src", "s_tokens", w)
    totals = src_w.agg(
        F.sum("s_tokens").alias("total_tokens"), F.sum("w").alias("sum_w")
    )
    rates = (
        src_w.join(F.broadcast(totals))
        .withColumn(
            "target",
            F.lit(budget_frac)
            * F.col("total_tokens").cast("double")
            * F.col("w")
            / F.col("sum_w"),
        )
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1000000).cast("long"),
                F.floor(F.col("target") / F.col("s_tokens") * F.lit(1000000.0)),
            ),
        )
        .select("src", "rate_ppm")
    )
    kept = tok.join(F.broadcast(rates), "src").where(
        portable_hash(F.col("id").cast("string")) % F.lit(1000000)
        < F.col("rate_ppm")
    )
    return (
        kept.groupBy("src", "rate_ppm")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .select(
            F.col("src").alias("source"), "rate_ppm", "kept_docs", "kept_tokens"
        )
        .orderBy("source")
    )
