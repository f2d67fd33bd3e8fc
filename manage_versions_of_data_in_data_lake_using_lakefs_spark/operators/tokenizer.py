"""BPE tokenizer training: the distributed merge-candidate count.

Byte-pair-encoding training is iterative, but every iteration is the
same distributed primitive: count adjacent-symbol-pair occurrences over
the corpus, weighted by word frequency, and take the argmax. The scale
trick — the one every real tokenizer trainer (GPT-2's, SentencePiece's)
uses — is that the corpus collapses to its word-frequency VOCABULARY
first: the 100 TB corpus pays exactly one token-count shuffle, and all
pair arithmetic runs over the (tiny, ~10⁶-row) vocab. The merge loop
then iterates on vocab-sized data; ``bpe_pair_counts`` is one such
iteration exposed as a query, with the full iteration driver in
``bpe_train`` (driver-side loop over a metadata-sized vocab, the same
pattern as the k-means trainer in clustering.py).

Pair extraction is pure Column arithmetic — a 2-char substring at every
position — spelled identically in the DuckDB oracle
(``bpe_pair_counts_sql`` kept adjacent so the two never drift). No
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from manage_versions_of_data_in_data_lake_using_lakefs_spark.runtime import local_df

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.text import tokenize


#: hard bound on collected word-frequency vocabularies. The docstring
#: Heaps'-law argument (~10⁶ rows for clean prose) does NOT hold for a
#: 100 TB web corpus, whose "word" set (typos, URLs, numbers) reaches
#: 10⁸⁺ — real trainers truncate by min-count/top-k BEFORE collecting
#: (SentencePiece does both). The merge loop is O(vocab · n_merges)
#: driver-side, so an unbounded collect is a driver blowup, not merely
#: a slow path — same guard class as pq.py's MAX_QUERY_BATCH.
MAX_VOCAB_COLLECT = 2_000_000


def collect_vocab(
    vocab_df: DataFrame,
    *,
    min_count: int = 1,
    max_vocab: int | None = None,
    bound: int | None = None,
) -> list[tuple[str, int]]:
    """Collect a (w, wc) vocabulary for driver-paced training, refusing
    silently unbounded collects. ``min_count`` (frequency floor) and
    ``max_vocab`` (deterministic top-k on wc DESC, w ASC) truncate on
    the DISTRIBUTED side, so the driver only ever sees bounded metadata;
    ``limit(bound+1)`` keeps the overflow probe itself cheap."""
    bound = MAX_VOCAB_COLLECT if bound is None else bound
    if min_count > 1:
        vocab_df = vocab_df.where(F.col("wc") >= min_count)
    if max_vocab is not None:
        vocab_df = vocab_df.orderBy(
            F.col("wc").desc(), F.col("w").asc()
        ).limit(max_vocab)
    rows = vocab_df.limit(bound + 1).collect()
    if len(rows) > bound:
        raise ValueError(
            f"BPE vocabulary exceeds MAX_VOCAB_COLLECT={bound} rows; "
            "truncate distributed-side before training — min_count=N "
            "drops rare noise words, max_vocab=K keeps the K most "
            "frequent (real tokenizer trainers do both)"
        )
    return [(r["w"], int(r["wc"])) for r in rows]


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (w, wc) word-frequency vocabulary. The single corpus-wide
    shuffle of tokenizer training; everything after runs on the vocab."""
    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
    return toks.groupBy("w").agg(F.count(F.lit(1)).alias("wc"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent character-pair counts over a (w, wc) vocabulary:
    pair_cnt = occurrence count weighted by word frequency (a pair
    appearing twice in one word counts twice — BPE semantics), n_words =
    distinct words containing the pair. Map + explode + one hash agg on
    vocab-sized input."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("w") - 1),
        lambda i: F.col("w").substr(i, F.lit(2)),
    )
    occ = (
        vocab.where(F.length("w") >= 2)
        .select("w", "wc", F.explode(pairs).alias("pair"))
    )
    return occ.groupBy("pair").agg(
        F.sum("wc").alias("pair_cnt"),
        F.countDistinct("w").alias("n_words"),
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_k: int = 32
) -> DataFrame:
    """Top-k BPE merge candidates: (rank, pair, pair_cnt, n_words),
    rank deterministic on (pair_cnt DESC, pair ASC). Distributed top-k
    (TakeOrdered) first, THEN the rank window over k surviving rows."""
    top = (
        pair_counts(word_frequencies(docs, text_col))
        .orderBy(F.col("pair_cnt").desc(), F.col("pair").asc())
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pair_cnt").desc(), F.col("pair").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "pair",
        "pair_cnt",
        "n_words",
    ).orderBy("rank")


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    *,
    min_count: int = 1,
    max_vocab: int | None = None,
) -> list[tuple[str, str]]:
    """Full BPE merge loop, driver-paced like the k-means trainer: ONE
    distributed vocab build, then ``n_merges`` iterations of pure-python
    pair counting over the collected word-frequency table. The collect
    is bounded (``MAX_VOCAB_COLLECT``, loud on overflow) and
    ``min_count``/``max_vocab`` truncate distributed-side first — the
    corpus itself is touched exactly once either way. Returns the merge
    list [(left, right), ...] in application order.

    Symbols here are characters then merged character blocks, tracked as
    space-separated symbol strings (classic Sennrich formulation).
    """
    vocab = collect_vocab(
        word_frequencies(docs, text_col),
        min_count=min_count,
        max_vocab=max_vocab,
    )
    return bpe_train_from_vocab(vocab, n_merges)


def bpe_train_from_vocab(
    vocab: list[tuple[str, int]], n_merges: int = 8
) -> list[tuple[str, str]]:
    """The merge loop of :func:`bpe_train` over an already-collected
    (word, count) vocabulary — lets a caller that has the vocab in hand
    (e.g. derived from a per-doc word-count frame) train without a
    second corpus scan."""
    # word → list of symbols (chars initially)
    words: list[tuple[list[str], int]] = [(list(w), wc) for w, wc in vocab]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, wc in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + wc
        if not counts:
            break
        # deterministic argmax: count DESC, pair ASC
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        ab = best[0] + best[1]
        new_words = []
        for syms, wc in words:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, wc))
        words = new_words
    return merges


def bpe_word_symbols(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "w",
    out: str = "s",
) -> DataFrame:
    """ENCODE: apply a trained merge list to every word, distributed.

    Each word becomes a '|'-sentineled space-joined symbol string
    ("abc" → "|a| |b| |c|"); each merge (a, b) is ONE literal
    string-replace of "|a| |b|" → "|ab|". Literal replace is greedy
    left-to-right non-overlapping in both Spark and DuckDB — exactly the
    scan order of :func:`bpe_train_from_vocab`'s application loop, so
    chained replaces reproduce the trainer's final symbolization
    bit-for-bit (and the oracle can replay it verbatim). Sentinels make
    matches symbol-exact: "|a| |b|" cannot fire inside "|xa| |b|"
    because every symbol is fully wrapped. '|' never collides with
    token text (tokenize yields [a-z0-9]+ only).

    Pure Column expressions, no UDFs: at 100 TB this runs over the
    VOCABULARY (not the corpus) and the word→symbols mapping broadcasts
    back onto corpus rows."""
    s = F.rtrim(F.regexp_replace(F.col(word_col), "(.)", "|$1| "))
    for a, b in merges:
        s = F.replace(s, F.lit(f"|{a}| |{b}|"), F.lit(f"|{a}{b}|"))
    return words.withColumn(out, s)


def bpe_encode_doc_counts(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Full train→encode pipeline: per-doc (n_words, n_bpe_tokens).

    ONE corpus shuffle builds the per-doc word counts; the vocabulary
    (bounded metadata, Heaps' law) is derived from them and trains the
    merges driver-paced; the merge chain applies to the VOCAB as pure
    Column expressions and the word→token-count mapping broadcasts back
    onto the per-doc counts — the corpus is never scanned twice and no
    UDF touches the hot path. The single definition is shared by the
    registry query and the stress harness so the measured plan IS the
    registered plan."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.runtime import track

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import _widen

    spark = docs.sparkSession
    dw = track(
        _widen(docs, "doc_id")
        .select("doc_id", F.explode(tokenize(F.col(text_col))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    vocab = collect_vocab(dw.groupBy("w").agg(F.sum("c").alias("wc")))
    merges = bpe_train_from_vocab(vocab, n_merges=n_merges)
    words = local_df(spark, [(w,) for w, _ in vocab], "w string")
    enc = bpe_word_symbols(words, merges).select(
        "w", F.size(F.split(F.col("s"), " ")).cast("long").alias("n_syms")
    )
    return (
        dw.join(F.broadcast(enc), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.sum(F.col("c") * F.col("n_syms")).alias("n_bpe_tokens"),
        )
    )


def bpe_encode_sql(toks_sql: str, n_merges: int = 8) -> str:
    """DuckDB twin of the full train→encode pipeline over ``documents``:
    replays every training iteration (pair count → deterministic argmax
    → sentinel replace) as chained CTEs from the raw corpus, then scores
    per-doc token counts off the final symbolization. A hash match
    certifies the driver-paced trainer AND the distributed encode in one
    shot — the same replay discipline as the Lloyd's/logreg oracles."""
    parts = [
        f"toks AS (SELECT doc_id, unnest({toks_sql}) AS w FROM documents)",
        "dw AS MATERIALIZED (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM toks GROUP BY doc_id, w)",
        "vocab AS MATERIALIZED (SELECT w, CAST(SUM(c) AS BIGINT) AS wc FROM dw GROUP BY w)",
        "v0 AS MATERIALIZED (SELECT w, wc,"
        " rtrim(regexp_replace(w, '(.)', '|\\1| ', 'g')) AS s FROM vocab)",
    ]
    for t in range(n_merges):
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT wc, string_split(s, ' ') AS syms FROM v{t})"
        )
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT syms[CAST(j AS INT)] AS sa,"
            f" syms[CAST(j AS INT) + 1] AS sb, SUM(wc) AS cnt"
            f" FROM x{t}, UNNEST(range(1, len(syms))) AS u(j) GROUP BY 1, 2)"
        )
        # argmax tiebreak on the RAW symbols (sentinel-stripped), matching
        # bpe_train_from_vocab's tuple compare exactly. When pairs are
        # exhausted before n_merges (the trainer's `if not counts: break`),
        # the empty-symbol sentinel row keeps m{t} at exactly one row —
        # its replace pattern '|| ||' cannot occur (symbols are non-empty),
        # so the remaining iterations are no-ops instead of the cross join
        # annihilating the vocabulary
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT replace(sa, '|', '') AS a,"
            f" replace(sb, '|', '') AS b"
            f" FROM p{t} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"mm{t} AS MATERIALIZED (SELECT a, b FROM m{t} UNION ALL"
            f" SELECT '', '' WHERE NOT EXISTS (SELECT 1 FROM m{t}))"
        )
        parts.append(
            f"v{t + 1} AS MATERIALIZED (SELECT w, wc,"
            f" replace(s, '|' || a || '| |' || b || '|',"
            f" '|' || a || b || '|') AS s FROM v{t}, mm{t})"
        )
    parts.append(
        f"enc AS MATERIALIZED (SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT)"
        f" AS n_syms FROM v{n_merges})"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT d.doc_id, CAST(SUM(d.c) AS BIGINT) AS n_words,
       CAST(SUM(d.c * e.n_syms) AS BIGINT) AS n_bpe_tokens
FROM dw d JOIN enc e USING (w)
GROUP BY d.doc_id ORDER BY d.doc_id"""
    )


def bpe_pair_counts_sql(toks_sql: str, top_k: int = 32) -> str:
    """DuckDB twin of ``bpe_pair_counts`` over ``documents``."""
    return f"""
WITH toks AS (SELECT unnest({toks_sql}) AS w FROM documents),
vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wc FROM toks GROUP BY w),
occ AS (SELECT w, wc, substring(w, CAST(d AS INT), 2) AS pair
        FROM vocab, UNNEST(range(1, len(w))) AS t(d)
        WHERE len(w) >= 2),
agg AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS pair_cnt,
               CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
        FROM occ GROUP BY pair)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pair_cnt DESC, pair ASC) AS INT) AS rank,
       pair, pair_cnt, n_words
FROM agg ORDER BY pair_cnt DESC, pair ASC LIMIT {top_k}
"""
