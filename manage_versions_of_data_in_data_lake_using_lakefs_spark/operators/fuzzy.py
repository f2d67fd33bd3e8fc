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


def _deletion_variants(text, k: int):
    """All strings reachable from ``text`` by deleting ≤ k characters
    (k ∈ {1, 2}), de-duplicated, as a map-side array expression."""
    ln = F.length(text)
    one = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.concat(text.substr(F.lit(1), i - 1), text.substr(i + 1, ln)),
    )
    out = F.concat(F.array(text), one)
    if k >= 2:
        two = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.greatest(ln - 1, F.lit(0))),
                lambda i: F.transform(
                    F.sequence(i + 1, ln),
                    lambda j: F.concat(
                        text.substr(F.lit(1), i - 1),
                        text.substr(i + 1, j - i - 1),
                        text.substr(j + 1, ln),
                    ),
                ),
            )
        )
        out = F.concat(out, two)
    return F.array_distinct(out)


def _symdel_candidates(s: DataFrame, k: int) -> DataFrame:
    """Candidate pairs via symmetric deletion (SymSpell, public):
    ed(a,b) ≤ k ⟹ deleting ≤ k characters from EACH reaches a common
    string (delete a's side of every substituted/deleted alignment
    position, b's side of every substituted/inserted one). Variants are
    hashed so only 16-byte keys shuffle. Buckets are near-singleton on
    key-like data — no frequency pass, no window, two shuffles total —
    which is why this beats the prefix filter wherever it is applicable
    (k ≤ 2, bounded length: variant count is C(len, k))."""
    # hash choice (r14): the blocking hash is internal — blocking is
    # complete (an ed≤k pair always shares a key) and the exact verify
    # strips any collision-added candidate — so the result is
    # hash-independent; xxhash64 longs shuffle 4× narrower than 32-hex
    # md5 strings at ~1/3 the per-byte hash cost.
    if k == 1:
        # POSITION-TAGGED deletions (r14): plain symdel at k=1 admits
        # every ed≤2 pair (one deletion on EACH side) — measured 956k
        # candidates for 19.5k true pairs on sequential zero-padded
        # customer keys, all of it thrown away by the verify. Tagging
        # the deletion position makes the block exact for k=1:
        #   substitution at p   ⟺ (p, del_p(a)) = (p, del_p(b)),
        #   b = del_p(a)        ⟺ (p, del_p(a)) = (p, b)  [slot term],
        #   a = b               ⟺ any slot term collides,
        # and conversely same-position matches imply ed≤1, so the
        # candidate set IS the answer set (verify still runs, now
        # near-free). Slots range to len+1 because the longer side of a
        # deletion pair may delete at its last position.
        t_, ln = F.col("t"), F.length(F.col("t"))
        dels = F.when(
            ln >= 1,
            F.transform(
                F.sequence(F.lit(1), ln),
                lambda i: F.struct(
                    i.alias("p"),
                    F.concat(t_.substr(F.lit(1), i - 1), t_.substr(i + 1, ln)).alias("v"),
                ),
            ),
        ).otherwise(F.array())
        slots = F.transform(
            F.sequence(F.lit(1), ln + 1),
            lambda i: F.struct(i.alias("p"), t_.alias("v")),
        )
        v = s.select(
            "id", F.explode(F.concat(dels, slots)).alias("pv")
        ).select("id", F.xxhash64("pv.p", "pv.v").alias("h"))
    else:
        v = s.select(
            "id", F.explode(_deletion_variants(F.col("t"), k)).alias("var")
        ).select("id", F.xxhash64("var").alias("h"))
    # both sides of the self-join read the variant set; persist it so the
    # explode+hash runs once, not once per side (released by the query
    # registry via runtime.release_tracked)
    from pyspark import StorageLevel

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.runtime import track

    v = track(v.persist(StorageLevel.MEMORY_AND_DISK))
    return (
        v.alias("a")
        .join(v.alias("b"), "h")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )


#: strings longer than this use the prefix-filter path even in auto mode
#: (C(len, 2) deletion variants per string outgrow the q-gram token count)
SYMDEL_MAX_LEN = 64


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    q: int = 3,
    method: str = "auto",
) -> DataFrame:
    """All id pairs (a < b) whose strings are within ``max_dist`` edits.

    Returns (a, b, dist) — exact Levenshtein distance, ≤ ``max_dist``.
    Candidate generation never forms a cross join; the final exact filter
    makes whichever blocking ran invisible in the result.

    ``method``:
    - ``"symdel"`` — symmetric-deletion blocking (k ≤ 2 only). The right
      choice for short key-like strings: candidate buckets are
      near-singleton even on adversarial shared-prefix namespaces where
      q-gram frequencies collapse (measured on ``Customer#0...``: the
      prefix filter's (k·q+1)-th rarest token can be shared by a third
      of the corpus — a single 50M-pair join bucket — while symdel stays
      ~1:1 candidates:true-pairs).
    - ``"prefix"`` — the Ed-Join prefix filter (module docstring): any k,
      any length; cost grows with gram-frequency skew.
    - ``"auto"`` — per-ROW hybrid, no probe scan (r9; the previous auto
      spent a standalone max-length pass deciding): strings of length
      ≤ ``SYMDEL_MAX_LEN``+k block via symdel, strings > ``SYMDEL_MAX_LEN``
      via the prefix filter, candidates unioned then deduped. Complete
      because a within-k pair's lengths differ by ≤ k: either both ends
      fit the symdel band, or both exceed ``SYMDEL_MAX_LEN`` and the
      prefix side meets them. On a uniformly short corpus the prefix
      branch filters to empty (a column-pruned no-op stage), so auto now
      costs the symdel plan alone — at 100 TB there is no longer a
      serial decide-then-run barrier, though callers who know their key
      shape can still pass ``method=`` to drop the empty branch.
    """
    k = max_dist
    s = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("t"),
        F.length(text_col).alias("len"),
    )
    if method == "auto":
        if k <= 2:
            lo = s.where(F.col("len") <= SYMDEL_MAX_LEN + k)
            hi = s.where(F.col("len") > SYMDEL_MAX_LEN)
            cands = (
                _symdel_candidates(lo, k)
                .unionByName(_prefix_candidates(hi, k, q))
                .distinct()
            )
            return _verify(cands, s, k)
        method = "prefix"
    if method == "symdel":
        if k > 2:
            raise ValueError("symdel supports max_dist <= 2; use method='prefix'")
        return _verify(_symdel_candidates(s, k), s, k)
    if method != "prefix":
        raise ValueError(f"unknown method {method!r}: auto | symdel | prefix")
    return _verify(_prefix_candidates(s, k, q), s, k)


def _prefix_candidates(s: DataFrame, k: int, q: int) -> DataFrame:
    """Ed-Join prefix-filtered candidates (module docstring steps 1-3)
    plus the short-string length-band block."""
    prefix_len = k * q + 1
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

    return cand_long.unionByName(cand_short).distinct()


def _verify(cand: DataFrame, s: DataFrame, k: int) -> DataFrame:
    """Exact filter: re-attach both strings, apply the length bound and
    the k-banded levenshtein (early-exit above k). Whatever blocking
    produced ``cand``, only true ≤ k pairs survive."""
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
