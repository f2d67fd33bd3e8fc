"""Deterministic Lloyd's k-means as DuckDB SQL CTE builders.

SQL twin of ``operators/clustering.py::kmeans_fit`` — the oracle side of
every trained-quantizer IVF query (`sim_topk_ivf_trained`,
`dedup_embedding_cosine`). Exact int64 partial sums and floor-division
centroid updates make the iterative training bit-reproducible, so a SQL
replay of the same iterations yields byte-identical centroids and hence
byte-identical IVF results.

Conventions shared with the Python trainer:
- init: the k smallest ids by (portable_hash(id), id) — cell numbering is
  that order (``ROW_NUMBER() - 1``), matching ``kmeans_fit``'s centroid
  index order (stable across iterations: updates are keyed by cell);
- assignment: exact integer-cosine argmax, ties → lowest cell id
  (numpy ``argmax`` first-index rule ↔ ``ORDER BY cos DESC, cell ASC``);
- update: elementwise exact int64 sum then floor division (pmod spelling
  so negatives round like numpy's ``//``); empty cells keep their
  previous centroid (COALESCE).
"""

from __future__ import annotations

from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.dedup import PORTABLE_HASH_SQL

#: embedding dimensionality, derived FROM THE DATA in SQL (scalar
#: subquery over the quantized-vector CTE) — a hardcoded constant would
#: silently break window parity if a testdata regeneration changed the
#: embedding dims while the Python trainer (which derives dims from the
#: first centroid row) kept working. DuckDB accepts a scalar subquery as
#: a range() bound.
KM_DIMS_SQL = "(SELECT MAX(len(q)) FROM qn)"
KM2_DIMS_SQL = "(SELECT MAX(len(q)) FROM qn2)"

#: centroid/init sampling key shared by the IVF oracles — the SQL twin
#: of operators.dedup.portable_hash over CAST(id AS VARCHAR)
CENT_SAMPLE_SQL = PORTABLE_HASH_SQL.format(x="CAST(id AS VARCHAR)", m=2147483647)

#: SQL twin of operators.clustering.adaptive_k_hier — the corpus-scaled
#: two-level width k₁ = k₂ = max(4, ⌈√(n/64)⌉). Used as the init LIMIT,
#: the per-shard QUALIFY bound, AND the global-cell-id multiplier, so an
#: oracle replays the adaptive trainer exactly at any corpus size.
K_HIER_SQL = "SELECT GREATEST(4, CAST(CEIL(SQRT(COUNT(*) / 64.0)) AS BIGINT)) FROM qn"


def km_init(out: str, k: int | str) -> str:
    """Init CTE: k centroids from a ``qn(id, q, n)`` relation. ``k`` may
    be an int or a SQL scalar expression (e.g. a data-dependent
    ``SELECT GREATEST(8, COUNT(*) // 64) FROM qn`` — DuckDB allows a
    scalar subquery as LIMIT), so an oracle can replay an adaptive-k
    trainer exactly at ANY corpus size, not just the one it was tuned
    on."""
    limit = f"({k})" if isinstance(k, str) else str(k)
    return f"""{out} AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY {CENT_SAMPLE_SQL}, id) - 1
                AS BIGINT) AS cell, q AS qc
    FROM qn
    ORDER BY {CENT_SAMPLE_SQL}, id LIMIT {limit}
)"""


def km_assign(prev: str, out: str) -> str:
    """Assignment CTE: rank centroids of ``prev`` per vector (rc = 1 is
    the nearest cell; rc <= nprobe gives the IVF probe set)."""
    return f"""{out} AS (
    SELECT qn.id, qn.q, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY qn.id
               ORDER BY list_dot_product(qn.q, c.qc)
                        / (SQRT(qn.n) * SQRT(list_dot_product(c.qc, c.qc))) DESC,
                        c.cell ASC) AS rc
    FROM qn CROSS JOIN {prev} c
)"""


def km_update(assign: str, prev: str, out: str) -> str:
    """Centroid-update CTE pair: exact elementwise mean of each cell."""
    # floor division via pmod so negatives round like numpy's //
    return f"""{out}_s AS (
    SELECT a.cell, t.d, CAST(SUM(a.q[t.d]) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT cell, q FROM {assign} WHERE rc = 1) a
    CROSS JOIN (SELECT UNNEST(range(1, {KM_DIMS_SQL} + 1)) AS d) t
    GROUP BY a.cell, t.d
),
{out} AS (
    SELECT p.cell, COALESCE(u.qc_new, p.qc) AS qc
    FROM {prev} p LEFT JOIN (
        SELECT cell,
               list((s - (((s % cnt) + cnt) % cnt)) // cnt ORDER BY d) AS qc_new
        FROM {out}_s GROUP BY cell
    ) u USING (cell)
)"""


def km_train_ctes(k: int | str, iters: int) -> tuple[str, str]:
    """The full training chain as one CTE string; returns (ctes,
    final_assign_name). ``final_assign_name`` ranks ALL cells of the
    trained centroids per vector — filter ``rc = 1`` for assignment,
    ``rc <= nprobe`` for an IVF probe set."""
    parts = [km_init("c0", k)]
    for i in range(iters):
        parts.append(km_assign(f"c{i}", f"a{i + 1}"))
        parts.append(km_update(f"a{i + 1}", f"c{i}", f"c{i + 1}"))
    final = f"a{iters + 1}"
    parts.append(km_assign(f"c{iters}", final))
    return ",\n".join(parts), final


# --- hierarchical (two-level) trainer, SQL twin of
# --- clustering.kmeans_fit_hierarchical -----------------------------------

def km2_init(out: str, k_fine: int | str) -> str:
    """Per-shard init CTE from ``qn2(id, q, n, shard)``: the k_fine
    smallest (portable_hash, id) rows WITHIN each shard. ``k_fine`` may
    be an int or a SQL scalar expression (adaptive-k replay, see
    ``km_init``)."""
    limit = f"({k_fine})" if isinstance(k_fine, str) else str(k_fine)
    return f"""{out} AS (
    SELECT shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY {CENT_SAMPLE_SQL}, id) - 1
                AS BIGINT) AS fine, q AS qc
    FROM qn2
    QUALIFY ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY {CENT_SAMPLE_SQL}, id) <= {limit}
)"""


def km2_assign(prev: str, out: str) -> str:
    """Rank ``prev``'s fine cells per vector WITHIN its shard."""
    return f"""{out} AS (
    SELECT qn2.id, qn2.q, qn2.shard, c.fine,
           ROW_NUMBER() OVER (
               PARTITION BY qn2.id
               ORDER BY list_dot_product(qn2.q, c.qc)
                        / (SQRT(qn2.n) * SQRT(list_dot_product(c.qc, c.qc))) DESC,
                        c.fine ASC) AS rc
    FROM qn2 JOIN {prev} c ON qn2.shard = c.shard
)"""


def km2_update(assign: str, prev: str, out: str) -> str:
    """Per-(shard, fine) exact elementwise mean; empty cells COALESCE."""
    return f"""{out}_s AS (
    SELECT a.shard, a.fine, t.d, CAST(SUM(a.q[t.d]) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT shard, fine, q FROM {assign} WHERE rc = 1) a
    CROSS JOIN (SELECT UNNEST(range(1, {KM2_DIMS_SQL} + 1)) AS d) t
    GROUP BY a.shard, a.fine, t.d
),
{out} AS (
    SELECT p.shard, p.fine, COALESCE(u.qc_new, p.qc) AS qc
    FROM {prev} p LEFT JOIN (
        SELECT shard, fine,
               list((s - (((s % cnt) + cnt) % cnt)) // cnt ORDER BY d) AS qc_new
        FROM {out}_s GROUP BY shard, fine
    ) u USING (shard, fine)
)"""


def km2_train_ctes(k_fine: int | str, iters: int) -> tuple[str, str]:
    """Fine-level training chain over ``qn2``; returns (ctes,
    final_assign_name) — filter rc <= nprobe on the final assignment and
    compute global cell = shard * k_fine + fine."""
    parts = [km2_init("f0", k_fine)]
    for i in range(iters):
        parts.append(km2_assign(f"f{i}", f"af{i + 1}"))
        parts.append(km2_update(f"af{i + 1}", f"f{i}", f"f{i + 1}"))
    final = f"af{iters + 1}"
    parts.append(km2_assign(f"f{iters}", final))
    return ",\n".join(parts), final


# --- integer-L2 trainer (PQ codebooks), SQL twin of operators/pq.py -------
# Same init/update conventions as km_*; assignment ranks by exact integer
# L2 (c·c − 2 q·c ASC — no division, no sqrt, no NaN edge), matching
# numpy argmin's first-index tie rule via `, cell ASC`. Parametrized by
# source relation so one oracle can train m independent subspaces.


def kml2_init(out: str, init_src: str) -> str:
    """Init from ``init_src`` (the shared k seed rows, already sliced to
    this subspace) — every subspace seeds from the SAME ids, so the
    ORDER BY hash pick happens once."""
    return f"""{out} AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY {CENT_SAMPLE_SQL}, id) - 1
                AS BIGINT) AS cell, q AS qc
    FROM {init_src}
)"""


def kml2_assign(prev: str, out: str, src: str) -> str:
    return f"""{out} AS (
    SELECT s.id, s.q, c.cell,
           ROW_NUMBER() OVER (
               PARTITION BY s.id
               ORDER BY list_dot_product(c.qc, c.qc)
                        - 2 * list_dot_product(s.q, c.qc) ASC,
                        c.cell ASC) AS rc
    FROM {src} s CROSS JOIN {prev} c
)"""


def kml2_update(assign: str, prev: str, out: str, src: str) -> str:
    dims = f"(SELECT MAX(len(q)) FROM {src})"
    return f"""{out}_s AS (
    SELECT a.cell, t.d, CAST(SUM(a.q[t.d]) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT cell, q FROM {assign} WHERE rc = 1) a
    CROSS JOIN (SELECT UNNEST(range(1, {dims} + 1)) AS d) t
    GROUP BY a.cell, t.d
),
{out} AS (
    SELECT p.cell, COALESCE(u.qc_new, p.qc) AS qc
    FROM {prev} p LEFT JOIN (
        SELECT cell,
               list((s - (((s % cnt) + cnt) % cnt)) // cnt ORDER BY d) AS qc_new
        FROM {out}_s GROUP BY cell
    ) u USING (cell)
)"""


def kml2_train_ctes(
    iters: int, src: str, init_src: str, tag: str
) -> tuple[str, str, str]:
    """Full per-subspace L2 chain; returns (ctes, final_centroids_name,
    final_assign_name). ``tag`` namespaces the CTEs so m subspace chains
    coexist in one WITH."""
    parts = [kml2_init(f"c0{tag}", init_src)]
    for i in range(iters):
        parts.append(kml2_assign(f"c{i}{tag}", f"a{i + 1}{tag}", src))
        parts.append(kml2_update(f"a{i + 1}{tag}", f"c{i}{tag}", f"c{i + 1}{tag}", src))
    final_c = f"c{iters}{tag}"
    final_a = f"a{iters + 1}{tag}"
    parts.append(kml2_assign(final_c, final_a, src))
    return ",\n".join(parts), final_c, final_a
