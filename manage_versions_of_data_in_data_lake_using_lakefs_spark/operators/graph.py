"""Iterative graph operators: connected components for dedup clustering.

Near-dup pair lists (MinHash-LSH, SimHash, embedding-cosine) induce a
graph; the training-data pipeline needs the *clusters* — keep one doc per
component, drop the rest. Components come from hash-min label
propagation: every node starts labeled with itself, and each iteration
takes the min label over direct neighbors; convergence in O(graph
diameter) rounds.

Scale design: each round is one join + one groupBy (shuffles keyed by
node id); ``localCheckpoint`` truncates the lineage each round so the
plan does not grow with iterations (the classic iterative-algorithm trap
on Spark). Diameters of near-dup graphs are tiny (duplicate clusters are
dense), so rounds ≈ 3-5 in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable from the node."""
    e = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    edges = e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y"))).distinct()
    edges = edges.localCheckpoint()
    labels = edges.select("x").distinct().withColumn("label", F.col("x"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("x").alias("y"), "label"), "y"
            )
            .groupBy("x")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "x", "left")
            .select(
                "x",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "x")
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("x").alias("id"), F.col("label").alias("component"))


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Drop all but the min-id document of every near-dup cluster.

    Rows not appearing in any pair are kept as-is (anti-join against the
    non-survivor set — the fact table never shuffles on anything but its
    own id)."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


#: truncate rank lineage past this many Pregel hops (deep loops only)
_CHECKPOINT_EVERY = 5


def pagerank_ppb(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    damping_pct: int = 85,
) -> DataFrame:
    """PageRank in exact parts-per-billion integer arithmetic →
    (node, rank) with Σrank ≈ N·10⁹.

    Classic PR sums floating-point contributions, whose order varies
    with partitioning — the result is NOT reproducible run-to-run on a
    cluster. This formulation keeps every quantity int64: ranks start at
    10⁹ per node, a node's contribution is ``rank DIV outdeg`` (floor),
    and the update is ``(1−d)·10⁹ + (d·Σcontrib) DIV 1`` in integer
    percent — associative sums, bit-identical at any partitioning and
    replayable as SQL CTEs. The ≤1-ppb-per-hop floor loss is far below
    float PR's own convergence tolerance.

    Scale shape: each iteration is the canonical Pregel message pass —
    one join of the rank table against the (persisted) degree-annotated
    edge list keyed on src, one groupBy on dst. The rank table is one
    row per NODE — orders of magnitude smaller than the edge list in
    real graphs — so AQE broadcasts it and the only per-iteration
    shuffle is the dst-keyed aggregation of contributions. Static
    tables persist lazily (no eager materialization jobs — the
    ``localCheckpoint``-per-table formulation measured 4× slower at
    sf0.1 from checkpoint I/O alone); rank lineage is truncated only
    past ``_CHECKPOINT_EVERY`` iterations, since a 2-3-hop plan needs
    no truncation.
    """
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.similarity import _persisted

    # repartition by src FIRST so the dedup, the degree aggregation and
    # the contribution join all ride ONE exchange of the edge list:
    # hash(src) satisfies the clustered distribution of both the
    # (src, dst) distinct and the src groupBy, so neither inserts its
    # own exchange (r15, guide §2.4 — the un-keyed spelling shuffled the
    # full edge list for the distinct and again for the degree partials).
    # Results are exact either way; a hub-heavy src skew concentrates a
    # partition here, but the src-keyed degree aggregation always has
    # that locality requirement — this just stops paying twice.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition(F.col("src"))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = _persisted(e.join(deg, "src"))
    # nodes = src ∪ dst: on a general directed graph, sink nodes appear
    # only as dst — deriving nodes from src alone would drop their rank
    # rows entirely (and silently lose the mass sent to them). deg
    # already distinct-ified the sources, so only the dst-only remainder
    # (the sinks) pays a new shuffle; the union of the two disjoint sets
    # needs no dedup pass.
    out_nodes = _persisted(deg.select(F.col("src").alias("node")))
    sinks = _persisted(
        e.select(F.col("dst").alias("node"))
        .distinct()
        .join(out_nodes, "node", "left_anti")
    )
    nodes = _persisted(out_nodes.union(sinks))
    # 1-row scalar frames for the dangling-mass redistribution: sinks
    # (no out-edges) hold rank but pass nothing, so their total rank is
    # redistributed uniformly — in exact integer arithmetic, as
    # share = Σ sink-rank DIV N, added to every node's incoming sum.
    # Sink-ness is static (it depends only on the edge list), so it is
    # detected ONCE; on a symmetrized edge list there are no sinks and
    # the per-hop share machinery is skipped entirely — share would be
    # identically 0, so the skip is value-identical (the oracle keeps
    # its share CTE, which computes 0) and the hop plan stays the
    # original join + groupBy pair.
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    has_sinks = bool(sinks.take(1))
    base = (100 - damping_pct) * 10_000_000  # (1-d)·1e9 in ppb
    r = nodes.withColumn("rank", F.lit(1_000_000_000).cast("long"))
    for i in range(iters):
        contrib = ed.join(
            r.select(F.col("node").alias("src"), "rank"), "src"
        ).select(
            F.col("dst").alias("node"), F.expr("rank DIV outdeg").alias("c")
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r_next = nodes.join(s, "node", "left")
        if has_sinks:
            dang = r.join(sinks.select("node"), "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("dang")
            )
            share = dang.crossJoin(n_df).select(
                F.expr("dang DIV n_nodes").cast("long").alias("share")
            )  # 1-row scalar broadcast
            r = r_next.crossJoin(share).select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{damping_pct} * (coalesce(s, 0L) + share) DIV 100")
                ).cast("long").alias("rank"),
            )
        else:
            r = r_next.select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{damping_pct} * coalesce(s, 0L) DIV 100")
                ).cast("long").alias("rank"),
            )
        if (i + 1) % _CHECKPOINT_EVERY == 0 and i + 1 < iters:
            r = r.localCheckpoint()
    return r
