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
