"""Row-level table mutations: MERGE INTO-style upsert.

The reference mutates tables only by whole-table overwrite
(``jobs/vdt4.py:39-40,76-77``) and by lakeFS branch merge
(``README.md:145``); a production lakehouse also needs row-level upsert
(Delta's ``MERGE INTO``). Expressed as pure DataFrame algebra so Catalyst
owns the physical strategy:

- ``update`` mode is one anti-join (target rows whose key the source
  replaces are dropped) + a union with the source. With a small change
  set the anti-join broadcasts the source key set — the 100 TB target is
  never shuffled.
- ``ignore`` mode inverts it: the target passes through untouched and
  only source rows with genuinely new keys are appended.

Both are a single narrow pass over the big side; neither collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    when_matched: str = "update",
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``.

    ``when_matched="update"``: source wins on key collision (UPDATE SET *),
    unmatched source rows are inserted. ``when_matched="ignore"``: existing
    target rows are kept (INSERT-only semantics).
    """
    if when_matched not in ("update", "ignore"):
        raise ValueError(f"when_matched must be update|ignore, got {when_matched}")
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"upsert source schema {sorted(source.columns)} != "
            f"target schema {sorted(target.columns)}"
        )
    if when_matched == "update":
        kept = target.join(source.select(keys).distinct(), keys, "left_anti")
        return kept.unionByName(source)
    new_rows = source.join(target.select(keys).distinct(), keys, "left_anti")
    return target.unionByName(new_rows)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version: int,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension Type 2 maintenance: apply a snapshot of
    changed/new rows at ``version``, keeping full history — the standard
    warehouse pattern for dimensions whose past values must stay
    queryable (``valid_to IS NULL`` = current; an as-of version v reads
    ``valid_from <= v AND (valid_to IS NULL OR valid_to > v)``).

    Semantics per change row:
      key exists, attributes DIFFER → close the current row
      (``valid_to`` = version) and insert a new current row
      (``valid_from`` = version);
      key exists, attributes equal → no-op (no spurious history rows);
      new key → insert as current.
    Closed history rows pass through untouched.

    Plan: ONE equi-join of the current slice against the changes
    (broadcastable for a small change set — the 100 TB dimension's
    closed history streams through a filter and never joins), attribute
    comparison via null-safe equality on every non-key column, then a
    three-way union. Deterministic: pure column algebra, no RNG, no
    driver collect."""
    from pyspark.sql import functions as F

    attrs = [c for c in changes.columns if c not in keys]
    if not attrs:
        raise ValueError("scd2 changes must carry at least one non-key column")
    expected = set(keys) | set(attrs) | {from_col, to_col}
    if set(dim.columns) != expected:
        raise ValueError(
            f"scd2 dim schema {sorted(dim.columns)} != keys+attrs+"
            f"[{from_col},{to_col}] = {sorted(expected)}"
        )
    # duplicate keys in one change set would fan the join out and break
    # the one-current-row-per-key invariant silently — refuse (the CDC
    # sink's last-wins reduction is the place to resolve them)
    dup = changes.groupBy(*keys).count().where(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(
            f"scd2 change set holds multiple rows per key {keys}; reduce "
            "it (e.g. last-wins by a sequence column) before applying"
        )
    closed_history = dim.where(F.col(to_col).isNotNull())
    current = dim.where(F.col(to_col).isNull())
    ch = changes.select(
        *[F.col(k) for k in keys],
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
        F.lit(1).alias("_chg"),  # match marker: attrs may legitimately be NULL
    )
    j = current.join(ch, keys, "left")
    same = None
    for a in attrs:
        eq = F.col(a).eqNullSafe(F.col(f"_new_{a}"))
        same = eq if same is None else (same & eq)
    matched = F.col("_chg").isNotNull()
    # rows the change set doesn't touch, or touches with equal attrs
    untouched = j.where(~matched | same).select(*dim.columns)
    closed = (
        j.where(matched & ~same)
        .select(*keys, *attrs, from_col)
        .withColumn(to_col, F.lit(version).cast("long"))
        .select(*dim.columns)
    )
    # replacements come straight from j (it already carries _new_*);
    # genuinely-new keys from one anti-join — no third join needed
    replaced = j.where(matched & ~same).select(
        *keys, *[F.col(f"_new_{a}").alias(a) for a in attrs]
    )
    new_rows = ch.join(current.select(*keys), keys, "left_anti").select(
        *keys, *[F.col(f"_new_{a}").alias(a) for a in attrs]
    )
    inserts = (
        new_rows.unionByName(replaced)
        .withColumn(from_col, F.lit(version).cast("long"))
        .withColumn(to_col, F.lit(None).cast("long"))
        .select(*dim.columns)
    )
    return closed_history.unionByName(untouched).unionByName(closed).unionByName(inserts)
