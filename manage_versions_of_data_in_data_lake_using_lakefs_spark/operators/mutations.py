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
