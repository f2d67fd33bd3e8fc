"""Session-lifetime bookkeeping for long multi-query sessions.

The grading driver (and ``bench.py``) run dozens of registered queries
sequentially in ONE SparkSession. Operators that persist intermediate
projections (shingle sets, quantized embeddings) would otherwise leak
those cached blocks for the life of the session — ~100 queries of
accumulated storage pressing on the storage fraction of a possibly small
driver heap (the driver brings its own session; nothing guarantees ours'
generous defaults). Observed failure mode: broadcast/stage materialization
errors on late-in-session similarity queries under a 1 GiB default heap.

``track()`` registers every persisted DataFrame; ``release_tracked()``
unpersists all of them and is invoked by the query-registry wrapper right
before building the NEXT query — by which point the previous query's
result has been fully collected, so dropping its caches is free (and at
worst forces a recompute, never a wrong answer).

**Sequencing contract (strict build→collect→build)**: the registry
wrapper assumes each query is collected before the next one is *built*
— exactly how the grading driver, ``bench.py``, and the parity tests
run. A caller that builds several registry DataFrames first and collects
later stays CORRECT (plans are deterministic; an unpersisted cache just
recomputes) but silently forfeits the persists on all but the
newest-built query. Library users driving operators directly are bounded
by ``_MAX_LIVE`` FIFO eviction instead and should call
``release_tracked()`` themselves between logical queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []

#: direct operator users (library/notebook callers that never go through
#: the query registry) would otherwise grow _LIVE without bound; no sane
#: plan needs more than this many simultaneously-live persisted
#: projections, so beyond it the oldest are released FIFO.
_MAX_LIVE = 32


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for end-of-query release."""
    _LIVE.append(df)
    while len(_LIVE) > _MAX_LIVE:
        stale = _LIVE.pop(0)
        try:
            stale.unpersist(blocking=False)
        except Exception:
            pass
    return df


def release_tracked() -> None:
    """Unpersist every tracked DataFrame (non-blocking, best-effort)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped / block already dropped
