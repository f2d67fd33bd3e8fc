#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
All Spark logs go to stderr.

TREND ANALYSIS READS BENCH_LOCAL.json, NOT THE DRIVER FILES: the
driver's BENCH_r{N}.json captures stdout truncated to ~2000 chars, so
the recorded line keeps only the ~30 slowest queries — BENCH_LOCAL.json
(written by every run, rotated to BENCH_LOCAL_prev.json first) carries
the full per-query spread. recorded_history() orders them
driver-rounds → prev-local → local, and tests/test_bench_trend.py
compares the two freshest full records (VERDICT r11 #8).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _record_timings(path: str) -> dict[str, float]:
    """Per-query timings recorded in one BENCH_r*.json / BENCH_LOCAL.json
    (either the driver's ``{"parsed": {...}}`` wrapper or bench.py's own
    flat layout); {} when the record carries none ("parsed": null — the
    round-5 stdout-truncation shape)."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}
    if "parsed" in d:
        d = d.get("parsed") or {}
    return d.get("queries") or {}


def recorded_history(here: str | None = None) -> list[tuple[str, dict[str, float]]]:
    """(path, timings) for every bench record that actually carries
    parsed per-query timings, oldest→newest: the driver's BENCH_r*.json
    rounds, then the gitignored same-machine BENCH_LOCAL.json as the
    freshest fallback. Records with "parsed": null are SKIPPED, not
    treated as an empty baseline — round 5 recorded null and the guards
    that read only the newest record silently compared nothing."""
    import glob

    here = here or os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    for name in ("BENCH_LOCAL_prev.json", "BENCH_LOCAL.json"):
        local = os.path.join(here, name)
        if os.path.exists(local):
            paths.append(local)
    out = []
    for p in paths:
        q = _record_timings(p)
        if q:
            out.append((p, q))
    return out


def regression_offenders(
    prev: dict[str, float],
    cur: dict[str, float],
    factor: float,
    floor: float = 0.5,
) -> dict[str, tuple[float, float]]:
    """Shared-key queries slower than ``factor``× their recorded time,
    ignoring sub-``floor`` baselines (warm-JVM noise dominates those).
    Shared by the run-time stderr guard and tests/test_bench_trend.py's
    hard CI floor."""
    return {
        name: (prev[name], t)
        for name, t in cur.items()
        if name in prev and prev[name] >= floor and t > prev[name] * factor
    }


def _regression_guard(timings: dict[str, float], factor: float = 1.5) -> None:
    """Compare steady-state minima against the newest recorded round
    WITH parsed timings (not blindly the newest file) and flag per-query
    slowdowns > ``factor`` on stderr (stdout stays the single JSON
    line). Sub-second timings on a warm local JVM are mostly run
    variance, so only queries slower than 0.5 s in the record are
    compared. Round-4's record carried medians-of-3 which sometimes
    landed on JIT-compile-storm runs; comparing today's min against
    those flags less, which is the right direction given the r4 medians
    were inflated."""
    history = recorded_history()
    # BENCH_LOCAL.json is this very run's output file once main() has
    # written it; as a baseline it's only meaningful when comparing
    # against a PRIOR run, which the driver records as BENCH_r*.json —
    # so prefer the newest driver round and use LOCAL only without one.
    rounds = [(p, q) for p, q in history if "BENCH_r" in os.path.basename(p)]
    source = rounds[-1] if rounds else (history[-1] if history else None)
    if source is None:
        return
    path, prev = source
    for name, (p, t) in regression_offenders(prev, timings, factor).items():
        print(
            f"BENCH REGRESSION {name}: {t:.3f}s vs {p:.3f}s in "
            f"{os.path.basename(path)} ({t / p:.2f}x)",
            file=sys.stderr,
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from manage_versions_of_data_in_data_lake_using_lakefs_spark.queries import all_queries
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.session import get_spark

    spark = get_spark(app_name="lakegraft-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "flagship",
        "agg_sum",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "tpch_q6",
        "tpch_q10",
        "tpch_q13",
        "tpch_q18",
        "window_top1",
        "window_mode",
        "string_indexer",
        "join_broadcast",
    ]
    registry = all_queries()
    names = [n for n in headline if n in registry]
    # optional extension headliners, present once implemented
    for extra in (
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "sim_topk",
        "text_quality",
        "agg_rollup",
        "join_asof",
        "sessionize",
        "sample_split",
        "sim_topk_ivf",
        "corpus_prep",
        "decontaminate",
        "dedup_embedding_cosine_hier",
        "multimodal_features",
        "tpch_q7",
        "tpch_q2",
        "tpch_q21",
        "text_bm25",
        "pack_sequences",
        "sim_topk_ivf_hier",
        "tokenizer_bpe",
        "embedding_covariance",
        "embedding_classify",
        "embedding_project",
        "graph_pagerank",
        "versioned_delete_prune",
        "dedup_incremental",
        "text_bigram_lm",
        "dedup_substring",
        "sample_temperature",
        "versioned_schema_evolution",
        "sim_topk_pq",
        "sim_topk_pq_refined",
        "sim_topk_ivfpq",
        "scd2_dim",
        "vector_lake_search",
        "sim_topk_ivfpq_refined",
        "text_heavy_hitters",
        "classifier_quality",
        "quantiles_scalable",
        "multimodal_png_decode",
        "resample_events",
        "tokenizer_bpe_encode",
        "json_roundtrip",
        "fuzzy_join_editdist",
        "anomaly_mad",
        "funnel_conversion",
        "cohort_retention",
        "multimodal_wav_decode",
        "multimodal_jpeg_decode",
        "multimodal_jpeg_420",
        "multimodal_jpeg_prog",
        "multimodal_jpeg_suite",
        "versioned_dv_merge",
        "multimodal_jpeg_arith",
        "multimodal_jpeg_arith_prog",
        "multimodal_jpeg_lossless",
        "multimodal_jpeg_mixed",
        "multimodal_jpeg_hier",
        "versioned_copy_into",
        "versioned_partitioned_ddl",
        "versioned_view_truncate_clone",
        "versioned_replace_where",
        "multimodal_gif_decode",
        "versioned_rename_ddl",
        "versioned_widen_identity",
        "versioned_cluster_optimize",
    ):
        if extra in registry:
            names.append(extra)

    # warm the JVM + parquet footers once so timings measure the queries,
    # not first-touch session costs
    registry[names[0]](spark, sf_dir).count()

    # One untimed warmup execution per query, then MIN of n timed runs
    # (default 3). Why min, not median: profiled per-run /proc/stat on the
    # round-4 "regressions" — slow executions of an unchanged plan burn
    # ~10x the CPU of steady-state ones (80 s CPU for a 7.6 s wall run vs
    # 5 s CPU at 1.0 s wall; zero GC-full, zero iowait, zero steal). That
    # surplus is tiered-JIT C2 compilation of the query's generated code,
    # which strikes nondeterministically across the first few executions,
    # so a median-of-3 frequently lands on a compile-storm run. The min
    # after a warmup is the steady-state cost — the quantity that matters
    # at 100 TB, where compilation amortizes over billions of rows — and
    # in an additive-noise environment the min is the stable estimator.
    # Per-query spread (min..max over the timed runs) rides in the JSON so
    # round-over-round comparisons can tell signal from noise.
    repeats = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in names:
        runs: list[float] = []
        for i in range(repeats + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            if i > 0:  # run 0 is the untimed JIT/codegen warmup
                runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        spreads[name] = [round(runs[0], 3), round(runs[-1], 3)]

    total = round(sum(timings.values()), 3)
    _regression_guard(timings)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    # The driver captures only the last ~2000 chars of stdout, so the
    # single JSON line must stay well under that. Per-query spread (and a
    # copy of everything on the line) goes to BENCH_LOCAL.json instead of
    # riding on stdout — round 5's line grew past the capture window once
    # spread was inlined and the driver recorded "parsed": null.
    # n_queries always reports the FULL query count, so a round-over-round
    # diff can tell "fell below the truncation cutoff" from "removed from
    # the bench" without the full record (VERDICT r14 #5; additions-only —
    # timing, the one-line format, and the env contract are unchanged)
    line = json.dumps(
        {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "n_repeats": repeats,
            "sf": sf,
            "n_queries": len(timings),
        }
    )
    n_keep = 30
    while len(line) > 1800 and n_keep >= 5:
        # keep only the slowest queries inline, shrinking until the line
        # actually fits the capture window (a fixed cut could still
        # overflow with enough long query names)
        slow = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:n_keep])
        line = json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": slow,
                "n_repeats": repeats,
                "sf": sf,
                "n_queries": len(timings),
                "truncated_to": len(slow),
            }
        )
        n_keep -= 5
    here = os.path.dirname(os.path.abspath(__file__))
    # rotate: keep the previous full record so the trend guard always
    # has TWO full-coverage records to compare (the driver's BENCH_r*
    # files are stdout-truncated to the slowest ~30)
    local_path = os.path.join(here, "BENCH_LOCAL.json")
    if os.path.exists(local_path):
        try:
            os.replace(
                local_path, os.path.join(here, "BENCH_LOCAL_prev.json")
            )
        except OSError:
            pass
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spreads,
                "n_repeats": repeats,
                "sf": sf,
            },
            f,
            indent=1,
        )
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
