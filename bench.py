#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized with the no-op sink (full computation, no
collect/sink cost).  A short warm-up query spins up the JVM first so the
per-query numbers measure the plans, not session startup.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_ingestion_scraper_spark import queries as Q
from market_data_ingestion_scraper_spark.session import get_spark

# Headline set: every registered query (correctness set == bench set keeps
# the two gates honest together).  Extend automatically as operators land.
EXCLUDE: set[str] = set()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")

    # Warm-up, not part of the measurement: JVM/codegen via a trivial
    # scan+agg, and the Python worker pool via a tiny Arrow round-trip
    # (first mapInPandas otherwise pays several seconds of worker spawn).
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    region.count()
    region.mapInPandas(lambda it: it, region.schema).count()

    # min-of-N per query: single-shot wall times on this box swing up to
    # 18x run-to-run (r03 verdict), so one sample cannot distinguish a plan
    # regression from scheduler jitter.  The min over N runs estimates the
    # noise floor — the number the plan actually costs; per-run samples go
    # to stderr so the spread stays inspectable.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name, spec in Q.REGISTRY.items():
        if name in EXCLUDE:
            continue
        runs: list[float] = []
        for _ in range(n_runs):
            # Isolate queries from each other: operators that persist()
            # intermediates (simhash, the LSH index) would otherwise leave
            # cached blocks behind and tax every later query's memory —
            # per-query numbers must measure the plan, not the neighbors.
            # (localCheckpoint blocks — the clustering loop — are NOT
            # covered by clearCache; those are freed by the ContextCleaner
            # once the loop's frames are garbage-collected, which the
            # gc.collect() below forces between runs.)
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs)
        print(f"  {name}: min={timings[name]}s runs={runs}", file=sys.stderr, flush=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    # The harness that records this output keeps only the LAST ~2000 chars
    # of stdout and parses the final JSON line; r02's 4-decimal line of 71
    # queries overflowed that window and parsed as null.  Emit the most
    # precise compact line that fits, full precision stays on stderr above.
    line = json.dumps(out, separators=(",", ":"))
    for ndigits in (3, 2, 1):
        if len(line) <= 1950:
            break
        out["queries"] = {k: round(v, ndigits) for k, v in timings.items()}
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
