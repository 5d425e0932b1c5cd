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
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_ingestion_scraper_spark import queries as Q
from market_data_ingestion_scraper_spark.session import get_spark

# Headline set: every registered query (correctness set == bench set keeps
# the two gates honest together).  Extend automatically as operators land.
EXCLUDE: set[str] = set()

# Queries backed by a persisted cross-call index (the "train once, serve
# many" pattern).  clearCache() between runs would force these to re-pay
# the index build every run, conflating build with serving cost: instead
# the cache is cleared ONCE before an untimed build run (recorded
# separately), and the timed runs measure serving against the warm index.
INDEX_BACKED: set[str] = {"lsh_topk_ann", "ann_recall_eval"}


def _wait_for_quiet_box() -> list[float]:
    """Round-over-round comparability gate (r7 review: BENCH_r07 was
    recorded at load avg 7.4 and read as a phantom 1.12x regression; r11
    review: a run passing at 1-min 1.88 but 5-min 3.24 read as a phantom
    1.21x — recently-finished work still steals cache/IO even when the
    instantaneous load has decayed): refuse to start timing while EITHER
    the 1-min or the 5-min load average exceeds the threshold, retrying
    for up to SPARK_GRAFT_LOAD_WAIT seconds.  If the box never quiets
    down, proceed anyway — a late number beats no number — but the
    recorded load_avg_start makes the contamination visible to the
    reader."""
    threshold = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "2.0"))
    deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600")
    )
    while True:
        load = os.getloadavg()
        if max(load[0], load[1]) <= threshold or time.monotonic() >= deadline:
            return list(load)
        print(
            f"load avg {load} > {threshold} (1- AND 5-min gated): waiting "
            "for a quiet box (SPARK_GRAFT_LOAD_MAX / SPARK_GRAFT_LOAD_WAIT "
            "to override)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(15)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Isolated mode (r14 verdict #2: "run-order sensitivity" must be a
    # measurement, not a hypothesis): SPARK_GRAFT_ONLY=name[,name...]
    # runs ONLY the named queries in this fresh JVM — no 100-query
    # sequence ahead of them contaminating executor memory, code cache,
    # or the OS page cache — and skips the round-detail file so an
    # isolation probe never masquerades as a round record.
    only_env = os.environ.get("SPARK_GRAFT_ONLY", "").strip()
    only: set[str] | None = (
        {n.strip() for n in only_env.split(",") if n.strip()}
        if only_env
        else None
    )
    if only:
        unknown = only - set(Q.REGISTRY)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY names not registered: {sorted(unknown)}")
        excluded = only & EXCLUDE
        if excluded:
            # silently skipping would print a 0-second "measurement"
            raise SystemExit(
                f"SPARK_GRAFT_ONLY names are in EXCLUDE: {sorted(excluded)}"
            )
    # context for run-to-run variance: a loaded box inflates every number
    # (observed 70 -> 83 s total between back-to-back identical runs)
    load_start = _wait_for_quiet_box()
    print(f"load avg at start: {load_start}", file=sys.stderr)
    spark = get_spark(app_name="bench")

    # Warm-up, not part of the measurement: JVM/codegen via a trivial
    # scan+agg, and the Python worker pool via a tiny Arrow round-trip
    # (first mapInPandas otherwise pays several seconds of worker spawn).
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    region.count()
    region.mapInPandas(lambda it: it, region.schema).count()

    # Box-speed calibration (r9: identical untouched plans measured
    # 1.4-1.5x slower than their r8 numbers on an idle box — host-level
    # throughput drift a load average cannot see).  A fixed pure-JVM
    # workload — SINGLE-partition 3e8-row codegen'd hash-sum, so one
    # thread runs a compute-bound loop with no scheduling floor (a
    # 32-way parallel range finishes in the ~0.2 s task-launch floor and
    # tracks nothing) — timed min-of-3 and recorded as
    # `calibration_sec`.  Cross-round query ratios should be read
    # relative to the calibration ratio before calling anything a plan
    # regression.
    cal_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        # % 1024 keeps the ANSI sum bounded; the hash still runs per row
        spark.range(0, 300_000_000, 1, 1).selectExpr(
            "sum(xxhash64(id) % 1024) AS s"
        ).collect()
        cal_runs.append(time.perf_counter() - t0)
    calibration = round(min(cal_runs), 4)
    print(
        f"box calibration (1-thread 3e8 hash-sum): {calibration}s",
        file=sys.stderr,
    )
    # 32-way parallel calibration (r12: the isolated watch-query re-check
    # found query walls ~1.3x their r10 records while the SINGLE-thread
    # calibration matched r10 exactly — host multi-core throughput drifts
    # independently of single-thread speed and the 1-thread number cannot
    # see it).  Same per-thread workload (3e8 hashed rows each across all
    # 32 threads): on a fixed box this tracks the 1-thread number; when
    # the ratio to it moves across rounds, read query-wall drift against
    # THIS number before calling anything a plan regression.
    mcal_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 32 * 300_000_000, 1, 32).selectExpr(
            "sum(xxhash64(id) % 1024) AS s"
        ).collect()
        mcal_runs.append(time.perf_counter() - t0)
    calibration_32way = round(min(mcal_runs), 4)
    print(
        f"box calibration (32-way 3e8/thread hash-sum): {calibration_32way}s",
        file=sys.stderr,
    )

    # min-of-N per query: single-shot wall times on this box swing up to
    # 18x run-to-run (r03 verdict), so one sample cannot distinguish a plan
    # regression from scheduler jitter.  The min over N runs estimates the
    # noise floor — the number the plan actually costs; per-run samples go
    # to stderr so the spread stays inspectable.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    index_build: dict[str, float] = {}
    for name, spec in Q.REGISTRY.items():
        if name in EXCLUDE or (only is not None and name not in only):
            continue
        if name in INDEX_BACKED:
            # Clear once, pay the index build in a separately-recorded
            # untimed run, then measure serving against the warm index.
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            index_build[name] = round(time.perf_counter() - t0, 4)
        runs: list[float] = []
        for _ in range(n_runs):
            if name not in INDEX_BACKED:
                # Isolate queries from each other: operators that persist()
                # intermediates (simhash, inline LSH banding) would
                # otherwise leave cached blocks behind and tax every later
                # query's memory — per-query numbers must measure the
                # plan, not the neighbors.  (localCheckpoint blocks — the
                # clustering loop — are NOT covered by clearCache; those
                # are freed by the ContextCleaner once the loop's frames
                # are garbage-collected, which gc.collect() forces.)
                spark.catalog.clearCache()
                gc.collect()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 4))
        timings[name] = min(runs)
        build = (
            f" index_build={index_build[name]}s" if name in index_build else ""
        )
        print(
            f"  {name}: min={timings[name]}s runs={runs}{build}",
            file=sys.stderr,
            flush=True,
        )
        if name in INDEX_BACKED:
            # Don't let the index linger into the next query's runs.
            spark.catalog.clearCache()
            gc.collect()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf

    # Full per-query timings go to a repo-side detail file: the harness
    # that records stdout keeps only the LAST ~2000 chars and parses the
    # final JSON line, and 87 queries no longer fit that window at any
    # precision (r06 parsed as null).  Round number: env override, else
    # one past the newest recorded BENCH_r{N}.json.
    here = os.path.dirname(os.path.abspath(__file__))
    if only is not None:
        # isolation probe: full timings fit stdout, never a round record
        print(
            json.dumps(
                {
                    "metric": "isolated_queries_wall",
                    "value": round(sum(timings.values()), 4),
                    "unit": "sec",
                    "sf": sf_val,
                    "queries": timings,
                    "load_avg_start": load_start,
                    "calibration_sec": calibration,
                    "calibration_32way_sec": calibration_32way,
                },
                separators=(",", ":"),
            )
        )
        return
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        seen = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)))
        ]
        rnd = str(max(seen) + 1) if seen else "0"
    detail_path = os.path.join(here, f"BENCH_DETAIL_r{int(rnd):02d}.json")
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "queries": timings,
                "index_build": index_build,
                "load_avg_start": load_start,
                "load_avg_end": os.getloadavg(),
                "calibration_sec": calibration,
                "calibration_32way_sec": calibration_32way,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"full per-query timings -> {detail_path}", file=sys.stderr)
    print(f"load avg at end: {os.getloadavg()}", file=sys.stderr)

    # The stdout line itself must ALWAYS fit the capture window: emit the
    # total plus only the 10 slowest queries (the ones worth gating on).
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "detail": os.path.basename(detail_path),
        "calibration_sec": calibration,
        "calibration_32way_sec": calibration_32way,
        "queries": {k: round(v, 2) for k, v in slowest.items()},
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
