"""Conditional local-parallelism spread for heavy per-row operators.

Fixture tables arrive as one parquet file → one scan partition → a
single-threaded signature/vector computation, so the dedup/similarity/text
operators widen narrow scans to ``defaultParallelism`` before per-row work.
At 100 TB the scan is naturally thousands of partitions and the spread must
be a free pass-through — no shuffle.

The "is the scan already wide?" probe deliberately avoids
``df.rdd.getNumPartitions()``: materializing the RDD converter runs a full
extra analysis pass on the driver for every query that calls it (r03
verdict item 5).  ``df.inputFiles()`` answers the same question from the
analyzed logical plan without touching the RDD API: a file-backed scan with
at least ``target`` files cannot be narrower than ``target`` partitions
(parquet splitting only subdivides files).  The two non-file cases both
default to repartitioning, which is correct where they occur:

- in-memory fixtures (``createDataFrame``) report no input files and are
  tiny — the repartition is the point;
- a scan of fewer, larger files than ``target`` may already be split wide
  by ``maxPartitionBytes``, in which case the repartition is redundant but
  harmless (one extra round-robin pass); multi-terabyte tables are never a
  handful of files in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-analyzable (e.g. streaming) sources: leave as-is
        return df
    if n_files >= target:
        return df
    return df.repartition(target)
