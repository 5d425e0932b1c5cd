"""Corpus snapshot versioning — content-level diff between two gold
snapshots.

A training corpus is rebuilt continuously (re-crawls, filter changes,
dedup policy bumps); the first question after every rebuild is "what
actually changed?".  Answering it by eyeballing row counts misses silent
content churn (same doc_id, new text).  This operator diffs two
snapshots on (id, content hash): a full-outer join on the 8-byte id with
32-byte hashes — column-pruned scans on both sides, never text — so the
diff of two 100 TB snapshots moves only ids + hashes through one
co-partitioned shuffle.

Statuses: ``added`` (id only in new), ``removed`` (id only in old),
``changed`` (both, hash differs — null-safe, so text→NULL and NULL→text
count as changed), ``unchanged`` (both, hash identical, including
NULL≡NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """One row per id present in either snapshot:
    (doc_id, status, old_hash, new_hash)."""
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("old_hash"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.col(hash_col).alias("new_hash"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"), "old_hash", "new_hash")


def corpus_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) rollup of a diff — the dashboard row."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
