"""Benchmark decontamination for training-data pipelines: flag corpus
documents that share word n-grams with an evaluation/benchmark set, so
test data can be excluded from training (the standard n-gram-overlap
decontamination used by large-LM data pipelines).

Scale shape: the benchmark set is tiny relative to the corpus (thousands
of eval documents vs billions of training documents), so its exploded
gram table is BROADCAST — the corpus-side gram explode joins against it
map-side with no shuffle of corpus data at all; the only shuffle is the
final per-document aggregation of matched grams, which carries matched
rows only (a vanishing fraction of the corpus).  A 100 TB corpus scan
stays one pass, embarrassment-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, string_shingles


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Flag training documents sharing >= ``min_hits`` distinct word
    ``k``-grams with any benchmark document.

    Returns one row per contaminated document:
    ``(doc_id, n_hit_grams, n_benchmarks_hit)`` — distinct matched grams
    and distinct benchmark documents matched.  Clean documents are absent
    (the common case; the caller anti-joins to drop flagged docs).

    Exact and engine-portable (string grams, no hashing), so the DuckDB
    oracle reproduces it byte-for-byte."""
    corpus = _spread(documents).select(
        F.col(id_col), F.explode(string_shingles(text_col, k)).alias("g")
    )
    bench = benchmark.select(
        F.col(bench_id_col), F.explode(string_shingles(text_col, k)).alias("g")
    ).distinct()
    hits = corpus.join(F.broadcast(bench), "g")
    return (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_hit_grams"),
            F.countDistinct(bench_id_col).alias("n_benchmarks_hit"),
        )
        .filter(F.col("n_hit_grams") >= min_hits)
    )
