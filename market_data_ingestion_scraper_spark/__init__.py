"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ingestion pipeline
(Sicelumusa1/market-data-ingestion-scraper), re-expressed Spark-first.

Layout:
- ``session``    — SparkSession factory tuned for local testing, cluster-ready.
- ``sources``    — table loaders (parquet fixtures) + raw CSV ingest boundary.
- ``functions``  — scalar/aggregate helper columns (sanitize, revenue, exact sums).
- ``operators``  — ingest/normalize, state/idempotency, analytics, dedup,
                   similarity (ANN/PQ/RP index lifecycles, hard-negative
                   mining), text analysis (incl. trigram-LM lifecycle +
                   perplexity curation), multimodal, sketches, graph
                   (PageRank), record linkage, time-series, BPE,
                   classifier, bloom, versioning, importance resampling
                   (DSIR), weighted reservoir sampling.
- ``streaming``  — Structured Streaming pipelines over the events feed.
- ``plans``      — explain/plan-audit utilities.

Design stance (SURVEY.md §1.3, §4): declarative DataFrame/SQL everywhere,
Catalyst does pushdown/pruning/join-choice; Pandas UDFs only where built-ins
cannot express the semantics (none needed for the reference surface itself).
"""

__version__ = "0.1.0"
