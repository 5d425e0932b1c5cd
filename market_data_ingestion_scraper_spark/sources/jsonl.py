"""JSONL (newline-delimited JSON) document source/sink — the wire format
LLM training corpora actually ship in (one JSON object per line, gzip per
shard).

Design for 100 TB:

- **Explicit schema, never inference.** Schemaless ``spark.read.json``
  runs a full extra pass over the data to infer one — at corpus scale
  that doubles ingest cost and can silently widen types between shards.
  Readers here take (or default) a hard schema; drift surfaces as
  quarantined rows, not as a schema change.
- **Text scan + ``from_json``, not the JSON source's corrupt column.**
  Spark forbids querying only ``_corrupt_record`` from a raw JSON scan
  (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the documented
  workaround is caching the whole corpus, a non-starter at scale).  One
  line-splittable text scan parsed by ``from_json`` gives the same split
  in a single pass: malformed lines parse to NULL and become the
  quarantine frame — the ingest equivalent of a dead-letter queue — with
  identical semantics in batch and streaming.
- **Line-splittable parallelism.** Uncompressed/zstd JSONL splits on
  newlines, so one shard fans out across executors; per-file gzip does
  not (one task per file) — the writer therefore shards output via
  ``repartition`` so downstream readers get file-level parallelism no
  matter the codec.

Reference parity: the reference persists scraped rows as a flat landed
table (`/root/reference/scraper/data_handler.py`); JSONL is the same
landed-boundary contract for document corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical documents-table schema (matches testdata documents.parquet).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


_CORRUPT = "_corrupt_record"


def _parse(lines: DataFrame, schema: T.StructType) -> DataFrame:
    """(value) → (value, parsed): malformed lines don't parse to a NULL
    struct (``from_json`` PERMISSIVE yields an all-NULL struct, which is
    indistinguishable from a legitimately sparse object) — the corrupt
    signal is an extra ``_corrupt_record`` field in the parse schema,
    which PERMISSIVE populates with the offending line on parse or
    type-coercion failure.  Blank lines are shard padding, not
    corruption, and are dropped before parsing."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    return lines.filter(F.trim("value") != "").select(
        "value", F.from_json("value", full, opts).alias("parsed")
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus → ``(clean, quarantine)``.

    ``clean`` has exactly ``schema``'s columns (objects missing fields
    parse with NULLs — schema enforcement, not rejection); ``quarantine``
    is one ``raw_line`` string column holding each malformed line
    verbatim for offline triage."""
    parsed = _parse(spark.read.text(path), schema)
    ok = F.col("parsed")[_CORRUPT].isNull()
    clean = parsed.filter(ok).select("parsed.*").drop(_CORRUPT)
    quarantine = parsed.filter(~ok).select(F.col("value").alias("raw_line"))
    return clean, quarantine


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """File-source streaming reader for a landing directory of JSONL
    shards: new files are discovered per micro-batch (exactly-once per
    file via the source's file-tracking log).  Same parse as
    :func:`read_jsonl`; corrupt lines are dropped here (one reader can't
    cheaply fork two sinks) — batch ``read_jsonl`` over the same
    directory recovers them for triage."""
    parsed = _parse(spark.readStream.text(path), schema)
    return (
        parsed.filter(F.col("parsed")[_CORRUPT].isNull())
        .select("parsed.*")
        .drop(_CORRUPT)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    shards: int = 1,
    compression: str = "gzip",
) -> None:
    """Shard-controlled JSONL writer: ``repartition`` fixes the output
    file count (shard size is the reader's parallelism unit under
    non-splittable codecs), ``partitionBy`` turns filter keys into
    directory pruning — same layout contract as the parquet gold writer."""
    out = df.repartition(shards, *partition_by) if partition_by else df.repartition(shards)
    writer = out.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
