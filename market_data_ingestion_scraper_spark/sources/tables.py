"""Fixture-table loaders (the engine's scan layer).

The reference's scan boundary is "HTML table → rows of strings"
(reference ``scraper/table_scraper.py:4-43``); ours is "parquet files →
typed DataFrames".  Columnar parquet scans give Catalyst filter pushdown
and column pruning for free (SURVEY.md §4.1) — the 100 TB path is exactly
these loaders pointed at a partitioned data lake instead of single files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# All driver fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain ``spark.read.parquet`` so predicate
    pushdown / column pruning stay available to Catalyst."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events feed has shipped with two physical ``ts`` encodings across
    testdata generations: nanosecond parquet timestamps (which Spark's
    vectorized reader rejects, [PARQUET_TYPE_ILLEGAL]) and native
    microsecond timestamps.  Adapt to whichever is on disk: a timestamp
    column passes through unchanged; int64 ns (read via legacy nanosAsLong)
    is truncated to microseconds with integer ``div`` — floating-point
    division would lose precision on int64 ns and DuckDB's reader truncates
    ns→µs the same way, so oracles stay exact either way."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type in ("long", "integer"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Normalize NTZ to the session-zone timestamp type the operators
        # (window(), unix_micros comparisons) were written against; the
        # session zone is pinned to UTC so wall-clock values are unchanged.
        df = df.withColumn("ts", F.to_timestamp(F.col("ts")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several tables at once: ``t = load_tables(spark, sf, "lineitem", "part")``."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views so operators can be written in
    SQL where that is clearer (same Catalyst plan either way)."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
