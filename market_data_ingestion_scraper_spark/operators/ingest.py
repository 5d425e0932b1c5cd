"""Ingest layer: raw scraped tables → typed, lineage-stamped silver layer.

Re-expresses the reference's core pipeline (SURVEY.md §2.1/§2.2/§2.7/§2.9)
Spark-first:

- reference scan boundary: HTML table → all-string pandas rows
  (``table_scraper.py:4-43``) → here: schema-on-read CSV of strings;
- whitespace-trim projection (``table_scraper.py:16,28,33``);
- summary-row exclusion (case-insensitive substring,
  ``div_link_handler.py:238-243``);
- name sanitization chain (``div_link_handler.py:116-123``);
- deferred typing: measures are strings at scrape time, cast at the silver
  boundary (``README.md:4-6`` promises numeric analytics; code never casts);
- lineage columns ``scrape_date, commodity, link_type, ingestion_run_id``
  (``div_link_handler.py:282-285``);
- sink: one partition per (commodity × link_type × scrape_date) — the
  reference's filename template ``joburg_market_{c}_{lt}_{d}.csv``
  (``div_link_handler.py:288-293``) becomes Hive-style ``partitionBy``.

Scale notes (100 TB): the silver write is partitioned on the natural query
keys, so downstream reads get partition pruning; dynamic partition
overwrite makes re-ingesting one (commodity, link_type, day) idempotent
without touching sibling partitions — the reference's re-run contract (L6)
at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import is_summary_row, sanitize_name

# Raw scraped-table shape (FIXTURES.md "reference-side raw-ingest schema"):
# every scraped cell is a string — typing is deferred to normalize().
RAW_SCHEMA = T.StructType(
    [
        T.StructField("commodity_raw", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("qty_sold", T.StringType()),
        T.StructField("total_value", T.StringType()),
    ]
)

# Measure columns and their silver-layer types (Ext-F14).
MEASURE_TYPES: dict[str, str] = {
    "price": "double",
    "qty_sold": "double",
    "total_value": "double",
}

PARTITION_KEYS = ("commodity", "link_type", "scrape_date")


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read scan of landed raw CSV: header row + all-string cells,
    the reference's scan contract (S1).  No inferSchema — raw is stringly
    typed by design, and schema inference would be a full extra pass."""
    return spark.read.option("header", True).schema(RAW_SCHEMA).csv(path)


def trim_all_strings(df: DataFrame) -> DataFrame:
    """P2: ``get_text(strip=True)`` on every cell → trim every string col."""
    return df.select(
        *[
            F.trim(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def drop_summary_rows(df: DataFrame, *cols: str) -> DataFrame:
    """P3: drop rows whose concatenated text contains total/summary
    (case-insensitive substring — exactly the reference predicate)."""
    cols = cols or tuple(
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    )
    return df.filter(~is_summary_row(*cols))


def cast_measures(df: DataFrame, measures: dict[str, str] | None = None) -> DataFrame:
    """Ext-F14 deferred typing: numeric-in-string → typed columns.
    Non-numeric garbage becomes NULL (permissive, like downstream pandas
    ``to_numeric(errors='coerce')`` would) — ``try_cast``, because plain
    ``cast`` throws under Spark 4's default ANSI mode."""
    measures = MEASURE_TYPES if measures is None else measures
    out = df
    for c, dtype in measures.items():
        out = out.withColumn(c, F.col(c).try_cast(dtype))
    return out


def add_lineage(
    df: DataFrame,
    scrape_date: str,
    commodity: str,
    link_type: str,
    run_id: str,
) -> DataFrame:
    """L1: the four constant lineage columns stamped on every row
    (``div_link_handler.py:282-285``).  Constants fold in Catalyst —
    zero per-row cost."""
    return (
        df.withColumn("scrape_date", F.lit(scrape_date))
        .withColumn("commodity", F.lit(commodity))
        .withColumn("link_type", F.lit(link_type))
        .withColumn("ingestion_run_id", F.lit(run_id))
    )


def normalize(
    raw: DataFrame,
    scrape_date: str,
    commodity_raw_name: str,
    link_type: str,
    run_id: str,
) -> DataFrame:
    """Full raw→silver normalization for one scraped table:
    trim → drop summary rows → cast measures → lineage stamp, with the
    commodity name sanitized exactly like the reference filename key."""
    commodity = _sanitize_py(commodity_raw_name)
    df = trim_all_strings(raw)
    df = drop_summary_rows(df)
    df = cast_measures(df)
    return add_lineage(df, scrape_date, commodity, link_type, run_id)


def _sanitize_py(name: str) -> str:
    """Driver-side scalar twin of functions.sanitize_name (the partition
    value must be computed before the plan is built).  Mirrors
    ``div_link_handler.py:116-123`` including ASCII ``\\w`` semantics."""
    import re

    cleaned = re.sub(r"[^\w\s-]", "", name.strip().lower())
    return re.sub(r"\s+", "_", cleaned)[:100]


def classify_table(df: DataFrame) -> str:
    """A4 classification (``div_link_handler.py:223-260``): count *data*
    rows (post summary-filter); ≤1 → 'single_container' else
    'multi_container'.  Returns the scalar label because the reference uses
    it for control-flow dispatch (L11)."""
    n = drop_summary_rows(df).count()
    return "single_container" if n <= 1 else "multi_container"


def write_silver(df: DataFrame, root: str) -> None:
    """S5 partitioned sink with L6 idempotency: dynamic partition overwrite
    replaces exactly the (commodity, link_type, scrape_date) partitions in
    ``df``, leaving siblings intact — re-running a unit of work is a no-op
    rewrite of the same partition, like the reference's fixed filenames."""
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        df.write.mode("overwrite")
        .partitionBy(*PARTITION_KEYS)
        .parquet(f"{root}/silver")
    )


def read_silver(spark: SparkSession, root: str) -> DataFrame:
    """Read the whole silver dataset as one logical table (U1: daily files
    accumulate into one dataset).  Partition pruning applies to any filter
    on the partition keys."""
    return spark.read.parquet(f"{root}/silver")
