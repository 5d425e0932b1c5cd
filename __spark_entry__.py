"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``market_data_ingestion_scraper_spark``; this file
is the thin binding layer.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Robust against being loaded by file path: the package lives next to this
# file, which may not already be on sys.path.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from market_data_ingestion_scraper_spark import queries as Q  # noqa: E402
from market_data_ingestion_scraper_spark.sources import load_table  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference ``form_handler.top_five()`` stub, implemented):
    top-5 commodities by revenue on /root/testdata/sf0.001."""
    from market_data_ingestion_scraper_spark.operators.analytics import top_commodities

    return top_commodities(
        load_table(spark, SMOKE_SF_DIR, "lineitem"),
        load_table(spark, SMOKE_SF_DIR, "part"),
        k=5,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; omitted only for
    genuinely non-SQL-expressible operators (rows-only check)."""
    return Q.oracle_sql()
