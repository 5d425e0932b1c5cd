"""Observability operators (SURVEY.md §2.1 S7, §2.4 A3): the reference
logs a row count after every scrape (``div_link_handler.py:278-279``) and
mirrors progress to a log file.  The Spark-native equivalent is
``DataFrame.observe`` — metrics ride the job itself (no extra pass over
the data, no ``.count()`` action), surfaced per-action via a listener or
read back from the observation object.

At 100 TB an extra ``count()`` for logging is a full job; ``observe``
computes the same counters inside the existing plan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions import is_summary_row


def observed_ingest(df: DataFrame, *text_cols: str) -> tuple[DataFrame, Observation]:
    """Attach the reference's per-scrape counters to an ingest DataFrame:
    total rows, data rows (post summary-filter), null-measure rows.
    Read ``obs.get`` after the first action on the returned frame."""
    cols = text_cols or tuple(
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    )
    obs = Observation("ingest_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(~is_summary_row(*cols), 1)).alias("n_data_rows"),
    )
    return observed, obs


def observed_count(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """A3 scraped-row counter as a rider on whatever action runs next."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
