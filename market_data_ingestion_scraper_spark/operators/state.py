"""Ingestion-state operators: resumable, idempotent incremental runs.

The reference keeps two hand-rolled JSON documents — a checkpoint
``{current_index, current_commodity, completed[]}`` saved *before* each unit
of work (``div_link_handler.py:57-71,507-508``) and a completed-set
``{commodity: [link_types]}`` (``:83-92``) — so a crashed run resumes at the
in-flight unit and skips finished ones (``:467-471,501-503``).

Spark-first redesign (SURVEY.md §2.9): the state is a **status table**
(append-only parquet) and the skip logic is an **anti-join**, not index
arithmetic.  Idempotency comes from dynamic partition overwrite in the data
sink, so redoing the in-flight unit rewrites the same partition — the
reference's crash contract (at-least-once per unit, exactly-once at
partition grain) at cluster scale.  No driver-side JSON, no mutable state.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATUS_SCHEMA = T.StructType(
    [
        T.StructField("commodity", T.StringType(), False),
        T.StructField("link_type", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # started | done
        T.StructField("event_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _status_path(root: str) -> str:
    return f"{root}/_ingest_status"


def read_status(spark: SparkSession, root: str) -> DataFrame:
    """The status table; empty-with-schema when no run has happened yet."""
    try:
        return spark.read.schema(STATUS_SCHEMA).parquet(_status_path(root))
    except Exception:
        return spark.createDataFrame([], STATUS_SCHEMA)


def record_status(
    spark: SparkSession,
    root: str,
    commodity: str,
    link_type: str,
    run_id: str,
    status: str,
) -> None:
    """L2/L4: append one status event.  'started' is written *before* the
    unit's work (checkpoint-before-process, ``div_link_handler.py:507-508``),
    'done' after the sink commits (completion marking, ``:534-536``)."""
    row = [(commodity, link_type, run_id, status, uuid.uuid4().hex,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None))]
    spark.createDataFrame(row, STATUS_SCHEMA).coalesce(1).write.mode("append").parquet(
        _status_path(root)
    )


def completed_units(spark: SparkSession, root: str) -> DataFrame:
    """The completed set (``completed_commodities.json`` analog): distinct
    (commodity, link_type) with a 'done' event."""
    return (
        read_status(spark, root)
        .filter(F.col("status") == "done")
        .select("commodity", "link_type")
        .distinct()
    )


def remaining_work(work: DataFrame, done: DataFrame) -> DataFrame:
    """L3/P5/J1: resume = work list ∖ completed set, as a broadcast
    anti-join (the completed set is small relative to the work list)."""
    return work.join(
        F.broadcast(done), on=["commodity", "link_type"], how="left_anti"
    )


def fully_completed_commodities(
    spark: SparkSession, root: str, expected_link_types: tuple[str, ...]
) -> DataFrame:
    """P6 subset containment: a commodity is complete iff every expected
    link type has a 'done' event (``all(t in scraped)`` at
    ``div_link_handler.py:94-102``) — collect_set + forall."""
    seen = completed_units(spark, root).groupBy("commodity").agg(
        F.collect_set("link_type").alias("seen")
    )
    complete = F.forall(
        F.array(*[F.lit(x) for x in expected_link_types]),
        lambda x: F.array_contains(F.col("seen"), x),
    )
    return seen.filter(complete).select("commodity")


def run_incremental(
    spark: SparkSession,
    root: str,
    work: DataFrame,
    process_unit,
    run_id: str | None = None,
) -> list[tuple[str, str]]:
    """L2-L7 orchestration: anti-join away completed units, then per
    remaining unit write 'started' → process (sink must be idempotent at
    partition grain) → write 'done'.  A crash between 'started' and 'done'
    leaves the unit in the remaining set for the next run — the reference's
    redo-in-flight-unit semantics.

    ``work``: DataFrame[commodity, link_type] (small — it is the reference's
    <select> option list × link types, hundreds of rows; collecting it to
    the driver is the job plan, not a data read).
    ``process_unit``: callable(commodity, link_type, run_id) doing the
    partition-idempotent write.  Returns the processed unit list.
    """
    run_id = run_id or dt.date.today().isoformat()
    todo = remaining_work(work, completed_units(spark, root)).collect()
    processed: list[tuple[str, str]] = []
    for r in todo:
        c, lt = r["commodity"], r["link_type"]
        record_status(spark, root, c, lt, run_id, "started")
        process_unit(c, lt, run_id)
        record_status(spark, root, c, lt, run_id, "done")
        processed.append((c, lt))
    return processed
