"""Differential tests: every registered query with an oracle must match
DuckDB bit-for-bit under the driver's comparison (replica in oracle_utils).

Runs at sf0.001 by default for speed; set ORACLE_SF_DIR=/root/testdata/sf0.01
to run at the driver's correctness scale.
"""

from __future__ import annotations

import os

import pytest

from market_data_ingestion_scraper_spark.queries import REGISTRY

from .oracle_utils import compare_query

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_matches_oracle(spark, name):
    # oracle_text(SF_DIR): sf-dependent oracle builders (the BPE trainer
    # differential) re-derive their expected values from the SAME corpus
    # the query runs on, so parity holds at any scale factor.
    spec = REGISTRY[name]
    compare_query(spark, SF_DIR, spec.fn, spec.oracle_text(SF_DIR))


def test_all_queries_return_rows(spark):
    """Every registered query composes and computes at the smoke SF.
    The 140 counts are independent jobs, so they run 4-wide from a
    thread pool (r19 suite-time fix; py4j calls release the GIL and the
    scheduler back-fills executor cores across jobs — 107 s → ~35 s).
    Each worker owns a contiguous registry slice and runs it in order,
    preserving the per-tag persist-generation sequencing within any
    operator family that shares a cache tag."""
    from concurrent.futures import ThreadPoolExecutor

    items = list(REGISTRY.items())
    step = (len(items) + 3) // 4
    slices = [items[i: i + step] for i in range(0, len(items), step)]

    def run(chunk):
        for name, spec in chunk:
            assert spec.fn(spark, SF_DIR).count() >= 0, name

    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(run, slices))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0]["revenue"] >= rows[-1]["revenue"]


def test_gate_window_ordering():
    """The external gate snapshots only the first 50 queries() entries —
    pin that every query still needing a first/fresh correctness row is
    inside that window and the export covers the registry exactly once."""
    from market_data_ingestion_scraper_spark.queries import (
        GATE_DEFERRED,
        GATE_PRIORITY,
        GATE_RETIRED,
        oracle_sql,
        queries,
    )

    names = list(queries())
    assert sorted(names + list(GATE_RETIRED)) == sorted(
        REGISTRY
    ), "export + retired must cover REGISTRY"
    assert not set(GATE_RETIRED) & set(names), "retired queries must not export"
    window = set(names[:50])
    missing = set(GATE_PRIORITY) - window
    assert not missing, f"priority queries outside gate window: {missing}"
    assert set(GATE_PRIORITY) & set(GATE_DEFERRED) == set()
    # two-round rotation invariant: window is exactly the priority list
    # and the parked list fills the next round's window exactly
    assert len(GATE_PRIORITY) == 50 and len(GATE_DEFERRED) == 50
    assert set(oracle_sql()) <= set(names)


def test_retire_on_green_guard():
    """r11 verdict #3: a query retired at round N must cite a green gate
    row from N or N-1 (enforced from r12 onward).  The import-time guard
    must fail fast on a stale future retirement and pass on the current
    ledger."""
    from unittest import mock

    from market_data_ingestion_scraper_spark import queries as q

    # every retired query is ledgered, no phantoms, and the guard passes
    assert set(q.GATE_RETIREMENT_LEDGER) == set(q.GATE_RETIRED)
    q._check_gate_lists()

    # a hypothetical r12+ retirement with r10-vintage evidence must raise
    name = q.GATE_RETIRED[0]
    stale = dict(q.GATE_RETIREMENT_LEDGER)
    stale[name] = (12, 10)
    with mock.patch.object(q, "GATE_RETIREMENT_LEDGER", stale):
        with pytest.raises(ValueError, match="stale retirement"):
            q._check_gate_lists()

    # ...while r12-retired-with-r11-green passes
    fresh = dict(q.GATE_RETIREMENT_LEDGER)
    fresh[name] = (12, 11)
    with mock.patch.object(q, "GATE_RETIREMENT_LEDGER", fresh):
        q._check_gate_lists()
