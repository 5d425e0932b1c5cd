"""Fixture-schema tripwire.

Round 5 lost six gate rows and the whole bench run because the driver
regenerated events.parquet with a different physical timestamp encoding
and the loader assumed the old one.  This test pins the CANONICAL schema
each loader must emit — when the next regeneration changes an on-disk
type, the failure is one named assertion here instead of a cryptic
mid-gate AnalysisException, and the fix belongs in sources/tables.py
(adapt the loader), never in downstream operators.
"""

from __future__ import annotations

import pytest

from market_data_ingestion_scraper_spark.sources import load_table

SF = "/root/testdata/sf0.001"

# table -> (column, canonical spark typeName) spot checks: the columns
# operators depend on for arithmetic/time/array semantics.
CANONICAL = {
    "events": [("event_id", "long"), ("ts", "timestamp"), ("value", "double"),
               ("props", "string")],
    "documents": [("doc_id", "long"), ("text", "string"), ("lang", "string"),
                  ("source", "string"), ("n_chars", "long")],
    "embeddings": [("vec_id", "long"), ("embedding", "array"), ("label", "integer")],
    "lineitem": [("l_orderkey", "long"), ("l_quantity", "double"),
                 ("l_extendedprice", "double"), ("l_shipdate", "timestamp_ntz")],
    "orders": [("o_orderkey", "long"), ("o_custkey", "long"),
               ("o_orderdate", "timestamp_ntz"), ("o_totalprice", "double")],
    "customer": [("c_custkey", "long"), ("c_nationkey", "integer")],
    "part": [("p_partkey", "long"), ("p_retailprice", "double")],
}


@pytest.mark.parametrize("table", sorted(CANONICAL))
def test_loader_emits_canonical_types(spark, table):
    schema = {f.name: f.dataType.typeName() for f in load_table(spark, SF, table).schema}
    for col, expected in CANONICAL[table]:
        assert col in schema, f"{table}.{col} missing (driver regenerated fixtures?)"
        assert schema[col] == expected, (
            f"{table}.{col}: loader emits {schema[col]!r}, operators expect "
            f"{expected!r} — adapt sources/tables.py, not the operators"
        )
