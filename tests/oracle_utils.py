"""Local replica of the driver's DuckDB-oracle differential gate.

Runs a registered Spark query and its oracle SQL over the same parquet
fixtures and compares: row count, column-name set, and the full multiset of
rows (columns sorted by name, values canonicalized, rows sorted) — strictly,
with bit-exact floats.  If this passes, any reasonable order-insensitive
value-hash comparison passes too.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from market_data_ingestion_scraper_spark.sources import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"f:{float(v)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return f"s:{v}"


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark, sf_dir: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        # Fetch through Arrow, not fetchall(): the driver canonicalizes via
        # pandas/Arrow, where DuckDB HUGEINT (SUM(int), count_if) surfaces as
        # decimal128/float64 instead of the Python int fetchall() returns —
        # the exact class of mismatch that made source_mix/quality_funnel
        # hash-fail at the r02 gate while fetchall()-based replicas passed.
        tbl = con.execute(oracle).fetch_arrow_table()
        o_cols = [f.name.lower() for f in tbl.schema]
        raw_cols = [f.name for f in tbl.schema]
        o_rows = [tuple(row[c] for c in raw_cols) for row in tbl.to_pylist()]
    finally:
        con.close()

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    sc = canon_rows(s_cols, s_rows)
    oc = canon_rows(o_cols, o_rows)
    if sc != oc:
        diff_s = [r for r in sc if r not in set(oc)][:5]
        diff_o = [r for r in oc if r not in set(sc)][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for a, b in zip(sc, oc) if a != b)} rows differ)\n"
            f"spark-only (5): {diff_s}\noracle-only (5): {diff_o}"
        )
