"""Scalar/aggregate helper columns shared by operators and queries.

Everything here is built-in ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def bounded_window(anchor: Column | str, *order_cols: Column | str) -> WindowSpec:
    """Single-partition window for PROVABLY BOUNDED post-aggregation grains
    (dimension enumerations, per-source/per-bucket share denominators,
    calendar-grain lag frames — dozens to thousands of rows at ANY corpus
    size, never fact-table cardinality).

    Partitions by a constant-0 key derived from ``anchor`` (any column of
    the frame) instead of an empty spec: the physical plan is the same
    single-partition exchange either way, but Spark's ``WindowExec: No
    Partition Defined`` WARN — which exists to flag ACCIDENTAL global
    windows over unbounded data — no longer fires, so the bench/driver
    logs only warn where a warning is meaningful.  The key must be
    derived from a column because Catalyst folds literal partition keys
    back to the empty spec, and must resist simplification for
    NON-NULLABLE anchors too (``anchor * 0`` folds once nullability is
    known): ``pmod(_, 1)`` is always 0 but has no rewrite rule, and the
    ``coalesce`` pins NULL anchors into the same single group.  Every
    call site must state why its input grain is bounded; if a grain ever
    becomes data-sized, restructure (two-phase numbering, aggregate+join)
    instead of widening this."""
    a = F.col(anchor) if isinstance(anchor, str) else anchor
    key = F.pmod(F.coalesce(F.length(a.cast("string")), F.lit(0)), F.lit(1))
    w = Window.partitionBy(key)
    return w.orderBy(*order_cols) if order_cols else w


def sanitize_name(c: Column | str) -> Column:
    """Filename-safe name sanitization with the semantics of the reference
    (``scraper/div_link_handler.py:116-123``): trim → lower → strip chars
    outside ``[\\w\\s-]`` → collapse whitespace runs to ``_`` → truncate to
    100 chars.  Java regex ``\\w`` matches ``[A-Za-z0-9_]`` like Python's
    ASCII ``\\w``; fixture names are ASCII."""
    c = F.col(c) if isinstance(c, str) else c
    cleaned = F.regexp_replace(F.lower(F.trim(c)), r"[^\w\s-]", "")
    return F.substring(F.regexp_replace(cleaned, r"\s+", "_"), 1, 100)


def is_summary_row(*cols: Column | str) -> Column:
    """Case-insensitive substring test for total/summary rows, exactly the
    reference predicate (``div_link_handler.py:238-243``): the row's full
    concatenated text containing "total" or "summary" marks it non-data."""
    text = F.lower(F.concat_ws(" ", *[F.col(c) if isinstance(c, str) else c for c in cols]))
    return text.contains("total") | text.contains("summary")


def revenue(price: Column | str = "l_extendedprice", discount: Column | str = "l_discount") -> Column:
    """Per-row revenue measure: ``extendedprice * (1 - discount)``
    (the README-promised revenue figure, reference ``README.md:4``).
    Computed in IEEE double per row — deterministic across engines."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return p * (F.lit(1) - d)


def exact_sum(c: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent exact SUM of a double measure.

    Double summation order differs between engines/partitionings, so raw
    ``SUM(double)`` is not reproducible bit-for-bit.  Casting each value to
    DECIMAL first makes the sum exact and identical regardless of partial
    aggregation order — on a 1000-executor cluster the map-side partial
    sums stay exact too.  Final cast back to DOUBLE gives a stable schema.
    Mirror in DuckDB oracle SQL:
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(c: Column | str, scale: int = 2, round_to: int = 6) -> Column:
    """Reproducible AVG: exact decimal sum divided by count in double, then
    rounded.  Oracle mirror:
    ``ROUND(CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x), r)``."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(
        exact_sum(col, scale) / F.count(col),
        round_to,
    )
