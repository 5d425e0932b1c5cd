"""Time-series similarity (operators/timeseries.py): planted-pattern
corpora with known similarity structure — scaled/shifted copies of a
pattern must match under z-normalization; noise must not."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from market_data_ingestion_scraper_spark.operators import timeseries as TS

D0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _events(spark, rows):
    # rows: (user_id, day, value)
    data = [
        (i, D0 + dt.timedelta(days=day), uid, "click", float(v), "{}")
        for i, (uid, day, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture(scope="module")
def planted(spark):
    base = [3, 1, 4, 1, 5, 9, 2, 6]  # the pattern
    rows = []
    for day, v in enumerate(base):
        rows.append((1, day, v))            # the pattern itself
        rows.append((2, day, 10 * v + 7))   # scaled + shifted copy
        rows.append((3, day, base[7 - day]))  # reversed: decorrelated
    rows.append((4, 0, 5.0))                # single-day user
    return _events(spark, rows)


def test_series_grid_and_missing_days(spark, planted):
    out = {r["user_id"]: r["series"]
           for r in TS.user_value_series(planted, n_days=8).collect()}
    assert out[1] == [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    assert out[2] == [37.0, 17.0, 47.0, 17.0, 57.0, 97.0, 27.0, 67.0]
    assert out[4] == [5.0] + [0.0] * 7  # missing days -> 0


def test_znormalize_is_scale_and_offset_invariant(spark, planted):
    vecs = TS.user_value_series(planted, n_days=8).select(
        "user_id", TS.znormalize_series().alias("z")
    )
    z = {r["user_id"]: r["z"] for r in vecs.collect()}
    # the affine copy z-normalizes to the same vector (float-tight)
    assert all(abs(a - b) < 1e-12 for a, b in zip(z[1], z[2]))
    # a z-normalized series has mean ~0
    assert abs(sum(z[1])) < 1e-9


def test_constant_series_normalizes_to_zero(spark):
    ev = _events(spark, [(9, d, 42.0) for d in range(4)])
    z = TS.user_value_series(ev, n_days=4).select(
        TS.znormalize_series().alias("z")
    ).collect()[0]["z"]
    assert z == [0.0, 0.0, 0.0, 0.0]


def test_topk_finds_affine_twin_not_reversal(spark, planted):
    out = TS.series_topk_similar(planted, [1], k=2, n_days=8).collect()
    ranked = sorted(out, key=lambda r: r["rnk"])
    # rank 1: the scaled+shifted twin at cosine ~1 (z-norm kills affine)
    assert ranked[0]["neighbor_id"] == 2
    assert ranked[0]["cos_sim"] >= 0.999999
    # the reversed series is decorrelated -> far below the twin
    by_n = {r["neighbor_id"]: r["cos_sim"] for r in out}
    assert by_n.get(3, -1.0) < 0.5


def test_fixture_events_series_runs(spark, sf_smoke):
    from market_data_ingestion_scraper_spark.sources import load_table

    ev = load_table(spark, sf_smoke, "events")
    out = TS.series_topk_similar(ev, [1, 2], k=3)
    rows = out.collect()
    assert len(rows) <= 6 and all(r["rnk"] <= 3 for r in rows)
    assert all(-1.000001 <= r["cos_sim"] <= 1.000001 for r in rows)


def test_subsequence_search_finds_planted_motif(spark):
    import random

    rng = random.Random(3)
    pat = [3.0, 1.0, 4.0, 1.0, 5.0]
    rows = []
    for uid in (1, 2, 3):
        for day in range(12):
            rows.append((uid, day, rng.uniform(0, 10)))
    # plant an affine copy of the pattern as EXTRA events for user 2 at
    # offset 4: each day's value averages the noise event with the
    # planted spike, and the spike (1000+5v) dominates the noise (0-10),
    # so the window still correlates with the pattern after averaging
    for j, v in enumerate(pat):
        rows.append((2, 4 + j, 1000 + 5 * v))
    ev = _events(spark, rows)
    out = TS.subsequence_topk(ev, pat, k=2, n_days=12).collect()
    best = sorted(out, key=lambda r: r["rnk"])[0]
    assert best["user_id"] == 2 and best["start_day"] == 4
    assert best["match_cos"] > 0.99


def test_subsequence_rejects_constant_pattern(spark, planted):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="constant pattern"):
        TS.subsequence_topk(planted, [2.0, 2.0, 2.0])


def test_subsequence_exact_match_on_clean_series(spark):
    pat = [1.0, 9.0, 2.0, 8.0]
    rows = [(5, d, v) for d, v in enumerate([0, 0, 1, 9, 2, 8, 0, 0])]
    ev = _events(spark, rows)
    out = TS.subsequence_topk(ev, pat, k=1, n_days=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 5 and r["start_day"] == 2 and r["match_cos"] == 1.0


def test_subsequence_topk_returns_multiple_windows_of_one_user(spark):
    """k>1 must surface a SECOND occurrence within the same user's series
    — a per-user top-1 reduction would silently drop it."""
    pat = [1.0, 9.0, 2.0, 8.0]
    vals = [0, 0, 1, 9, 2, 8, 0, 0, 1, 9, 2, 8, 0, 0]  # planted at 2 and 8
    rows = [(5, d, float(v)) for d, v in enumerate(vals)]
    rows += [(6, d, float(d % 3)) for d in range(14)]  # unrelated user
    ev = _events(spark, rows)
    out = sorted(
        TS.subsequence_topk(ev, pat, k=2, n_days=14).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["user_id"], r["start_day"]) for r in out] == [(5, 2), (5, 8)]
    assert all(r["match_cos"] == 1.0 for r in out)
