"""X33 leakage-safe temporal split: independent pure-Python twin over
the sf0.001 events fixture, planted warm/cold truth table, the frozen
train-entity artifact, stream ≡ batch, and validation.  The plan shape
is pinned in test_plans.py."""

from __future__ import annotations

import datetime as dt

import pytest

from market_data_ingestion_scraper_spark.operators.splits import (
    temporal_split,
    temporal_split_report,
    train_entities,
)
from market_data_ingestion_scraper_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
CUT = "2024-01-25 00:00:00"


def _py_split(rows, cutoff, embargo_days):
    cut = dt.datetime.fromisoformat(cutoff)
    val_start = cut + dt.timedelta(days=embargo_days)
    seen = {u for e, u, ts in rows if ts < cut and u is not None}
    out = {}
    for e, u, ts in rows:
        if ts is None:
            out[e] = "embargo"
        elif ts < cut:
            out[e] = "train"
        elif ts < val_start:
            out[e] = "embargo"
        elif u in seen:
            out[e] = "val_warm"
        else:
            out[e] = "val_cold"
    return out


def test_temporal_split_matches_python_twin(spark):
    ev = load_table(spark, SF, "events")
    rows = [
        (r["event_id"], r["user_id"], r["ts"])
        for r in ev.select("event_id", "user_id", "ts").collect()
    ]
    want = _py_split(rows, CUT, 1)
    got = {
        r["event_id"]: r["split"]
        for r in temporal_split(ev, CUT, embargo_days=1).collect()
    }
    assert got == want
    # all of train/embargo/val must occur on the fixture or the twin is
    # vacuous (val_cold needs planted cold users — the test below)
    assert {"train", "embargo", "val_warm"} <= set(want.values())


def test_temporal_split_planted_truth_table(spark):
    """Hand-checked assignments: pre-cutoff row -> train; inside the
    embargo day -> embargo (neither side); post-embargo row of a user
    with train history -> val_warm; of an unseen user -> val_cold; a
    NULL user post-embargo -> val_cold (no attributable history)."""
    rows = [
        (1, 10, dt.datetime(2024, 1, 20, 12)),   # train
        (2, 10, dt.datetime(2024, 1, 25, 6)),    # embargo
        (3, 10, dt.datetime(2024, 1, 27, 0)),    # val_warm (10 in train)
        (4, 20, dt.datetime(2024, 1, 28, 0)),    # val_cold (20 unseen)
        (5, None, dt.datetime(2024, 1, 28, 0)),  # val_cold (null user)
        (6, 20, dt.datetime(2024, 1, 25, 23, 59)),  # embargo edge
        (7, 30, dt.datetime(2024, 1, 26, 0)),    # val_cold (boundary in)
        (8, 10, None),  # NULL ts -> embargo (placeable on neither side)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    got = {r["event_id"]: r["split"] for r in temporal_split(df, CUT).collect()}
    assert got == {
        1: "train", 2: "embargo", 3: "val_warm", 4: "val_cold",
        5: "val_cold", 6: "embargo", 7: "val_cold", 8: "embargo",
    }


def test_temporal_split_frozen_entities_artifact(spark, tmp_path):
    """The persisted train-entity table must reproduce the in-plan
    assignment exactly — the split artifact contract (freeze once, every
    later job and the streaming tagger agree)."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "train_entities")
    train_entities(ev, CUT).write.parquet(path)
    frozen = spark.read.parquet(path)
    via_artifact = {
        r["event_id"]: r["split"]
        for r in temporal_split(ev, CUT, entities=frozen).collect()
    }
    in_plan = {
        r["event_id"]: r["split"] for r in temporal_split(ev, CUT).collect()
    }
    assert via_artifact == in_plan


def test_temporal_split_report_shares(spark):
    ev = load_table(spark, SF, "events")
    rep = {r["split"]: r for r in temporal_split_report(ev, CUT).collect()}
    n_total = sum(r["n_rows"] for r in rep.values())
    assert n_total == ev.count()
    for r in rep.values():
        assert r["row_share_ppm"] == (r["n_rows"] * 2_000_000 + n_total) // (
            2 * n_total
        )
    # exact half-up shares reconcile to 1e6 within one ulp per row
    assert abs(sum(r["row_share_ppm"] for r in rep.values()) - 1_000_000) <= len(rep)


def test_stream_split_tag_matches_batch(spark, tmp_path):
    """The streaming tagger over the frozen artifact must agree with the
    batch constructor bit-for-bit (shared split_expr; stream-static
    join) — driven through the memory sink in append mode."""
    from market_data_ingestion_scraper_spark.streaming import pipeline as P

    ev = load_table(spark, SF, "events")
    ents = train_entities(ev, CUT)
    src = str(tmp_path / "in")
    ev.repartition(3).write.parquet(src)
    stream = P.stream_events(spark, src)
    out = P.run_to_memory(
        P.stream_split_tag(stream, ents, CUT, embargo_days=1),
        "t_split_tag", spark, mode="append",
    )
    s = {r["event_id"]: r["split"] for r in out.collect()}
    b = {r["event_id"]: r["split"] for r in temporal_split(ev, CUT).collect()}
    assert s == b


def test_temporal_split_validation(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="ISO timestamp"):
        temporal_split(ev, "not-a-date")
    with pytest.raises(ValueError, match="embargo_days"):
        temporal_split(ev, CUT, embargo_days=-1)


def test_temporal_split_nondistinct_entities_and_compact_cutoff(spark):
    """r15 review fixes: a NON-distinct entities frame (the raw
    pre-cutoff projection) must not fan rows out through the join, and
    every fromisoformat-accepted cutoff form must normalize to a
    Spark-safe literal instead of dying at action time."""
    ev = load_table(spark, SF, "events")
    raw = ev.filter(f"ts < timestamp'{CUT}'").select("user_id")  # dupes
    base = temporal_split(ev, CUT).collect()
    via_raw = temporal_split(ev, CUT, entities=raw).collect()
    assert sorted(map(tuple, via_raw)) == sorted(map(tuple, base))
    assert len(via_raw) == ev.count()

    compact = {
        r["event_id"]: r["split"]
        for r in temporal_split(ev, "2024-01-25T00").collect()
    }
    assert compact == {r["event_id"]: r["split"] for r in base}
