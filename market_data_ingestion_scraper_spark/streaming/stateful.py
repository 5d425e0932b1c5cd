"""Custom stateful streaming operator (SURVEY.md §2.10 "custom state"):
purchase-terminated user sessions via ``applyInPandasWithState``.

Built-in ``session_window`` closes sessions only by inactivity gap.  The
reference's work units additionally end on an explicit signal (commodity
completed → marked done, ``div_link_handler.py:534-536``); the analog here:
a user session ends EITHER on a terminal event (``purchase``) OR on
processing-time timeout.  That event-type-dependent close is not
expressible with built-in windows — exactly the case for GroupState.

State per user: (session_start_ms, last_ts_ms, n_events, total_value) —
fixed width, bounded by live-user cardinality, reclaimed on timeout.  At
100 TB/day the state store shards by user hash across executors; a key's
state is touched only by its own partition (no cross-task coordination).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Ship session_fn (and its module-level helpers) by value so executor
# workers never need this package importable — see operators/multimodal.py.
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("ended_by", StringType()),  # purchase | timeout
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_ms", LongType()),
        StructField("last_ts_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

TIMEOUT_MS = 30_000


def _close(user_id: int, st: tuple, ended_by: str) -> pd.DataFrame:
    start, last, n, total = st
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start_ms": [start],
            "session_end_ms": [last],
            "n_events": [n],
            "total_value": [float(total)],
            "ended_by": [ended_by],
        }
    )


def session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into session state;
    emit a row when a purchase closes the session or the state times out."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            yield _close(user_id, tuple(state.get), "timeout")
        state.remove()
        return

    st: tuple[Any, ...] | None = tuple(state.get) if state.exists else None
    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, etype, value in zip(
            pdf["ts"].astype("int64") // 1_000_000,  # ns → ms
            pdf["event_type"],
            pdf["value"],
        ):
            if st is None:
                st = (int(ts), int(ts), 1, float(value))
            else:
                # events may arrive out of event-time order across
                # micro-batches: track min/max, not arrival order
                st = (min(st[0], int(ts)), max(st[1], int(ts)),
                      st[2] + 1, st[3] + float(value))
            if etype == "purchase":
                out.append(_close(user_id, st, "purchase"))
                st = None
    if st is not None:
        state.update(st)
        try:
            state.setTimeoutDuration(TIMEOUT_MS)
        except Exception:
            pass  # NoTimeout mode: open sessions wait for their purchase
    elif state.exists:
        state.remove()
    yield from out if out else iter(())


RESERVOIR_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("weight", LongType()),
        StructField("key_nano", LongType()),
    ]
)

RESERVOIR_STATE = StructType(
    [StructField("keys", ArrayType(LongType()))]  # sorted ascending, ≤ n
)


def make_reservoir_fn(n: int):
    """Per-shard A-ES candidate admission: keep the running top-``n``
    keys as fixed-width state; EMIT every row that enters the shard's
    reservoir.  Emission is monotone (a row once admitted is never
    retracted), so the operator is append-mode-legal; evictions happen at
    the batch finalize step instead (``orderBy(key).limit(n)`` over the
    emitted candidates — exactly :func:`...sampling.weighted_reservoir_sample`'s
    selection, which the parity test pins).  Admission uses ``>=`` against
    the shard threshold so key ties cannot exclude a row the batch
    tie-break (ascending doc_id) would have selected — the candidate set
    is a strict superset of the final sample by construction."""

    def reservoir_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import bisect

        (shard,) = key
        keys: list[int] = list(state.get[0]) if state.exists else []
        out: list[tuple[int, int, int, int]] = []
        for pdf in pdfs:
            for doc_id, w, k in zip(
                pdf["doc_id"], pdf["weight"], pdf["key_nano"]
            ):
                k = int(k)
                if len(keys) < n:
                    bisect.insort(keys, k)
                    out.append((int(shard), int(doc_id), int(w), k))
                elif k >= keys[0]:
                    keys.pop(0)
                    bisect.insort(keys, k)
                    out.append((int(shard), int(doc_id), int(w), k))
        state.update((keys,))
        if out:
            yield pd.DataFrame(
                out, columns=["shard", "doc_id", "weight", "key_nano"]
            )

    return reservoir_fn


def stream_weighted_reservoir(
    rows: DataFrame,
    n: int,
    n_shards: int = 32,
    seed: str = "wrs-v1",
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Streaming A-ES weighted reservoir (§2.10 custom state × X23): each
    of ``n_shards`` hash shards maintains its own top-``n`` key state and
    streams out ADMITTED candidates; the exact global sample is the batch
    reduction ``orderBy(key_nano desc, doc_id).limit(n)`` over everything
    emitted (any global-top-n row is inside its shard's top-n, so the
    union of shard candidates always covers the final sample).

    Scale: state is ``n_shards × n`` int64 keys — fixed width, sharded by
    key hash across executors; the candidate stream is the classic
    reservoir bound, expected O(n·log(N/n)) emissions per shard, a
    vanishing fraction of the input at web scale.  The key expression is
    the SHARED :func:`...sampling.aes_key_nano`, so stream and batch
    cannot drift."""
    from ..operators.sampling import aes_key_nano

    keyed = (
        rows.filter(F.col(weight_col) > 0)
        .select(
            F.pmod(F.col(key_col), F.lit(int(n_shards))).alias("shard"),
            F.col(key_col).alias("doc_id"),
            F.col(weight_col).cast("long").alias("weight"),
            aes_key_nano(seed, key_col, weight_col).alias("key_nano"),
        )
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_reservoir_fn(int(n)),
        RESERVOIR_OUTPUT,
        RESERVOIR_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def finalize_reservoir(candidates: DataFrame, n: int) -> DataFrame:
    """Exact top-n over streamed candidates — the same
    TakeOrderedAndProject selection the batch reservoir plans."""
    return (
        candidates.select("doc_id", "weight", "key_nano")
        .orderBy(F.desc("key_nano"), F.col("doc_id"))
        .limit(int(n))
    )


def purchase_sessions(
    events: DataFrame, timeout: str = GroupStateTimeout.NoTimeout
) -> DataFrame:
    """Apply the stateful session operator.

    Default ``NoTimeout``: sessions close only on the terminal event, and a
    drained stream (``processAllAvailable``) settles — with
    ``ProcessingTimeTimeout`` the engine keeps scheduling timeout-evaluation
    batches, so drain-style tests never return; pass it explicitly for
    long-running production queries that must reap abandoned sessions."""
    return events.groupBy("user_id").applyInPandasWithState(
        session_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )
