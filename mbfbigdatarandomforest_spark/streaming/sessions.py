"""Custom stateful streaming operator: user sessionization
(SURVEY.md §2.12 extension — `applyInPandasWithState`).

Groups an event stream by user and maintains per-user session state: a
session closes after ``gap`` seconds of inactivity (processing-time
timeout). Emits one row per closed session with count/sum/duration —
the canonical "operator Spark's built-ins can't express" (session
windows with custom emission logic / per-group state machines).

Scale notes: state is keyed by user_id (uniform); each micro-batch
touches only the groups present in it plus timed-out state. State size
is O(active users), bounded by the timeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("duration_sec", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ts", DoubleType()),
        StructField("last_ts", DoubleType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Event-time sessionization with optional processing-time timeout.

    Within a batch of rows for one user, events more than
    ``gap_seconds`` apart split into separate sessions; the trailing
    open session stays in state. ``timeout_ms`` flushes idle state in
    long-running jobs; leave None for bounded (availableNow) drains —
    with a timeout set, Spark keeps scheduling cleanup micro-batches
    until every group times out, which can stall a drain for minutes."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ts, last_ts, n, total = state.get
                state.remove()
                yield _emit(user_id, start_ts, last_ts, n, total)
            return

        if state.exists:
            start_ts, last_ts, n, total = state.get
        else:
            start_ts = last_ts = None
            n, total = 0, 0.0

        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                ts_s = ts.timestamp()
                if last_ts is not None and ts_s - last_ts > gap_seconds:
                    closed.append((start_ts, last_ts, n, total))
                    start_ts, n, total = ts_s, 0, 0.0
                if start_ts is None:
                    start_ts = ts_s
                last_ts = ts_s
                n += 1
                total += float(value) if value is not None else 0.0

        state.update((start_ts, last_ts, n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        for s in closed:
            yield _emit(user_id, *s)

    def _emit(user_id, start_ts, last_ts, n, total) -> pd.DataFrame:
        # integer microseconds: float-seconds reconstruction leaves ns
        # residue that Arrow's safe us-cast rejects
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(int(round(start_ts * 1e6)), unit="us", tz="UTC")],
                "session_end": [pd.Timestamp(int(round(last_ts * 1e6)), unit="us", tz="UTC")],
                "n_events": [n],
                "total_value": [total],
                "duration_sec": [last_ts - start_ts],
            }
        )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def batch_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of ``sessionize`` (lag + cumulative session ids) used
    as the correctness oracle: same semantics, pure window functions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events.withColumn(
        "new_session",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
            > gap_seconds
        ).cast("int"),
    ).withColumn(
        "session_id", F.sum(F.coalesce("new_session", F.lit(0))).over(w)
    )
    return (
        gaps.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .withColumn(
            "duration_sec",
            F.col("session_end").cast("double") - F.col("session_start").cast("double"),
        )
        .drop("session_id")
    )
