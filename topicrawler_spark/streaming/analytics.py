"""Streaming analytics over event streams (crawl metrics / fetch logs).

Watermarked tumbling windows for late-tolerant counters, plus stateful
sessionization with ``applyInPandasWithState`` — the custom-stateful-operator
pattern for anything the built-in windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with late-data tolerance. Works identically on
    batch and streaming DataFrames (same API — that's the point)."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("status", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful sessionization: emits a session row when the inactivity gap
    expires (processing-time timeout). The custom-stateful-operator pattern
    (``applyInPandasWithState``) the engine uses wherever windows can't
    express the semantics."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_ms, unit="ms"),
                        "session_end": pd.Timestamp(last_ms, unit="ms"),
                        "n_events": n,
                        "status": "closed",
                    }
                ]
            )
            return
        ts_min = None
        ts_max = None
        count = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            col = pd.to_datetime(pdf[ts_col])
            mn, mx = col.min(), col.max()
            ts_min = mn if ts_min is None else min(ts_min, mn)
            ts_max = mx if ts_max is None else max(ts_max, mx)
            count += len(pdf)
        if count == 0:
            return
        mn_ms = int(ts_min.value // 1_000_000)
        mx_ms = int(ts_max.value // 1_000_000)
        if state.exists:
            start_ms, last_ms, n = state.get
            state.update((min(start_ms, mn_ms), max(last_ms, mx_ms), n + count))
        else:
            state.update((mn_ms, mx_ms, count))
        state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(state.get[0], unit="ms"),
                    "session_end": pd.Timestamp(state.get[1], unit="ms"),
                    "n_events": state.get[2],
                    "status": "open",
                }
            ]
        )

    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
