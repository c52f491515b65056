"""Custom stateful streaming operator: per-key COUNT-based tumbling windows.

The reference's count windows (alexp/.../streaming/Windows/Tumbling.java:9-34)
buffer n rows and emit when full. Spark has no native count windows
(SURVEY §2.10); this is the Structured-Streaming rendering via
applyInPandasWithState: per key, a (buffered_count, buffered_sum, next
window id) state triple carries partial windows across micro-batches, and a
row is emitted exactly when a window fills. Count windows are only
well-defined per key in a distributed stream (global row order does not
exist); the emitted aggregates (n, sum, avg) are order-insensitive, so the
operator is deterministic for any arrival order within a key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("window_id", LongType()),
        StructField("n", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("avg_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("buf_n", LongType()),
        StructField("buf_sum", DoubleType()),
        StructField("next_window", LongType()),
    ]
)


def stream_count_tumbling(
    stream_df: DataFrame, key_col: str, value_col: str, size: int
) -> DataFrame:
    """Per-key count-tumbling aggregation over a stream; emits one row per
    COMPLETE window of `size` events. Use outputMode('append')."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf_n, buf_sum, wid = state.get
        else:
            buf_n, buf_sum, wid = 0, 0.0, 0
        out = []
        for pdf in pdfs:
            for v in pdf[value_col].to_numpy(dtype=float):
                buf_n += 1
                buf_sum += float(v)
                if buf_n == size:
                    out.append((key[0], wid, buf_n, buf_sum, buf_sum / buf_n))
                    wid += 1
                    buf_n, buf_sum = 0, 0.0
        state.update((buf_n, buf_sum, wid))
        yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA.fields])

    return (
        stream_df.selectExpr(f"cast({key_col} as string) as key", f"{value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


SLIDING_STATE_SCHEMA = StructType(
    [
        StructField("seen", LongType()),
        StructField("buf", ArrayType(DoubleType())),
    ]
)


def stream_count_sliding(
    stream_df: DataFrame, key_col: str, value_col: str, size: int, slide: int
) -> DataFrame:
    """Per-key count-SLIDING windows over a stream — the Structured-
    Streaming rendering of the reference's Sliding window semantics
    (alexp/.../streaming/Windows/Sliding.java:11-40): window w covers event
    ordinals [w*slide, w*slide+size) and emits exactly once, when its last
    event arrives. Matches the batch `count_sliding_window` explode
    (windowed.py) per key.

    State per key = (events seen, rolling buffer of the last `size`
    values): at the arrival of ordinal w*slide+size-1 the buffer holds
    exactly window w's events for ANY slide (overlap when slide<size, gaps
    when slide>size), so retired events leave state as soon as no future
    window can contain them — state is O(size), not O(stream).
    Use outputMode('append')."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen, buf = state.get
            buf = list(buf)
        else:
            seen, buf = 0, []
        out = []
        for pdf in pdfs:
            for v in pdf[value_col].to_numpy(dtype=float):
                buf.append(float(v))
                if len(buf) > size:
                    buf.pop(0)
                seen += 1
                if seen >= size and (seen - size) % slide == 0:
                    wid = (seen - size) // slide
                    s = float(sum(buf))
                    out.append((key[0], wid, len(buf), s, s / len(buf)))
        state.update((seen, buf))
        yield pd.DataFrame(out, columns=[f.name for f in OUT_SCHEMA.fields])

    return (
        stream_df.selectExpr(f"cast({key_col} as string) as key", f"{value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, SLIDING_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
