"""Time-window aggregations — extensions over the reference's calendar keys.

The reference groups by calendar columns only ("queries are not by time
slice", README.md:20; T2 notes windows as the optional extension).  These
are the Spark-native window forms a time-series engine needs:

- tumbling: ``F.window(ts, width)`` — maps each row to exactly one bucket,
  so it partial-aggregates map-side like any groupBy (no extra shuffle).
- session: ``F.session_window(ts, gap)`` — gap-merged activity sessions;
  Spark merges overlapping windows in the agg (batch) or state store
  (streaming).

Both work unchanged on a streaming DataFrame with a watermark — that is the
point of expressing them declaratively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from killrweather_spark.functions.time import epoch_us


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Fixed-width tumbling window aggregation; window bounds exposed as
    ``window_start``/``window_end`` columns."""
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge; the
    window ends ``gap`` after the last event (Spark semantics)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def trailing_range_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    trailing_micros: int,
    aggs_builder,
) -> DataFrame:
    """Time-based RANGE-frame window: for each row, aggregate all rows of the
    same key within the trailing ``trailing_micros`` (inclusive of peers with
    the identical timestamp — RANGE, not ROWS, semantics).

    The frame is anchored on epoch *microseconds* (``unix_micros``), not a
    seconds cast: casting a timestamp to long truncates sub-second precision
    and silently widens the frame.  Scale: one shuffle on the key, then a
    streaming ordered scan per partition with state bounded by the time
    range — this is the batch analog of a sliding event-time window, and
    unlike a self-join formulation it never re-pairs rows (O(n·frame) work,
    zero extra shuffles).

    ``aggs_builder(window)`` returns the list of windowed Columns to attach.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch_us(ts_col))
        .rangeBetween(-trailing_micros, 0)
    )
    return df.select("*", *aggs_builder(w))
