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


def global_row_number(
    df: DataFrame,
    order: Sequence[Column | str],
    out_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over a TOTAL order — WITHOUT the
    single-partition ``WindowExec`` a bare ``Window.orderBy`` compiles to
    (which funnels the whole input through one task and dies at scale).

    Two-pass range-rank, the standard distributed formulation:

    1. ``repartitionByRange`` on the order — partition *i*'s rows all sort
       strictly before partition *i+1*'s (the order must be total, i.e.
       carry a unique tiebreak column, which also makes the result
       deterministic).
    2. Per-partition local ``row_number`` partitioned by
       ``spark_partition_id()`` — bounded by partition size, never global.
    3. A bounded driver-side probe (one count per range partition —
       ``num_partitions`` rows, the same discipline as the IVF probe's
       centroid collect) yields cumulative offsets, broadcast-joined back:
       ``global = offset[pid] + local``.

    The stamped frame is materialized via an eager ``localCheckpoint`` so
    the offsets probe and the final scan observe ONE range-boundary sample
    (range boundaries are sampled; ranks are exact for any boundaries, but
    only if both passes see the same assignment).  A checkpoint, not a
    ``persist()``: SQL-cached plans are held strongly by the CacheManager
    until an explicit unpersist, so chained calls (``rfm_segments`` runs
    three nested ntiles) would stack cached frames for the life of the
    session — checkpoint blocks are RDD-level storage the ContextCleaner
    releases as soon as the result frame is garbage-collected, and the
    stored stamp can never be silently recomputed under a different
    boundary sample.  Returns ``(ranked_df, total_rows)`` — the total
    falls out of the probe for free and closed-form bucket maths (ntile)
    needs it.
    """
    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    stamped = (
        df.repartitionByRange(n, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in stamped.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((int(pid), acc))
        acc += int(sizes[pid])
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], schema="__pid int, __off bigint"
    )
    local = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*cols)
    )
    ranked = (
        stamped.withColumn("__local", local)
        .join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col, (F.col("__off") + F.col("__local")).cast("bigint")
        )
        .drop("__pid", "__local", "__off")
    )
    return ranked, acc


def global_ntile(
    df: DataFrame,
    order: Sequence[Column | str],
    n_buckets: int,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY <total order>)`` without an
    unpartitioned window: :func:`global_row_number` supplies the exact
    global rank and total N, then the bucket is ANSI ntile's closed form —
    the first ``N mod n`` buckets take ``ceil(N/n)`` rows, the rest
    ``floor(N/n)`` — applied as a literal-folded expression (matches
    DuckDB/Spark ntile bit-for-bit because the order is total)."""
    ranked, total = global_row_number(
        df, order, "__rank", num_partitions
    )
    q, rem = divmod(total, n_buckets)
    if q == 0:
        bucket = F.col("__rank").cast("int")
    else:
        thr = rem * (q + 1)
        bucket = F.expr(
            f"CAST(CASE WHEN __rank <= {thr} "
            f"THEN (__rank - 1) div {q + 1} + 1 "
            f"ELSE {rem} + (__rank - {thr} - 1) div {q} + 1 END AS INT)"
        )
    return ranked.withColumn(out_col, bucket).drop("__rank")
