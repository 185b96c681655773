"""Incremental tier maintenance — batch refresh that touches only new data.

The reference maintains its daily tier by per-key write-back on query
(``TemperatureActor.scala:76-77``: aggregate one (wsid, y, m, d), save it
back to ``daily_aggregate_temperature``).  The streaming pipeline rebuilds
that continuously (``streaming/pipeline.py:start_daily_temp_rollup``); this
module is the *batch lakehouse* form of the same contract: given raw data
with calendar columns and a materialized daily tier, recompute ONLY the
calendar partitions at-or-after the refresh watermark and
dynamic-partition-overwrite them into the tier.

The tier is directory-partitioned by a composite ``date_key`` at exactly
the refresh grain (one directory per calendar unit), so the dynamic
overwrite replaces precisely the recomputed units — it can never clobber
older rows sharing a coarser directory.

At 100 TB this is the difference between an O(new-day) nightly job and an
O(corpus) one: the raw scan prunes to rows at-or-after the watermark, the
aggregation shuffles only new rows, and the overwrite replaces only the
affected tier directories — older tier partitions are never read whole or
rewritten.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_key(date_cols: Sequence[str]) -> Column:
    """Composite integer calendar key: ((year)*100 + month)*100 + day ... —
    lexicographic on the tuple, one pushable partition column."""
    k = F.col(date_cols[0]).cast("bigint")
    for c in date_cols[1:]:
        k = k * 100 + F.col(c).cast("bigint")
    return k


def tier_watermark(spark: SparkSession, tier_path: str) -> int | None:
    """Latest materialized ``date_key`` in the tier, or None if absent.

    Reads only the (tiny) tier table, never the raw side.
    """
    try:
        tier = spark.read.parquet(tier_path)
    except Exception:
        return None
    row = tier.agg(F.max("date_key").alias("wm")).first()
    return row.wm if row else None


def incremental_refresh(
    spark: SparkSession,
    raw: DataFrame,
    tier_path: str,
    key_cols: Sequence[str],
    date_cols: Sequence[str],
    aggs: Sequence[Column],
    units: Sequence[int] | None = None,
) -> int:
    """Refresh the tier for every calendar unit >= the watermark, or — when
    ``units`` is given — for exactly those ``date_key`` units.

    ``raw`` must carry ``key_cols + date_cols``; ``aggs`` are the same
    aggregate expressions a full rebuild would use.  Each refreshed unit is
    recomputed WHOLE from raw (idempotent — re-running the refresh, or
    replaying late rows for the newest day, converges to the same tier:
    the at-least-once-safe property the reference got from keyed upserts,
    SURVEY T7).  Returns the number of refreshed calendar units.

    The two modes serve the two maintenance shapes:

    - **watermark** (default, nightly-cron form): everything at-or-after
      the tier's newest unit recomputes, so late rows for the most recent
      day fold in without bookkeeping;
    - **units** (ingest write-back form, ≙ ``TemperatureActor.scala:76-77``
      updating exactly the queried key): the caller names the units its new
      batch touches — including units OLDER than the watermark, which the
      watermark mode cannot reach — and nothing else is read or rewritten.
    """
    dk = date_key(date_cols)
    if units is not None:
        raw = raw.filter(dk.isin([int(u) for u in units]))
    else:
        wm = tier_watermark(spark, tier_path)
        if wm is not None:
            raw = raw.filter(dk >= F.lit(wm))
    fresh = raw.groupBy(*key_cols, *date_cols).agg(*aggs).withColumn(
        "date_key", date_key(date_cols)
    )
    # persist the (small: one row per key×unit) refreshed aggregate so the
    # unit count and the write share one raw scan+shuffle — without it the
    # nightly job pays the full aggregation twice (count job, then write)
    fresh = fresh.persist()
    try:
        n_units = fresh.select("date_key").distinct().count()
        if n_units:
            (
                fresh.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("date_key")
                .parquet(tier_path)
            )
    finally:
        fresh.unpersist()
    return n_units
