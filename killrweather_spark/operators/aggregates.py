"""Tiered-rollup aggregations — the reference's signature pattern.

raw (hourly) → daily → monthly/annual, where each tier reads the previous
tier's output (reference: ``README.md:146-148``; ``TemperatureActor.scala``
computes the daily tier on demand and writes it back, the monthly tier then
reads the daily table).

Every function is column-parameterized: the reference hardcodes
``(wsid, year, month, day, hour)``/``temperature``; here any
``(entity keys, time col, measure)`` combination works, which is also what
lets the correctness harness run these on the driver's synthetic ``events``
table.

Scale notes (100 TB posture):
- All aggregations are ``groupBy().agg()`` — Catalyst plans partial
  (map-side) aggregation before the shuffle, so the shuffle carries one row
  per (partition × key), not per input row.  This replaces the reference's
  driver-side ``StatCounter`` over ``collectAsync`` results
  (``TemperatureActor.scala:87-103``), which is correct only when a key has
  ≤24 rows — the Spark form is correct and parallel at any cardinality.
- ``top_k`` per group uses ``row_number`` over a partitioned window — a
  single shuffle by key, no global sort.  A global top-k uses
  ``orderBy().limit(k)`` which Catalyst executes as TakeOrderedAndProject
  (per-partition bounded heap + driver merge, same algorithm as the
  reference's ``RDD.top(k)``, ``PrecipitationActor.scala:49``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def daily_stats(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    out_prefix: str = "",
) -> DataFrame:
    """High/low/mean/population-variance/population-stdev per key group.

    Rebuild of A1 ``GetDailyTemperature`` (``TemperatureActor.scala:55-60``):
    the reference collects ≤24 hourly values per (wsid,y,m,d) to the driver
    and runs ``StatCounter``.  ``StatCounter.variance`` divides by n →
    **population** variance, so ``var_pop``/``stddev_pop`` here, NOT Spark's
    sample-variance defaults (SURVEY §2.4 A1 risk note).
    """
    p = out_prefix
    return df.groupBy(*keys).agg(
        F.max(value).alias(f"{p}high"),
        F.min(value).alias(f"{p}low"),
        F.avg(value).alias(f"{p}mean"),
        F.var_pop(value).alias(f"{p}variance"),
        F.stddev_pop(value).alias(f"{p}stdev"),
    )


def daily_stats_exact(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    decimals: int = 2,
) -> DataFrame:
    """A1 stats with order-independent, cross-engine-exact arithmetic.

    For measures with fixed decimal precision (the weather feed's
    temperatures/precip are 1-2 dp, ``data/load/*.csv.gz``), accumulate
    integer fixed-point sums (``sum(round(x·10^d))`` — exact, commutative)
    and derive mean/var_pop/stdev algebraically from (n, Σx, Σx²).  Result is
    bit-identical regardless of partitioning/reduction order — what makes the
    engine's output replayable and oracle-checkable at any cluster size.
    Plain :func:`daily_stats` (Welford-style builtins) is the general-purpose
    path; this is the deterministic path.
    """
    s = 10**decimals
    x = F.col(value)
    inner = df.groupBy(*keys).agg(
        F.max(value).alias("high"),
        F.min(value).alias("low"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.round(x * s).cast("bigint")).alias("__sx"),
        F.sum(F.round(x * x * s * s).cast("bigint")).alias("__sxx"),
    )
    mean = (F.col("__sx") / float(s)) / F.col("__n")
    with_mean = inner.withColumn("mean", mean)
    variance = F.greatest(
        F.lit(0.0),
        (F.col("__sxx") / float(s * s)) / F.col("__n") - F.col("mean") * F.col("mean"),
    )
    return (
        with_mean.withColumn("variance", variance)
        .withColumn("stdev", F.sqrt(F.col("variance")))
        .drop("__n", "__sx", "__sxx")
    )


def fixed_point_sum(value: str, decimals: int = 2) -> Column:
    """Order-independent sum of a fixed-decimal measure:
    ``sum(cast(round(x·10^d) as bigint)) / 10^d``.  Exact integer
    accumulation — immune to float reduction-order drift across partitions
    (and across engines, which is what the oracle check needs)."""
    s = 10**decimals
    return F.sum(F.round(F.col(value) * s).cast("bigint")) / float(s)


def monthly_hilow(
    daily: DataFrame,
    keys: Sequence[str],
    high: str = "high",
    low: str = "low",
) -> DataFrame:
    """Monthly hi/low over the *daily* tier — A2 (``TemperatureActor.scala:65-69``).

    Reads the previous tier's output, not the raw table: the tier dependency
    is load-bearing in the reference (the daily write-back feeds this).
    """
    return daily.groupBy(*keys).agg(
        F.max(high).alias("high"),
        F.min(low).alias("low"),
    )


def daily_sum(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    out: str = "precipitation",
) -> DataFrame:
    """Per-key sum — the batch equivalent of the streaming Cassandra counter
    accumulation (A4, ``KafkaStreamingActor.scala:47-64``): the DB counter's
    commutative partial/final sum is exactly Spark's partial-agg + final-agg.
    """
    return df.groupBy(*keys).agg(F.sum(value).alias(out))


def annual_sum(
    daily: DataFrame,
    keys: Sequence[str],
    value: str = "precipitation",
    out: str = "total",
) -> DataFrame:
    """Annual rollup over the daily tier — A3 ``GetPrecipitation``
    (``PrecipitationActor.scala:39-44``; driver-side ``aggregate.sum`` in the
    reference, executor-side ``sum`` here).
    """
    return daily.groupBy(*keys).agg(F.sum(value).alias(out))


def top_k(
    df: DataFrame,
    partition_keys: Sequence[str],
    order_col: str | Column,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per key group — A5 ``GetTopKPrecipitation``
    (``PrecipitationActor.scala:46-54``, ``RDD.top(k)``).

    ``row_number`` over a window partitioned by key: one shuffle on the key,
    rank assignment is streaming within each partition (no global sort).
    Ties break deterministically by the order column only, matching
    ``top(k)``'s ordering-by-value semantics.
    """
    col = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*partition_keys).orderBy(
        col.asc() if ascending else col.desc()
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def top_k_values(
    df: DataFrame,
    partition_keys: Sequence[str],
    value: str,
    k: int,
) -> DataFrame:
    """Top-k as one array row per key — the reference's result shape
    (``TopKPrecipitation.top: Seq[Double]``, ``Weather.scala:136-138``).

    ``sort_array(collect_list(...))`` would buffer all values per key; instead
    rank-filter first (bounded state per key) then collect the ≤k survivors.
    """
    ranked = top_k(df, partition_keys, value, k)
    return ranked.groupBy(*partition_keys).agg(
        F.sort_array(F.collect_list(value), asc=False).alias("top")
    )
