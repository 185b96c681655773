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


# --------------------------------------------------------------------------
# Explicit-register HyperLogLog — oracle-replayable approximate distinct
# --------------------------------------------------------------------------

HLL_M = 256  # registers (8-bit bucket = first two md5 hex chars); rsd ≈ 6.5 %
_HLL_W = 48  # tail bits examined for the leading-zero rank
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # standard HLL bias constant
# numerator of the raw estimate, alpha·m²·2^49, folded into ONE double
# literal so both engines perform a single IEEE division
_HLL_NUMER = _HLL_ALPHA * HLL_M * HLL_M * float(2**49)
# linear-counting values m·ln(m/V) for V=1..m-1, precomputed HERE: Spark's
# Math.log and DuckDB's libm log disagree in the last ulp for most of these
# inputs, so the transcendental must not be evaluated engine-side.  Decimal
# literals parse to identical doubles everywhere.
_HLL_LINEAR = [HLL_M * __import__("math").log(HLL_M / v) for v in range(1, HLL_M)]

_HEX = "0123456789abcdef"


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via explicit HLL registers.

    Unlike ``approx_count_distinct`` (whose HLL++ sketch bytes are opaque and
    engine-specific), every step here is deterministic, engine-portable
    arithmetic, so a DuckDB oracle replays it value-exactly:

    - register index = 8 md5 bits, rank = leading-zero count of the next 48
      bits (string ops on the md5 hex, no RNG);
    - per-register MAX then Σ2^(49−reg) as EXACT bigint arithmetic — the
      harmonic mean's float-sum order problem is gone;
    - one final IEEE division, plus a literal-lookup linear-counting branch
      for the small-range regime.

    Scale: this is the 100 TB cardinality path — the groupBy carries one row
    per (group, register) ≤ 256·|groups| through the shuffle instead of every
    distinct key, and MAX(reg) is a mergeable partial aggregate (map-side
    combine).  Swap in ``approx_count_distinct`` in production if sketch
    mergeability across jobs matters more than replayability.
    """
    return hll_estimate(
        hll_registers(df, group_cols, value_col), group_cols, out_col
    )


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """The sketch state of :func:`hll_distinct`: one ``(group…, bucket,
    reg)`` row per non-empty register.  This IS a mergeable partial — the
    union of two register frames reduced with ``MAX(reg)`` per (group,
    bucket) is exactly the sketch of the union of their inputs (max is
    associative/commutative), which is what ``operators/mergeable`` builds
    the incremental cardinality path on."""
    d1 = f"(instr('{_HEX}', substr(__hx, 1, 1)) - 1)"
    d2 = f"(instr('{_HEX}', substr(__hx, 2, 1)) - 1)"
    lz = "length(regexp_extract(__tail, '^(0*)', 1))"
    dnz = f"(instr('{_HEX}', substr(__tail, {lz} + 1, 1)) - 1)"
    clz4 = (
        f"CASE WHEN {dnz} >= 8 THEN 0 WHEN {dnz} >= 4 THEN 1 "
        f"WHEN {dnz} >= 2 THEN 2 ELSE 3 END"
    )
    prepared = (
        # NULL values never count: md5(NULL) is NULL, and letting that row
        # through would steal an empty-register slot and overestimate —
        # COUNT(DISTINCT) / approx_count_distinct both ignore NULLs, and
        # the oracle mirrors the same filter
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.md5(F.col(value_col).cast("string")).alias("__hx"),
        )
        .withColumn("__tail", F.expr("substr(__hx, 3, 12)"))
        .select(
            *group_cols,
            F.expr(f"{d1} * 16 + {d2}").alias("bucket"),
            F.expr(
                f"CASE WHEN {lz} = 12 THEN 49 ELSE 4 * {lz} + {clz4} + 1 END"
            ).alias("rho"),
        )
    )
    return prepared.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("reg")
    )


def hll_estimate(
    regs: DataFrame, group_cols: Sequence[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Finalize a register frame (from :func:`hll_registers`, possibly
    after any number of MAX-merges) into the cardinality estimate —
    unchanged arithmetic, so merged and direct sketches finalize
    identically."""
    sums = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.expr("shiftleft(1L, 49 - reg)"))
            + (F.lit(HLL_M) - F.count("*")) * F.lit(2**49)
        ).alias("sum_scaled"),
        (F.lit(HLL_M) - F.count("*")).cast("int").alias("v_empty"),
    )
    est_raw = F.lit(_HLL_NUMER) / F.col("sum_scaled")
    linear = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LINEAR]), F.col("v_empty")
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0), linear
    ).otherwise(est_raw)
    return sums.select(*group_cols, est.alias(out_col))


def hll_distinct_oracle_sql(
    table: str, group_col: str, value_col: str, out_col: str = "approx_distinct"
) -> str:
    """The DuckDB replay of :func:`hll_distinct` (same literals, same ops)."""
    # ::DOUBLE is load-bearing: DuckDB types a bare decimal literal as
    # DECIMAL, whose cast back to double rounds differently in the last ulp
    linear_list = ", ".join(f"{x!r}::DOUBLE" for x in _HLL_LINEAR)
    return f"""
    WITH h AS (
      SELECT {group_col}, md5(CAST({value_col} AS VARCHAR)) AS hx
      FROM {table}
      WHERE {value_col} IS NOT NULL
    ), pre AS (
      SELECT {group_col},
             (strpos('{_HEX}', substr(hx, 1, 1)) - 1) * 16
               + (strpos('{_HEX}', substr(hx, 2, 1)) - 1) AS bucket,
             substr(hx, 3, 12) AS tail
      FROM h
    ), ranked AS (
      SELECT {group_col}, bucket,
             length(regexp_extract(tail, '^(0*)', 1)) AS lz,
             strpos('{_HEX}',
                    substr(tail, length(regexp_extract(tail, '^(0*)', 1)) + 1, 1)
                   ) - 1 AS dnz
      FROM pre
    ), rho AS (
      SELECT {group_col}, bucket,
             CASE WHEN lz = 12 THEN 49
                  ELSE 4 * lz
                       + CASE WHEN dnz >= 8 THEN 0 WHEN dnz >= 4 THEN 1
                              WHEN dnz >= 2 THEN 2 ELSE 3 END
                       + 1 END AS rho
      FROM ranked
    ), regs AS (
      SELECT {group_col}, bucket, MAX(rho) AS reg FROM rho GROUP BY 1, 2
    ), sums AS (
      SELECT {group_col},
             SUM(1::BIGINT << (49 - reg))
               + ({HLL_M} - COUNT(*)) * (1::BIGINT << 49) AS sum_scaled,
             CAST({HLL_M} - COUNT(*) AS INT) AS v_empty
      FROM regs GROUP BY 1
    )
    SELECT {group_col},
           CASE WHEN {_HLL_NUMER!r}::DOUBLE / sum_scaled <= {2.5 * HLL_M!r}
                     AND v_empty > 0
                THEN [{linear_list}][v_empty]
                ELSE {_HLL_NUMER!r}::DOUBLE / sum_scaled END AS {out_col}
    FROM sums
    """


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Single-pass data profile: per column, row count, null count, exact
    distinct count, and numeric min/max — the first query anyone runs on a
    new 100 TB table, so it must be ONE scan, not |cols| scans.

    All per-column stats are computed in a single ``agg`` (Catalyst plans
    the multi-distinct via one Expand — |cols|× row multiplication in the
    map stage but still a single pass over the data), then unpivoted with
    ``stack`` into long form.  At extreme |cols|·|rows|, swap the exact
    distinct for :func:`hll_distinct` per column (one register set each) to
    drop the Expand.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            # try_cast: ANSI mode (Spark 4 default) would otherwise throw
            # CAST_INVALID_INPUT on the first non-numeric string — a
            # profile of a NEW table must tolerate string columns (null
            # min/max), not crash on them
            F.min(F.expr(f"try_cast({c} AS double)")).alias(f"__mn_{c}"),
            F.max(F.expr(f"try_cast({c} AS double)")).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
