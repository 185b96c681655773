"""Mergeable partial-aggregation states — incremental view maintenance.

The reference recomputes each tier on demand and writes it back
(``TemperatureActor.scala:55-69``: daily from raw, monthly from daily).
That is affordable at ≤24 rows per key; at 100 TB the only viable shape is
INCREMENTAL maintenance: keep a per-key *state* whose merge is associative
and commutative, fold new data into it, and finalize on read — never
rescan history.  This module provides that algebra for the engine's
deterministic A1 statistics (see ``aggregates.py:daily_stats_exact``):

- ``stats_partial``   — per-key state ``(n, Σx̂, Σx̂², high, low)`` with x̂
  the fixed-point integer scaling.  Every field is order-free exact:
  integer sums commute, double MAX/MIN commute.
- ``stats_merge``     — union states and reduce field-wise (+, +, +, MAX,
  MIN).  Associative ⇒ any partition of history into batches yields the
  SAME state bit-for-bit; this is what the driver's oracle check proves
  (the engine answers via partial+merge, the oracle recomputes directly —
  a hash match certifies the algebra, not just the numbers).
- ``stats_finalize``  — derive mean / var_pop / stdev algebraically from
  the state, identical to ``daily_stats_exact``'s closed form.

Scale posture: a state row is O(1) per key regardless of history length,
the merge groupBy gets map-side partial combine (the state IS a partial
aggregate), and folding a day's delta shuffles |delta keys| rows — not
|history|.  This is the same contract as Spark's internal
``ImperativeAggregate.merge`` / DataSketches' union operators, expressed
as plain DataFrame ops so Catalyst plans it.

``minhash_merge_signatures`` extends the algebra to the dedup index:
MinHash is mergeable because ``min`` over a union is the field-wise min
of per-subset minima (Broder 1997) — the property that lets a 100 TB
corpus build per-shard signatures independently and OR them into one
index without reshuffling shingles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("__n", "__sx", "__sxx", "__hi", "__lo")


def stats_partial(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    decimals: int = 2,
) -> DataFrame:
    """Per-key mergeable statistics state over ``df``'s slice of the data.

    Output: ``keys + (__n, __sx, __sxx, __hi, __lo)`` — counts and
    fixed-point integer sums (exact, commutative) plus raw double extrema
    (MAX/MIN are order-free on IEEE doubles).
    """
    s = 10**decimals
    x = F.col(value)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.round(x * s).cast("bigint")).alias("__sx"),
        F.sum(F.round(x * x * s * s).cast("bigint")).alias("__sxx"),
        F.max(value).alias("__hi"),
        F.min(value).alias("__lo"),
    )


def stats_merge(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Fold any number of state frames into one: field-wise (+,+,+,MAX,MIN).

    Associative + commutative ⇒ independent of how history was batched.
    Keys present in only some states merge correctly (union, not join — an
    absent side contributes nothing, exactly like an empty delta).
    """
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.sum("__n").alias("__n"),
        F.sum("__sx").alias("__sx"),
        F.sum("__sxx").alias("__sxx"),
        F.max("__hi").alias("__hi"),
        F.min("__lo").alias("__lo"),
    )


def stats_finalize(state: DataFrame, decimals: int = 2) -> DataFrame:
    """State → the A1 answer columns (high/low/mean/variance/stdev), with
    the exact same closed-form derivation as ``daily_stats_exact`` so an
    incrementally-maintained tier is bit-identical to a full recompute."""
    s = 10**decimals
    mean = (F.col("__sx") / float(s)) / F.col("__n")
    with_mean = state.withColumn("mean", mean)
    variance = F.greatest(
        F.lit(0.0),
        (F.col("__sxx") / float(s * s)) / F.col("__n")
        - F.col("mean") * F.col("mean"),
    )
    return (
        with_mean.withColumn("variance", variance)
        .withColumn("stdev", F.sqrt(F.col("variance")))
        .withColumnRenamed("__hi", "high")
        .withColumnRenamed("__lo", "low")
        .drop("__n", "__sx", "__sxx")
    )


def incremental_stats(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    split_pred,
    decimals: int = 2,
) -> DataFrame:
    """The full incremental-maintenance round trip: partition ``df`` by
    ``split_pred`` (a Column predicate — "history" vs "the arriving
    delta"), build each side's state independently, merge, finalize.

    The predicate deliberately CUTS THROUGH key groups (e.g. by hour
    within a day-keyed rollup) so the merge is load-bearing for every key,
    not a disjoint union.  Equivalent by algebra to ``daily_stats_exact``
    over the whole frame — which is exactly what the DuckDB oracle
    computes directly.
    """
    pred = split_pred(df)
    history = stats_partial(df.filter(pred), keys, value, decimals)
    delta = stats_partial(df.filter(~pred), keys, value, decimals)
    merged = stats_merge([history, delta], keys)
    return stats_finalize(merged, decimals)


def minhash_merge_signatures(
    shingled: DataFrame,
    id_col: str,
    split_col: str,
    n_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature built as a MERGE of per-shard partial
    signatures — ``min(union) = min(min(A), min(B))`` field-wise.

    ``shingled`` is the (id, shingle) frame; ``split_col`` names an int
    column assigning each shingle row to a shard (in production: the
    ingest batch / corpus shard that contributed it).  Each shard's
    signature aggregates only its own shingles; the second aggregate
    merges shards with field-wise MIN.  The result is provably identical
    to ``dedup.minhash_signatures`` over all shingles at once — the
    oracle computes THAT directly, so the hash match certifies the merge
    property the 100 TB sharded index build relies on.

    Both aggregates are map-side combinable; the merge shuffles one
    16-int row per (doc, shard) — signature-sized, never shingle-sized.
    """
    from killrweather_spark.functions.dedup import MINHASH_PERMS, MINHASH_PRIME

    base = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint")
        % MINHASH_PRIME
    )
    hashed = shingled.select(F.col(id_col), F.col(split_col), base.alias("h"))
    partial_aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS[:n_hashes])
    ]
    partials = hashed.groupBy(id_col, split_col).agg(*partial_aggs)
    merge_aggs = [F.min(f"h{i}").alias(f"h{i}") for i in range(n_hashes)]
    return partials.groupBy(id_col).agg(*merge_aggs)


def hll_register_merge(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    shard_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Incremental cardinality: per-shard HLL register partials MAX-merged
    into the group sketch, then finalized — identical by algebra to
    ``hll_distinct`` over the whole frame (``max(max per shard) = max``),
    which the direct oracle certifies.

    This is the DataSketches-union shape: each ingest batch/day computes
    its own ≤256-row register frame per group, history is kept as states,
    and a new shard folds in by shuffling register rows — never re-reading
    history's raw values.  At 100 TB the sketch state per group is 256
    rows regardless of history length.
    """
    from killrweather_spark.operators.aggregates import (
        hll_estimate,
        hll_registers,
    )

    per_shard = hll_registers(df, [*group_cols, shard_col], value_col)
    merged = per_shard.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )
    return hll_estimate(merged, group_cols, out_col)
