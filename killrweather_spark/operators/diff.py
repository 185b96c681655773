"""Keyed snapshot diff — the reconciliation operator for slowly-changing
state (table versions, CDC replays, backfill audits).

Given two keyed snapshots of the same logical table, classify every key as
``added`` / ``removed`` / ``changed`` / ``unchanged`` and emit the old/new
images. This is the read-side complement of `operators/cdc.py:merge_changes`
(which *applies* a changelog); diffing two applied states recovers the net
changelog between them — how you audit that an incremental pipeline
converged to the batch answer, or what a replayed backfill actually touched.

Shape: one FULL OUTER join on the key — the single shuffle, keyed by the
natural output key. Comparison is null-safe equality over the tracked
columns (JVM expressions, codegen). At 100 TB both sides are typically
written bucketed by the key (`sources/sinks.py:save_bucketed_table`), which
turns the join shuffle-free; otherwise AQE handles the skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two snapshots on ``keys`` over ``compare_cols``.

    Returns ``keys + old_<c>/new_<c> per compare col + change`` where
    ``change ∈ {'added','removed','changed','unchanged'}``.
    """
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.withColumn("change", change).drop("__in_old", "__in_new")
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
