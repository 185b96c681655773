"""As-of join — a time-series operator Spark lacks as a built-in.

``asof_join(left, right, key, ts)``: for each left row, attach the latest
right row with the same key whose timestamp is ≤ the left timestamp.

Implementation: **union + ordered window**, not a theta-join.

A naive formulation (``left.join(right, key & (r.ts <= l.ts))`` + rank)
explodes to O(|L|·|R|) per key before ranking — unusable at scale.  The
union trick is a single shuffle on the key and a single ordered pass:

1. tag both sides, union aligned columns;
2. window ``last_value(right payload, ignorenulls) over (partition by key
   order by ts, side)`` — right rows carry payload, left rows carry null,
   so each left row picks up the most recent right payload;
3. keep left rows.

Cost: one shuffle (by key) + one sort within partitions — the same price
as a sort-merge join, with no row explosion.  Skewed keys can be salted
upstream; AQE handles moderate skew.

Determinism: ties on (key, ts) in the right side must be resolved before
the join (pass ``dedupe_right=True`` to keep the max-``seq_col`` row), and
right-vs-left rows at the exact same timestamp order right first (side
tag 0 < 1) so "at or before" includes the simultaneous right row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    dedupe_right_by: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + latest right payload at-or-before.

    ``payload``: right columns to carry.  ``dedupe_right_by``: a right
    column whose max picks the winner among right rows sharing
    (key, right_ts) — required for deterministic output when such ties
    exist.
    """
    r = right
    if dedupe_right_by is not None:
        w_dedup = Window.partitionBy(key_right, right_ts).orderBy(
            F.col(dedupe_right_by).desc()
        )
        r = (
            r.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    left_cols = left.columns
    r_tagged = r.select(
        F.col(key_right).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l_tagged = left.select(
        F.col(key_left).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("__side") == 1).select(
        *left_cols, *[F.col("__match")[c].alias(c) for c in payload]
    )
    return out
