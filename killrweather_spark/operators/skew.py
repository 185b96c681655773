"""Skew-resilient aggregation & join — explicit salting operators.

AQE's skew-join splitting (`session.py` enables it) handles most runtime
skew, but two cases still want explicit salting at 100 TB:

- **Aggregation skew**: one hot key (one station reporting every second, one
  boilerplate document fingerprint) funnels into a single reduce task.
  AQE cannot split a single aggregation key.  :func:`salted_agg` runs the
  classic two-phase plan: groupBy(key, salt) partial → groupBy(key) merge —
  the hot key's rows spread over ``n_salts`` tasks in phase 1 and phase 2
  merges ``n_salts`` tiny partials.
- **Broadcast-infeasible skewed join**: :func:`salted_join` replicates the
  small side ``n_salts`` times and salts the big side deterministically, so
  the hot key's join work spreads over ``n_salts`` tasks.

Salt derivation is ``pmod(hash(spread_col), n)`` — deterministic (replays
and retries produce identical partitioning; no ``rand()``, which would break
task-retry correctness for non-idempotent sinks).

The reference never needed this (per-key groups are ≤24 rows,
``TemperatureActor.scala:80-92``) — it is part of the 100 TB posture
(SURVEY §7 step 6, SCALE.md "Joins").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_expr) per algebraic aggregate: phase 1 computes the
# partial per (key, salt); phase 2 merges partials per key.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    spread_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resilient aggregation.

    ``aggs`` maps output name → (fn, input column) with fn in
    {sum, count, min, max} (the algebraic aggregates whose partials merge
    losslessly; avg = sum/count composed by the caller).

    Example::

        salted_agg(ev, ["user_id"], {"total": ("sum", "cents"),
                                     "n": ("count", "cents")}, "event_id")
    """
    salt = F.pmod(
        F.hash(F.col(spread_col) if isinstance(spread_col, str) else spread_col),
        F.lit(n_salts),
    ).alias("__salt")

    partials = []
    merges = []
    for out, (fn, col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {fn!r}; use sum/count/min/max")
        part_fn, merge_fn = _ALGEBRAIC[fn]
        partials.append(part_fn(col).alias(f"__p_{out}"))
        merges.append(merge_fn(f"__p_{out}").alias(out))

    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*merges)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    spread_col: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the big side, replicate the
    small side ``n_salts``× (explode over the salt range), join on
    (keys + salt).  Total small-side inflation is ``n_salts``× — use when
    the small side is too big to broadcast but skew kills sort-merge.

    Only join types that never null-extend the SMALL side are valid: each
    small-side row exists ``n_salts`` times but a big-side row matches
    exactly one replica, so ``right``/``full`` (and right-semi/anti) would
    emit the n_salts-1 unmatched replicas as duplicate null-extended rows.
    For those, swap the sides (salt the other input) or use a plain join
    with AQE skew handling.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "cross",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} join types; {how!r} "
            "would null-extend the replicated small side (one spurious row "
            "per unmatched salt replica) — swap the join sides or use a "
            "plain join with AQE skew handling"
        )
    salt = F.pmod(
        F.hash(F.col(spread_col) if isinstance(spread_col, str) else spread_col),
        F.lit(n_salts),
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")
