"""Size-gated join hints — broadcast decisions that survive a 100× scale-up.

The reference hand-places its dimension joins (``SampleJoin.scala:39-50`` is
the declared join surface); the Spark-first equivalent is a broadcast hint —
but a HARDCODED ``F.broadcast`` on a dimension that grows linearly with the
corpus (customer, supplier, a filtered part) is a bench-scale optimization
that OOMs the driver at the 100 TB tier.  ``maybe_broadcast`` applies the
hint only when the plan's own size estimate fits under a threshold, so the
same query code plans a broadcast at bench SF and a keyed shuffle join
(size-based planning / AQE's choice) beyond it.

Constant-size dimensions (nation: 25 rows at every SF, region: 5) keep their
unconditional hints — that is what a broadcast hint is FOR.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)
_warned_estimation_failure = False

# Conservative executor-memory bound for a broadcast build side.  Catalyst's
# own default (spark.sql.autoBroadcastJoinThreshold) is 10 MiB because it
# auto-applies to every join; an explicit opt-in hint can afford more, and
# plan-stat estimates for raw scans are file bytes (pre-decompression), so
# 64 MiB of parquet is comfortably a sub-GiB broadcast.
BROADCAST_BYTES_THRESHOLD = 64 << 20


def estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the frame's optimized logical plan.

    For file-backed frames this is the scan's file bytes (scaled by column
    pruning when CBO stats exist); for derived frames it is the propagated
    estimate.  Driver-side only — no job runs.
    """
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
    )


def maybe_broadcast(
    df: DataFrame, threshold_bytes: int | None = None
) -> DataFrame:
    """``F.broadcast(df)`` only if the plan's size estimate fits under
    ``threshold_bytes`` (default :data:`BROADCAST_BYTES_THRESHOLD`, read at
    call time so tests can spoof the gate); otherwise ``df`` unchanged —
    the join then falls to size-based planning / AQE, which picks a keyed
    shuffle join when the side really is big.

    An estimate Catalyst cannot produce (extremely rare) counts as "too
    big": the un-hinted plan is the safe default — but it is WARNED once
    per process, because a systematic estimation breakage (a Spark/py4j
    upgrade changing the ``sizeInBytes`` surface) would otherwise silently
    degrade every size-gated dimension join to a shuffle join fleet-wide
    with nothing in the logs.
    """
    global _warned_estimation_failure
    limit = BROADCAST_BYTES_THRESHOLD if threshold_bytes is None else threshold_bytes
    try:
        size = estimated_plan_bytes(df)
    except Exception:  # noqa: BLE001 — unknown size: do not force a broadcast
        if not _warned_estimation_failure:
            _warned_estimation_failure = True
            _log.warning(
                "maybe_broadcast: plan-size estimation failed; joins fall "
                "back to size-based planning (warned once per process)",
                exc_info=True,
            )
        return df
    return F.broadcast(df) if size <= limit else df
