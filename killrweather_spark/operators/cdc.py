"""Changelog→snapshot merge (CDC apply) — batch upsert-with-deletes.

The reference's write path is upsert-by-primary-key into Cassandra
(``KafkaStreamingActor.scala:45`` — ``saveToCassandra`` overwrites the row
for an existing PK), so "apply the latest state per key" is the storage
engine's job there.  On a lakehouse there is no such sink: maintaining a
snapshot table from a stream of keyed changes (inserts, updates, deletes)
is an explicit MERGE, and this module is its shuffle-minimal DataFrame
form:

    new_snapshot = merge_changes(snapshot, changes, keys=..., order_by=...)

Semantics: for each key, the latest change (by ``order_by``, total order)
wins over the snapshot row; a key whose latest change is a delete
disappears; keys with no change keep their snapshot row unchanged.

Scale notes (100 TB snapshot, ~GB-scale delta batch):

- The union+rank plan below shuffles snapshot ∪ changes once on the key —
  correct at any size and ideal when the delta is a large fraction of the
  snapshot (backfills, replays).
- For small deltas the right physical strategy is partition-pruned
  rewrite: derive the distinct partition values touched by ``changes``,
  anti-join/filter only those partitions of the snapshot, merge, and
  dynamic-partition-overwrite them back (see
  ``operators/incremental.py:incremental_refresh`` — the same
  watermark/overwrite contract).  ``merge_changes`` is the merge kernel
  either way; callers choose how much of the snapshot to feed it.
- Ties are broken by the caller's ``order_by`` columns, which must form a
  total order per key (e.g. ``(ts, event_id)``) — without it, "latest"
  is nondeterministic under replay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    delete_col: str = "is_delete",
) -> DataFrame:
    """Apply a keyed changelog onto a snapshot: latest change per key wins,
    deletes drop the key, untouched keys pass through.

    ``snapshot`` must carry the key + payload columns; ``changes`` the same
    columns plus ``order_by`` ordering columns and a boolean ``delete_col``.
    The snapshot is treated as older than every change (changes are the
    delta *since* the snapshot was taken), so ordering columns on the
    snapshot side are not required to be comparable across the two inputs.
    Returns the new snapshot with the snapshot's column set.
    """
    out_cols = snapshot.columns
    missing = [c for c in out_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot columns: {missing}")

    ord_types = {c: changes.schema[c].dataType for c in order_by}
    snap = snapshot.select(
        *out_cols,
        F.lit(False).alias(delete_col),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(ord_types[c]).alias(f"_ord_{c}") for c in order_by],
    )
    chg = changes.select(
        *out_cols,
        # NULL in the delete flag means "not a delete" (an upsert), never
        # "delete": without the coalesce, ~NULL filters the rank-1 row out
        # and the key silently VANISHES as if deleted
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False)).alias(
            delete_col
        ),
        F.lit(1).alias("_src"),
        *[F.col(c).alias(f"_ord_{c}") for c in order_by],
    )
    # One hash shuffle on the key; rank newest-first with the snapshot
    # ranked below every change (_src ASC after the DESCs puts src=0 last).
    w = Window.partitionBy(*keys).orderBy(
        F.col("_src").desc(),
        *[F.col(f"_ord_{c}").desc_nulls_last() for c in order_by],
    )
    return (
        snap.unionByName(chg)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col(delete_col))
        .select(*out_cols)
    )
