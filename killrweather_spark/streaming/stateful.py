"""Custom stateful streaming operators — ``applyInPandasWithState``.

The built-in stateful ops (windowed agg, dropDuplicates, session_window)
cover the reference's needs; this module is the extension point for
semantics Spark lacks, using the Arrow-batched state API
(SURVEY §2.10 / system brief: "applyInPandasWithState for custom stateful
operators").

Scale posture: state is per-group (keyed by the grouping columns), stored in
the state store (HDFS/RocksDB) — memory is bounded by (groups × state row),
never by stream length; Arrow batches bound the per-task Python transfer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_max_by_key(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running maximum as a custom stateful operator.

    Equivalent batch semantics: ``SELECT key, MAX(value) GROUP BY key`` —
    but maintained incrementally across microbatches with explicit state
    (the pattern for any custom monoid the built-in aggs don't cover:
    t-digests, HLL sketches, decaying counters...).  Emits the key's new
    maximum whenever it changes (update-mode semantics).
    """
    out_schema = f"{key_col} bigint, max_{value_col} double"
    state_schema = "mx double"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mx = state.get[0] if state.exists else None
        for pdf in pdfs:
            batch_max = float(pdf[value_col].max())
            if mx is None or batch_max > mx:
                mx = batch_max
        state.update((mx,))
        yield pd.DataFrame({key_col: [key[0]], f"max_{value_col}": [mx]})

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
