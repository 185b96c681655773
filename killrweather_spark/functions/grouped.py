"""Grouped-map Pandas operators — batch ``applyInPandas``.

Completes the sanctioned Python surface (SURVEY §2.10): ``mapInPandas``
(multimodal.py, stateless batches), ``applyInPandasWithState``
(streaming/stateful.py), and here the batch grouped-map form — whole group
in, whole group out, Arrow both ways.

When to reach for this: per-group logic that needs the *entire* group
materialized (model fits, order-dependent passes, library calls). Anything
expressible as window/aggregate expressions should stay JVM-side — this
module's rank-normalize exists precisely so the Arrow grouped-map path has
a value-exact oracle proving the plumbing (schema, grouping, batch
round-trip) correct; production users swap the body, keep the harness.

Scale: one shuffle on the grouping key; each group must fit in one
executor's memory as a pandas frame (spark.sql.execution.arrow
maxRecordsPerBatch bounds the Arrow batches, not the group). Skewed or
giant groups are the failure mode — salt or pre-aggregate first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rank_normalize(
    df: DataFrame, key_col: str, value_col: str, out_col: str = "pr_micro"
) -> DataFrame:
    """Within-group min-rank percentile in exact integer micro-units:
    ``(rank-1)·10⁶ div (n-1)`` with min-rank tie semantics (SQL ``RANK()``)
    — bit-identical to the window-function formulation on any engine.
    Singleton groups map to 0.
    """
    import numpy as np
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"

    def normalize(pdf):
        # numpy min-rank (unique + counts-cumsum) and a dict-built output
        # frame: pandas .rank() plus in-place column assignment paid a
        # frame copy per GROUP, and grouped-map dispatch is per group —
        # r13 session 6, ~25% off the per-group body.  Semantics are
        # RANK()'s min-rank ties, identical to .rank(method="min").
        n = len(pdf)
        if n == 1:
            pr = np.zeros(1, dtype="int64")
        else:
            vals = pdf[value_col].to_numpy()
            _, inv, cnt = np.unique(
                vals, return_inverse=True, return_counts=True
            )
            starts = np.cumsum(cnt) - cnt  # 0-based min-rank per value
            pr = starts[inv] * 1_000_000 // (n - 1)
        data = {f: pdf[f] for f in pdf.columns}
        data[out_col] = pr
        return pd.DataFrame(data, copy=False)

    return df.groupBy(key_col).applyInPandas(normalize, schema=out_schema)
