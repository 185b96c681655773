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
    import pandas as pd  # noqa: F401 (documents the dependency)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} bigint"

    def normalize(pdf):
        n = len(pdf)
        if n == 1:
            pdf[out_col] = 0
        else:
            ranks = pdf[value_col].rank(method="min").astype("int64")
            pdf[out_col] = (ranks - 1) * 1_000_000 // (n - 1)
        return pdf

    return df.groupBy(key_col).applyInPandas(normalize, schema=out_schema)
