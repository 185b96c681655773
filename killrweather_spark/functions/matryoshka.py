"""Matryoshka (dimension-truncated) retrieval — recall curve + two-stage.

Matryoshka Representation Learning (Kusupati et al., NeurIPS 2022) trains
embeddings whose PREFIX is itself a valid lower-dimensional embedding, so
retrieval can trade accuracy for cost by truncating: a d/D-dim first pass
reads, shuffles, and multiplies d/D of the bytes.  Two operators make that
trade measurable and usable on the engine's ``embeddings`` table:

- ``matryoshka_recall_curve`` — for each truncation width d, brute-force
  top-k by d-dim cosine vs the full-width ground truth, mean recall@k in
  integer micro-units.  The curve is the evidence a pipeline needs before
  committing to a cheap first pass (the ``ann_ivf_probe_curve`` pattern,
  applied to width instead of probe depth).
- ``matryoshka_two_stage`` — the production shape the curve justifies:
  shortlist at a narrow width, then EXACT full-width rescore of the
  shortlist only (the ``ann_int8_rescored`` two-stage pattern with width
  as the compression axis).  Per query the full-width work drops from
  |corpus| dot products to |shortlist|.

Scale posture: both stages are the engine's standard quantized-component
shape — (vec_id, pos, q) int64 rows, broadcast query side, map-side
pos-join, one groupBy per dot product — and the truncated pass filters
``pos <= d`` BEFORE the join, so the saving is real scan/shuffle bytes,
not post-hoc masking.  All arithmetic is the exact fixed-point convention
(``similarity.QUANT``): integer dots, one final IEEE division per cosine,
deterministic (cosine DESC, neighbor_id) ranking — DuckDB replays every
step value-exactly.

Reference parity: the reference has no vector surface; this extends the
beyond-reference similarity family (SURVEY §2 extension block).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from killrweather_spark.functions.similarity import (
    cosine_norms,
    quantized_components,
)
from killrweather_spark.plans.caching import persist_once

TRUNC_DIMS = (8, 16, 32, 64)


def _truncated_topk(
    comp: DataFrame,
    query_pred,
    dim: int,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``k`` neighbors per query by cosine over the first ``dim``
    components of an already-quantized (id, pos, q) frame.  Rows whose
    truncated vector is all-zero are excluded on BOTH sides (cosine
    undefined; mirrors ``cosine_norms``'s zero-norm rule per width)."""
    tcomp = comp.filter(F.col("pos") <= dim)
    nrm = cosine_norms(tcomp, id_col)
    qcomp = tcomp.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ccomp = tcomp.select(
        F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb")
    )
    dots = (
        F.broadcast(qcomp)
        .join(ccomp, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = nrm.select(
        F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2")
    ).filter(query_pred(F.col("query_id")))
    cn = nrm.select(
        F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2")
    )
    sims = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("qnorm2")) * F.sqrt(F.col("nnorm2"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def matryoshka_recall_curve(
    df: DataFrame,
    query_pred,
    k: int = 10,
    dims: Sequence[int] = TRUNC_DIMS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean recall@``k`` of d-dim-truncated retrieval vs full-width truth,
    one row per truncation width.

    recall is summed as integer hit counts and reduced to micro-units with
    integer division — order-free exact.  Queries whose truncated vector
    is all-zero at some width drop out of that width's mean (``n_queries``
    records the survivors); the widest entry of ``dims`` doubles as the
    self-check row (recall ≡ 1.0 against itself).
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    full_dim = max(dims)
    # ONE brute-force pos-join computes every width's dot products as
    # per-width CONDITIONAL sums over the full-width pair rows (r13,
    # guide §1.2/§2.4): the old per-width loop replayed the N·|queries|
    # join + (query, neighbor) groupBy + rank window once per width —
    # Σd component rows multiplied and 4 corpus-scale Exchanges where one
    # suffices.  Width-d equivalence is exact by construction:
    #  - dot_d  = Σ qa·qb over shared pos <= d  ≡ the old pos<=d inner
    #    join's sum (a pos missing on either side contributed nothing);
    #  - cnt_d > 0 reproduces the old width-d PAIR SET (the pos<=d inner
    #    join emitted a pair iff it shares >= 1 component position);
    #  - norm2_d per vector (same conditional sum) reproduces
    #    cosine_norms(tcomp)'s per-width zero-norm exclusion on both
    #    sides.
    # (An r13 array-dot rewrite of _truncated_topk — one-row query
    # broadcast + zip_with/aggregate fold — was A/B'd 15-20% SLOWER
    # at sf0.1: the higher-order-function fold does not reach
    # whole-stage codegen, while the pos-join + partial agg does.)
    qcomp = comp.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ccomp = comp.select(
        F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb")
    )
    dot_aggs = []
    for d in dims:
        dot_aggs.append(
            F.sum(
                F.when(F.col("pos") <= d, F.col("qa") * F.col("qb"))
            ).alias(f"dot_{d}")
        )
        dot_aggs.append(
            F.count(F.when(F.col("pos") <= d, F.lit(1))).alias(f"cnt_{d}")
        )
    pairs = (
        F.broadcast(qcomp)
        .join(ccomp, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(*dot_aggs)
    )
    norms = comp.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("pos") <= d, F.col("q") * F.col("q"))
            ).alias(f"norm2_{d}")
            for d in dims
        ]
    )
    qn = norms.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"norm2_{d}").alias(f"qnorm2_{d}") for d in dims],
    )
    cn = norms.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"norm2_{d}").alias(f"nnorm2_{d}") for d in dims],
    )
    sims = (
        pairs.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .transform(persist_once)
    )

    def ranked(d: int) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            (F.col(f"dot_{d}")
             / (F.sqrt(F.col(f"qnorm2_{d}")) * F.sqrt(F.col(f"nnorm2_{d}"))))
            .desc(),
            F.col("neighbor_id").asc(),
        )
        return (
            sims.filter(
                (F.col(f"cnt_{d}") > 0)
                & (F.col(f"qnorm2_{d}") > 0)
                & (F.col(f"nnorm2_{d}") > 0)
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id")
        )

    truth = ranked(full_dim).transform(persist_once)
    curves = []
    for d in dims:
        approx = truth if d == full_dim else ranked(d)
        hits = (
            approx.join(truth, ["query_id", "neighbor_id"])
            .groupBy()
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        nq = approx.select("query_id").distinct().groupBy().agg(
            F.count(F.lit(1)).alias("n_queries")
        )
        curves.append(
            hits.crossJoin(nq).select(
                F.lit(d).cast("int").alias("trunc_dim"),
                F.col("n_queries").cast("bigint"),
                F.expr(f"(1000000 * hits) div ({k} * n_queries)")
                .cast("bigint")
                .alias("mean_recall_micro"),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out


def matryoshka_two_stage(
    df: DataFrame,
    query_pred,
    shortlist: int = 25,
    k: int = 5,
    stage_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: shortlist by ``stage_dim``-truncated cosine,
    exact full-width rescore of the shortlist, final top-``k``.

    The full-width pass joins components ONLY for (query, shortlisted
    neighbor) pairs — ``shortlist``·|queries| rows instead of |corpus| —
    so at 100 TB the wide vectors are read for a vanishing fraction of
    the corpus (and could live in colder storage than the truncated
    prefix index).
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    cand = _truncated_topk(comp, query_pred, stage_dim, shortlist, id_col).select(
        "query_id", "neighbor_id"
    )
    nrm = cosine_norms(comp, id_col)
    qcomp = comp.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ncomp = comp.select(
        F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb")
    )
    rescored = (
        F.broadcast(cand)
        .join(qcomp, "query_id")
        .join(ncomp, ["neighbor_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = nrm.select(
        F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2")
    ).filter(query_pred(F.col("query_id")))
    cn = nrm.select(
        F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2")
    )
    sims = (
        rescored.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("qnorm2")) * F.sqrt(F.col("nnorm2"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
