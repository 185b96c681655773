"""Similarity search over embedding columns (``array<float>``).

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** — the exact baseline.  Embeddings are
  quantized to int64 fixed-point (×10⁶) so dot products and norms are exact
  integer arithmetic: reduction-order independent, hence reproducible across
  engines (the DuckDB oracle) and across cluster sizes.  The query side is
  tiny → broadcast; the corpus side never shuffles; per-query top-k is a
  windowed rank (bounded state).
- **LSH-bucketed (random hyperplanes)** — the 100 TB path.  K deterministic
  pseudo-hyperplanes (md5-derived weights, no RNG state) map each vector to
  a K-bit bucket; search compares only same-bucket pairs.  Bucket keys are
  uniform by construction → skew-free shuffle; recall/probe tradeoff via
  multi-probe (flip one bit) if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from killrweather_spark.plans.caching import persist_once
from killrweather_spark.functions.sqlutil import qualify_pred

QUANT = 1_000_000  # fixed-point scale for float32 embeddings


def quantized_components(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """(id, pos, q) with q = round(component · 10⁶) as int64 — exact."""
    return df.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "v")
    ).select(
        id_col,
        (F.col("pos") + 1).alias("pos"),  # 1-based to match SQL array indexing
        F.round(F.col("v").cast("double") * QUANT).cast("bigint").alias("q"),
    )


def norms(components: DataFrame, id_col: str = "vec_id") -> DataFrame:
    return components.groupBy(id_col).agg(
        F.sum(F.col("q") * F.col("q")).alias("norm2")
    )


def cosine_norms(components: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Norms for COSINE ranking: zero-norm vectors (all components quantize
    to 0) are excluded — their cosine is undefined, and under Spark 4's
    default ANSI mode the division would otherwise throw DIVIDE_BY_ZERO and
    abort the whole query on one bad row.  Every cosine oracle mirrors the
    exclusion with ``HAVING SUM(q * q) > 0``.  Norm STATISTICS
    (docs_embedding_norms) keep the unfiltered :func:`norms` — a zero
    vector is a legitimate data point there."""
    return norms(components, id_col).filter(F.col("norm2") > 0)


def cosine_topk(
    df: DataFrame,
    query_ids_filter,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the rows matching
    ``query_ids_filter`` (a Column predicate on the id), excluding self.

    Output: (query_id, neighbor_id, cosine) with deterministic
    (cosine DESC, neighbor_id ASC) ranking.
    """
    # r12 pos-join form, RESTORED in r13 session 5 after A/B'ing the
    # session-2 zip_with/aggregate array-dot fold: that fold is
    # CodegenFallback (interpreted per element), ~1.8× slower at sf1
    # on cosine_topk itself and on every truth-building consumer
    # (ann_ivfpq_recall 6.8→3.4 s, alternating fresh-JVM legs), while
    # at sf0.1 the two forms tie.  It also forfeits the comp cache the
    # rest of the similarity family shares in-session.  The shared
    # persisted component index IS the production layout (the
    # precomputed index stored next to the vectors), so the pos-join +
    # partial-agg form is both the codegen'd and the cache-shared one.
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)

    qcomp = comp.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ccomp = comp.select(
        F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb")
    )

    # query side is k·dims rows — broadcast it; the corpus side streams.
    dots = (
        F.broadcast(qcomp)
        .join(ccomp, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    # qn carries a broadcast hint: bound it to the QUERY ids first —
    # hinting the corpus-sized norms frame would ship the whole corpus
    # to every executor at scale even though only the query rows match.
    # The bound is a broadcast semi against the (tiny, unique-id) query
    # predicate on the source frame: map-side, no extra shuffle.
    qids = df.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id")
    )
    qn = nrm.select(
        F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2")
    ).join(F.broadcast(qids), "query_id")
    cn = nrm.select(
        F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2")
    )
    sims = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot")
            / (F.sqrt(F.col("qnorm2")) * F.sqrt(F.col("nnorm2"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def hard_negative_topk(
    df: DataFrame,
    query_pred,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for each
    query vector, the top-``k`` most-similar vectors whose LABEL differs —
    the near-misses a bi-encoder must learn to push away (in-batch random
    negatives are too easy; the hard ones live at the decision boundary).

    Shape: the query side (``query_pred`` on the id — in production the
    arriving training batch) is tiny and broadcast; the corpus side is one
    map-side pos-join scan with per-query bounded top-k state
    (TakeOrdered-style window).  At 100 TB the flat corpus scan is replaced
    by probes of the persisted IVF index (``ann_index.ivf_probe_topk``)
    with the label-mismatch filter applied to the probed candidates — the
    margin/rank semantics are unchanged, which is why this exact form is
    the oracle-checked baseline (the semantic_eval_screen precedent).

    Output: (query_id, query_label, negative_id, negative_label, cosine),
    deterministic (cosine DESC, negative_id ASC) top-k per query.
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    lab = df.select(F.col(id_col), F.col(label_col).alias("__lab"))

    qcomp = comp.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ccomp = comp.select(
        F.col(id_col).alias("negative_id"), "pos", F.col("q").alias("qb")
    )
    dots = (
        F.broadcast(qcomp)
        .join(ccomp, "pos")
        .filter(F.col("query_id") != F.col("negative_id"))
        .groupBy("query_id", "negative_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    # the broadcast-hinted query-side frames are bounded to the QUERY
    # ids first — hinting corpus-sized norms/labels would ship the whole
    # corpus to every executor at scale.  The bound is a broadcast semi
    # against the (tiny, unique-id) query predicate on the source frame:
    # map-side, no extra shuffle.
    qids = df.filter(query_pred(F.col(id_col))).select(
        F.col(id_col).alias("query_id")
    )
    qn = nrm.select(
        F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2")
    ).join(F.broadcast(qids), "query_id")
    cn = nrm.select(
        F.col(id_col).alias("negative_id"), F.col("norm2").alias("nnorm2")
    )
    ql = lab.select(
        F.col(id_col).alias("query_id"), F.col("__lab").alias("query_label")
    ).join(F.broadcast(qids), "query_id")
    cl = lab.select(
        F.col(id_col).alias("negative_id"),
        F.col("__lab").alias("negative_label"),
    )
    sims = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "negative_id")
        .join(F.broadcast(ql), "query_id")
        .join(cl, "negative_id")
        # hard NEGATIVES: same-label candidates are positives — excluded
        # before the rank so each kept slot is a usable training negative
        .filter(F.col("query_label") != F.col("negative_label"))
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("qnorm2")) * F.sqrt(F.col("nnorm2"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "query_label", "negative_id", "negative_label",
            "cosine",
        )
    )


def hard_negative_topk_sql(k: int = 5, query_pred_sql: str = "vec_id < 20",
                           comp_nrm_sql: str | None = None) -> str:
    """DuckDB oracle replaying :func:`hard_negative_topk` — identical
    integer dots/norms, identical label-mismatch filter, identical
    (cosine DESC, id ASC) rank."""
    head = f"WITH {comp_nrm_sql}," if comp_nrm_sql else "WITH"
    return f"""
    {head}
    lab AS (SELECT vec_id, label FROM embeddings),
    dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS negative_id,
             SUM(a.q * b.q) AS dot
      FROM comp a JOIN comp b ON b.pos = a.pos AND b.vec_id != a.vec_id
      WHERE {qualify_pred(query_pred_sql, "a")}
      GROUP BY 1, 2
    )
    SELECT d.query_id, CAST(la.label AS INT) AS query_label,
           d.negative_id, CAST(lb.label AS INT) AS negative_label,
           d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) AS cosine
    FROM dots d
    JOIN nrm na ON na.vec_id = d.query_id
    JOIN nrm nb ON nb.vec_id = d.negative_id
    JOIN lab la ON la.vec_id = d.query_id
    JOIN lab lb ON lb.vec_id = d.negative_id
    WHERE la.label != lb.label
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY d.query_id
      ORDER BY d.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) DESC, d.negative_id
    ) <= {k}
    """


MARGIN_QUERY_MAX_ID = 40  # bounded mining batch: even-parity ids below this
MARGIN_K = 4  # neighborhood size for both margin denominators


def margin_mining_pairs(
    df: DataFrame,
    k: int = MARGIN_K,
    query_max_id: int = MARGIN_QUERY_MAX_ID,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Margin-based pair mining (Artetxe & Schwenk 2019, the CCMatrix /
    LASER bitext miner): score a candidate pair (x, y) not by raw cosine
    but by its RATIO to the mean similarity of each side's own k-NN
    neighborhood — margin(x,y) = cos(x,y) / ((μₖ(x) + μₖ(y)) / 2).  Raw
    cosine mines hubs (vectors near everything); the margin normalizes
    each side by how crowded its neighborhood is, which is what makes
    mined parallel corpora usable as training data.

    Sides are the two label parities (≙ the two languages / modalities
    sharing one embedding space); the mining batch is the even-parity
    vectors with id < ``query_max_id`` (in production the arriving shard —
    the bounded-query-window pattern every *_fixed screen twin uses).

    Cross-engine exactness: per-pair cosine is one IEEE expression over
    integer dots/norms; each neighborhood mean is kept ORDER-FREE by
    summing ROUND(cos·10⁶) as int64 micro-units, and the margin is a
    single double division of two exact integers — no float reduction
    anywhere.  margin = 2·cmic·nₓ·n_y / (Σₓ·n_y + Σ_y·nₓ) IS the textbook
    mean-of-means ratio cos / ((Σₓ/nₓ + Σ_y/n_y) / 2) with both sides
    scaled by 10⁶·nₓ·n_y — exact even when one side has fewer than k
    neighbors (nₓ ≠ n_y), where a pooled mean would overweight the
    larger neighborhood.  Pairs whose combined scaled neighborhood mass
    Σₓ·n_y + Σ_y·nₓ is ≤ 0 (both k-NN lists anti-correlated) are
    EXCLUDED on both engines: the ratio's sign flips and it stops being
    a margin; such queries have no mineable alignment by construction.

    Scale: |candidates| ≤ |batch|·k, so the reverse-direction k-NN pass is
    bounded; both directions' flat scans become probes of the shared IVF
    index at corpus scale (the x→Y and y→X searches are exactly
    ``ivf_probe_topk`` calls), keeping the margin form unchanged.

    Output: (query_id, pair_id, cos_micro, margin, best) — every candidate
    pair with its margin; ``best`` flags the argmax-margin pair per query
    (the mined alignment).
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    par = df.select(
        F.col(id_col), (F.col(label_col) % 2).cast("int").alias("par")
    )
    compn = comp.join(par, id_col)

    def side_dots(qside: DataFrame, cside: DataFrame, qname: str,
                  cname: str) -> DataFrame:
        """Broadcast the bounded query side, pos-join the corpus side,
        attach norms, emit (qname, cname, cos, cmic)."""
        dots = (
            F.broadcast(qside.select(F.col(id_col).alias(qname), "pos",
                                     F.col("q").alias("qa")))
            .join(cside.select(F.col(id_col).alias(cname), "pos",
                               F.col("q").alias("qb")), "pos")
            .groupBy(qname, cname)
            .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
        )
        qn = nrm.select(F.col(id_col).alias(qname),
                        F.col("norm2").alias("qn2"))
        cn = nrm.select(F.col(id_col).alias(cname),
                        F.col("norm2").alias("cn2"))
        cos = F.col("dot") / (F.sqrt(F.col("qn2")) * F.sqrt(F.col("cn2")))
        return (
            dots.join(F.broadcast(qn), qname)
            .join(cn, cname)
            .select(
                qname, cname, cos.alias("cos"),
                F.round(cos * 1_000_000).cast("bigint").alias("cmic"),
            )
        )

    xq = compn.filter(
        (F.col("par") == 0) & (F.col(id_col) < query_max_id)
    )
    yc = compn.filter(F.col("par") == 1)
    fwd = side_dots(xq, yc, "query_id", "pair_id")
    wx = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("pair_id").asc()
    )
    cand = (
        fwd.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= k)
        .select("query_id", "pair_id", "cos", "cmic")
        .transform(persist_once)
    )
    dx = cand.groupBy("query_id").agg(
        F.sum("cmic").alias("dxs"), F.count(F.lit(1)).alias("nx")
    )
    # reverse direction: each candidate y's own k-NN neighborhood in the
    # FULL even-parity side (not just the batch) — the denominator must
    # measure y's true crowding or hubs sneak through
    ys = cand.select(F.col("pair_id").alias(id_col)).distinct()
    yq = compn.join(F.broadcast(ys), id_col).filter(F.col("par") == 1)
    xc = compn.filter(F.col("par") == 0)
    rev = side_dots(yq, xc, "pair_id", "rev_id")
    wy = Window.partitionBy("pair_id").orderBy(
        F.col("cos").desc(), F.col("rev_id").asc()
    )
    dy = (
        rev.withColumn("rk", F.row_number().over(wy))
        .filter(F.col("rk") <= k)
        .groupBy("pair_id")
        .agg(F.sum("cmic").alias("dys"), F.count(F.lit(1)).alias("ny"))
    )
    denom = (
        F.col("dxs") * F.col("ny") + F.col("dys") * F.col("nx")
    )
    margin = (
        F.lit(2) * F.col("cmic") * F.col("nx") * F.col("ny")
    ).cast("double") / denom.cast("double")
    wbest = Window.partitionBy("query_id").orderBy(
        F.col("margin").desc(), F.col("pair_id").asc()
    )
    return (
        cand.join(F.broadcast(dx), "query_id")
        .join(F.broadcast(dy), "pair_id")
        .filter(denom > 0)
        .withColumn("margin", margin)
        .withColumn("best", F.row_number().over(wbest) == 1)
        .select("query_id", "pair_id", "cmic", "margin", "best")
        .withColumnRenamed("cmic", "cos_micro")
    )


def margin_mining_pairs_sql(
    k: int = MARGIN_K,
    query_max_id: int = MARGIN_QUERY_MAX_ID,
    comp_nrm_sql: str | None = None,
) -> str:
    """DuckDB oracle replaying :func:`margin_mining_pairs`: same parity
    split, same top-k tiebreaks, same int64 micro-unit sums, same single
    double division for the margin."""
    head = f"WITH {comp_nrm_sql}," if comp_nrm_sql else "WITH"
    return f"""
    {head}
    par AS (SELECT vec_id, CAST(label % 2 AS INT) AS par FROM embeddings),
    xq AS (SELECT c.vec_id, c.pos, c.q FROM comp c JOIN par p USING (vec_id)
           WHERE p.par = 0 AND c.vec_id < {query_max_id}),
    yc AS (SELECT c.vec_id, c.pos, c.q FROM comp c JOIN par p USING (vec_id)
           WHERE p.par = 1),
    fwd AS (
      SELECT a.vec_id AS query_id, b.vec_id AS pair_id,
             SUM(a.q * b.q) AS dot
      FROM xq a JOIN yc b USING (pos) GROUP BY 1, 2
    ),
    fcos AS (
      SELECT f.query_id, f.pair_id,
             f.dot / (SQRT(nx.norm2) * SQRT(ny.norm2)) AS cos,
             CAST(ROUND(f.dot / (SQRT(nx.norm2) * SQRT(ny.norm2)) * 1000000)
                  AS BIGINT) AS cmic
      FROM fwd f
      JOIN nrm nx ON nx.vec_id = f.query_id
      JOIN nrm ny ON ny.vec_id = f.pair_id
    ),
    cand AS (
      SELECT query_id, pair_id, cmic FROM fcos
      QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, pair_id) <= {k}
    ),
    dx AS (SELECT query_id, SUM(cmic) AS dxs, COUNT(*) AS nx
           FROM cand GROUP BY 1),
    ys AS (SELECT DISTINCT pair_id FROM cand),
    yq AS (SELECT c.vec_id, c.pos, c.q FROM comp c
           JOIN ys ON ys.pair_id = c.vec_id),
    xc AS (SELECT c.vec_id, c.pos, c.q FROM comp c JOIN par p USING (vec_id)
           WHERE p.par = 0),
    rev AS (
      SELECT a.vec_id AS pair_id, b.vec_id AS rev_id,
             SUM(a.q * b.q) AS dot
      FROM yq a JOIN xc b USING (pos) GROUP BY 1, 2
    ),
    rcos AS (
      SELECT r.pair_id, r.rev_id,
             r.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) AS cos,
             CAST(ROUND(r.dot / (SQRT(na.norm2) * SQRT(nb.norm2)) * 1000000)
                  AS BIGINT) AS cmic
      FROM rev r
      JOIN nrm na ON na.vec_id = r.pair_id
      JOIN nrm nb ON nb.vec_id = r.rev_id
    ),
    dy AS (
      SELECT pair_id, SUM(cmic) AS dys, COUNT(*) AS ny
      FROM (SELECT pair_id, rev_id, cmic FROM rcos
            QUALIFY ROW_NUMBER() OVER (PARTITION BY pair_id
                                       ORDER BY cos DESC, rev_id) <= {k})
      GROUP BY 1
    )
    SELECT c.query_id, c.pair_id, c.cmic AS cos_micro,
           CAST(2 * c.cmic * dx.nx * dy.ny AS DOUBLE)
             / CAST(dx.dxs * dy.ny + dy.dys * dx.nx AS DOUBLE) AS margin,
           ROW_NUMBER() OVER (
             PARTITION BY c.query_id
             ORDER BY CAST(2 * c.cmic * dx.nx * dy.ny AS DOUBLE)
                      / CAST(dx.dxs * dy.ny + dy.dys * dx.nx AS DOUBLE)
                      DESC, c.pair_id
           ) = 1 AS best
    FROM cand c
    JOIN dx USING (query_id)
    JOIN dy USING (pair_id)
    WHERE dx.dxs * dy.ny + dy.dys * dx.nx > 0
    """


# --------------------------------------------------------------------------
# LSH (random-hyperplane) bucketing — the approximate/scale path
# --------------------------------------------------------------------------

def lsh_buckets(
    df: DataFrame, n_planes: int = 8, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K-bit bucket per vector: bit_j = sign(Σ_i w(j,i)·x_i).

    Weights come from md5 nibbles of (plane, pos): reproducible everywhere.
    One narrow pass (explode → weighted sum per (id, plane) → bit-string
    assembly); output (id, bucket) feeds a bucket-equality self-join.

    The weighted sum is EXACT integer arithmetic — odd integer weights
    (2·nibble − 17 ∈ {−15..15}, never 0) times the ×10⁶-quantized
    component — so bucket bits are reduction-order independent. A float
    sum here would make a near-zero projection's sign depend on partition
    count: a nondeterministic bucket assignment at 100 TB is a
    reproducibility bug, not a rounding nit.
    """
    # r13 session 5 (guide §2.4, §4.2): the former explode form computed
    # the md5 weight expression per (component, plane) ROW — 20.5 M
    # evaluations of a 1,024-value LUT at sf1 — and paid two
    # corpus-sized Exchanges ((id, plane) rollup + per-id map
    # assembly): 19.1 s of the banded screen's 48.5 s sf1 wall.  The
    # weights depend only on (plane, pos), so the kernel builds the LUT
    # once per batch (same md5-nibble formula, hashlib ≡ SQL md5) and
    # every bucket is one row-local int64 matvec — no Exchange at all.
    # Same integers, order-free sums ⇒ identical bits; the empty-vector
    # drop (posexplode emitted nothing) maps to the NULL filter, and an
    # all-null vector keeps its all-'0' bucket (SUM of no non-null
    # terms is NULL, CASE falls through) on both forms.
    nb = int(n_planes)
    qa = F.expr(
        f"transform({vec_col}, x -> "
        f"cast(round(cast(x as double) * {QUANT}) as bigint))"
    )

    @F.pandas_udf("string")
    def bucket_of(qa_s):
        import hashlib

        import numpy as _np
        import pandas as _pd

        rows = qa_s.to_list()
        maxw = 0
        for r in rows:
            if r is not None and len(r) > maxw:
                maxw = len(r)
        if maxw == 0:
            return _pd.Series([None] * len(rows), dtype=object)
        W = _np.array(
            [
                [
                    (
                        int(
                            hashlib.md5(
                                f"{j}_{i + 1}".encode()
                            ).hexdigest()[0],
                            16,
                        )
                        + 1
                    )
                    * 2
                    - 17
                    for i in range(maxw)
                ]
                for j in range(nb)
            ],
            dtype=_np.int64,
        )
        try:
            mat = _np.stack(rows)
            full = (
                mat.ndim == 2
                and mat.shape[1] == maxw
                and mat.dtype.kind in "iu"
            )
        except (TypeError, ValueError):
            full = False
        if full:
            s = mat.astype(_np.int64) @ W.T
            bits = _np.where(s >= 0, "1", "0")
            return _pd.Series(["".join(b) for b in bits])
        out = []
        for r in rows:
            if r is None or len(r) == 0:
                out.append(None)
                continue
            chars = []
            for j in range(nb):
                s = None
                for i, x in enumerate(r):
                    if x is None or x != x:
                        continue
                    t = int(W[j][i]) * int(x)
                    s = t if s is None else s + t
                chars.append("1" if (s is not None and s >= 0) else "0")
            out.append("".join(chars))
        return _pd.Series(out, dtype=object)

    return (
        df.select(F.col(id_col), qa.alias("__qa"))
        .withColumn("bucket", bucket_of("__qa"))
        .filter(F.col("bucket").isNotNull())
        .select(id_col, "bucket")
    )


def ivf_cells(
    df: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    comp: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are the vectors with the ``n_centroids`` smallest ids —
    deterministic (no RNG/k-means state), which is what reproducible
    100 TB re-partitioning needs; swap in trained k-means centroids behind
    the same (id, cell) contract.  Assignment = argmax cosine against the
    broadcast centroid set: the corpus streams once, never shuffles until
    the (id, cell) groupBy, and cells are the IVF inverted lists.

    ``comp`` lets a caller that already holds (and persisted) the
    quantized component table pass it in, so the posexplode/quantize pass
    runs once per screen invocation instead of being re-derived here.
    """
    if comp is None:
        comp = quantized_components(df, id_col, vec_col)
    cent = comp.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), "pos", F.col("q").alias("cq")
    )
    cnorm = (
        cent.groupBy("cell")
        .agg(F.sum(F.col("cq") * F.col("cq")).alias("cnorm2"))
        .filter(F.col("cnorm2") > 0)  # zero-norm centroid: cosine undefined
    )
    nrm = cosine_norms(comp, id_col)
    dots = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cell")
        .agg(F.sum(F.col("q") * F.col("cq")).alias("dot"))
    )
    scored = dots.join(F.broadcast(cnorm), "cell").join(
        F.broadcast(nrm.withColumnRenamed("norm2", "vnorm2")), id_col
    ).withColumn(
        "sim", F.col("dot") / (F.sqrt(F.col("cnorm2")) * F.sqrt(F.col("vnorm2")))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(id_col, "cell")
    )


def ivf_cosine_topk(
    df: DataFrame,
    query_ids_filter,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: rank only vectors in the query's ``n_probe``
    closest cells — the classic recall/latency dial.  At 100 TB the corpus
    is stored partitioned by cell (inverted lists), so a probe reads
    ``n_probe / n_centroids`` of the data with partition pruning doing the
    skipping; here cells live in a column and the same restriction happens
    via the candidate join.
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    cent = comp.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), "pos", F.col("q").alias("cq")
    )
    cnorm = (
        cent.groupBy("cell")
        .agg(F.sum(F.col("cq") * F.col("cq")).alias("cnorm2"))
        .filter(F.col("cnorm2") > 0)  # zero-norm centroid: cosine undefined
    )

    # per-query: its n_probe nearest cells
    qcomp = comp.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    qdots = (
        F.broadcast(qcomp)
        .join(cent, "pos")
        .groupBy("query_id", "cell")
        .agg(F.sum(F.col("qa") * F.col("cq")).alias("dot"))
        .join(F.broadcast(cnorm), "cell")
    )
    wq = Window.partitionBy("query_id").orderBy(
        (F.col("dot") / F.sqrt(F.col("cnorm2"))).desc(), F.col("cell").asc()
    )
    probes = (
        qdots.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= n_probe)
        .select("query_id", "cell")
    )

    cells = ivf_cells(df, n_centroids, id_col, vec_col, comp=comp)
    cand = (
        F.broadcast(probes)
        .join(cells.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    ccomp = comp.select(F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb"))
    dots = (
        F.broadcast(cand)
        .join(qcomp, "query_id")
        .join(ccomp, ["neighbor_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = nrm.select(F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2"))
    cn = nrm.select(F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2"))
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
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ann_cosine_topk_lsh(
    df: DataFrame,
    query_ids_filter,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact (quantized) cosine ranking within candidates."""
    buckets = lsh_buckets(df, n_planes, id_col, vec_col).transform(persist_once)
    # components come straight from df — joining the bucket column in first
    # would cost a full extra shuffle of the corpus for a column the
    # projection never reads (buckets only drive the candidate-pair join)
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    b = buckets
    qb = b.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "bucket"
    )
    cand = qb.join(b.select(F.col(id_col).alias("neighbor_id"), "bucket"), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    qcomp = comp.select(F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa"))
    ccomp = comp.select(F.col(id_col).alias("neighbor_id"), "pos", F.col("q").alias("qb"))
    dots = (
        F.broadcast(cand)
        .join(qcomp, "query_id")
        .join(ccomp, ["neighbor_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = nrm.select(F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2"))
    cn = nrm.select(F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2"))
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
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def eval_probe_buckets(
    eval_buckets: DataFrame, n_planes: int, id_col: str = "eval_id"
) -> DataFrame:
    """Multi-probe expansion of the EVAL side's LSH buckets: the exact
    bucket plus every 1-bit flip — ``n_planes + 1`` probe rows per eval
    vector, all distinct strings (probe p flips exactly bit p; the exact
    bucket flips none), so a (train, eval) pair can match at most ONE
    probe and the candidate join needs no dedup shuffle.

    Probing the SMALL side is the multi-probe trick that buys Hamming-1
    recall without re-bucketing the corpus: the train side keeps one bucket
    per vector (one narrow pass at index-build time), and the probe table
    stays |eval| × (planes+1) rows — broadcastable by construction.
    """
    p = F.col("p")
    flipped = F.concat(
        F.expr("substr(bucket, 1, p - 1)"),
        F.when(F.expr("substr(bucket, p, 1)") == "1", F.lit("0")).otherwise(
            F.lit("1")
        ),
        F.expr("substr(bucket, p + 1)"),
    )
    return eval_buckets.select(
        id_col,
        "bucket",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes))).alias("p"),
    ).select(
        id_col,
        F.when(p == 0, F.col("bucket")).otherwise(flipped).alias("bucket"),
    )


#: In-process memo of collected eval sides keyed by (session identity,
#: semantic hash of the ANALYZED bounded-collect plan — lineage + filter
#: + cap all included).  The screen family re-collects the same few
#: thousand eval rows for every variant in a bench/oracle session; one
#: driver job per distinct eval side amortizes that (the pq.py
#: _SCREEN_STATE pattern).  Dies with the process — every invocation
#: still computes from the parquet inputs.
_EVAL_SIDE_MEMO: dict = {}


def _collected_eval_side(quant: DataFrame, is_eval, id_col: str) -> list:
    """The bounded eval-side collect shared by the Arrow verify legs:
    zero-norm-filtered, id-ascending, capped at ``EVAL_COLLECT_CAP + 1``
    rows so overflow is detectable without ever materializing more."""
    bounded = (
        quant.filter(is_eval)
        .filter(F.col("__norm2") > 0)
        .select(id_col, "__qv", "__norm2")
        .orderBy(id_col)
        .limit(EVAL_COLLECT_CAP + 1)
    )
    try:
        key = (
            id(quant.sparkSession),
            bounded._jdf.queryExecution().analyzed().semanticHash(),  # noqa: SLF001
        )
    except Exception:  # noqa: BLE001 — internal surface moved: no memo
        key = None
    if key is not None and key in _EVAL_SIDE_MEMO:
        return _EVAL_SIDE_MEMO[key]
    rows = bounded.collect()
    if key is not None:
        _EVAL_SIDE_MEMO[key] = rows
    return rows


def _screen_verify_candidates_np(
    quant: DataFrame,
    cand: DataFrame,
    evals: list,
    threshold: float,
) -> DataFrame:
    """Arrow verify leg of :func:`_screen_verify_candidates`: per-train
    candidate gather + int64 matvec against the broadcast eval side.
    ``evals`` rows are (id, __qv, __norm2), already zero-norm-filtered
    and id-ascending (the collect is a TakeOrdered)."""
    import math

    import numpy as np

    eval_ids = np.array([r[0] for r in evals], dtype=np.int64)
    en = np.sqrt(np.array([r[2] for r in evals], dtype=np.float64))
    widths = {len(r[1]) for r in evals}
    clean = len(widths) == 1 and not any(
        v is None for r in evals for v in r[1]
    )
    emat = (
        np.array([r[1] for r in evals], dtype=np.int64) if clean else None
    )
    eraw = [list(r[1]) for r in evals]
    bc = quant.sparkSession.sparkContext.broadcast(
        (eval_ids, emat, en, eraw)
    )
    thresh = float(threshold)

    def kernel(batches):
        import pandas as pd

        ids_, em_, en_, eraw_ = bc.value
        d = em_.shape[1] if em_ is not None and em_.ndim == 2 else -1

        def pair_dot(qv, ev):
            # exact pos-join semantics: shared positions only, a null
            # (or NaN-upcast) component on either side contributes
            # nothing, no non-null term at all => no pair row
            m = min(len(qv), len(ev))
            acc = None
            for i in range(m):
                x, y = qv[i], ev[i]
                if x is None or x != x or y is None or y != y:
                    continue
                t = int(x) * int(y)
                acc = t if acc is None else acc + t
            return acc

        for pdf in batches:
            out_t, out_e, out_c = [], [], []
            for tid, qv, n2, cands in zip(
                pdf["train_id"], pdf["__qv"], pdf["__norm2"],
                pdf["__cands"],
            ):
                if qv is None or len(cands) == 0:
                    continue
                ca = np.asarray(cands, dtype=np.int64)
                pos = np.searchsorted(ids_, ca)
                ok = pos < len(ids_)
                pos0 = np.where(ok, pos, 0)
                ok &= ids_[pos0] == ca
                if not ok.any():
                    continue
                idxv = pos0[ok]
                tn = math.sqrt(float(n2))
                qarr = np.asarray(qv)
                if (
                    em_ is not None
                    and qarr.ndim == 1
                    and qarr.shape[0] == d
                    and qarr.dtype.kind in "iu"
                ):
                    dots = em_[idxv] @ qarr.astype(np.int64)
                    cos = dots / (tn * en_[idxv])
                    keep = cos >= thresh
                    for j in np.nonzero(keep)[0]:
                        out_t.append(int(tid))
                        out_e.append(int(ids_[idxv[j]]))
                        out_c.append(float(cos[j]))
                else:
                    qlist = list(qv)
                    for j in idxv:
                        acc = pair_dot(qlist, eraw_[j])
                        if acc is None:
                            continue
                        c = acc / (tn * en_[j])
                        if c >= thresh:
                            out_t.append(int(tid))
                            out_e.append(int(ids_[j]))
                            out_c.append(float(c))
            yield pd.DataFrame(
                {"train_id": out_t, "eval_id": out_e, "cosine": out_c}
            )

    g = cand.groupBy("train_id").agg(
        F.sort_array(F.collect_list("eval_id")).alias("__cands")
    )
    t = (
        quant.filter(F.col("__norm2") > 0)
        .withColumnRenamed(quant.columns[0], "train_id")
        .join(g, "train_id")
    )
    sims = t.mapInPandas(
        kernel, "train_id bigint, eval_id bigint, cosine double"
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("cosine").desc(), F.col("eval_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("train_id", "eval_id", "cosine")
    )


def _screen_verify_candidates(
    comp: DataFrame,
    nrm: DataFrame,
    cand: DataFrame,
    eval_filter,
    threshold: float,
    id_col: str,
    df: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact quantized-cosine verification of (train_id, eval_id) candidate
    pairs + threshold + best-eval-per-train — the verify kernel shared by
    the LSH screen variants (Hamming-1 multi-probe and banded OR) and the
    IVF screen.  Candidate pairs must be DISTINCT (every caller
    constructs them that way); a duplicate pair would double its dot in
    the relational path.

    r13 session 5 (guide §4.2): when the caller passes ``df``, the eval
    side — small by the family's own premise — is collected under the
    same ``EVAL_COLLECT_CAP`` TakeOrdered guard the vectorized screen
    uses and broadcast to an Arrow kernel; candidates group per train id
    (ONE narrow |cand|-row shuffle of two int64s) and each train row
    scores its own candidate set with one int64 matvec against the
    broadcast eval matrix.  The former per-component join shuffled
    |cand|·dims rows through a hash aggregate — 64× the rows — and was
    the dominant stage of every variant's sf1 wall.  Values are
    bit-identical: int64 dots, float64 ``dot / (sqrt(tn2)·sqrt(en2))``
    in the same operand order, null/ragged rows routed to an exact
    per-pair fallback that mirrors the pos-join semantics.  An
    eval_filter matching more than the cap falls back to the relational
    kernel below — on-cluster at any scale, no driver collect."""
    if df is not None:
        quant = _quantized_rows(df, id_col, vec_col)
        is_eval = eval_filter(F.col(id_col))
        evals = _collected_eval_side(quant, is_eval, id_col)
        if len(evals) <= EVAL_COLLECT_CAP:
            return _screen_verify_candidates_np(
                quant, cand, evals, threshold
            )
    tcomp = comp.select(
        F.col(id_col).alias("train_id"), "pos", F.col("q").alias("qt")
    )
    ecomp = comp.filter(eval_filter(F.col(id_col))).select(
        F.col(id_col).alias("eval_id"), "pos", F.col("q").alias("qe")
    )
    dots = (
        cand.join(tcomp, "train_id")
        .join(F.broadcast(ecomp), ["eval_id", "pos"])
        .groupBy("train_id", "eval_id")
        .agg(F.sum(F.col("qt") * F.col("qe")).alias("dot"))
    )
    tn = nrm.select(F.col(id_col).alias("train_id"), F.col("norm2").alias("tnorm2"))
    en = nrm.select(F.col(id_col).alias("eval_id"), F.col("norm2").alias("enorm2"))
    sims = (
        dots.join(tn, "train_id")
        .join(F.broadcast(en), "eval_id")
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("tnorm2")) * F.sqrt(F.col("enorm2"))),
        )
        .filter(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("cosine").desc(), F.col("eval_id").asc()
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("train_id", "eval_id", "cosine")
    )


def banded_keys(
    buckets: DataFrame,
    n_bands: int,
    band_planes: int,
    out_id: str,
    id_col: str = "vec_id",
) -> DataFrame:
    """(out_id, band, key) banding of an ``(id, bucket)`` bit-string table:
    band b's key is bits ``[b·k+1, (b+1)·k]`` of the bucket — the
    AND-within-band layout.  Shared by :func:`semantic_screen_lsh_banded`
    and the scale-sweep candidate-volume guard, so the guard can never
    measure a different key construction than the shipped screen."""
    return buckets.select(
        F.col(id_col).alias(out_id),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        "bucket",
    ).select(
        out_id,
        "band",
        F.expr(f"substr(bucket, band * {band_planes} + 1, {band_planes})")
        .alias("key"),
    )


def semantic_screen_lsh_banded(
    df: DataFrame,
    eval_filter,
    threshold: float = 0.8,
    n_bands: int = 4,
    band_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded-OR LSH contamination screen — the recall dial of the family.

    Where :func:`semantic_screen_lsh` probes Hamming-1 neighbors of ONE
    n-plane bucket, this computes ``n_bands · band_planes`` hyperplane bits
    and keys candidates on (band, band-bits): a pair is a candidate if ANY
    band matches — the classic AND-within-band / OR-across-bands s-curve
    (exactly the 4×4 construction the MinHash dedup path uses).  For
    per-bit agreement p the candidate probability is 1 − (1 − p^k)^L:
    near-duplicate contamination (cosine→1, p→1) is caught with
    probability → 1 while uncorrelated pairs stay out at p^k per band.
    Candidate volume is ~L/2^k of the pair product (k, L are the dial);
    pairs matching several bands are deduped by one distinct before the
    exact verify, so verification cost is per-pair once.

    Same deterministic integer bucketing, same exact verify kernel, same
    (train_id, eval_id, cosine) contract as the other variants.
    """
    total = n_bands * band_planes
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    buckets = lsh_buckets(df, total, id_col, vec_col).transform(persist_once)

    is_eval = eval_filter(F.col(id_col))
    tb = banded_keys(buckets.filter(~is_eval), n_bands, band_planes,
                     "train_id", id_col)
    eb = banded_keys(buckets.filter(is_eval), n_bands, band_planes,
                     "eval_id", id_col)
    cand = (
        tb.join(F.broadcast(eb), ["band", "key"])
        .select("train_id", "eval_id")
        .distinct()
    )
    return _screen_verify_candidates(
        comp, nrm, cand, eval_filter, threshold, id_col,
        df=df, vec_col=vec_col,
    )


def semantic_screen_lsh(
    df: DataFrame,
    eval_filter,
    threshold: float = 0.8,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed train-vs-eval contamination screen — the 100 TB form of
    :func:`semantic_screen`.

    The exact screen's dot-product groupBy shuffles O(|train| · |eval|)
    pair rows (1 B train docs × 10 k eval items = 10¹³ pairs — an outage,
    not a plan).  Here both sides go through the deterministic hyperplane
    bucketing (:func:`lsh_buckets`), the eval side expands to its bucket
    plus every 1-bit flip (:func:`eval_probe_buckets` — Hamming-1
    multi-probe on the small side), and exact quantized cosine runs ONLY
    on same-bucket candidates.  Candidate volume is
    ~|train| · |eval| · (planes+1) / 2^planes — planes is the dial that
    keeps it linear-ish in |train| (20 planes at the 1 B × 10 k example:
    ~2×10⁸ candidate pairs, a routine shuffle).  Recall vs the exact
    screen is a measured corpus statistic (`semantic_screen_recall`), the
    same QA contract `lsh_recall_eval` gives MinHash: near-duplicate
    contamination (cosine → 1) is caught with high probability, borderline
    pairs trade off against the candidate budget.

    Join shape: everything EVAL-sided broadcasts by the screen's own
    premise (eval suites are thousands of items, not billions — the probe
    table is |eval|·(planes+1) rows, the eval component/norm tables
    |eval|·dims); the candidate→TRAIN-component join carries NO broadcast
    hint — at bench SF AQE converts it on its own, at 100 TB the candidate
    list outgrows the driver and the keyed shuffle is the only correct
    plan (the Q7/Q8 lesson, applied from the start).  Everything is exact
    integer arithmetic end-to-end, so the approximate pipeline is
    deterministic and the DuckDB oracle replays it value-exactly.

    Output: (train_id, eval_id, cosine) — identical contract to
    :func:`semantic_screen`.
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    buckets = lsh_buckets(df, n_planes, id_col, vec_col).transform(persist_once)

    is_eval = eval_filter(F.col(id_col))
    eprobes = eval_probe_buckets(
        buckets.filter(is_eval).select(F.col(id_col).alias("eval_id"), "bucket"),
        n_planes,
    )
    cand = (
        buckets.filter(~is_eval)
        .select(F.col(id_col).alias("train_id"), "bucket")
        .join(F.broadcast(eprobes), "bucket")
        .select("train_id", "eval_id")
    )
    return _screen_verify_candidates(
        comp, nrm, cand, eval_filter, threshold, id_col,
        df=df, vec_col=vec_col,
    )


def ivf_cell_ranks(
    df: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    comp: DataFrame | None = None,
) -> DataFrame:
    """(id, cell, rk) — every vector's cells ranked by nearest-first:
    ``rk = 1`` is the vector's own IVF cell (what :func:`ivf_cells`
    returns), ``rk <= p`` its p probe cells.  Shared by the IVF screen's
    train assignment AND eval probing so both sides rank cells with the
    byte-identical formula.

    Ranking uses ``dot / sqrt(cnorm2)`` — the vector's own norm scales
    every cell's cosine equally, so dropping it changes nothing about the
    per-id ordering and removes any need to join the (corpus-sized) norms
    table into the ranking at all: the only shuffle is the (id, cell)
    partial aggregation, and the centroid tables broadcast by construction
    (n_centroids · dims rows).

    ``comp`` lets the caller supply its already-persisted quantized
    component table (the screen does), avoiding a second
    posexplode/quantize pass over the corpus.
    """
    if comp is None:
        comp = quantized_components(df, id_col, vec_col)
    cent = comp.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), "pos", F.col("q").alias("cq")
    )
    cnorm = (
        cent.groupBy("cell")
        .agg(F.sum(F.col("cq") * F.col("cq")).alias("cnorm2"))
        .filter(F.col("cnorm2") > 0)  # zero-norm centroid: cosine undefined
    )
    vdots = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cell")
        .agg(F.sum(F.col("q") * F.col("cq")).alias("dot"))
        .join(F.broadcast(cnorm), "cell")
    )
    w = Window.partitionBy(id_col).orderBy(
        (F.col("dot") / F.sqrt(F.col("cnorm2"))).desc(), F.col("cell").asc()
    )
    return vdots.withColumn("rk", F.row_number().over(w)).select(
        id_col, "cell", "rk"
    )


def semantic_screen_ivf(
    df: DataFrame,
    eval_filter,
    threshold: float = 0.8,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-probed train-vs-eval contamination screen — the third member of
    the screen family, for corpora where embedding mass is CLUSTERED:
    random hyperplanes split dense clusters into skewed buckets (one
    bucket carries most of the mass → the candidate join inherits the
    skew), while data-derived cells track the clusters and keep inverted
    lists balanced.

    Construction: every vector ranks the ``n_centroids`` deterministic
    centroids by :func:`ivf_cell_ranks`; each TRAIN vector belongs to its
    rank-1 cell (the IVF inverted list it would be stored in — at 100 TB
    this is the partition key, so a probe is partition pruning), each
    EVAL vector probes its ``n_probe`` nearest cells, and exact quantized
    cosine verifies only (train, eval) pairs sharing a probed cell —
    candidate volume ~|train|·|eval|·(n_probe/n_centroids) under balanced
    cells, with recall measured against the exact screen
    (`semantic_screen_recall_ivf`), not assumed.  A train vector appears
    in exactly ONE cell and eval probes are distinct cells, so a pair can
    match at most once — no dedup shuffle.  Same deterministic integer
    arithmetic and same exact verify kernel as the LSH variants, hence a
    value-exact DuckDB replay.

    Output: (train_id, eval_id, cosine) — the family contract.
    """
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    is_eval = eval_filter(F.col(id_col))
    # the screen's persisted comp feeds the ranking too — one
    # posexplode/quantize pass per invocation, not two
    ranks = ivf_cell_ranks(df, n_centroids, id_col, vec_col,
                           comp=comp).transform(persist_once)
    train_cells = (
        ranks.filter(~is_eval)
        .filter(F.col("rk") == 1)
        .select(F.col(id_col).alias("train_id"), "cell")
    )
    eval_probes = (
        ranks.filter(is_eval)
        .filter(F.col("rk") <= n_probe)
        .select(F.col(id_col).alias("eval_id"), "cell")
    )
    cand = (
        train_cells.join(F.broadcast(eval_probes), "cell")
        .select("train_id", "eval_id")
    )
    return _screen_verify_candidates(
        comp, nrm, cand, eval_filter, threshold, id_col,
        df=df, vec_col=vec_col,
    )


def ann_cosine_topk_int8(
    df: DataFrame,
    query_ids_filter,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: int8-coarse scan + exact rescore — the
    memory-bandwidth form of :func:`cosine_topk`.

    Stage 1 scores every corpus vector against the broadcast query set in
    the :func:`quantize_int8` code space (4× smaller than float32 — at
    100 TB the coarse scan IS the I/O bill, and it reads codes only,
    never the float vectors).  Code dot products are exact int64
    arithmetic, so the shortlist — top ``shortlist`` per query by int8
    cosine, ties to the smallest neighbor — is deterministic and
    oracle-replayable.  Stage 2 rescores ONLY the shortlist with the
    exact ×10⁶ quantized cosine (the float-precision read is
    |queries|·shortlist vectors, not the corpus) and returns the top k.

    Approximation contract: recall vs :func:`cosine_topk` depends on how
    well int8 cosine preserves the true ranking near the cut (symmetric
    per-vector quantization keeps relative error ~1/127); the shortlist
    size is the dial, and the rescore stage means returned cosines are
    always exact.  Zero-norm vectors quantize to all-zero codes and are
    excluded from both stages, mirroring the cosine family's contract.

    Output: (query_id, neighbor_id, cosine) — exact cosine, same contract
    as :func:`cosine_topk`.
    """
    codes = quantize_int8(df, id_col, vec_col).transform(persist_once)
    comp8 = codes.select(
        F.col(id_col), F.posexplode("codes").alias("pos", "c8")
    ).select(id_col, (F.col("pos") + 1).alias("pos"),
             F.col("c8").cast("bigint").alias("c8"))
    n8 = comp8.groupBy(id_col).agg(
        F.sum(F.col("c8") * F.col("c8")).alias("n8")
    ).filter(F.col("n8") > 0)

    q8 = comp8.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("c8").alias("qa")
    )
    c8 = comp8.select(F.col(id_col).alias("neighbor_id"), "pos",
                      F.col("c8").alias("qb"))
    dots8 = (
        F.broadcast(q8)
        .join(c8, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot8"))
    )
    qn8 = n8.select(F.col(id_col).alias("query_id"), F.col("n8").alias("qn8"))
    cn8 = n8.select(F.col(id_col).alias("neighbor_id"), F.col("n8").alias("nn8"))
    coarse = (
        dots8.join(F.broadcast(qn8), "query_id")
        .join(cn8, "neighbor_id")
        .withColumn(
            "s8", F.col("dot8") / (F.sqrt(F.col("qn8")) * F.sqrt(F.col("nn8")))
        )
    )
    w8 = Window.partitionBy("query_id").orderBy(
        F.col("s8").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        coarse.withColumn("rk8", F.row_number().over(w8))
        .filter(F.col("rk8") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    # exact rescore of the shortlist only
    comp = quantized_components(df, id_col, vec_col).transform(persist_once)
    nrm = cosine_norms(comp, id_col)
    qcomp = comp.filter(query_ids_filter(F.col(id_col))).select(
        F.col(id_col).alias("query_id"), "pos", F.col("q").alias("qa")
    )
    ccomp = comp.select(F.col(id_col).alias("neighbor_id"), "pos",
                        F.col("q").alias("qb"))
    dots = (
        F.broadcast(cand)
        .join(qcomp, "query_id")
        .join(ccomp, ["neighbor_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dot"))
    )
    qn = nrm.select(F.col(id_col).alias("query_id"), F.col("norm2").alias("qnorm2"))
    cn = nrm.select(F.col(id_col).alias("neighbor_id"), F.col("norm2").alias("nnorm2"))
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
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def _kcenter_qarr(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """``(id, qa)`` — the vector as an int64 ARRAY under the same ×10⁶
    rounding as :func:`quantized_components` (array twin, one row per
    vector instead of one per component)."""
    return df.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> "
            f"cast(round(cast(x as double) * {QUANT}) as bigint))"
        ).alias("qa"),
    )


def _kcenter_d2(cq: list) -> "F.Column":
    """Row-local squared-L2 distance from ``qa`` to the driver-held
    center array ``cq`` — NULL when ``qa`` is empty (the inner
    pos-join semantics: such ids leave the state, exactly as the
    join-based form dropped them).  A position either side lacks, or a
    null component, contributes nothing (SUM's null-term skipping);
    everything is int64, reduction-order free.

    Arrow-vectorized kernel (guide §4.2): the JVM forms all lose
    somewhere — the former per-round pos-join + per-id aggregation
    pays a corpus Exchange per pick, and a zip_with/aggregate fold is
    CodegenFallback (interpreted per element: ~2× the whole query at
    sf1 — kcenter_pp_coreset 5.2 → 1.8 s, alternating fresh-JVM legs,
    OPTIMIZATION_r13 session 5; at sf0.1 the kernel costs ~0.3 s of
    per-round pandas_udf dispatch, the accepted trade for the
    scale-dominant form).  The pandas_udf hands each Arrow batch to
    numpy: one
    vectorized ``((A − c)²).sum(axis=1)`` over the (N × dim) block on
    the fast path (every row full-width, no nulls), an exact per-row
    fallback for ragged/null rows.  int64 wrap semantics match the
    JVM; values are identical to the join form on every path."""
    n = len(cq)
    if n == 0:
        return F.lit(None).cast("bigint")
    import numpy as np

    cvals = np.array(
        [0 if v is None else int(v) for v in cq], dtype=np.int64
    )
    cmask = np.array([v is not None for v in cq], dtype=bool)

    @F.pandas_udf("bigint")
    def d2(qa):
        import numpy as _np
        import pandas as _pd

        rows = qa.to_list()
        # Fast path only for a cleanly stackable INTEGER batch: Arrow →
        # pandas delivers a null-free array<bigint> row as an int64
        # ndarray, but a row WITH nulls arrives as float64 with NaN —
        # and numpy's unsafe cast would silently turn that NaN into
        # INT64_MIN (wrapping to a wrong finite d2), so a non-integer
        # dtype routes the whole batch to the exact per-row loop.
        try:
            mat = _np.stack(rows)
            full = (
                mat.ndim == 2
                and mat.shape[1] == n
                and mat.dtype.kind in "iu"
            )
        except (TypeError, ValueError):
            full = False
        if full:
            diff = _np.where(cmask, mat.astype(_np.int64) - cvals, 0)
            return _pd.Series((diff * diff).sum(axis=1))
        out = []
        for row in rows:
            if row is None or len(row) == 0:
                out.append(None)
                continue
            m = min(len(row), n)
            acc = 0
            for i in range(m):
                x = row[i]
                # x != x catches the NaN that pandas uses for a null
                # element inside a float64-upcast row
                if x is None or x != x or not cmask[i]:
                    continue
                d = int(x) - int(cvals[i])
                acc += d * d
            out.append(acc)
        return _pd.Series(out, dtype=object)

    return d2(F.col("qa"))


def kcenter_select(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point traversal) over the quantized
    embedding space — the diversity-SELECTION counterpart to SemDeDup's
    redundancy PRUNING: pick the point farthest from everything chosen so
    far, k times, yielding a coreset whose coverage radius is within 2×
    of the optimal k-center cost (the classic Gonzalez bound).

    Deterministic end-to-end: the seed is the smallest id, distances are
    exact int64 squared-L2 over ×10⁶-quantized components
    (reduction-order free), and argmax ties break on smallest id — so
    the DuckDB oracle replays every pick exactly and a production rerun
    selects the identical coreset.

    r13 shape (guide §2.4, §5 — the greedy_source_coverage pattern): the
    per-round DECISIONS are metadata-sized (one center id + one
    dim-length array per pick, k ≤ dozens by contract), so they live on
    the driver and each center closes over the next round's distance
    kernel.  Per round the carried ``(id, qa, d2min)`` state frame takes
    ONE map-only pass — the Arrow-vectorized :func:`_kcenter_d2`
    against the driver-held center, ``least`` into the carried minimum,
    an ``isin`` drop of the picked id — and is localCheckpoint()-ed
    eagerly (state feeds both the next argmax and the next distance
    pass; without materialization pick i re-runs the whole prefix
    chain, measured 7× slower).  The argmax is a TakeOrdered
    ``(d2 DESC, id)`` limit(1) —
    identical to ``max(struct(d2, -id))``.  No per-round corpus
    shuffle: the former pos-join + per-id aggregation Exchange per pick
    is gone (the distances were always per-row computable; only the
    argmax is global).  k map passes over the corpus total — the
    textbook greedy k-center bill; for k beyond ~dozens, switch to
    sampling-based k-center++ behind the same contract.

    Output: (sel_rank, vec_id, d2_before) — pick order, chosen id, and
    the pick's min-squared-distance to all earlier picks (NULL for the
    seed).  ``d2_before`` is non-increasing in rank (each pick is the
    current farthest point), and the post-selection coverage radius is
    ≤ the last pick's ``d2_before`` — both pinned in tests.

    Picks are DISTINCT ids by construction: every selected id leaves
    the carried state before the next argmax, so duplicate embeddings
    (remaining min-distance 0) yield distinct-id zero-distance picks
    rather than silently re-selecting the seed — and ``k`` larger than
    the corpus raises instead of emitting null picks (the state frame
    would run empty).
    """
    n_ids = df.count()
    if k > n_ids:
        raise ValueError(
            f"kcenter_select: k={k} exceeds the {n_ids} available vectors"
            " — every id can be picked at most once"
        )
    arr = _kcenter_qarr(df, id_col, vec_col).transform(persist_once)

    seed_id = df.agg(F.min(id_col).alias("cid")).collect()[0]["cid"]
    crow = arr.filter(F.col(id_col) == seed_id).select("qa").collect()
    cq = list(crow[0]["qa"]) if crow else []
    picks_py: list[tuple] = [(0, seed_id, None)]
    m = (
        arr.withColumn("d2", _kcenter_d2(cq))
        .filter(F.col("d2").isNotNull())
        .filter(F.col(id_col) != F.lit(seed_id))
        .select(id_col, "qa", "d2")
        .localCheckpoint(eager=True)
    )
    for i in range(1, k):
        top = (
            m.orderBy(F.col("d2").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        pick_id = top[0][id_col]
        picks_py.append((i, pick_id, int(top[0]["d2"])))
        if i < k - 1:
            m = (
                m.withColumn("nd2", _kcenter_d2(list(top[0]["qa"])))
                .filter(F.col("nd2").isNotNull())
                .select(id_col, "qa", F.least("d2", "nd2").alias("d2"))
                .filter(F.col(id_col) != F.lit(pick_id))
                .localCheckpoint(eager=True)
            )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("sel_rank", LongType(), False),
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("d2_before", LongType(), True),
        ]
    )
    return df.sparkSession.createDataFrame(
        [(int(r), p, None if d is None else int(d)) for r, p, d in picks_py],
        schema,
    )


KPP_HASH_MOD = 65536  # 16-bit hash space for the D² acceptance test
KPP_PSCALE = 1_000_000  # micro-unit normalized D² mass
KPP_BOOST = 2  # acceptance-rate multiplier over the cap (k-means|| style):
               # expected accepts ≈ BOOST·l per round so the (d2 DESC, id)
               # cap usually fills; capped picks stay D²-biased


def kcenter_pp_select(
    df: DataFrame,
    k: int,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sampling-based k-center++ — the large-k form :func:`kcenter_select`'s
    docstring promises, behind the same ``(sel_rank, vec_id, d2_before)``
    contract.

    Greedy farthest-point costs one corpus pass PER CENTER (k passes).
    Here each round D²-samples up to ``oversample`` centers at once (the
    k-means|| oversampling move, Bahmani et al. 2012) and updates the
    carried min-distance state against the whole batch in ONE pass —
    ``ceil((k-1)/oversample)`` corpus passes total, the k/l speedup that
    makes hundreds of centers affordable.

    Deterministic D²-sampling without RNG state: point i enters round r's
    candidate set iff ``h16(i, r) < (l · p_i · 65536) div 10⁶`` where
    ``p_i = (10⁶ · d2_i) div max(Σd2, 1)`` is its micro-unit D² mass and
    ``h16`` is the first 4 md5 hex digits of ``"{id}_{round}"`` and
    ``l = KPP_BOOST · oversample`` — an acceptance probability
    ≈ l·d2_i/Σd2, so expected accepts ≈ 2× the cap per round (the
    k-means|| oversampling rate) and rounds usually fill, biased exactly
    like k-center++ toward far points.  Accepted
    points are capped at ``oversample`` by (d2 DESC, id); a round whose
    acceptance test admits nobody falls back to the greedy argmax, so
    every round makes progress.  All arithmetic is integer and every
    tiebreak total, so the DuckDB oracle replays each round bit-for-bit.

    Rounds are FIXED at ``ceil((k-1)/oversample)`` and the output is
    truncated to k picks at the end: earlier rounds can never exceed
    their cap, so truncation only ever drops final-round picks — which
    influenced no later state — keeping Spark and the unrolled oracle in
    lockstep.  Within a round picks are mutually independent (the
    k-means|| semantics): ``d2_before`` is the distance to all PRIOR
    rounds' centers, so it is non-increasing across rounds but not
    necessarily within one.  Underfull rounds (strict acceptance) mean
    the result can carry fewer than k rows; the coverage radius stays
    within a small constant factor of greedy's on real corpora (pinned
    on the fixture in tests).

    Same distinct-picks guarantees as greedy: picked ids leave the state,
    k beyond the corpus raises.
    """
    n_ids = df.count()
    if k > n_ids:
        raise ValueError(
            f"kcenter_pp_select: k={k} exceeds the {n_ids} available vectors"
        )
    arr = _kcenter_qarr(df, id_col, vec_col).transform(persist_once)

    # r13 shape, same as kcenter_select: per-round decisions (≤ oversample
    # centers + the 1-row D² total) are metadata-sized and driver-held;
    # the state update is ONE map-only pass against the held centers
    # (least() skips a NULL no-overlap distance exactly like the former
    # per-(id, cid) inner join + MIN).  No per-round corpus shuffle.
    seed_id = df.agg(F.min(id_col).alias("cid")).collect()[0]["cid"]
    crow = arr.filter(F.col(id_col) == seed_id).select("qa").collect()
    cq = list(crow[0]["qa"]) if crow else []
    picks_py: list[tuple] = [(0, seed_id, None)]
    m = (
        arr.withColumn("d2", _kcenter_d2(cq))
        .filter(F.col("d2").isNotNull())
        .filter(F.col(id_col) != F.lit(seed_id))
        .select(id_col, "qa", "d2")
        .localCheckpoint(eager=True)
    )
    rounds = -(-(k - 1) // oversample)
    for r in range(1, rounds + 1):
        tot = int(
            m.agg(
                F.greatest(F.sum("d2"), F.lit(1)).cast("bigint").alias("tot")
            ).collect()[0]["tot"]
        )
        h16 = F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"_{r}"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        # acceptance test + (d2 DESC, id) cap in one TakeOrdered job; the
        # former row_number window over the accepted rows picked the same
        # top-oversample set
        sel_rows = (
            m.filter(
                h16
                < F.expr(
                    f"({KPP_BOOST * oversample} * "
                    f"(({KPP_PSCALE} * d2) div {tot}) * {KPP_HASH_MOD})"
                    f" div {KPP_PSCALE}"
                )
            )
            .orderBy(F.col("d2").desc(), F.col(id_col).asc())
            .limit(oversample)
            .collect()
        )
        if not sel_rows:  # greedy fallback: the round must progress
            sel_rows = (
                m.orderBy(F.col("d2").desc(), F.col(id_col).asc())
                .limit(1)
                .collect()
            )
        picks_py.extend(
            (r, row[id_col], int(row["d2"])) for row in sel_rows
        )
        if r < rounds:
            nds = [_kcenter_d2(list(row["qa"])) for row in sel_rows]
            nd2 = nds[0] if len(nds) == 1 else F.least(*nds)
            picked = [row[id_col] for row in sel_rows]
            m = (
                m.withColumn("nd2", nd2)
                .filter(F.col("nd2").isNotNull())
                .select(id_col, "qa", F.least("d2", "nd2").alias("d2"))
                .filter(~F.col(id_col).isin(picked))
                .localCheckpoint(eager=True)
            )
    # final rank: (ord_round ASC, d2_before DESC, id ASC), truncated to k
    # — the former driver-sized window, now a plain sort of ≤ k +
    # oversample·rounds driver-held tuples (the seed is round 0's only
    # row, so its NULL d2_before never ties against a real one)
    picks_py.sort(
        key=lambda t: (t[0], -(t[2] if t[2] is not None else 0), t[1])
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("sel_rank", LongType(), False),
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField("d2_before", LongType(), True),
        ]
    )
    return df.sparkSession.createDataFrame(
        [
            (int(i), p, None if d is None else int(d))
            for i, (_, p, d) in enumerate(picks_py[:k])
        ],
        schema,
    )


def kcenter_coverage_radius(df: DataFrame, centers: DataFrame,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """1-row (radius2) — max over points of min squared distance to any
    selected center: the coreset's coverage cost.  Centers broadcast (k
    rows); one narrow pos-join + two aggregations."""
    comp = quantized_components(df, id_col, vec_col)
    cent = comp.join(
        F.broadcast(centers.select(F.col(id_col).alias("cid"))),
        comp[id_col] == F.col("cid"),
    ).select(F.col("cid"), "pos", F.col("q").alias("cq"))
    d2 = (
        comp.join(F.broadcast(cent), "pos")
        .groupBy(id_col, "cid")
        .agg(
            F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq")))
            .alias("d2")
        )
        .groupBy(id_col)
        .agg(F.min("d2").alias("d2min"))
    )
    return d2.agg(F.max("d2min").alias("radius2"))


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: ``code_i = round(127·x_i/amax)``.

    The storage/compression path for ANN at scale — 4× smaller than float32,
    distance kernels read contiguous int8 codes.  Everything is JVM array
    expressions on the row (no shuffle, no UDF): amax via array_max over
    abs, codes via transform.  ``round`` (half-away-from-zero on both Spark
    and DuckDB for doubles) keeps codes engine-reproducible; zero vectors
    get scale 0 and all-zero codes.
    """
    absarr = F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    amax = F.array_max(absarr)
    scale = F.when(amax > 0, amax / 127.0).otherwise(F.lit(0.0))
    codes = F.when(
        amax > 0,
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * 127.0 / amax).cast("int"),
        ),
    ).otherwise(F.transform(F.col(vec_col), lambda x: F.lit(0)))
    return df.select(
        F.col(id_col), scale.alias("scale"), codes.alias("codes")
    )


def kmeans_assign_step(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """One Lloyd iteration over an embedding column: M-step (centroid of
    each current label) + E-step (reassign every vector to its nearest
    centroid, squared-L2), composed as DataFrame plans — the second
    iterative-algorithm exemplar next to PageRank (clustering instead of
    message passing).

    Determinism at scale: components quantize to int64 (×10⁶) and each
    centroid coordinate is an exact FLOOR division of integer sums —
    ``(s - ((s % n + n) % n)) div n`` — written identically on both
    engines because Spark's ``div`` truncates toward zero while a naive
    SQL floor-div would floor, and centroid sums can be negative.
    Distances are integer sums of squares: reduction-order free, so the
    assignment is bit-identical on any cluster size.

    Scale: the M-step is the only shuffle — (labels × dims) centroid cells
    with map-side partial aggregation.  The centroids then fold into ONE
    broadcast row (an array of (cand, coords) structs), and the E-step is a
    single per-row JVM expression: ``array_min(transform(cents, c →
    struct(Σ(q−c)², cand)))`` — the struct ordering (d2, then cand) IS the
    deterministic argmin tiebreak, so no explode, no fan-out join, no
    window, zero extra shuffles.  Per-row work is O(labels·dims) inside
    whole-stage codegen.  Iterating = feeding ``new_label`` back in; at a
    label count too big for one broadcast row, prune candidates with the
    IVF cells instead (:func:`ivf_cosine_topk`).
    """
    comp = df.select(
        F.col(label_col),
        F.posexplode(vec_col).alias("pos0", "v"),
    ).select(
        label_col,
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("v").cast("double") * QUANT).cast("bigint").alias("q"),
    )
    cent = (
        comp.groupBy(label_col, "pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col(label_col).alias("cand"),
            "pos",
            F.expr("(s - ((s % n + n) % n)) div n").alias("c"),
        )
    )
    qdf = df.select(
        F.col(id_col),
        F.col(label_col).alias("old_label"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
        ).alias("qv"),
    )
    # E-step as an Arrow kernel (r13 session 5, guide §4.2): the former
    # ``array_min(transform(cents, …zip_with…aggregate…))`` expression is
    # CodegenFallback — |labels|·dims interpreted lambda calls per row
    # (the session's recurring signature; ~3.5 s at sf1 for 20k rows).
    # The centroid table is labels×dims (the one-broadcast-row premise
    # this operator already documents), so it is collected once and the
    # argmin is a per-centroid vectorized ``((Q − c)²).sum`` — exact
    # int64, ties to the smallest cand via ascending centroid order.
    # Replicated null semantics, probed and pinned: zip_with null-pads a
    # width mismatch and a null component nullifies the whole fold, and
    # array_min sorts a NULL d2 FIRST — so any non-clean row maps to
    # (new_label = smallest cand, dist2 = NULL).  A null label (a null
    # cand) or an empty corpus falls back to the plain JVM expression.
    cent_rows = cent.collect()
    by_cand: dict = {}
    for r in cent_rows:
        by_cand.setdefault(r["cand"], {})[int(r["pos"])] = int(r["c"])
    usable = bool(by_cand) and None not in by_cand
    if usable:
        import numpy as np

        cands = sorted(by_cand)
        width = None
        mats = []
        for cand in cands:
            d = by_cand[cand]
            poss = sorted(d)
            if poss != list(range(1, len(poss) + 1)):
                usable = False
                break
            if width is None:
                width = len(poss)
            elif width != len(poss):
                usable = False
                break
            mats.append([d[p] for p in poss])
    if not usable:
        cents_one = (
            cent.groupBy("cand")
            .agg(
                F.sort_array(F.collect_list(F.struct("pos", "c"))).alias(
                    "pc"
                )
            )
            .select(
                "cand", F.transform("pc", lambda s: s["c"]).alias("arr")
            )
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("cand", "arr"))
                ).alias("cents")
            )
        )
        best = F.expr(
            "array_min(transform(cents, c -> struct("
            "aggregate(zip_with(qv, c.arr, (a, b) -> (a - b) * (a - b)), "
            "cast(0 as bigint), (s, x) -> s + x) as d2, c.cand as cand)))"
        )
        return (
            qdf.crossJoin(F.broadcast(cents_one))
            .withColumn("best", best)
            .select(
                id_col,
                "old_label",
                F.col("best.cand").alias("new_label"),
                F.col("best.d2").alias("dist2"),
            )
        )

    cmat = np.array(mats, dtype=np.int64)
    cand_arr = np.array(cands, dtype=np.int64)
    d = int(width)

    # new_label is INT like the source label column (and the oracle's
    # cand) — the interrupted session declared it bigint, which passed
    # value parity but failed the dtype-parity gate (int64 vs int32)
    @F.pandas_udf("new_label int, dist2 bigint")
    def assign(qv_s):
        import numpy as _np
        import pandas as _pd

        rows = qv_s.to_list()
        labels: list = []
        dists: list = []
        try:
            mat = _np.stack(rows)
            full = (
                mat.ndim == 2
                and mat.shape[1] == d
                and mat.dtype.kind in "iu"
            )
        except (TypeError, ValueError):
            full = False
        if full:
            q = mat.astype(_np.int64)
            best_d = None
            best_c = None
            for ci in range(len(cand_arr)):
                diff = q - cmat[ci]
                d2 = (diff * diff).sum(axis=1)
                if best_d is None:
                    best_d = d2.copy()
                    best_c = _np.full(len(q), cand_arr[ci])
                else:
                    better = d2 < best_d
                    best_d[better] = d2[better]
                    best_c[better] = cand_arr[ci]
            labels = [int(x) for x in best_c]
            dists = [int(x) for x in best_d]
        else:
            min_cand = int(cand_arr[0])
            for r in rows:
                clean = r is not None and len(r) == d
                if clean:
                    vals = []
                    for x in r:
                        if x is None or x != x:
                            clean = False
                            break
                        vals.append(int(x))
                if not clean:
                    labels.append(min_cand)
                    dists.append(None)
                    continue
                q = _np.array(vals, dtype=_np.int64)
                diffs = cmat - q
                d2s = (diffs * diffs).sum(axis=1)
                bi = int(_np.argmin(d2s))
                labels.append(int(cand_arr[bi]))
                dists.append(int(d2s[bi]))
        return _pd.DataFrame({"new_label": labels, "dist2": dists})

    return qdf.withColumn("__b", assign("qv")).select(
        id_col,
        "old_label",
        F.col("__b.new_label").alias("new_label"),
        F.col("__b.dist2").alias("dist2"),
    )


def kmeans_assign_step_sql() -> str:
    """DuckDB oracle for :func:`kmeans_assign_step` — identical quantize /
    floor-division / argmin arithmetic over the same table."""
    return f"""
    WITH comp AS (
      SELECT vec_id, label, i.i AS pos,
             CAST(ROUND(CAST(embedding[i.i] AS DOUBLE) * {QUANT}) AS BIGINT) AS q
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS i(i)
    ),
    cent AS (
      SELECT label AS cand, pos,
             (s - ((s % n + n) % n)) // n AS c
      FROM (SELECT label, pos, SUM(q) AS s, COUNT(*) AS n
            FROM comp GROUP BY label, pos)
    ),
    dist AS (
      SELECT comp.vec_id, comp.label, cent.cand,
             CAST(SUM((comp.q - cent.c) * (comp.q - cent.c)) AS BIGINT) AS d2
      FROM comp JOIN cent ON comp.pos = cent.pos
      GROUP BY comp.vec_id, comp.label, cent.cand
    )
    SELECT vec_id, label AS old_label, cand AS new_label, d2 AS dist2
    FROM dist
    QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cand) = 1
    """


def kmeans_iterate(
    df: DataFrame,
    n_iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Run ``n_iters`` Lloyd iterations by feeding each step's ``new_label``
    back into :func:`kmeans_assign_step`.

    Iterative algorithms as DataFrame plans: each iteration adds one
    (labels × dims)-bounded centroid aggregation + a broadcast argmin
    projection to the lineage.  Every ``checkpoint_every`` iterations the
    frame is localCheckpoint()-ed to truncate the growing plan — the same
    policy the pagerank operator documents (without it, analysis time
    grows superlinearly in iterations; with it, each segment replans from
    a materialized base).  Labels converge monotonically in total
    within-cluster distance (Lloyd's guarantee — asserted in
    ``tests/test_llm_ops.py``).

    Returns (id, label, dist2) with the final assignment.
    """
    cur = df.select(
        F.col(id_col), F.col(vec_col), F.col(label_col).alias("label")
    )
    for i in range(n_iters):
        step = kmeans_assign_step(cur, id_col, vec_col, "label")
        cur = (
            cur.select(id_col, vec_col)
            .join(
                step.select(
                    id_col,
                    F.col("new_label").alias("label"),
                    "dist2",
                ),
                id_col,
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            cur = cur.localCheckpoint(eager=True)
    return cur.select(id_col, "label", "dist2")


def semantic_screen(
    df: DataFrame,
    eval_filter,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Train-vs-eval semantic contamination screen: every TRAIN vector
    whose cosine similarity to ANY eval vector reaches ``threshold``,
    with the best-matching eval id — the embedding-space complement of
    the exact n-gram ``decontaminate`` pass (paraphrased eval leakage has
    no shared n-grams but lands next to the eval item in embedding space).

    MAP-ONLY plan (the kmeans E-step pattern): the eval set — small by the
    screen's own premise (thousands of items, not billions) — folds into
    ONE broadcast row of (eval_id, quantized vector, norm²) structs, and
    each train row computes every eval cosine inside a single expression:
    ``array_min(transform(evals, …))`` over (−cosine, eval_id) structs,
    whose lexicographic ordering does the deterministic argmax — largest
    cosine first, smallest eval_id on ties, for ANY orderable id type
    (negating the id, the previous tiebreak, silently miscast string ids
    to double under non-ANSI semantics; negating the double cosine is an
    exact IEEE sign flip).  No explode, no pair shuffle, no window — no
    KEYED exchange anywhere: the train side sees at most a round-robin
    :func:`fan_out` (bench-SF only — a narrow single-split scan would
    otherwise run the whole kernel on one core; production-scale scans
    are already wide and fan_out no-ops), and O(|eval|·dims) arithmetic
    per train row scales out linearly with executors.  (The round-4 plan
    shuffled O(|train|·|eval|) PAIR ROWS through a groupBy — at 1 B ×
    10 k that is 10¹³ shuffled rows; this form shuffles none.  The LSH
    variants still matter: they cut the per-row CPU, not the shuffle.
    :func:`semantic_screen_vectorized` is the same plan with the per-row
    kernel swapped for an Arrow/numpy matmul.)  Integer-quantized dots +
    fixed-order IEEE division keep the DuckDB oracle value-exact.

    Output: (train_id, eval_id, cosine) — the single best eval match per
    contaminated train vector (ties break on eval id).

    ``dim`` (when given) excludes ragged vectors — ``size(vec) != dim``
    rows — from BOTH sides, the one semantics every engine can state
    identically (the power_iteration_top_pc rule): without it a short
    train vector null-pads through zip_with to a null cosine (silently
    dropped), the numpy kernel would crash on np.stack, and a
    relational replay keeps partial components — three different
    answers for the same row.
    """
    from killrweather_spark.sources.readers import fan_out

    df = _uniform_dim(df, vec_col, dim)
    is_eval = eval_filter(F.col(id_col))
    quant = _quantized_rows(df, id_col, vec_col)
    evals_one = _eval_fold(quant, is_eval, id_col)
    best = F.expr(
        "array_min(transform(__evals, e -> struct("
        "-(aggregate(zip_with(__qv, e.eqv, (a, b) -> a * b),"
        " cast(0 as bigint), (s, x) -> s + x)"
        " / (sqrt(cast(__norm2 as double)) * sqrt(cast(e.enorm2 as double))))"
        " as neg_cosine,"
        " e.eval_id as eval_id)))"
    )
    return (
        # full-width spread pinned: the map stage below carries the
        # |evals|×dims fold per train row — kernel-bound, not byte-bound,
        # so the sized default (which sees only a half-MB scan) would
        # under-parallelize it
        _quantized_rows(
            fan_out(df, slots=df.sparkSession.sparkContext.defaultParallelism),
            id_col,
            vec_col,
        )
        .filter(~is_eval)
        .filter(F.col("__norm2") > 0)  # zero-norm train: excluded everywhere
        .crossJoin(F.broadcast(evals_one))
        .withColumn("__best", best)
        .filter(-F.col("__best.neg_cosine") >= threshold)
        .select(
            F.col("__best.eval_id").alias("eval_id"),
            F.col(id_col).alias("train_id"),
            (-F.col("__best.neg_cosine")).alias("cosine"),
        )
        .select("train_id", "eval_id", "cosine")
    )


def _uniform_dim(df: DataFrame, vec_col: str, dim: int | None) -> DataFrame:
    """Ragged-vector exclusion shared by the exact-screen family: keep only
    rows whose vector has exactly ``dim`` components (no-op when ``dim``
    is None)."""
    if dim is None:
        return df
    return df.filter(F.size(F.col(vec_col)) == dim)


def _quantized_rows(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, __qv, __norm2) row form of the ×10⁶ quantization — the whole
    vector stays in one array cell (no posexplode), feeding the map-only
    screen kernels."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
    )
    return df.select(F.col(id_col), qv.alias("__qv")).withColumn(
        "__norm2",
        F.expr("aggregate(__qv, cast(0 as bigint), (s, x) -> s + x * x)"),
    )


def _eval_fold(quant: DataFrame, is_eval, id_col: str) -> DataFrame:
    """Fold the eval side into ONE row of sorted (eval_id, eqv, enorm2)
    structs — the broadcast operand both exact-screen kernels share."""
    return (
        quant.filter(is_eval)
        .filter(F.col("__norm2") > 0)  # zero-norm eval: cosine undefined
        .select(
            F.struct(
                F.col(id_col).alias("eval_id"),
                F.col("__qv").alias("eqv"),
                F.col("__norm2").alias("enorm2"),
            ).alias("__e")
        )
        .agg(F.sort_array(F.collect_list("__e")).alias("__evals"))
    )


#: Hard ceiling on the eval-side rows :func:`semantic_screen_vectorized`
#: will collect to the driver.  The screen's premise is that eval suites
#: are SMALL (thousands of items) — this cap turns a hostile/mistaken
#: ``eval_filter`` that matches a corpus-sized population into a loud
#: error instead of a driver OOM at 100 TB.  Generous vs real suites
#: (~200k × 64 int dims ≈ 100 MB driver-side) yet far below corpus scale.
EVAL_COLLECT_CAP = 200_000


def semantic_screen_vectorized(
    df: DataFrame,
    eval_filter,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_eval_rows: int = EVAL_COLLECT_CAP,
) -> DataFrame:
    """:func:`semantic_screen` with the per-row JVM kernel replaced by an
    Arrow-batched numpy matmul — same map-only shape, same exact integer
    arithmetic, identical output (the registered query shares the exact
    screen's oracle SQL verbatim).

    The JVM form's per-row cost is interpreted higher-order-function
    evaluation (~d·|eval| lambda calls per train row — ArrayTransform /
    ArrayAggregate never enter whole-stage codegen); here each Arrow
    batch of quantized train vectors becomes one int64 matrix and the
    whole batch's dot products are a single BLAS-free integer ``t @ E.T``
    (exact: |q| ≤ ~4·10⁶, d = 64 ⇒ |dot| < 2⁶³), measured ~6× faster
    per core at bench SF.  This is the sanctioned Arrow path (the
    multimodal family's ``mapInPandas`` pattern), NOT row-at-a-time
    Python: no BatchEvalPython node appears.

    The eval side is collected to the driver and shipped as a Spark
    broadcast — the same |eval|·dims integers the JVM form folds into its
    broadcast row, justified by the screen's own small-eval premise; the
    collect is intentional and bounded (eval suites are thousands of
    items), and the premise is ENFORCED: the collect runs as an
    ``orderBy(id).limit(max_eval_rows + 1)`` (a bounded TakeOrdered, so
    at most the cap ever reaches the driver) and overflow raises a
    ``ValueError`` directing callers to the banded/IVF variants instead
    of silently OOM-ing the driver on an eval_filter that matches a
    corpus-sized population.  Cosine division happens in float64 in the
    same operand order
    as the JVM/DuckDB forms, so results are value-exact, and eval ids are
    scanned in ascending order so numpy's first-max argmax reproduces the
    (cosine DESC, eval_id ASC) tiebreak.

    ``dim`` excludes ragged vectors from both sides (see
    :func:`semantic_screen`); independent of it, the kernel drops any
    train row whose length differs from the eval matrix width instead of
    letting ``np.stack`` crash on a ragged batch — exactly the rows the
    JVM form's zip_with null-pads to a null (hence dropped) cosine.
    """
    import numpy as np

    from killrweather_spark.sources.readers import fan_out

    df = _uniform_dim(df, vec_col, dim)
    is_eval = eval_filter(F.col(id_col))
    quant = _quantized_rows(df, id_col, vec_col)
    evals = (
        quant.filter(is_eval)
        .filter(F.col("__norm2") > 0)
        .select(id_col, "__qv", "__norm2")
        .orderBy(id_col)
        .limit(max_eval_rows + 1)
        .collect()
    )
    if len(evals) > max_eval_rows:
        raise ValueError(
            f"semantic_screen_vectorized: eval_filter matched more than "
            f"max_eval_rows={max_eval_rows} vectors — the vectorized "
            f"screen broadcasts the WHOLE eval side and is only valid "
            f"under the small-eval premise.  Use "
            f"semantic_screen_banded/semantic_screen (IVF form) for "
            f"corpus-sized eval populations, or raise max_eval_rows "
            f"deliberately."
        )
    eval_ids = np.array([r[0] for r in evals], dtype=np.int64)
    emat = np.array([r[1] for r in evals], dtype=np.int64)
    enorm = np.sqrt(np.array([r[2] for r in evals], dtype=np.float64))
    bc = df.sparkSession.sparkContext.broadcast((eval_ids, emat, enorm))
    thresh = float(threshold)

    def kernel(batches):
        import pandas as pd

        ids, em, en = bc.value
        d = em.shape[1] if em.ndim == 2 else 0
        for pdf in batches:
            if pdf.empty or len(ids) == 0:
                continue
            # ragged defense: a train vector whose length differs from the
            # eval dimension can never produce a non-null cosine in the JVM
            # form (zip_with null-pads) — drop it here instead of letting
            # np.stack raise or build an object array
            ok = np.fromiter(
                (len(v) == d for v in pdf["__qv"].values),
                dtype=bool,
                count=len(pdf),
            )
            pdf = pdf[ok]
            if pdf.empty:
                continue
            t = np.stack(pdf["__qv"].values).astype(np.int64)
            tn = np.sqrt(pdf["__norm2"].values.astype(np.float64))
            cos = (t @ em.T) / (tn[:, None] * en[None, :])
            bi = cos.argmax(axis=1)  # first max = smallest eval_id (sorted)
            bcos = cos[np.arange(len(bi)), bi]
            keep = bcos >= thresh
            yield pd.DataFrame(
                {
                    "train_id": pdf["__tid"].values[keep],
                    "eval_id": ids[bi[keep]],
                    "cosine": bcos[keep],
                }
            )

    train = (
        # full-width spread pinned (kernel-bound map stage — the sized
        # fan_out default under-parallelizes the |evals|×dims matvec)
        _quantized_rows(
            fan_out(df, slots=df.sparkSession.sparkContext.defaultParallelism),
            id_col,
            vec_col,
        )
        .filter(~is_eval)
        .filter(F.col("__norm2") > 0)
        .withColumnRenamed(id_col, "__tid")
    )
    return train.mapInPandas(
        kernel, "train_id bigint, eval_id bigint, cosine double"
    )


PC_PSCALE = 1024  # power-of-two quantization: x·1024 is EXACT in double
PC_VSCALE = 1 << 20  # iterate renormalized to max|v| ∈ [2²⁰, 2²¹)


def power_iteration_top_pc(
    df: DataFrame,
    dim: int,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = True,
) -> DataFrame:
    """Top principal direction of the embedding matrix by power iteration
    on the Gram operator — ``v ← normalize(Aᵀ(Av))`` — composed entirely
    as DataFrame plans.  The curation use is ABTT-style common-direction
    analysis (Mu & Viswanath 2018: embedding corpora share a dominant
    direction that swamps cosine similarity; computing it is the first
    step of removing it) next to the kmeans/kcenter iterative exemplars.

    Determinism: components quantize at ×1024 (a power of two, so the
    double multiply is exact and rounding is unambiguous on both
    engines); every iteration is int64 products + sums (order-free) and
    a floor-division renormalization by ``max(1, max|acc| div 2²⁰)``
    written in the sign-safe floor form shared with kmeans — so the
    DuckDB oracle unrolls the same ``iters`` stages and matches
    bit-for-bit, including the sign of the converged direction (fixed by
    the all-ones start, since power iteration only determines v up to
    sign).

    Scale shape per iteration — no corpus-sized shuffle: the current
    1-row v broadcasts, ``s = qv·v`` is a per-row fold, and ``Aᵀs``
    reduces via a posexplode → ``groupBy(pos)`` partial aggregation
    whose exchange carries at most ``dim × partitions`` partial-sum
    rows (64 keys, map-side combined — dim-sized state, not corpus).
    A single ``dim``-wide scalar-sum aggregate would avoid even that
    exchange but compiles 64 aggregate expressions per iteration —
    measured 2.3× slower end-to-end at bench SF; the tiny keyed fold
    wins at every scale.  The corpus is scanned ``iters`` times; each
    1-row v localCheckpoints eagerly so plan depth stays constant.
    Int64 headroom: |acc| ≤
    n·dim·qmax²·2·VSCALE — safe through ~10⁷ rows at these scales; past
    that halve VSCALE per 4× rows (the direction is scale-free) or move
    the accumulation to DECIMAL(38,0).

    Returns ``(pos, v_scaled)`` — the 1-based component index and the
    integer-scaled direction after ``iters`` iterations.  Convergence
    rate is (λ2/λ1)ᵗ: on a corpus with a genuinely dominant common
    direction a handful of iterations suffice; on a near-isotropic
    corpus (the synthetic fixtures: λ1/λ2 ≈ 1.02) the iterate is a
    dominant-SUBSPACE direction whose Rayleigh quotient climbs
    monotonically toward λ1 (pinned in tests) — raise ``iters`` when
    the application needs the axis itself rather than a max-variance
    direction.
    """
    spark = df.sparkSession
    # ragged vectors are EXCLUDED, not silently zeroed: a row shorter than
    # dim would null-pad through zip_with and vanish from every sum while
    # a relational replay would keep its partial components — filtering
    # is the one semantics both plans state identically
    qdf = (
        df.filter(F.size(F.col(vec_col)) == dim)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * PC_PSCALE).cast("bigint"),
            ).alias("qv"),
        )
        .transform(persist_once)
    )
    v = spark.range(1).select(
        F.expr(
            f"transform(sequence(1, {dim}), "
            f"p -> cast({PC_VSCALE} as bigint))"
        ).alias("varr")
    )
    for _ in range(iters):
        scored = qdf.crossJoin(F.broadcast(v)).select(
            "qv",
            F.expr(
                "aggregate(zip_with(qv, varr, (a, b) -> a * b), "
                "cast(0 as bigint), (s, x) -> s + x)"
            ).alias("s"),
        )
        acc = (
            scored.select(F.posexplode(F.expr("transform(qv, q -> q * s)")))
            .groupBy("pos")
            .agg(F.sum("col").alias("acc"))
            .agg(
                F.expr("sort_array(collect_list(struct(pos, acc)))").alias("pa")
            )
            .select(F.expr("transform(pa, x -> x.acc)").alias("acc"))
        )
        v = (
            acc.select(
                "acc",
                F.expr(
                    "greatest(cast(1 as bigint), "
                    "aggregate(acc, cast(0 as bigint), "
                    f"(m, x) -> greatest(m, abs(x))) div {PC_VSCALE})"
                ).alias("dnm"),
            )
            .select(
                F.expr(
                    "transform(acc, a -> "
                    "(a - ((a % dnm + dnm) % dnm)) div dnm)"
                ).alias("varr")
            )
        )
        # single-branch chain (no kcenter-style O(k²) hazard) — the eager
        # checkpoint only keeps plan depth constant; tests disable it to
        # inspect the full composed plan
        if checkpoint:
            v = v.localCheckpoint(eager=True)
    return v.select(F.posexplode("varr")).select(
        (F.col("pos") + 1).cast("bigint").alias("pos"),
        F.col("col").cast("bigint").alias("v_scaled"),
    )


def power_iteration_top_pc_sql(dim: int, iters: int = 4) -> str:
    """DuckDB oracle for :func:`power_iteration_top_pc` — the iteration
    unrolled into ``iters`` CTE stages over the same ×1024 quantization
    (relational joins instead of array folds; identical integer values)."""
    parts = [
        "pcomp AS (\n"
        "      SELECT e.vec_id, i.i AS pos,\n"
        f"             CAST(ROUND(CAST(e.embedding[i.i] AS DOUBLE) * {PC_PSCALE})"
        " AS BIGINT) AS q\n"
        "      FROM embeddings e,\n"
        "           unnest(generate_series(1, len(e.embedding))) AS i(i)\n"
        f"      WHERE len(e.embedding) = {dim})",
        f"v0 AS (SELECT i.i AS pos, CAST({PC_VSCALE} AS BIGINT) AS v\n"
        f"           FROM unnest(generate_series(1, {dim})) AS i(i))",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"s{t} AS (SELECT c.vec_id, CAST(SUM(c.q * v.v) AS BIGINT) AS s\n"
            f"           FROM pcomp c JOIN v{t - 1} v USING (pos) GROUP BY 1)"
        )
        parts.append(
            f"a{t} AS (SELECT c.pos, CAST(SUM(c.q * s.s) AS BIGINT) AS acc\n"
            f"           FROM pcomp c JOIN s{t} s USING (vec_id) GROUP BY 1)"
        )
        parts.append(
            f"d{t} AS (SELECT GREATEST(CAST(1 AS BIGINT),"
            f" MAX(ABS(acc)) // {PC_VSCALE}) AS dnm FROM a{t})"
        )
        parts.append(
            f"v{t} AS (SELECT pos,"
            " (acc - ((acc % dnm + dnm) % dnm)) // dnm AS v\n"
            f"           FROM a{t} CROSS JOIN d{t})"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT pos, CAST(v AS BIGINT) AS v_scaled FROM v{iters}"
    )
