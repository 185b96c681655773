"""Corpus-curation operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star), complementing
``functions/dedup.py`` (pair finding) and ``functions/text.py`` (per-doc
metrics) with the *corpus-level* decisions a 100 TB pipeline makes after
those stages: cluster the duplicate pairs into groups, split the corpus
into train/val/test, sample per stratum, pick signature vocabulary, and
filter by per-stratum quantile.

Determinism is the design constraint throughout — at 100 TB a curation
decision must be reproducible across reruns, cluster sizes, and engines:

- all pseudo-randomness is ``md5`` of a stable id (content-addressed;
  identical in any engine, no seed, no ``rand()`` — task retries and
  partition count changes cannot flip an assignment);
- all scores that feed a comparison are integers or single IEEE divisions
  of integers (exactly-rounded, engine-independent) — never ``ln``/``exp``
  whose libm implementations differ in the last ulp;
- every ranking carries a total tiebreak order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from killrweather_spark.functions.text import TOKEN_RE


def hash_key(id_col: Column) -> Column:
    """Content-addressed pseudo-random key: md5 hex of the id's decimal
    string. Uniform over [0, 16^32), reproducible everywhere."""
    return F.md5(id_col.cast("string").cast("binary"))


# --------------------------------------------------------------------------
# deterministic train/val/test split
# --------------------------------------------------------------------------

def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    boundaries: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.9)),
    last_label: str = "test",
    out: str = "split",
) -> DataFrame:
    """Assign each row to a split by thresholding the first 16 bits of its
    md5 key — e.g. 0.8 → hex prefix < 'cccc' (52428/65536 ≈ 0.79999).

    Per-row hash thresholds (not a global sort/count) mean assignments are
    stable as the corpus grows: adding documents never moves an existing
    document between splits — the property that keeps eval sets
    uncontaminated across pipeline reruns at 100 TB. Narrow projection,
    no shuffle, whole-stage codegen.
    """
    prefix = F.substring(hash_key(F.col(id_col)), 1, 4)
    expr = None
    for label, frac in boundaries:
        bound = format(int(frac * 65536), "04x")
        cond = prefix < F.lit(bound)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(out, expr.otherwise(F.lit(last_label)))


def split_thresholds_sql(
    boundaries: tuple[tuple[str, float], ...] = (("train", 0.8), ("val", 0.9)),
    last_label: str = "test",
    id_expr: str = "doc_id",
) -> str:
    """The oracle-SQL CASE expression mirroring :func:`deterministic_split`."""
    whens = " ".join(
        f"WHEN substr(md5(CAST({id_expr} AS VARCHAR)), 1, 4) < "
        f"'{format(int(frac * 65536), '04x')}' THEN '{label}'"
        for label, frac in boundaries
    )
    return f"CASE {whens} ELSE '{last_label}' END"


# --------------------------------------------------------------------------
# stratified deterministic sampling
# --------------------------------------------------------------------------

def stratified_sample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    fraction: float = 0.2,
) -> DataFrame:
    """Exact-fraction per-stratum sample: rank rows within each stratum by
    their md5 key (a deterministic shuffle) and keep the first
    ``ceil(fraction * stratum_size)``.

    One shuffle on the stratum key; rank + windowed count stream within
    partitions. Unlike ``df.sample(fraction)`` this hits the target size
    *exactly* per stratum and is reproducible (no RNG state, no partition
    dependence). Skewed strata split fine: the window is per-stratum but
    AQE skew handling applies to the exchange.
    """
    w = Window.partitionBy(strata_col).orderBy(hash_key(F.col(id_col)), id_col)
    wc = Window.partitionBy(strata_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )


# --------------------------------------------------------------------------
# per-stratum quantile filter
# --------------------------------------------------------------------------

def quantile_filter(
    df: DataFrame,
    strata_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    min_quantile: float = 0.5,
) -> DataFrame:
    """Keep rows at or above the ``min_quantile`` of ``order_col`` within
    their stratum (e.g. drop the shortest half of each source).

    ``percent_rank`` = (rank-1)/(n-1): a single IEEE division of integers,
    so the kept *set* is engine- and partitioning-independent. The total
    order (order_col, id) makes ranks unique. One shuffle on the stratum.
    """
    w = Window.partitionBy(strata_col).orderBy(order_col, id_col)
    return (
        df.withColumn("q_rank", F.percent_rank().over(w))
        .filter(F.col("q_rank") >= min_quantile)
    )


# --------------------------------------------------------------------------
# per-stratum signature vocabulary (df-filtered top terms)
# --------------------------------------------------------------------------

def top_terms_per_stratum(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Per-stratum signature terms: token frequency within the stratum,
    excluding corpus-wide stopwords (terms in > ``max_df_ratio`` of all
    docs — the document-frequency filter of tf-idf without the float log).

    Plan shape: tokenize+explode (narrow) → two hash aggregations with
    map-side partials (per-doc-term, then per-term / per-stratum-term) →
    broadcast of the small global-df table back onto the stratum counts →
    per-stratum top-k via row_number (bounded, streaming rank). Integer
    counts only — no libm, bit-identical across engines.
    """
    toks = df.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col).alias("__doc"),
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)).alias("term"),
    )
    # per-document distinct terms -> global document frequency
    doc_terms = toks.select("__doc", "term").distinct()
    n_docs = df.select(F.col(id_col)).distinct().count()
    global_df = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    keep_terms = global_df.filter(F.col("term_df") <= int(max_df_ratio * n_docs))

    stratum_tf = toks.groupBy("stratum", "term").agg(F.count(F.lit(1)).alias("tf"))
    ranked = (
        stratum_tf.join(F.broadcast(keep_terms), "term")
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy(F.desc("tf"), F.asc("term"))
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select("stratum", "term", "tf", "term_df", "rank")


# --------------------------------------------------------------------------
# connected components (duplicate-pair clustering)
# --------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 15,
) -> DataFrame:
    """Cluster near-duplicate *pairs* into groups: each node gets
    ``component`` = the minimum node id reachable from it. The canonical
    keep-one-per-group dedup decision is then "keep node == component".

    Algorithm: hash-min label propagation with path halving — each round
    every node takes ``min(own label, neighbors' labels)`` and then
    shortcuts to its label's label (``comp := comp(comp)``, the
    pointer-jumping step of [Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14]). Neighbor-min alone moves the minimum
    one hop per round (O(diameter) rounds — a 1000-link chain would need
    1000 rounds); the shortcut halves label-chain depth each round, giving
    O(log n) convergence on any graph shape. Each round is two joins + one
    partial-aggregated ``groupBy``, all keyed by node/label id.
    Convergence is detected (no label changed) and non-convergence within
    ``max_iter`` raises rather than returning silently-wrong groups.

    Labels only ever decrease, so the fixpoint is order- and
    partitioning-independent: deterministic output at any cluster size.

    Each round ends in ``localCheckpoint`` — iterative self-joins otherwise
    grow the logical plan exponentially (round N's plan embeds round N-1's
    twice), which blows up planning long before data does (observed: plan
    *string* rendering alone OOMs the driver at round ~10). Checkpointing
    truncates lineage to the materialized result, keeping every round's
    plan O(1). On a cluster, swap in ``spark.sparkContext.setCheckpointDir``
    + ``.checkpoint()`` for executor-loss resilience; the algorithm is
    unchanged.

    Returns (node, component) for every node that appears in a pair.
    """
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("node").alias("dst"), F.col("component").alias("__c")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("__c").alias("__nbr_min"))
        )
        stepped = labels.join(nbr_min, labels["node"] == nbr_min["src"], "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("__nbr_min"), F.col("component"))
            ).alias("component"),
        )
        # path halving: comp := comp(comp) — labels table has a row for
        # every node and components are nodes, so the self-join resolves
        shortcut = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("node").alias("__ln"), F.col("component").alias("__lc")
                ),
                F.col("s.component") == F.col("__ln"),
            )
            .select("node", F.col("__lc").alias("component"))
        )
        proposed = (
            shortcut.alias("new")
            .join(
                labels.select(F.col("node").alias("__on"), F.col("component").alias("__oc")),
                F.col("new.node") == F.col("__on"),
            )
            .select(
                "node",
                "component",
                (F.col("component") < F.col("__oc")).alias("__changed"),
            )
            .localCheckpoint()  # materializes eagerly; truncates lineage
        )
        changed = proposed.filter(F.col("__changed")).count()
        labels = proposed.drop("__changed")
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the duplicate graph is deeper than expected — raise max_iter "
            "(rounds needed ≈ log2(longest label chain))"
        )
    edges.unpersist()
    return labels.select(F.col("node"), F.col("component"))


def dedup_keep_list(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a component assignment as a dedup decision: every document
    keeps its component's representative (min id); docs never seen in a
    pair are their own representative. Left join against the (small,
    pair-nodes-only) component table — broadcastable in practice since
    the dup-graph is a tiny fraction of the corpus."""
    return df.join(
        F.broadcast(components).withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("representative", F.coalesce(F.col("component"), F.col(id_col)))
