"""Corpus-trained n-gram language-model scoring for data curation.

Two classic pretraining-data selection primitives, both trained ON the
corpus being scored (no external model artifacts), both beyond the
reference's weather surface (SURVEY §2 extension family: text analysis /
curation next to ``text.py`` quality heuristics and ``curation.py``):

- :func:`bigram_lm_scores` — the CCNet/KenLM-style fluency filter: a
  word-bigram LM with add-one smoothing scores every document by how
  predictable its word transitions are under the corpus itself.
  Boilerplate and templated text score high, line noise scores low;
  filtering the tails is the standard perplexity-filter move.
- :func:`dsir_weights` — DSIR (Data Selection via Importance Resampling,
  Xie et al. 2023): per-document importance weights from the ratio of a
  TARGET domain's unigram feature distribution to the RAW corpus's.
  Sampling ∝ weight reshapes the corpus toward the target domain.

Cross-engine determinism (the module-wide rule, same as ``search.py``):
probabilities and ratios stay in scaled INTEGER arithmetic — add-one
smoothed counts, floor division to micro-units — because `ln`/float
division drift in the last ulp between engines.  The standard
formulations use log-probabilities; the monotone per-event quantities
here (smoothed conditional probability, target/raw probability ratio)
rank documents for the same filtering decisions while letting the DuckDB
oracle replay every value bit-for-bit.  (Production swap: wrap the same
rationals in `ln` and sum — one float op per n-gram type.)

Scale shape (both functions):

1. tokenize in narrow maps (``text.py:tokens``, shared regex) — the
   per-doc n-gram rollup is persisted so multi-branch consumers share
   one pass; ``bigram_lm_scores``'s vocabulary count is a second narrow
   scan (cheaper than persisting the raw token projection it would
   share);
2. n-gram count tables reduce to VOCABULARY-sized frames, shuffled on
   the n-gram key with map-side partial aggregation;
3. per-document n-gram occurrences pre-aggregate to
   ``(doc_id, gram, cnt)`` BEFORE joining the probability table, so the
   model join carries distinct (doc, gram) pairs, not raw token
   positions;
4. the model join is keyed on the gram — never FORCE-broadcast (the
   vocabulary grows with the corpus); Catalyst's size threshold still
   broadcasts it while it fits, and Zipf skew on stopword grams is
   AQE's skew-join case once it shuffles;
5. one final ``groupBy(doc_id)`` produces the score.

At 100 TB nothing holds state beyond vocabulary-sized aggregates and
the corpus-sized (doc, gram) flow; no collects, no Python in the row
path.  Integer magnitudes: products are bounded by
``count × (corpus_tokens + vocab) × SCALE`` — under 2⁶³ through ~10⁹
tokens at micro scale; past that, drop SCALE to milli or switch the
two factors to DECIMAL(38,0) (same swap note as BM25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from killrweather_spark.functions.text import TOKEN_RE, tokens
from killrweather_spark.plans.caching import persist_once

SCALE_P = 1_000_000  # micro-units for smoothed bigram probabilities
SCALE_R = 1_000_000  # micro-units for DSIR target/raw ratios

_TOK_SQL = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """``(doc_id, w1, w2, cnt)`` — per-document bigram multiplicities.

    Bigrams come straight off the token ARRAY (adjacent pairs via an
    indexed ``transform`` over the first n-1 elements) — no positional
    explode-then-self-join, which would shuffle token positions twice.
    """
    pairs = F.when(
        F.size(F.col("toks")) >= 2,
        F.expr(
            "transform(slice(toks, 1, size(toks) - 1), "
            "(w, i) -> struct(w AS w1, element_at(toks, i + 2) AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(pairs).alias("bg"))
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def bigram_lm_scores(docs: DataFrame) -> DataFrame:
    """Per-document mean smoothed bigram probability (micro-units).

    Model: ``P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)`` — add-one
    smoothing over the corpus's own bigram table, V = distinct token
    types.  Document score = floor-mean of ``P`` over the document's
    bigram occurrences, scaled ×10⁶.  Returns
    ``(doc_id, n_bigrams, mean_p_micro)``; docs with < 2 tokens carry
    no bigrams and drop out (both engines agree).
    """
    # doc_bg feeds both the model counts and the final scoring join —
    # persist so the tokenize + pre-aggregation runs once per branch set
    doc_bg = _doc_bigrams(docs).transform(persist_once)
    cbg = (
        doc_bg.groupBy("w1", "w2")
        .agg(F.sum("cnt").cast("bigint").alias("cbg"))
    )
    cug = cbg.groupBy("w1").agg(F.sum("cbg").alias("cug"))
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .agg(F.count_distinct("term").cast("bigint").alias("v"))
    )
    # the probability table is vocabulary-sized: cbg ⋈ cug share the w1
    # key (no broadcast HINT — the vocabulary grows with the corpus, so
    # Catalyst's size threshold decides), the 1-row vocab count
    # broadcasts by construction
    ptable = (
        cbg.join(cug, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.expr(f"({SCALE_P} * (cbg + 1)) div (cug + v)").alias("p_micro"),
        )
    )
    return (
        doc_bg.join(ptable, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.expr("sum(cnt * p_micro) div sum(cnt)")
            .cast("bigint")
            .alias("mean_p_micro"),
        )
    )


def bigram_lm_scores_sql() -> str:
    """DuckDB oracle for :func:`bigram_lm_scores` — identical integer
    arithmetic; bigrams from ``generate_series`` over the token list."""
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ),
    doc_bg AS MATERIALIZED (
      SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS i(i)
      GROUP BY 1, 2, 3
    ),
    cbg AS (
      SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS cbg
      FROM doc_bg GROUP BY 1, 2
    ),
    cug AS (SELECT w1, CAST(SUM(cbg) AS BIGINT) AS cug FROM cbg GROUP BY 1),
    vocab AS (
      SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v
      FROM (SELECT unnest(t) AS term FROM tok)
    ),
    ptable AS (
      SELECT w1, w2, ({SCALE_P} * (cbg + 1)) // (cug + v) AS p_micro
      FROM cbg JOIN cug USING (w1) CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(cnt * p_micro) // SUM(cnt) AS BIGINT) AS mean_p_micro
    FROM doc_bg JOIN ptable USING (w1, w2)
    GROUP BY doc_id
    """


def dsir_weights(docs: DataFrame, target_source: str) -> DataFrame:
    """DSIR importance weights toward the ``target_source`` domain.

    Hashed-feature DSIR reduced to its exact form (the corpus vocabulary
    fits a count table, so no feature hashing is needed): per token type,
    ``ratio = p_target(t) / p_raw(t)`` with add-one smoothing —
    ``((c_t + 1) · (N_r + V)) · 10⁶ div ((c_r + 1) · (N_t + V))`` — and a
    document's weight is the floor-mean ratio over its token occurrences.
    Sampling ∝ weight reshapes the raw corpus toward the target domain's
    unigram distribution.  Returns ``(doc_id, n_tokens, weight_micro)``.
    """
    doc_ug = (
        docs.select(
            "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        # feeds raw counts, target counts, and the final scoring join
        .transform(persist_once)
    )
    # ONE vocabulary aggregation carries both count columns (r14): the
    # former shape ran two corpus-scale term rollups (raw + the
    # target-filtered tgt) and LEFT-joined them — a second term-keyed
    # Exchange over the same persisted doc_ug for a conditional sum the
    # first rollup can compute in place.  ``c_t`` is NULL exactly when the
    # term never occurs in the target source, matching the old left
    # join's missing-term NULL (target-only types cannot occur in raw
    # documents, so nothing is lost either way).
    counts = doc_ug.groupBy("term").agg(
        F.sum("cnt").alias("c_r"),
        F.sum(
            F.when(F.col("source") == target_source, F.col("cnt"))
        ).alias("c_t"),
    )
    totals = counts.agg(
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("bigint").alias("n_t"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    # ratio table: raw-vocabulary-sized; totals broadcast as one row
    rtable = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.expr(
                f"((coalesce(c_t, 0) + 1) * (n_r + v) * {SCALE_R}) "
                "div ((c_r + 1) * (n_t + v))"
            ).alias("r_micro"),
        )
    )
    return (
        doc_ug.join(rtable, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.expr("sum(cnt * r_micro) div sum(cnt)")
            .cast("bigint")
            .alias("weight_micro"),
        )
    )


def dsir_weights_sql(target_source: str) -> str:
    """DuckDB oracle for :func:`dsir_weights` — same smoothed-ratio
    integer arithmetic."""
    target_source = target_source.replace("'", "''")
    return f"""
    WITH doc_ug AS MATERIALIZED (
      SELECT doc_id, source, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, source, unnest({_TOK_SQL}) AS term
            FROM documents)
      GROUP BY 1, 2, 3
    ),
    raw AS MATERIALIZED (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c_r
            FROM doc_ug GROUP BY 1),
    tgt AS MATERIALIZED (SELECT term, CAST(SUM(cnt) AS BIGINT) AS c_t
            FROM doc_ug WHERE source = '{target_source}' GROUP BY 1),
    totals AS (
      SELECT CAST(SUM(c_r) AS BIGINT) AS n_r,
             CAST(COALESCE(SUM(c_t), 0) AS BIGINT) AS n_t,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM raw LEFT JOIN tgt USING (term)
    ),
    rtable AS (
      SELECT term,
             ((COALESCE(c_t, 0) + 1) * (n_r + v) * {SCALE_R})
               // ((c_r + 1) * (n_t + v)) AS r_micro
      FROM raw LEFT JOIN tgt USING (term) CROSS JOIN totals
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * r_micro) // SUM(cnt) AS BIGINT) AS weight_micro
    FROM doc_ug JOIN rtable USING (term)
    GROUP BY doc_id
    """


def kn_bigram_scores(docs: DataFrame) -> DataFrame:
    """Per-document mean interpolated Kneser-Ney bigram probability
    (micro-units) — the stronger-smoothing sibling of
    :func:`bigram_lm_scores` (KN is what KenLM actually ships; add-one
    overweights unseen mass badly on Zipfian text).

    Model, with the standard discount D = 3/4 (exact as the rational 3/4,
    so the whole computation stays in integer floor arithmetic):

    ``P(w2|w1) = (c(w1w2) − D)/c(w1·) + D·N1+(w1·)/c(w1·) · Pcont(w2)``
    ``Pcont(w2) = N1+(·w2) / N1+(··)``

    where ``N1+(w1·)`` is the number of distinct continuations of w1,
    ``N1+(·w2)`` the number of distinct left-contexts of w2, and
    ``N1+(··)`` the total distinct bigram types.  Every observed bigram
    has c ≥ 1 > D, so the discounted term is positive and both terms are
    exact integer ratios scaled ×10⁶ with separate floor divisions:

    ``p_micro = (10⁶·(4c−3)) div (4·c(w1·))
              + (10⁶·3·N1(w1)·Nctx(w2)) div (4·c(w1·)·Ntypes)``

    Magnitudes: the second numerator ≤ 3·V·V·10⁶ — under 2⁶³ through
    ~10⁶-type vocabularies; past that drop the scale to milli (the BM25
    swap note).  Scale shape is bigram_lm_scores': one tokenize pass,
    vocabulary-sized count/continuation tables joined on the gram key,
    one final per-doc rollup.  Returns
    ``(doc_id, n_bigrams, mean_p_micro)``.
    """
    doc_bg = _doc_bigrams(docs).transform(persist_once)
    cbg = (
        doc_bg.groupBy("w1", "w2")
        .agg(F.sum("cnt").cast("bigint").alias("cbg"))
        .transform(persist_once)
    )
    cug = cbg.groupBy("w1").agg(
        F.sum("cbg").cast("bigint").alias("cug"),
        F.count(F.lit(1)).cast("bigint").alias("n1fw"),  # N1+(w1 ·)
    )
    ctx = cbg.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("nctx")   # N1+(· w2)
    )
    ntypes = cbg.agg(F.count(F.lit(1)).cast("bigint").alias("ntypes"))
    ptable = (
        cbg.join(cug, "w1")
        .join(ctx, "w2")
        .crossJoin(F.broadcast(ntypes))
        .select(
            "w1",
            "w2",
            (
                F.expr(f"({SCALE_P} * (4 * cbg - 3)) div (4 * cug)")
                + F.expr(
                    f"({SCALE_P} * 3 * n1fw * nctx) div (4 * cug * ntypes)"
                )
            ).cast("bigint").alias("p_micro"),
        )
    )
    return (
        doc_bg.join(ptable, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.expr("sum(cnt * p_micro) div sum(cnt)")
            .cast("bigint")
            .alias("mean_p_micro"),
        )
    )


def kn_bigram_scores_sql() -> str:
    """DuckDB oracle for :func:`kn_bigram_scores` — identical discounted
    integer arithmetic over the same bigram/continuation tables."""
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, {_TOK_SQL} AS t FROM documents
    ),
    doc_bg AS MATERIALIZED (
      SELECT doc_id, t[i.i] AS w1, t[i.i + 1] AS w2,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok, unnest(generate_series(1, len(t) - 1)) AS i(i)
      GROUP BY 1, 2, 3
    ),
    cbg AS MATERIALIZED (
      SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS cbg
      FROM doc_bg GROUP BY 1, 2
    ),
    cug AS (SELECT w1, CAST(SUM(cbg) AS BIGINT) AS cug,
                   CAST(COUNT(*) AS BIGINT) AS n1fw
            FROM cbg GROUP BY 1),
    ctx AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nctx FROM cbg GROUP BY 1),
    ntypes AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntypes FROM cbg),
    ptable AS (
      SELECT w1, w2,
             ({SCALE_P} * (4 * cbg - 3)) // (4 * cug)
             + ({SCALE_P} * 3 * n1fw * nctx) // (4 * cug * ntypes)
               AS p_micro
      FROM cbg JOIN cug USING (w1) JOIN ctx USING (w2) CROSS JOIN ntypes
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(cnt * p_micro) // SUM(cnt) AS BIGINT) AS mean_p_micro
    FROM doc_bg JOIN ptable USING (w1, w2)
    GROUP BY doc_id
    """


PERC_BUCKETS = 256  # hashed feature dimensionality (md5-derived, no seeds)

# Hard epoch ceiling shared by the trainer and its oracle builder: each
# epoch is 2 eager localCheckpoints plus a curve-row job from the driver
# loop (a blocking serial chain), and the unrolled DuckDB oracle grows ~5
# CTEs per epoch (measured: epochs=7 took 38 s on a 10-row table, epochs=9
# never finished).  Misuse fails loudly here instead of hanging the gate;
# past this ceiling the right tool is a streaming/minibatch trainer, not a
# longer unrolled batch chain.
PERC_MAX_EPOCHS = 8


def _perceptron_features(docs: DataFrame, target_source: str) -> DataFrame:
    """``(doc_id, y, bucket, cnt)`` hashed token-count features with the
    ±1 domain label — shared by the training curve and the apply step.
    Repartitioned by doc_id ONCE and persisted so every epoch's margin
    aggregation groups on the partitioning key with no exchange."""
    return (
        docs.select(
            "doc_id",
            F.when(F.col("source") == target_source, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("y"),
            F.explode(tokens(F.col("text"))).alias("term"),
        )
        .select(
            "doc_id",
            "y",
            (
                F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10)
                .cast("bigint")
                % PERC_BUCKETS
            ).alias("bucket"),
        )
        .groupBy("doc_id", "y", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .repartition("doc_id")
        .transform(persist_once)
    )


def _check_epochs(epochs: int) -> None:
    if not 1 <= epochs <= PERC_MAX_EPOCHS:
        raise ValueError(
            f"epochs={epochs} outside [1, {PERC_MAX_EPOCHS}]: each epoch is"
            " a blocking checkpoint chain on the driver and ~5 unrolled"
            " oracle CTEs — see PERC_MAX_EPOCHS"
        )


def perceptron_domain_classifier(
    docs: DataFrame, target_source: str, epochs: int = 3
) -> DataFrame:
    """Train an integer batch perceptron separating the target domain —
    the fastText-style quality/domain classifier of LLM data pipelines
    (CCNet, LLaMA filtering), reduced to a form a DuckDB oracle replays
    bit-for-bit: hashed token-count features (md5 → ``PERC_BUCKETS``
    buckets, no RNG), labels ``y = ±1`` by source, and the BATCH update
    ``w ← w + Σ_misclassified y·x`` (all integers; a doc is misclassified
    when ``y·(w·x) ≤ 0``).  Starting from w = 0, every epoch is exactly
    determined — no learning-rate or shuffle-order nondeterminism.

    Returns the training curve: one row per epoch ``(epoch, n_train,
    n_misclassified, error_micro)`` where row e reports errors under the
    weights BEFORE epoch e's update, plus a final row (``epochs + 1``)
    scoring the finished weights.  A shrinking error column IS the
    classifier learning the domain; downstream filtering applies
    ``sign(w·x)`` with the final weights.

    Scale: features pre-aggregate to ``(doc_id, y, bucket, cnt)`` and are
    REPARTITIONED BY doc_id once and persisted — every epoch's margin
    aggregation then groups on the partitioning key with no exchange;
    the weight table is ``PERC_BUCKETS`` rows (broadcast by
    construction) and each update is a bucket-keyed partial aggregation
    of misclassified rows only.  Per epoch: one broadcast, one
    exchange-free margin agg, one bucket-sized update shuffle.

    ``epochs`` is capped at :data:`PERC_MAX_EPOCHS` — the driver loop is
    a serial chain of blocking checkpoints and the unrolled oracle grows
    ~5 CTEs per epoch, so a large value degrades into a hang; fail loudly
    instead.
    """
    _check_epochs(epochs)
    feats = _perceptron_features(docs, target_source)
    ntr = feats.agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_train")
    ).localCheckpoint(eager=True)
    spark = docs.sparkSession
    w = spark.range(PERC_BUCKETS).select(
        F.col("id").cast("bigint").alias("bucket"),
        F.lit(0).cast("bigint").alias("w"),
    )
    wdoc = Window.partitionBy("doc_id")
    out = []
    for epoch in range(1, epochs + 2):
        # ONE feats pass per epoch (was two: a margin groupBy for the
        # curve row plus a mis-join-feats pass for the update): the
        # margin is a partitionBy(doc_id) window sum — feats is already
        # partitioned by doc_id, so no exchange — and the filtered frame
        # KEEPS the bucket rows, so the update aggregates it directly
        # instead of joining the doc-level set back onto feats.  Integer
        # sums are order-free, so window-vs-groupBy is value-identical.
        misrows = (
            feats.join(F.broadcast(w), "bucket")
            .withColumn("m", F.sum(F.col("cnt") * F.col("w")).over(wdoc))
            .filter(F.col("y") * F.col("m") <= 0)
            .select("doc_id", "y", "bucket", "cnt")
        )
        if epoch <= epochs:
            # feeds BOTH the curve row and the update — materialize once
            # (kcenter lineage rule)
            misrows = misrows.localCheckpoint(eager=True)
        out.append(
            misrows.agg(
                F.count_distinct("doc_id")
                .cast("bigint")
                .alias("n_misclassified")
            )
            .crossJoin(F.broadcast(ntr))
            .select(
                F.lit(epoch).cast("bigint").alias("epoch"),
                "n_train",
                "n_misclassified",
                F.expr(
                    "(1000000 * n_misclassified) div greatest(n_train, 1)"
                )
                .cast("bigint")
                .alias("error_micro"),
            )
        )
        if epoch <= epochs:
            upd = misrows.groupBy("bucket").agg(
                F.sum(F.col("y") * F.col("cnt")).alias("u")
            )
            w = (
                w.join(upd, "bucket", "left")
                .select(
                    "bucket",
                    (F.col("w") + F.coalesce(F.col("u"), F.lit(0)))
                    .cast("bigint")
                    .alias("w"),
                )
                .localCheckpoint(eager=True)
            )
    res = out[0]
    for nxt in out[1:]:
        res = res.unionAll(nxt)
    return res


def perceptron_domain_classifier_sql(
    target_source: str, epochs: int = 3
) -> str:
    """DuckDB oracle for :func:`perceptron_domain_classifier` — the
    epochs unrolled into CTE stages over the identical md5 bucketing and
    integer batch updates.  Same :data:`PERC_MAX_EPOCHS` ceiling as the
    trainer (the unrolled plan is the measured hang)."""
    _check_epochs(epochs)
    parts = _perceptron_base_parts_sql(target_source)
    selects = []
    for e in range(1, epochs + 2):
        parts += _perceptron_epoch_parts_sql(e, with_update=e <= epochs)
        selects.append(
            f"SELECT CAST({e} AS BIGINT) AS epoch, n AS n_train,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM mis{e})"
            " AS n_misclassified,"
            f" CAST((1000000 * (SELECT COUNT(*) FROM mis{e}))"
            " // GREATEST(n, 1) AS BIGINT) AS error_micro FROM ntr"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


def _perceptron_base_parts_sql(target_source: str) -> list[str]:
    """feats / ntr / w0 CTEs shared by the curve and apply oracles.

    Every multi-referenced CTE is MATERIALIZED: DuckDB inlines plain
    CTEs, and feats/w/mis are each referenced 2-3x per epoch — inlined,
    the plan doubles per epoch (measured: epochs=7 took 38 s on a 10-row
    table; epochs=9 never finished)."""
    target_source = target_source.replace("'", "''")
    return [
        f"""feats AS MATERIALIZED (
      SELECT doc_id, y, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id,
                   CASE WHEN source = '{target_source}' THEN 1 ELSE -1 END AS y,
                   ('0x' || substr(md5(term), 1, 8))::BIGINT % {PERC_BUCKETS}
                     AS bucket
            FROM (SELECT doc_id, source, unnest({_TOK_SQL}) AS term
                  FROM documents))
      GROUP BY 1, 2, 3)""",
        "ntr AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT doc_id)"
        " AS BIGINT) AS n FROM feats)",
        f"w0 AS MATERIALIZED (SELECT i.i AS bucket, CAST(0 AS BIGINT) AS w\n"
        f"           FROM unnest(generate_series(0, {PERC_BUCKETS - 1}))"
        " AS i(i))",
    ]


def _perceptron_epoch_parts_sql(e: int, with_update: bool) -> list[str]:
    """One epoch's m/mis (+ u/w when the epoch updates) CTEs."""
    parts = [
        f"m{e} AS MATERIALIZED (SELECT f.doc_id, f.y,"
        " CAST(SUM(f.cnt * w.w) AS BIGINT) AS m\n"
        f"           FROM feats f JOIN w{e - 1} w USING (bucket)"
        " GROUP BY 1, 2)",
        f"mis{e} AS MATERIALIZED (SELECT doc_id, y AS my"
        f" FROM m{e} WHERE y * m <= 0)",
    ]
    if with_update:
        parts.append(
            f"u{e} AS (SELECT f.bucket,"
            " CAST(SUM(s.my * f.cnt) AS BIGINT) AS u\n"
            f"           FROM mis{e} s JOIN feats f USING (doc_id)"
            " GROUP BY 1)"
        )
        parts.append(
            f"w{e} AS MATERIALIZED (SELECT w.bucket,"
            " CAST(w.w + COALESCE(u.u, 0) AS BIGINT) AS w\n"
            f"           FROM w{e - 1} w LEFT JOIN u{e} u USING (bucket))"
        )
    return parts


def perceptron_final_weights(
    docs: DataFrame, target_source: str, epochs: int = 3
) -> DataFrame:
    """The finished classifier: ``(bucket, w)`` after ``epochs`` batch
    updates — the training loop of :func:`perceptron_domain_classifier`
    without the curve instrumentation (no per-epoch count jobs; one
    blocking checkpoint per epoch instead of three driver actions).
    Deterministic for the same reason the curve is: w starts at 0 and
    every update is an integer batch sum."""
    _check_epochs(epochs)
    feats = _perceptron_features(docs, target_source)
    spark = docs.sparkSession
    w = spark.range(PERC_BUCKETS).select(
        F.col("id").cast("bigint").alias("bucket"),
        F.lit(0).cast("bigint").alias("w"),
    )
    for _ in range(epochs):
        margins = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("m"))
        )
        mis = margins.filter(F.col("y") * F.col("m") <= 0).select(
            "doc_id", F.col("y").alias("my")
        )
        upd = (
            mis.join(feats, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("my") * F.col("cnt")).alias("u"))
        )
        # one eager checkpoint per epoch: w feeds the next epoch's margin
        # join AND (transitively) every later stage — the kcenter lineage
        # rule; the frame is PERC_BUCKETS rows, so the cost is the epoch's
        # own job, nothing more
        w = (
            w.join(upd, "bucket", "left")
            .select(
                "bucket",
                (F.col("w") + F.coalesce(F.col("u"), F.lit(0)))
                .cast("bigint")
                .alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w


def domain_filtered_corpus(
    docs: DataFrame, target_source: str, epochs: int = 3,
    mode: str = "sign",
) -> DataFrame:
    """The APPLY step the classifier exists for: score every document with
    the final trained weights (the same lineage
    :func:`perceptron_domain_classifier` reports the curve of) and keep
    the in-domain slice.  This is the fastText-gate stage of an LLM data
    pipeline: train on labeled data, then sweep the corpus.

    Two gate semantics, both exact-integer and oracle-replayable:

    - ``mode="sign"`` — the production gate: keep ``w·x > 0`` (the strict
      complement of training's ``y·(w·x) ≤ 0`` misclassification rule, so
      the boundary doc is consistently out).  On a corpus whose domains
      are genuinely separable this returns the domain (pinned on a
      disjoint-vocabulary fixture in tests).
    - ``mode="above_mean"`` — the BUDGETED-selection gate: keep docs whose
      margin exceeds the corpus mean margin (sign-safe floor mean, the
      kmeans centroid form).  Production pipelines often threshold the
      classifier score to hit a token budget rather than at 0; the mean
      is the budget threshold that needs only a 1-row broadcast
      aggregate — no global sort, no percentile sketch — so the plan
      stays map-only after training.  (It is also the honest gate for
      the SYNTHETIC fixture, whose sources share one vocabulary by
      construction: a linear classifier has no signal to find, the sign
      gate degenerates to empty-or-everything, and the relative gate
      still exercises the full mechanism with a non-trivial kept set.)

    Scale shape: the weight table is ``PERC_BUCKETS`` rows and broadcasts;
    scoring is one margin aggregation over the doc_id-partitioned feature
    table (exchange-free on the persisted partitioning), the threshold is
    at most one more 1-row broadcast, and the doc join is doc_id-keyed —
    the corpus is touched once past training.

    Output: ``(doc_id, source, margin)`` for kept docs — ``source`` kept
    so the funnel can audit the gate's domain mix, ``margin`` the integer
    evidence strength.
    """
    if mode not in ("sign", "above_mean"):
        raise ValueError(f"unknown gate mode {mode!r}")
    feats = _perceptron_features(docs, target_source)
    w = perceptron_final_weights(docs, target_source, epochs)
    margins = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("w")).cast("bigint").alias("margin"))
    )
    if mode == "sign":
        kept = margins.filter(F.col("margin") > 0)
    else:
        mu = margins.agg(
            F.expr(
                "(sum(margin) - ((sum(margin) % count(1) + count(1))"
                " % count(1))) div count(1)"
            ).cast("bigint").alias("mu")
        )
        kept = (
            margins.crossJoin(F.broadcast(mu))
            .filter(F.col("margin") > F.col("mu"))
            .drop("mu")
        )
    return (
        kept.join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "margin")
    )


def domain_filtered_corpus_sql(target_source: str, epochs: int = 3,
                               mode: str = "sign") -> str:
    """DuckDB oracle for :func:`domain_filtered_corpus` — the training
    unrolled to ``w{epochs}``, then one margin scoring + the gate
    (sign, or the sign-safe floor-mean threshold)."""
    _check_epochs(epochs)
    if mode not in ("sign", "above_mean"):
        raise ValueError(f"unknown gate mode {mode!r}")
    parts = _perceptron_base_parts_sql(target_source)
    for e in range(1, epochs + 1):
        parts += _perceptron_epoch_parts_sql(e, with_update=True)
    parts.append(
        "margins AS MATERIALIZED (SELECT f.doc_id,"
        " CAST(SUM(f.cnt * w.w) AS BIGINT) AS margin\n"
        f"           FROM feats f JOIN w{epochs} w USING (bucket)"
        " GROUP BY 1)"
    )
    if mode == "sign":
        gate = "m.margin > 0"
    else:
        parts.append(
            "mu AS (SELECT CAST((SUM(margin)"
            " - ((SUM(margin) % COUNT(*) + COUNT(*)) % COUNT(*)))"
            " // COUNT(*) AS BIGINT) AS mu FROM margins)"
        )
        gate = "m.margin > (SELECT mu FROM mu)"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT m.doc_id, d.source, m.margin
    FROM margins m JOIN documents d ON d.doc_id = m.doc_id
    WHERE {gate}"""
    )


def bigram_lm_ptable(model_docs: DataFrame) -> DataFrame:
    """The trained bigram probability table alone — ``(w1, w2, p_micro)``
    with :func:`bigram_lm_scores`'s exact arithmetic — for consumers that
    train once and score elsewhere (the streaming scorer, a saved-model
    sink).  Vocabulary-sized."""
    doc_bg = _doc_bigrams(model_docs).transform(persist_once)
    cbg = doc_bg.groupBy("w1", "w2").agg(
        F.sum("cnt").cast("bigint").alias("cbg")
    )
    cug = cbg.groupBy("w1").agg(F.sum("cbg").alias("cug"))
    vocab = model_docs.select(
        F.explode(tokens(F.col("text"))).alias("term")
    ).agg(F.count_distinct("term").cast("bigint").alias("v"))
    return (
        cbg.join(cug, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.expr(f"({SCALE_P} * (cbg + 1)) div (cug + v)").alias("p_micro"),
        )
    )


def bigram_lm_scores_stream(
    model_docs: DataFrame, stream_docs: DataFrame
) -> DataFrame:
    """The production LM-filter deployment shape: the bigram model is
    trained ONCE in batch (:func:`bigram_lm_ptable` over ``model_docs``)
    and arriving documents are scored as a STREAM — a stream-static
    equi-join against the vocabulary-sized model, then one stateful
    per-document rollup.  Value-identical to :func:`bigram_lm_scores`
    when the stream replays the training corpus (the batch-equivalence
    oracle), because scoring is per-occurrence integer arithmetic.

    Streaming constraints shape the plan: Structured Streaming allows
    ONE aggregation, so bigram occurrences join the model as raw
    positions (cnt=1 rows) instead of batch's pre-aggregated
    ``(doc, gram, cnt)`` — ``sum(p)//count(*)`` ≡ ``sum(cnt*p)//sum(cnt)``.
    The model side is persisted so each micro-batch re-reads the trained
    table, not the training lineage.  State is per-document partial sums
    only; with documents atomic per micro-batch, production would run
    this in update mode with a watermark evicting finished docs.
    """
    ptable = bigram_lm_ptable(model_docs).transform(persist_once)
    # Spread the narrow micro-batch across every task slot before the
    # bigram explode (the streaming_semantic_screen fan-out rule,
    # pq.py): a |batch|-row round-robin exchange per trigger buys
    # full-width scoring; the per-doc rollup is keyed, so placement
    # cannot change any value.
    stream_docs = stream_docs.repartition(
        stream_docs.sparkSession.sparkContext.defaultParallelism
    )
    toks = tokens(F.col("text"))
    pairs = (
        stream_docs.withColumn("__toks", toks)
        .filter(F.size("__toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> struct(__toks[i - 1] AS w1, __toks[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    return (
        pairs.join(ptable, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr("sum(p_micro) div count(*)")
            .cast("bigint")
            .alias("mean_p_micro"),
        )
    )
