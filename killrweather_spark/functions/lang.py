"""Trained language-ID gate — the first stage of a real curation funnel.

The reference pipeline (KillrWeather ingests weather CSV, not text) has no
language stage; every production LLM-data pipeline does, and round 7's
funnel shipped quality, domain, PII, and dedup gates without one.  This
module adds the classic Cavnar–Trenkle shape in Spark-first form:

- **train** (:func:`lang_trigram_profiles`): character-trigram profiles
  per declared ``lang``, TRAINED ON-CLUSTER from the corpus itself — one
  explode pass, a (lang, gram) count rollup, per-lang integer
  ``weight_micro = (10⁶·count) div total``, top-``k`` grams per lang by
  ``(count DESC, gram)``.  The profile table is ``|langs|·k`` rows —
  broadcastable by construction at any corpus size.
- **score** (:func:`lang_profile_scores`): per-doc gram counts join the
  BROADCAST profile table on ``gram`` and fold to one integer score per
  (doc, lang) — a codegen sum, no Python anywhere.
- **gate** (:func:`lang_filtered_corpus`): argmax lang per doc (ties →
  lang ascending, identical on both engines), then keep by mode:
  ``match_declared`` keeps docs whose detected language agrees with
  their ``lang`` metadata (the mislabeled-crawl-segment screen — the
  mode with signal on the shipped corpus, whose five declared languages
  share one synthetic vocabulary, exactly the situation
  ``domain_filtered_corpus`` documents for its mean-threshold mode);
  ``target`` keeps docs detected as one pipeline target language (the
  production monolingual-corpus gate, pinned on a disjoint-alphabet
  fixture in tests where it separates perfectly).
- **funnel** (:func:`lang_gate_funnel`): the gate integrated as the
  FIRST stage of the Gopher-rules funnel (lang_mismatch → too_short →
  too_long → low_stopword → kept) with first-failure attribution and
  integer micro shares — the per-stage datasheet shape of
  ``filter_funnel``.

Scale: training is one corpus pass rolled up to a vocabulary-bounded
table; scoring is explode → per-doc rollup → broadcast join; nothing
ever shuffles more than (doc, gram) tuples, and the profile side is
O(|langs|·k) regardless of corpus size.  All arithmetic is int64
(products bounded by 10⁶·max gram count per doc), so the DuckDB oracle
replays every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Profile width: grams per language.  64 keeps the broadcast table tiny
# (5 langs x 64 = 320 rows here) while covering the head of a trigram
# distribution; raise for production corpora with real orthographies.
LANG_PROFILE_K = 64

# Char-trigram explode, guarded for texts shorter than 3 chars (Spark's
# sequence(1, 0) is DESCENDING [1, 0], not empty — the guard is load-bearing).
_TRIGRAMS_EXPR = (
    "CASE WHEN length(t) >= 3 THEN "
    "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3)) "
    "ELSE cast(array() as array<string>) END"
)


def _doc_grams(docs: DataFrame, id_cols: list[str],
               text_col: str = "text") -> DataFrame:
    t = docs.select(*id_cols, F.lower(F.col(text_col)).alias("t"))
    return t.select(*id_cols, F.explode(F.expr(_TRIGRAMS_EXPR)).alias("gram"))


def lang_trigram_profiles(
    docs: DataFrame, k: int = LANG_PROFILE_K, text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Train per-language char-trigram profiles from the corpus's own
    declared labels.  Returns ``(lang, gram, gram_count, weight_micro)``
    — the top-``k`` grams per lang; ``weight_micro`` is the gram's
    integer micro-share of the lang's FULL trigram mass (denominator
    over all grams, not just the kept head, so weights are comparable
    across profile widths)."""
    g = _doc_grams(docs.select(F.col(lang_col).alias("lang"), text_col),
                   ["lang"], text_col)
    c = g.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("gram_count")
    )
    tot = c.groupBy("lang").agg(F.sum("gram_count").alias("__total"))
    w = Window.partitionBy("lang").orderBy(
        F.col("gram_count").desc(), F.col("gram").asc()
    )
    return (
        c.join(tot, "lang")
        .withColumn(
            "weight_micro",
            F.expr("(1000000 * gram_count) div __total").cast("bigint"),
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("lang", "gram", "gram_count", "weight_micro")
    )


def lang_profile_scores(
    docs: DataFrame, profiles: DataFrame, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every trained profile: per-doc gram
    counts join the broadcast ``(lang, gram, weight_micro)`` table and
    fold to ``score_micro = Σ count·weight``.  Langs sharing no gram
    with a doc produce no row (score 0 by absence — identical on both
    engines)."""
    # Profile-gram SEMI filter before the (doc, gram) aggregation (guide
    # §3.2): only n_langs·k distinct grams can ever score, so dropping
    # every other occurrence map-side (broadcast semi on the tiny gram
    # list) shrinks both the partial-aggregation hash map and the
    # hashpartitioning(doc_id, gram) Exchange to profile grams only.
    # Inner-join semantics are unchanged — non-profile grams contributed
    # no score row before either.
    from killrweather_spark.plans.caching import persist_once

    # The profile table is vocabulary-sized (n_langs·k rows) but its
    # lineage is a full corpus pass — and it is referenced twice below
    # (semi gram list + weight join).  Persist so training runs once.
    pg = persist_once(profiles.select("lang", "gram", "weight_micro"))
    dg = (
        _doc_grams(docs.select(id_col, text_col), [id_col], text_col)
        .join(F.broadcast(pg.select("gram").distinct()), "gram", "leftsemi")
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    return (
        dg.join(F.broadcast(pg), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.col("__cnt") * F.col("weight_micro"))
            .cast("bigint")
            .alias("score_micro")
        )
    )


def _predictions(docs: DataFrame, k: int, id_col: str,
                 text_col: str) -> DataFrame:
    """Argmax lang per doc as a struct-MIN aggregate, not a row_number
    window: ``min(struct(-score, lang))`` picks the max score with
    lang-asc tiebreak AND gets map-side partial aggregation (a window
    argmax shuffles every (doc, lang) row; the partial min ships one row
    per doc per map task) — the argmax-at-scale move the batched-BPE
    selection already uses on both engines.

    Train and score share ONE corpus gram pass (the oracle's
    MATERIALIZED ``lg``): per-``(doc, lang, gram)`` counts are computed
    once and persisted; the training rollup sums them to ``(lang,
    gram)`` occurrence counts (Σ per-doc counts ≡ the direct occurrence
    count) and the scorer reads the same frame back per doc — instead
    of exploding and hash-aggregating the corpus twice, once per
    lineage.  The persisted frame is the per-doc distinct-gram table
    (≤ text length rows per doc, far smaller than the occurrence
    explode), the same size class as the tokenized-doc projections
    other curation operators persist."""
    from killrweather_spark.plans.caching import persist_once

    dgc = persist_once(
        _doc_grams(
            docs.select(id_col, "lang", text_col), [id_col, "lang"],
            text_col,
        )
        .groupBy(id_col, "lang", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    c = dgc.groupBy("lang", "gram").agg(
        F.sum("__cnt").cast("bigint").alias("gram_count")
    )
    tot = c.groupBy("lang").agg(F.sum("gram_count").alias("__total"))
    w = Window.partitionBy("lang").orderBy(
        F.col("gram_count").desc(), F.col("gram").asc()
    )
    profiles = (
        c.join(tot, "lang")
        .withColumn(
            "weight_micro",
            F.expr("(1000000 * gram_count) div __total").cast("bigint"),
        )
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select("lang", "gram", "weight_micro")
    )
    scored = (
        dgc.select(id_col, "gram", "__cnt")
        .join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.col("__cnt") * F.col("weight_micro"))
            .cast("bigint")
            .alias("score_micro")
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("nsc"),
                    F.col("lang").alias("plang"),
                )
            ).alias("__s")
        )
        .select(
            id_col,
            F.col("__s.plang").alias("pred_lang"),
            (-F.col("__s.nsc")).cast("bigint").alias("score_micro"),
        )
    )


def lang_filtered_corpus(
    docs: DataFrame,
    k: int = LANG_PROFILE_K,
    mode: str = "match_declared",
    target: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The language gate: train profiles, predict per doc, keep by mode.

    Returns ``(doc_id, lang, source, pred_lang, score_micro)`` for kept
    docs.  ``match_declared`` keeps agreement with the ``lang`` metadata
    (the audit gate — catches mislabeled segments); ``target`` keeps
    docs DETECTED as ``target`` regardless of metadata (the production
    monolingual gate)."""
    if mode not in ("match_declared", "target"):
        raise ValueError(f"unknown mode {mode!r}")
    pred = _predictions(docs, k, id_col, text_col)
    joined = docs.select(id_col, "lang", "source").join(pred, id_col)
    if mode == "match_declared":
        kept = joined.filter(F.col("pred_lang") == F.col("lang"))
    else:
        kept = joined.filter(F.col("pred_lang") == F.lit(target))
    return kept.select(id_col, "lang", "source", "pred_lang", "score_micro")


def lang_gate_funnel(
    docs: DataFrame, k: int = LANG_PROFILE_K, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The trained gate integrated as stage 1 of the Gopher-rules
    funnel: each doc attributes to the FIRST stage it fails —
    ``lang_mismatch`` (trained prediction disagrees with metadata, or no
    prediction at all) → ``too_short`` → ``too_long`` → ``low_stopword``
    → ``kept`` — with integer micro shares of the full corpus.  Same
    report shape as ``filter_funnel``; the new first stage is the one
    every real pipeline runs before quality rules (quality priors are
    language-specific, so scoring an unidentified doc is meaningless)."""
    from killrweather_spark.functions.text import STOPWORDS, tokens

    pred = _predictions(docs, k, id_col, text_col)
    m = (
        docs.select(
            id_col,
            "lang",
            F.length(text_col).alias("__nc"),
            F.size(tokens(F.col(text_col))).alias("__tok"),
            F.size(
                F.regexp_extract_all(
                    F.lower(text_col), F.lit(STOPWORDS["en"]), 0
                )
            ).alias("__stop"),
        )
        .join(pred, id_col, "left")
    )
    staged = m.select(
        F.when(
            F.col("pred_lang").isNull()
            | (F.col("pred_lang") != F.col("lang")),
            F.lit("lang_mismatch"),
        )
        .when(F.col("__tok") < 25, F.lit("too_short"))
        .when(F.col("__nc") > 450, F.lit("too_long"))
        .when(F.col("__stop") * 20 < F.col("__tok"), F.lit("low_stopword"))
        .otherwise(F.lit("kept"))
        .alias("stage")
    )
    # |m| == |docs|: pred is grouped by doc_id (unique join key), so the
    # left join preserves the doc count exactly; counting docs directly
    # avoids replaying the train+score+join lineage for one scalar
    # (guide §1.2: don't compute things you throw away).
    total = docs.agg(F.count(F.lit(1)).alias("__n_total"))
    return (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(total))
        .select(
            "stage",
            "n_docs",
            F.expr("(1000000 * n_docs) div __n_total")
            .cast("bigint")
            .alias("share_micro"),
        )
    )


def lang_scores_stream(
    model_docs: DataFrame,
    stream_docs: DataFrame,
    k: int = LANG_PROFILE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The language gate's DEPLOYMENT shape: profiles trained ONCE in
    batch (:func:`lang_trigram_profiles` over ``model_docs``, persisted),
    arriving documents scored as a STREAM — per-occurrence trigram rows
    join the broadcast profile table, then ONE stateful ``(doc, lang)``
    rollup (a single grouping, within Structured Streaming's
    one-aggregation limit).  ``sum(weight)`` over cnt=1 occurrence rows
    ≡ the batch scorer's ``sum(cnt·weight)``, so replaying the training
    corpus through the stream reproduces :func:`lang_profile_scores`
    bit-for-bit; the argmax/gate step runs on the drained result (the
    ``streaming_tws_totals`` post-drain pattern), making
    ``lang_filtered_corpus``'s batch SQL the oracle verbatim."""
    from killrweather_spark.plans.caching import persist_once

    profiles = lang_trigram_profiles(model_docs, k, text_col).transform(
        persist_once
    )
    # Arrivals come off a NARROW source (a file-stream micro-batch is
    # often one scan partition), and the per-occurrence trigram explode
    # below is the CPU stage — spread the (tiny) arrival rows across
    # every task slot first, the streaming_semantic_screen fan-out rule
    # (pq.py).  A |batch|-row round-robin exchange per trigger buys
    # full-width scoring; the (doc, lang) rollup is keyed, so placement
    # cannot change any value.
    arrivals = stream_docs.select(id_col, text_col).repartition(
        stream_docs.sparkSession.sparkContext.defaultParallelism
    )
    grams = _doc_grams(arrivals, [id_col], text_col)
    return (
        grams.join(
            F.broadcast(profiles.select("lang", "gram", "weight_micro")),
            "gram",
        )
        .groupBy(id_col, "lang")
        .agg(F.sum("weight_micro").cast("bigint").alias("score_micro"))
    )


def gate_drained_scores(
    docs: DataFrame, drained: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Post-drain gate: struct-MIN argmax over the drained (doc, lang)
    scores, metadata join, keep declared==detected — the batch gate's
    exact tail, applied to a stream's drained state."""
    pred = (
        drained.groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("score_micro")).alias("nsc"),
                    F.col("lang").alias("plang"),
                )
            ).alias("__s")
        )
        .select(
            id_col,
            F.col("__s.plang").alias("pred_lang"),
            (-F.col("__s.nsc")).cast("bigint").alias("score_micro"),
        )
    )
    return (
        docs.select(id_col, "lang", "source")
        .join(pred, id_col)
        .filter(F.col("pred_lang") == F.col("lang"))
        .select(id_col, "lang", "source", "pred_lang", "score_micro")
    )


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _profile_ctes(k: int) -> str:
    """The shared train-and-predict CTE chain (documents → pred).
    ``lg``/``lc`` are MATERIALIZED: each is referenced twice (the 2^k
    CTE-inlining class this repo documents on the BPE oracle)."""
    return f"""lt AS (
      SELECT doc_id, lang, lower(text) AS t FROM documents
    ),
    lg AS MATERIALIZED (
      SELECT doc_id, lang, substr(t, i.i, 3) AS gram
      FROM lt, unnest(generate_series(1, len(t) - 2)) AS i(i)
    ),
    lc AS MATERIALIZED (
      SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS gram_count
      FROM lg GROUP BY 1, 2
    ),
    ltot AS (SELECT lang, SUM(gram_count) AS total FROM lc GROUP BY 1),
    prof AS MATERIALIZED (
      SELECT lang, gram, gram_count,
             CAST((1000000 * gram_count) // total AS BIGINT) AS weight_micro
      FROM lc JOIN ltot USING (lang)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
                                 ORDER BY gram_count DESC, gram) <= {k}
    ),
    dg AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lg GROUP BY 1, 2
    ),
    sc AS (
      SELECT dg.doc_id, p.lang AS plang,
             CAST(SUM(dg.cnt * p.weight_micro) AS BIGINT) AS score_micro
      FROM dg JOIN prof p USING (gram)
      GROUP BY 1, 2
    ),
    pred AS MATERIALIZED (
      SELECT doc_id, s['plang'] AS pred_lang,
             CAST(-s['nsc'] AS BIGINT) AS score_micro
      FROM (SELECT doc_id,
                   MIN({{'nsc': -score_micro, 'plang': plang}}) AS s
            FROM sc GROUP BY doc_id)
    )"""


def lang_trigram_profiles_sql(k: int = LANG_PROFILE_K) -> str:
    return f"""
    WITH {_profile_ctes(k)}
    SELECT lang, gram, gram_count, weight_micro FROM prof
    """


def lang_filtered_corpus_sql(
    k: int = LANG_PROFILE_K, mode: str = "match_declared",
    target: str = "en",
) -> str:
    if mode not in ("match_declared", "target"):
        raise ValueError(f"unknown mode {mode!r}")
    where = (
        "p.pred_lang = d.lang" if mode == "match_declared"
        else f"p.pred_lang = '{target}'"
    )
    return f"""
    WITH {_profile_ctes(k)}
    SELECT d.doc_id, d.lang, d.source, p.pred_lang, p.score_micro
    FROM documents d JOIN pred p USING (doc_id)
    WHERE {where}
    """


def lang_gate_funnel_sql(k: int = LANG_PROFILE_K) -> str:
    return rf"""
    WITH {_profile_ctes(k)},
    lm AS (
      SELECT d.doc_id, d.lang, p.pred_lang,
             length(d.text) AS nc,
             len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS tok,
             len(regexp_extract_all(lower(d.text),
                 '\b(the|a|and|of|to|in|is)\b')) AS stop
      FROM documents d LEFT JOIN pred p USING (doc_id)
    ),
    staged AS (
      SELECT CASE WHEN pred_lang IS NULL OR pred_lang != lang
                       THEN 'lang_mismatch'
                  WHEN tok < 25 THEN 'too_short'
                  WHEN nc > 450 THEN 'too_long'
                  WHEN stop * 20 < tok THEN 'low_stopword'
                  ELSE 'kept' END AS stage
      FROM lm
    )
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(1000000 * COUNT(*) AS BIGINT)
                // (SELECT COUNT(*) FROM lm) AS BIGINT) AS share_micro
    FROM staged GROUP BY stage
    """
