"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID, quality
scoring, token counting, document fingerprinting — each expressed with
built-in JVM functions (``regexp_extract_all``/``length``/``md5``), no
Python in the row path, so whole-stage codegen applies and the operator
scales linearly with executors.

Cross-engine determinism notes (for the DuckDB oracle):
- word tokens = ``[a-z0-9]+`` matches on lowercased text (identical in Java
  regex and RE2);
- ratios are int/int divisions (exact inputs → identical doubles);
- fingerprints are md5 hex strings compared/min'd lexicographically —
  no float, no hash-seed dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from killrweather_spark.plans.caching import persist_once

TOKEN_RE = "[a-z0-9]+"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
# tiny per-language stopword sets: enough signal for the n-gram heuristic
STOPWORDS = {
    "en": r"\b(the|a|and|of|to|in|is)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|los|las|es|una|y)\b",
}
CJK_RE = r"[\x{4e00}-\x{9fff}]"


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)


def token_count(col: Column) -> Column:
    """Whitespace-ish word count (the 'whitespace tokenizer')."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish sub-word proxy: alpha runs, digit runs, and single
    non-alnum marks each count as one token."""
    return F.size(
        F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scoring: length, token stats, punctuation and
    stopword ratios, and a composite score.  All built-ins, one projection.

    Ratios over token-less / empty documents are NULL: Spark 4 runs ANSI
    mode by default, so a bare ``x / ntok`` would throw DIVIDE_BY_ZERO and
    abort the whole scan on the first punctuation-only doc — ``try_divide``
    keeps the per-row semantics (NULL = "no ratio defined") that a corpus
    audit wants, on both engines (the oracle mirrors with NULLIF).
    """
    t = F.col(text_col)
    ntok = token_count(t)
    alpha_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
    npunct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0))
    nstop = F.size(F.regexp_extract_all(F.lower(t), F.lit(STOPWORDS["en"]), 0))
    return df.withColumns(
        {
            "n_chars_calc": F.length(t),
            "n_tokens": ntok,
            "avg_token_len": F.try_divide(alpha_chars, ntok),
            "punct_ratio": F.try_divide(npunct, F.length(t)),
            "stopword_ratio": F.try_divide(nstop, ntok),
        }
    )


def lang_scores(col: Column) -> dict[str, Column]:
    """Stopword-hit counts per language + CJK character count."""
    lowered = F.lower(col)
    scores = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
        for lang, pat in STOPWORDS.items()
    }
    scores["zh"] = F.size(F.regexp_extract_all(col, F.lit(CJK_RE), 0))
    return scores


def lang_id(col: Column) -> Column:
    """N-gram/stopword language heuristic with a fixed priority order
    (en ≥ de ≥ fr ≥ es) so ties break identically everywhere."""
    s = lang_scores(col)
    return (
        F.when(s["zh"] > 0, F.lit("zh"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"])
            & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]) & (s["de"] > 0), F.lit("de"))
        .when((s["fr"] >= s["es"]) & (s["fr"] > 0), F.lit("fr"))
        .when(s["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def normalized_fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-collapsed lowercase text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


def rolling_min_fingerprint(col_name: str, gram: int = 8) -> Column:
    """Winnowing-style content fingerprint: minimum md5 over all character
    ``gram``-grams of the named column — robust to local edits, pure
    string ops.

    grams are generated JVM-side via ``transform(sequence(...))`` (no
    explode): per-row bounded work, no shuffle.  Takes the column NAME
    (the lambda-bearing expression is built with ``F.expr``, which needs a
    resolvable identifier — an earlier revision hardcoded an internal
    ``__fp_src`` reference, silently ignoring the argument).
    """
    c = col_name
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({c}) - {gram - 1}, 1)),"
        f" i -> md5(substr({c}, i, {gram}))))"
    )


def add_rolling_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint",
                            gram: int = 8) -> DataFrame:
    """Attach the winnowing fingerprint of ``text_col`` (arbitrary column
    names supported via a sanitized alias)."""
    return (
        df.withColumn("__fp_src", F.col(text_col))
        .withColumn(out, rolling_min_fingerprint("__fp_src", gram))
        .drop("__fp_src")
    )


def collocations(df: DataFrame, text_col: str = "text",
                 min_pair_count: int = 5) -> DataFrame:
    """Collocation extraction: adjacent-token bigrams scored by lift —
    p(w1,w2) / (p(w1)·p(w2)) — the PMI argument without the log (monotone
    in PMI, so ranking/thresholding is identical) and therefore computable
    as one exact product of integer counts per pair.

    Scale: tokens leave the scan only as *counts* — the unigram and bigram
    tables shuffle (string, bigint) rows with map-side partial aggregation,
    never document text.  The unigram vocabulary (sub-linear in corpus
    size) broadcasts onto the bigram table twice, and the two 1-row totals
    broadcast as scalar-subquery stand-ins.  The lift expression is a
    single double division whose operands are exact integers in identical
    association order on both engines — bit-stable.
    """
    from killrweather_spark.sources.readers import fan_out

    # tokenize once: the regex pass feeds both the unigram and the bigram
    # aggregation, so materialize the token arrays instead of re-scanning
    # (at 100 TB this is the tokenized intermediate you'd checkpoint anyway)
    docs = fan_out(df).select(tokens(F.col(text_col)).alias("t")).transform(persist_once)
    uni = (
        docs.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    )
    # sequence(1, size-1) must be guarded: Spark infers a NEGATIVE step
    # when size-1 < 1 and would emit a descending sequence, not an empty one.
    pairs = (
        docs
        .select(
            F.explode(
                F.when(
                    F.size("t") >= 2,
                    F.expr(
                        "transform(sequence(1, size(t) - 1), "
                        "i -> struct(t[i-1] as w1, t[i] as w2))"
                    ),
                ).otherwise(F.expr("array()").cast(
                    "array<struct<w1:string,w2:string>>"))
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("b")
    )
    tot_u = uni.agg(F.sum("u").cast("bigint").alias("N"))
    tot_b = big.agg(F.sum("b").cast("bigint").alias("M"))
    return (
        big.filter(F.col("b") >= min_pair_count)
        .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                     F.col("u").alias("u1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                     F.col("u").alias("u2"))), "w2")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "w1",
            "w2",
            F.col("b").alias("pair_count"),
            (
                (F.col("b").cast("double") * F.col("N") * F.col("N"))
                / (F.col("M").cast("double") * F.col("u1") * F.col("u2"))
            ).alias("lift"),
        )
    )


def collocations_sql(min_pair_count: int = 5) -> str:
    """DuckDB oracle for :func:`collocations` (1-based array indexing;
    ``generate_series(1, 0)`` is already empty so no size guard needed)."""
    return f"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '{TOKEN_RE}') AS t FROM documents
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS u
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS b
      FROM (
        SELECT t[i.i] AS w1, t[i.i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS i(i)
      ) GROUP BY w1, w2
    ),
    tot_u AS (SELECT CAST(SUM(u) AS BIGINT) AS N FROM uni),
    tot_b AS (SELECT CAST(SUM(b) AS BIGINT) AS M FROM big)
    SELECT big.w1, big.w2, big.b AS pair_count,
           (CAST(big.b AS DOUBLE) * tot_u.N * tot_u.N)
             / (CAST(tot_b.M AS DOUBLE) * u1.u * u2.u) AS lift
    FROM big
    JOIN uni u1 ON u1.w = big.w1
    JOIN uni u2 ON u2.w = big.w2, tot_u, tot_b
    WHERE big.b >= {min_pair_count}
    """


def vocab_power_law(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Zipf-fit + concentration datasheet for the corpus vocabulary: one
    row ``(n_terms, total_tokens, slope, intercept_log2, gini)``.

    The two numbers a corpus card reports about its token distribution:
    the Zipf exponent (OLS slope of log2-frequency on log2-rank — natural
    text sits near −1; templated/synthetic text drifts shallower) and the
    Gini coefficient of token mass (how much of the corpus a few head
    words carry — the skew dial for frequency-based vocab pruning).

    Exactness: ranks come from ``global_row_number`` (the exact
    distributed range-rank — no single-task WindowExec on a vocabulary
    that can be 10⁷ terms), logs from the engine-portable fixed-point
    ``floor(2¹⁶·log₂ x)`` integer fold (``unigram._ilog2fp_expr`` — no
    libm, so both engines produce identical integers), and every
    reduction is an int64 sum.  Slope/intercept/gini are then single
    non-reduced double expressions over those exact sums (deterministic
    IEEE).  The ascending rank Gini needs is ``n+1−rank_desc`` — within a
    tied frequency block any permutation gives the same Σrank·cnt, so the
    reversed tiebreak is immaterial and both engines agree bit-for-bit.

    Scale: one corpus pass to a vocabulary-sized (word, cnt) rollup, one
    range-rank over the vocabulary, one global aggregate.  The Gini
    cross-moment Σ(rank·cnt) stays in int64 up to n·total ≈ 9·10¹⁸ —
    past that (10⁷-term vocab × 10¹² tokens) move that ONE sum to
    decimal(38); everything else is log-scaled and safe.
    """
    from killrweather_spark.functions.unigram import _ilog2fp_expr
    from killrweather_spark.operators.windows import global_row_number

    wc = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ranked, total = global_row_number(
        wc, [F.col("cnt").desc(), F.col("word").asc()], out_col="rank"
    )
    xy = ranked.select(
        "rank",
        "cnt",
        F.expr(_ilog2fp_expr("rank")).alias("x"),
        F.expr(_ilog2fp_expr("cnt")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum((F.lit(total + 1) - F.col("rank")) * F.col("cnt")).alias("src"),
        F.sum("cnt").alias("tot"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    slope = F.when(
        denom != 0.0,
        (nd * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double")) / denom,
    )
    intercept = F.when(
        denom != 0.0,
        (F.col("sy").cast("double") * F.col("sxx").cast("double")
         - F.col("sx").cast("double") * F.col("sxy").cast("double"))
        / denom / F.lit(65536.0),
    )
    gini = (
        F.lit(2.0) * F.col("src").cast("double")
        / (nd * F.col("tot").cast("double"))
        - (nd + F.lit(1.0)) / nd
    )
    return s.select(
        F.col("n").alias("n_terms"),
        F.col("tot").alias("total_tokens"),
        slope.alias("slope"),
        intercept.alias("intercept_log2"),
        gini.alias("gini"),
    )
