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
    stopword ratios, and a composite score.  All built-ins, one projection."""
    t = F.col(text_col)
    ntok = token_count(t)
    alpha_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
    npunct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0))
    nstop = F.size(F.regexp_extract_all(F.lower(t), F.lit(STOPWORDS["en"]), 0))
    return df.withColumns(
        {
            "n_chars_calc": F.length(t),
            "n_tokens": ntok,
            "avg_token_len": alpha_chars / ntok,
            "punct_ratio": npunct / F.length(t),
            "stopword_ratio": nstop / ntok,
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


def rolling_min_fingerprint(col: Column, gram: int = 8) -> Column:
    """Winnowing-style content fingerprint: minimum md5 over all character
    ``gram``-grams — robust to local edits, pure string ops.

    grams are generated JVM-side via ``transform(sequence(...))`` (no
    explode): per-row bounded work, no shuffle.
    """
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({{c}}) - {gram - 1}, 1)),"
        f" i -> md5(substr({{c}}, i, {gram}))))".replace("{c}", "__fp_src")
    )


def add_rolling_fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint",
                            gram: int = 8) -> DataFrame:
    return (
        df.withColumn("__fp_src", F.col(text_col))
        .withColumn(out, rolling_min_fingerprint(F.col("__fp_src"), gram))
        .drop("__fp_src")
    )
