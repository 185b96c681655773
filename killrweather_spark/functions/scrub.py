"""PII scrubbing and HTML boilerplate extraction — the privacy/cleanup
stages of a training-data curation pipeline.

Real corpora arrive with personal identifiers (emails, phone numbers,
IPs, SSNs) that must be counted and redacted before training, and web
text arrives wrapped in markup whose boilerplate (nav bars, scripts,
footers) must be stripped to the content.  Both stages are pure
row-local regex work — the ideal Spark shape: map-only, JVM codegen
(``regexp_count`` / ``regexp_replace``), zero shuffles, projection
pushed to the scan.  At 100 TB this is embarrassingly parallel; the only
thing that matters is staying out of Python, and everything here is
built-in SQL functions.

The shipped ``documents`` table is synthetic prose with no PII or
markup, so each operator follows the repo's multimodal pattern
(``multimodal.py:synth_png``): a deterministic md5-derived synthesis
step plants the artifacts — every byte predictable by the DuckDB oracle
— and the detector/redactor then genuinely finds and removes them.
The detection regexes are deliberately restricted to syntax with
IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB): character
classes, ``\\d``, ``\\s``, ``\\b``, non-capturing groups, bounded
repetition, ``(?s)`` and non-greedy — no lookarounds, no backreferences
(RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- cross-engine PII patterns (Java regex ≡ RE2 on these) -------------
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
IPV4_RE = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
SSN_RE = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

_PII = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ipv4", IPV4_RE, "[IP]"),
    ("phone", PHONE_RE, "[PHONE]"),
    ("ssn", SSN_RE, "[SSN]"),
]


def _hx_spark(i: int, n: int) -> str:
    return f"cast(conv(substr(md5(text), {i}, {n}), 16, 10) as bigint)"


def _hx_duck(i: int, n: int) -> str:
    return f"CAST(concat('0x', substr(md5(text), {i}, {n})) AS BIGINT)"


def _synth_pii_expr(hx) -> str:
    """The augmented text: the original document plus md5-gated PII
    sentences whose every character is hash-derived — identical
    construction on both engines (``hx`` is the engine's hex-slice→int
    builder).  Gates use disjoint hex slices so the four artifact types
    occur independently; values reuse slices freely (independence is not
    needed for correctness, only determinism)."""
    email = (
        f"CASE WHEN {hx(9, 2)} % 3 = 0 THEN "
        "' Contact user' || substr(md5(text), 1, 4) || '@mail' || "
        "substr(md5(text), 5, 2) || '.com now.' ELSE '' END"
    )
    phone = (
        f"CASE WHEN {hx(11, 2)} % 4 = 0 THEN "
        f"' Call 555-' || lpad(CAST({hx(17, 3)} % 1000 AS VARCHAR), 3, '0')"
        f" || '-' || lpad(CAST({hx(20, 4)} % 10000 AS VARCHAR), 4, '0')"
        " || '.' ELSE '' END"
    )
    ipv4 = (
        f"CASE WHEN {hx(13, 2)} % 4 = 1 THEN "
        f"' Server at ' || CAST({hx(24, 2)} % 256 AS VARCHAR) || '.' || "
        f"CAST({hx(26, 2)} % 256 AS VARCHAR) || '.' || "
        f"CAST({hx(28, 2)} % 256 AS VARCHAR) || '.' || "
        f"CAST({hx(30, 2)} % 256 AS VARCHAR) || ' up.' ELSE '' END"
    )
    ssn = (
        f"CASE WHEN {hx(15, 2)} % 5 = 0 THEN "
        f"' SSN ' || lpad(CAST({hx(17, 3)} % 1000 AS VARCHAR), 3, '0')"
        f" || '-' || lpad(CAST({hx(20, 2)} % 100 AS VARCHAR), 2, '0')"
        f" || '-' || lpad(CAST({hx(22, 4)} % 10000 AS VARCHAR), 4, '0')"
        " || ' on file.' ELSE '' END"
    )
    return f"text || {email} || {phone} || {ipv4} || {ssn}"


def synth_pii(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` with deterministic PII planted — the test-data
    stand-in for a raw crawl (Spark side of the shared synthesis)."""
    expr = _synth_pii_expr(_hx_spark).replace("AS VARCHAR", "AS STRING")
    return docs.select("doc_id", F.expr(expr).alias("text"))


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Detect and redact PII in one pass: per-document counts by type,
    sizes before/after, and the md5 digest of the redacted text (the
    value the gate hashes — proving the redaction byte-for-byte, not
    just the counts).

    Redaction replaces each match with a fixed tag; the four patterns
    are mutually non-overlapping by construction (emails contain ``@``,
    IPs dots, phones/SSNs distinct dash shapes), so replacement order
    cannot change the result.  Map-only JVM regex — no shuffle, no
    Python.
    """
    aug = docs
    # Column API, never F.expr SQL literals: Spark SQL string literals
    # eat backslashes ('\d' parses to 'd'), the Column path does not
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat))
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in _PII
    ]
    clean = F.col("text")
    for _, pat, tag in _PII:
        clean = F.regexp_replace(clean, pat, tag)
    return aug.select(
        "doc_id",
        *counts,
        F.length("text").cast("bigint").alias("chars_raw"),
        F.length(clean).cast("bigint").alias("chars_clean"),
        F.md5(clean).alias("clean_digest"),
    )


def pii_scrub_sql() -> str:
    """DuckDB oracle: identical synthesis arithmetic, RE2 counts via
    ``regexp_extract_all``, global redaction via the ``'g'`` flag (DuckDB
    replaces only the first match without it — Spark replaces all)."""
    synth = _synth_pii_expr(_hx_duck)
    clean = "t"
    for _, pat, tag in _PII:
        clean = f"regexp_replace({clean}, '{pat}', '{tag}', 'g')"
    count_cols = ",\n           ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in _PII
    )
    return f"""
    WITH aug AS (SELECT doc_id, {synth} AS t FROM documents)
    SELECT doc_id,
           {count_cols},
           CAST(length(t) AS BIGINT) AS chars_raw,
           CAST(length({clean}) AS BIGINT) AS chars_clean,
           md5({clean}) AS clean_digest
    FROM aug
    """


# --- HTML boilerplate extraction ---------------------------------------

_SCRIPT_RE = "(?s)<script[^>]*>.*?</script>"
_STYLE_RE = "(?s)<style[^>]*>.*?</style>"
_TAG_RE = "<[^>]+>"
_WS_RE = "\\s+"


def _synth_html_expr() -> str:
    """Document wrapped in a deterministic page skeleton: script + style
    + nav boilerplate around a content div, md5-salted footer.  Same
    string algebra on both engines."""
    return (
        "'<html><head><script>var x = 1;</script>"
        "<style>.nav { color: red }</style></head>"
        "<body><nav>home | about | contact</nav>"
        "<div class=\"content\">' || text || '</div>"
        "<footer>(c) site-' || substr(md5(text), 1, 4) || "
        "'</footer></body></html>'"
    )


def synth_html(docs: DataFrame) -> DataFrame:
    """``(doc_id, html)`` — the deterministic raw-web stand-in."""
    return docs.select(
        "doc_id", F.expr(_synth_html_expr()).alias("html")
    )


def html_text_extract(pages: DataFrame) -> DataFrame:
    """Markup → content: drop script/style blocks (DOTALL non-greedy),
    strip remaining tags, collapse whitespace, trim.  Returns per-page
    ``(doc_id, chars_html, chars_text, content_ratio_micro,
    text_digest)`` — ``content_ratio_micro`` is the floor-scaled
    text/html size ratio (the boilerplate metric trafilatura-style
    extractors report), and the digest pins the extracted text itself.

    Same scale shape as :func:`pii_scrub`: row-local JVM regex chain,
    map-only.  A production extractor would swap the regex chain for a
    real parser behind this exact contract; the plumbing (schema,
    map-only plan, digest-verified output) is what the engine owns.
    """
    txt = F.col("html")
    for pat in (_SCRIPT_RE, _STYLE_RE, _TAG_RE):
        txt = F.regexp_replace(txt, pat, " ")
    txt = F.trim(F.regexp_replace(txt, _WS_RE, " "))
    sized = pages.select(
        "doc_id",
        F.length("html").cast("bigint").alias("chars_html"),
        F.length(txt).cast("bigint").alias("chars_text"),
        F.md5(txt).alias("text_digest"),
    )
    return sized.select(
        "doc_id",
        "chars_html",
        "chars_text",
        F.expr("(1000000 * chars_text) div chars_html")
        .cast("bigint")
        .alias("content_ratio_micro"),
        "text_digest",
    )


def html_text_extract_sql() -> str:
    """DuckDB oracle: identical synthesis and regex chain (all-RE2-safe
    patterns), ``'g'``-flagged replaces."""
    chain = "h"
    for pat in (_SCRIPT_RE, _STYLE_RE, _TAG_RE, _WS_RE):
        chain = f"regexp_replace({chain}, '{pat}', ' ', 'g')"
    txt = f"trim({chain})"
    return f"""
    WITH pages AS (SELECT doc_id, {_synth_html_expr()} AS h FROM documents)
    SELECT doc_id,
           CAST(length(h) AS BIGINT) AS chars_html,
           CAST(length({txt}) AS BIGINT) AS chars_text,
           CAST((1000000 * length({txt})) // length(h) AS BIGINT)
               AS content_ratio_micro,
           md5({txt}) AS text_digest
    FROM pages
    """
