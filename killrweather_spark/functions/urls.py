"""URL normalization + domain-level curation — the crawl-side curation
stage every web-scale training pipeline runs before text-side dedup
(RefinedWeb/C4-style): canonicalize each document's source URL, collapse
exact URL duplicates, and aggregate quality per registered domain (the
unit domain blocklists and per-domain caps operate on).

The synthetic corpus carries no URL column, so — the ``synth_png``
pattern applied to provenance — :func:`synth_urls` derives a
deterministic raw URL per document from ``md5(text)``, with doc_id-keyed
VARIANT noise (uppercase host + explicit default port, fragment,
duplicate path slash, tracking parameter) so normalization has real work
to do and distinct raw forms genuinely collapse to one canonical URL.

Everything here is pure JVM-side column expressions — concat / lower /
replace / anchored regexp — inside whole-stage codegen: per-row
normalization costs no shuffle and no Python, URL-level dedup is ONE
hash aggregate on the normalized key (map-side partial combine), and the
domain report is one more keyed aggregate.  At 100 TB that is the
cheapest possible shape for this stage; hot domains skew the SECOND agg's
keys, but count/sum partials combine map-side so the skewed reduce moves
only one row per (partition, domain).

Cross-engine exactness rules (the DuckDB oracle replays every step):
regex patterns are anchored so DuckDB's first-match ``regexp_replace``
and Spark's replace-all agree; replacements that could repeat use plain
``replace`` (non-regex, identical semantics); group extraction uses
``regexp_extract(expr, pat, 1)`` which both engines define identically.

Reference parity note: the reference has no URL surface (weather keys);
this extends SURVEY §2's beyond-reference curation family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Keyspace moduli for the synthesized URLs — sized so the bench corpora
#: produce real cross-document collisions after normalization (≈ n²/2/1920
#: expected duplicate pairs over n docs).
URL_SITES = 10
URL_PATHS = 16
URL_TLDS = ("com", "org", "net")


def _hx(text: Column, start: int, length: int) -> Column:
    """Integer value of an md5(text) hex substring (1-based start) — the
    registry's standard deterministic-derivation idiom."""
    return F.conv(
        F.substring(F.md5(text), start, length), 16, 10
    ).cast("bigint")


def synth_urls(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Attach a deterministic raw ``url`` per document.

    Canonical identity (what normalization should recover):
    ``site = md5[1:4] % URL_SITES``, ``tld = md5[5] % 3``,
    ``www? = md5[6] % 2``, ``path id = md5[7:8] % URL_PATHS``.
    Variant noise by ``doc_id % 4``: 0 = UPPERCASE host + explicit
    ``:443`` + trailing ``utm_source`` tracking param; 1 = ``#frag``
    fragment; 2 = duplicated path slash (and no query); 3 = clean."""
    text = F.col(text_col)
    site = _hx(text, 1, 4) % URL_SITES
    tld = F.element_at(
        F.array(*[F.lit(t) for t in URL_TLDS]),
        (_hx(text, 5, 1) % 3 + 1).cast("int"),
    )
    www = F.when(_hx(text, 6, 1) % 2 == 0, F.lit("www.")).otherwise(
        F.lit("")
    )
    pid = _hx(text, 7, 2) % URL_PATHS
    host = F.concat(www, F.lit("example"), site, F.lit("."), tld)
    path = F.concat(F.lit("/p/"), pid)
    qid = F.concat(F.lit("?id="), pid)
    variant = F.col(id_col) % 4
    url = (
        F.when(
            variant == 0,
            F.concat(F.lit("https://"), F.upper(host), F.lit(":443"),
                     path, qid, F.lit("&utm_source=feed")),
        )
        .when(
            variant == 1,
            F.concat(F.lit("https://"), host, path, qid, F.lit("#frag")),
        )
        .when(variant == 2, F.concat(F.lit("https://"), host, F.lit("/"), path))
        .otherwise(F.concat(F.lit("https://"), host, path, qid))
    )
    return df.withColumn("url", url)


def normalize_url(url: Column) -> Column:
    """Canonicalize a raw URL: drop the fragment, lowercase scheme+host
    (path/query case is preserved — hosts are case-insensitive, paths are
    not), strip the default :443 port, drop a terminal ``utm_*`` tracking
    parameter, and collapse the duplicated path slash.  Anchored /
    non-regex steps only (see module docstring for why that makes the
    DuckDB replay exact)."""
    n0 = F.regexp_replace(url, r"#.*$", "")
    head = F.regexp_extract(n0, r"^(https?://[^/]+)", 1)
    tail = F.substr(n0, F.length(head) + F.lit(1))
    n1 = F.concat(F.lower(head), tail)
    n2 = F.replace(n1, F.lit(":443/"), F.lit("/"))
    n3 = F.regexp_replace(n2, r"[?&]utm_[a-z]+=[a-z0-9]*$", "")
    return F.replace(n3, F.lit("//p/"), F.lit("/p/"))


def registered_domain(url_norm: Column) -> Column:
    """The registrable domain of a normalized URL — the unit blocklists
    and per-domain caps key on.  Simplified public-suffix rule (strip a
    ``www.`` subdomain); a production pipeline substitutes the PSL table
    as a broadcast join, same plan shape."""
    return F.regexp_extract(
        url_norm, r"^https://(?:www\.)?([^/:?#]+)", 1
    )


def url_dedup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """URL-level exact dedup after normalization: distinct raw forms
    (tracking params, default port, case, fragments, slash noise) that
    canonicalize to the same URL form one group; the min-doc_id member is
    the keeper (the registry's canonical-keeper convention).  One hash
    aggregate on the normalized key — map-side combinable."""
    u = synth_urls(df, id_col, text_col).withColumn(
        "url_norm", normalize_url(F.col("url"))
    )
    return (
        u.groupBy("url_norm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min(id_col).cast("bigint").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "url_norm",
            registered_domain(F.col("url_norm")).alias("registered_domain"),
            "n_docs",
            "canonical_doc",
        )
    )


def domain_quality_report(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          chars_col: str = "n_chars") -> DataFrame:
    """Per-registered-domain curation report: document count, distinct
    canonical URLs, mean document length, and the URL-duplication share
    ``(n_docs − n_urls) / n_docs`` — the signals a per-domain cap or
    blocklist decision reads.  Integer micro-unit divisions, so the
    oracle replays the report value-exactly."""
    u = synth_urls(df, id_col, text_col).withColumn(
        "url_norm", normalize_url(F.col("url"))
    )
    return (
        u.withColumn("dom", registered_domain(F.col("url_norm")))
        .groupBy("dom")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("url_norm").cast("bigint").alias("n_urls"),
            F.sum(chars_col).cast("bigint").alias("__chars"),
        )
        .select(
            F.col("dom").alias("registered_domain"),
            "n_docs",
            "n_urls",
            F.expr("(1000000 * __chars) div n_docs")
            .cast("bigint")
            .alias("mean_chars_micro"),
            F.expr("(1000000 * (n_docs - n_urls)) div n_docs")
            .cast("bigint")
            .alias("dup_share_micro"),
        )
    )
