"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

The scale story (100 TB posture) is the point of each design:

- **exact**: hash-groupBy on a normalized fingerprint — one shuffle keyed by
  a 128-bit hash, perfectly parallel, no skew (hash keys are uniform).
- **MinHash+LSH**: shingle → per-seed min-hash → band buckets → self-join on
  (band, bucket).  The candidate join shuffles only (doc, band, bucket)
  tuples — never full text — and bucket keys spread uniformly.  This is the
  standard sub-quadratic near-dup pipeline; brute-force O(n²) never runs.
- **SimHash**: one pass token → bit-vote accumulation (a groupBy per
  (doc, bit) then per doc), fingerprints joinable/bucketable by prefix.
- **n-gram Jaccard**: exact pair similarity, restricted to candidate pairs
  (here: a blocking key; in production: LSH candidates) — the verifier stage
  after LSH, not a standalone O(n²) scan.

Determinism: all hashing is md5 (hex strings, lexicographic mins) — no
engine-native hash functions, so the DuckDB oracle reproduces every value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from killrweather_spark.plans.caching import persist_once

from killrweather_spark.functions.text import normalized_fingerprint


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts: representative = min id.

    ``keep="first"`` dedup is then an inner join back on (fingerprint,
    representative) or a ``row_number() = 1`` filter.
    """
    return (
        df.select(F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct normalized text (the min-id representative)."""
    from pyspark.sql import Window

    w = Window.partitionBy(normalized_fingerprint(F.col(text_col))).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def char_shingles(df: DataFrame, text_col: str, id_col: str, gram: int = 4) -> DataFrame:
    """(id, shingle) pairs: character n-grams via lateral position explode.

    Fans narrow inputs out to all task slots first — shingling is the
    CPU-bound stage of every MinHash pipeline and must not run on one core
    because the input happened to be a single file."""
    from killrweather_spark.sources.readers import fan_out

    df = fan_out(df)
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - (gram - 1), F.lit(1)))
        ).alias("pos"),
        F.col(text_col).alias("__t"),
    ).select(id_col, F.expr(f"substr(__t, pos, {gram})").alias("shingle"))


MINHASH_PRIME = 2_147_483_647  # 2^31 - 1

# Fixed affine-permutation constants (aᵢ, bᵢ), md5-derived — LARGE multipliers
# so (aᵢ·h + bᵢ) mod p wraps many times and genuinely reorders the hash space.
# Small multipliers (1, 3, 5…) keep the map near-monotone: every permutation's
# minimum lands on the same few smallest base hashes, bands stop being
# independent, and candidate volume explodes (measured 1.2M pairs → ~9k on
# sf0.1 after this change).  aᵢ·h < 2^62: overflow-free in int64.
MINHASH_PERMS: list[tuple[int, int]] = [
    (729209906, 2078250761),
    (2139117089, 1852947005),
    (2089068656, 368451835),
    (1446449770, 1567573471),
    (846100909, 477842783),
    (287839648, 1910693950),
    (1827965962, 237583011),
    (180313009, 1499639759),
    (1277445419, 1127503030),
    (1161051244, 1406429405),
    (2033422181, 683233028),
    (112426274, 701635544),
    (1581961797, 1063483363),
    (2087444719, 1044613562),
    (1531343433, 1458154655),
    (1403863831, 1936919003),
]


def minhash_signatures(
    shingled: DataFrame, id_col: str, n_hashes: int = 16
) -> DataFrame:
    """Per-doc MinHash signature via one base hash + affine permutations.

    Each shingle is hashed ONCE (md5 prefix → int mod p); permutation i is
    ``(aᵢ·h + bᵢ) mod p`` over :data:`MINHASH_PERMS` — the classic
    universal-hash family.  All ``n_hashes`` minima are conditional
    aggregates over the SAME rows: no seed fan-out (16× fewer rows and ~16×
    fewer md5 calls than hashing per-seed), partial aggregation before the
    one shuffle.
    """
    base = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint")
        % MINHASH_PRIME
    )
    hashed = shingled.select(F.col(id_col), base.alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS[:n_hashes])
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature and self-join on (band, bucket) → candidate pairs.

    rows_per_band = n_hashes // bands; bucket = md5(concat of band's mins).
    The join key (band, bucket) is uniform → no skew; output is DISTINCT
    (doc_a < doc_b) candidate pairs for a verifier (Jaccard) stage.
    """
    # The band self-join references the signature table twice; without
    # materialization Spark recomputes the whole shingle→minhash lineage per
    # side (measured 5.2 s → 0.9 s at sf0.1).  Signatures are tiny — one row
    # of 16 ints per doc — exactly what you'd persist as the dedup index at
    # 100 TB anyway.
    signatures = signatures.transform(persist_once)
    rpb = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rpb + j}").cast("string") for j in range(rpb)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("bucket")
            )
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 6,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Full near-dup candidate pipeline: shingle → MinHash → LSH pairs.

    Defaults (6-gram shingles, 16 hashes × 4 rows/band, candidate
    probability 1-(1-s⁴)⁴) tuned on the synthetic corpus: templated text
    gives unrelated pairs mean 4-gram Jaccard ≈ 0.27 (candidate explosion)
    but mean 6-gram Jaccard ≈ 0.11, while true near-dups stay ≥ 0.8 — the
    shingle width is the separation dial, the band shape is the recall dial.
    """
    # No distinct() on shingles: MIN over a multiset equals MIN over its set,
    # so deduplicating first would only add a full shuffle of the widest
    # intermediate (doc × shingle) for nothing.
    sh = char_shingles(df, text_col, id_col, gram)
    sig = minhash_signatures(sh, id_col, n_hashes)
    return lsh_candidate_pairs(sig, id_col, n_hashes, bands)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash fingerprint as a bit-string column ``simhash``.

    Token multiset → per-bit ±1 votes (bit j read from md5 hex nibble j) →
    sign of the vote sum.  Fully row-local: the token array is hashed ONCE
    per row (one ``transform`` → md5 array), then each bit's vote is an
    in-row ``aggregate`` fold over that array — no explode, no groupBy, no
    shuffle at all.  The fingerprint is a map-only projection that fuses
    into the scan; at 100 TB it rides along with ingest for free.  Near-dup
    docs differ in few bits → group by prefix or Hamming-join downstream.
    """
    from killrweather_spark.sources.readers import fan_out

    # full width pinned: the map stage is kernel-bound (an md5 per token,
    # then 64 per-row vote folds over the hash array), so the sized
    # fan_out default — which sees only a half-MB scan — starves it
    df = fan_out(df, slots=df.sparkSession.sparkContext.defaultParallelism)
    hx = F.transform(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0),
        lambda t: F.md5(t),
    )
    # Token-less docs (empty/punctuation-only text, NULL text) emit no
    # fingerprint: the vote fold over an empty array would produce sum 0 on
    # every bit (an all-'1' fingerprint) and NULL text an all-'0' one —
    # spurious rows the explode/groupBy formulation (and the DuckDB oracle's
    # unnest) never had, and worse, every token-less doc would pair with
    # every other at Hamming distance 0 downstream. size(NULL array) is NULL
    # so the > 0 filter drops both cases.
    row = df.select(F.col(id_col), hx.alias("hx")).filter(F.size("hx") > 0)

    def _vote(j):  # closure factory: F.aggregate requires a binary lambda
        return lambda acc, h: acc + F.when(
            F.substring(h, j + 1, 1).isin(*"89abcdef"), F.lit(1)
        ).otherwise(F.lit(-1))

    votes = row.select(
        id_col,
        *[
            F.aggregate(F.col("hx"), F.lit(0), _vote(j)).alias(f"s{j}")
            for j in range(bits)
        ],
    )
    bit_chars = [
        F.when(F.col(f"s{j}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)
    ]
    return votes.select(id_col, F.concat(*bit_chars).alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    max_distance: int = 2,
) -> DataFrame:
    """All document pairs whose SimHash fingerprints differ in at most
    ``max_distance`` bits — the pair-finding stage that completes the
    SimHash pipeline (≙ MinHash's LSH stage).

    Scale path: the fingerprint is split into ``max_distance + 1`` bands;
    by pigeonhole, any pair within the distance budget agrees *exactly* on
    at least one band, so candidates are found by a band-bucket equi-join
    (uniform keys, never a cross product) and only candidates pay the exact
    Hamming check. Recall is therefore 100% by construction — the DuckDB
    oracle computes the brute-force O(n²) answer and the driver verifies
    the banded plan returns the identical pair set.

    Hamming distance is exact integer popcount: the bit-string
    fingerprint is parsed ONCE per document (``conv(fp, 2, 10)`` — safe
    through 63 bits) and each candidate pair pays a single
    ``bit_count(a ^ b)`` instead of a ``bits``-position interpreted
    filter fold per pair (r13 session 6, the image_hamming_pairs #8
    rewrite applied here: same bits, same count, ~16 interpreted
    ``substr`` lambda evals per pair removed, and the candidate shuffle
    carries an int64 instead of the fingerprint string).  No Python, no
    UDF.
    """
    n_bands = max_distance + 1
    sizes = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    starts, s = [], 1
    for sz in sizes:
        starts.append(s)
        s += sz
    if bits > 63:  # int64 popcount path needs the sign bit free
        raise ValueError(f"bits must be <= 63, got {bits}")
    fp = (
        simhash(df, text_col, id_col, bits)
        .withColumn("__fpi", F.conv(F.col("simhash"), 2, 10).cast("bigint"))
        .transform(persist_once)
    )
    # A doc pair's band agreement and Hamming distance depend only on the
    # two FINGERPRINT VALUES, and a `bits`-bit space holds at most 2^bits
    # of them, so the banded self-join and the exact verify run over the
    # DISTINCT fingerprints (collision groups collapse — 5,000 docs →
    # 1,448 values at sf0.1, a 20× smaller verify) and member joins expand
    # the surviving value pairs back to doc pairs afterwards.  Value pairs
    # keep x <= y so equal-fingerprint groups (Hamming 0) surface exactly
    # once; doc ordering is re-imposed on expansion, so the emitted pair
    # set is identical to the per-doc banded join.
    fpd = fp.select("simhash", "__fpi").distinct().transform(persist_once)
    bands = fpd.select(
        "__fpi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring("simhash", starts[i], sizes[i]).alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("__fpi", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    a = bands.select(F.col("__fpi").alias("ia"), "band", "val")
    b = bands.select(F.col("__fpi").alias("ib"), "band", "val")
    # popcount of the XOR counts exactly the positions where the two
    # bit strings differ — identical to the former per-position filter
    hamming = F.bit_count(F.col("ia").bitwiseXOR(F.col("ib"))).cast("int")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("ia") <= F.col("ib"))
        .select("ia", "ib")
        .distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_distance)
    )
    ma = fp.select(F.col(id_col).alias("__da"), F.col("__fpi").alias("ia"))
    mb = fp.select(F.col(id_col).alias("__db"), F.col("__fpi").alias("ib"))
    return (
        cand.join(ma, "ia")
        .join(mb, "ib")
        # distinct value pairs (ia < ib) contribute every cross member
        # combo exactly once — either doc may carry the smaller id, so
        # the pair is ORDERED on emit; equal-value groups (ia == ib)
        # enumerate each member pair twice plus self-pairs, so they keep
        # the id filter instead
        .filter((F.col("ia") != F.col("ib")) | (F.col("__da") < F.col("__db")))
        .select(
            F.least("__da", "__db").alias("doc_a"),
            F.greatest("__da", "__db").alias("doc_b"),
            "hamming",
        )
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (verifier stage)
# --------------------------------------------------------------------------

# Document-frequency cap for the gram-keyed verifier self-joins (the standard
# prefix-filter trade).  A gram appearing in d documents contributes O(d²)
# rows to the (gram[, block]) self-join, so one stop-word-heavy gram ("of
# the"-class bigrams, boilerplate headers) turns the verifier quadratic in
# corpus size — the same constant-ish-key pathology as unblocked fuzzy
# matching, one level down.  Dropping grams with df > cap bounds every join
# key's fan-out at cap², making total join output ≤ n_grams · cap² — linear
# in corpus size for fixed cap.  Recall cost is negligible and quantifiable:
# true near-dups share MANY grams, almost all of them rare (a pair flagged
# only by ubiquitous grams was a false positive to begin with); scores are
# computed in the capped gram universe on BOTH engines, so the oracle stays
# value-exact.  1,000 keeps every gram at the bench SFs (max per-key df ≈ 8
# at sf0.01) while bounding 100 TB skew; the quadratic-growth property test
# (`test_properties.py::test_gram_df_cap_bounds_candidate_growth`) pins the
# linear-vs-quadratic behavior on a stop-word-heavy fixture.
GRAM_DF_CAP = 1000


def gram_df_cap(
    sh: DataFrame, key_cols: list[str], max_df: int | None
) -> DataFrame:
    """Drop (id, gram) rows whose join key appears in more than ``max_df``
    documents.  ``sh`` must be DISTINCT per (id, key) so ``count(*)`` per key
    IS document frequency.

    Plan shape: one partial-aggregated groupBy over ``sh`` builds the hot-key
    list — tiny by heavy-tail construction (only keys with df > cap survive)
    — then a broadcast LEFT ANTI join filters ``sh`` map-side.  No extra
    full-width shuffle; the hot list at 100 TB is KBs (there are only so many
    stop-gram combinations).
    """
    if max_df is None:
        return sh
    hot = (
        sh.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select(*key_cols)
    )
    return sh.join(F.broadcast(hot), key_cols, "left_anti")


def word_bigram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.2,
    max_df: int | None = GRAM_DF_CAP,
) -> DataFrame:
    """Exact Jaccard over word-bigram shingle sets for blocked pairs.

    ``block_col`` bounds the candidate space (LSH bucket / source / shard);
    inter/union counts are integers, the division is one deterministic
    double op, so the threshold filter is reproducible.

    ``max_df`` is the :data:`GRAM_DF_CAP` prefix filter: grams in more than
    ``max_df`` documents (per block) are dropped BEFORE sizes and the
    self-join, so both the candidate volume and the scores live in the
    capped gram universe (mirrored exactly in the DuckDB oracle).
    """
    from killrweather_spark.sources.readers import fan_out

    tokens_expr = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(__toks) - 1, 1)),"
        " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"
    )
    base_cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    # shingle build runs at scan parallelism otherwise (r13 session 6:
    # size-derived spread; no-op on wide production scans)
    sh = (
        fan_out(df).select(*base_cols, tokens_expr.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select(*base_cols, F.explode(bigrams).alias("shingle"))
        .distinct()
        # referenced 3× below (sizes + both join sides): persist so the
        # tokenize→explode→distinct lineage runs once
        .transform(persist_once)
    )
    from killrweather_spark.plans.hints import maybe_broadcast

    sh = gram_df_cap(
        sh, ["shingle"] + ([block_col] if block_col else []), max_df
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # Intersection counting by PER-GRAM PAIR EXPANSION instead of the
    # gram-keyed self-join (r13 session 6): each capped gram's doc list
    # (≤ max_df ids — ~8 KB at the default cap) collects once and the
    # ordered pairs expand ROW-LOCALLY; the self-join shuffled the
    # (doc, shingle) table twice and hash-probed Σ df² incidences
    # through the join operator (sf1: 193 M incidences, 84 s join form
    # vs 53 s expansion form, identical 51.5 M-pair output).  sort_array
    # over the distinct doc list yields exactly the a < b pairs the join
    # condition kept.
    gkeys = ["shingle"] + ([block_col] if block_col else [])
    gl = sh.groupBy(*gkeys).agg(
        F.sort_array(F.collect_list(id_col)).alias("__ds")
    )
    pair_expand = F.expr(
        "flatten(transform(__ds, (x, i) -> "
        "transform(slice(__ds, i + 2, size(__ds)), "
        "y -> struct(x as doc_a, y as doc_b))))"
    )
    inter = (
        gl.select(F.explode(pair_expand).alias("__p"))
        .select("__p.doc_a", "__p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # sizes is one row per surviving doc — metadata-sized next to the
    # pre-threshold pair table it decorates (51.5 M rows at sf1); the
    # size gate broadcasts it at bench SFs and falls back to the keyed
    # join when a corpus outgrows the gate
    sa = maybe_broadcast(
        sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    )
    sb = maybe_broadcast(
        sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    )
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# --------------------------------------------------------------------------
# eval-set decontamination
# --------------------------------------------------------------------------

def word_ngram_set(
    df: DataFrame, text_col: str, id_col: str, n: int = 8
) -> DataFrame:
    """Distinct whitespace-word ``n``-grams per document: (id, gram) rows.

    Gram generation is a JVM-side ``transform(sequence(...))`` over the
    token array — no Python in the loop, stays in whole-stage codegen.
    Documents shorter than ``n`` tokens yield no grams.
    """
    return (
        df.select(F.col(id_col), _distinct_grams(text_col, n).alias("__grams"))
        .select(F.col(id_col), F.explode("__grams").alias("gram"))
    )


def _distinct_grams(text_col: str, n: int):
    """Per-row array of DISTINCT word n-grams — the dedup happens in the
    array domain (map-side), so no (id, gram) shuffle is ever needed."""
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + F.lit(1), F.lit(n)), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    n: int = 5,
    threshold: float = 0.6,
    max_df: int | None = GRAM_DF_CAP,
) -> DataFrame:
    """Asymmetric near-dup pairs by word-``n``-gram containment:
    ``|A∩B| / min(|A|, |B|)`` — the score that catches SUBSET duplication
    (one doc quoted or embedded inside a larger one), which symmetric
    Jaccard dilutes toward 0 as the size ratio grows.

    Same blocked-pair plan as :func:`word_bigram_jaccard_pairs`: per-doc
    distinct grams are built in the array domain (map-side, no dedup
    shuffle), the self-join is keyed by (gram[, block]) so it never goes
    cartesian, and intersection counts are integers — the one division is
    deterministic on both engines.  ``max_df`` is the :data:`GRAM_DF_CAP`
    prefix filter (see :func:`gram_df_cap`): hot boilerplate grams are
    dropped before sizes and the join on both engines.
    """
    from killrweather_spark.sources.readers import fan_out

    base_cols = [F.col(id_col)] + ([F.col(block_col)] if block_col else [])
    # gram build runs at scan parallelism (r13 session 5: fan the
    # bench-narrow scan; no-op on wide production scans)
    sh = (
        fan_out(df).select(*base_cols, _distinct_grams(text_col, n).alias("__grams"))
        .select(*base_cols, F.explode("__grams").alias("gram"))
        # referenced 3× below (sizes + both join sides): persist so the
        # tokenize→explode lineage runs once
        .transform(persist_once)
    )
    from killrweather_spark.plans.hints import maybe_broadcast

    sh = gram_df_cap(sh, ["gram"] + ([block_col] if block_col else []), max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # per-gram ordered pair expansion instead of the gram-keyed
    # self-join — see word_bigram_jaccard_pairs (r13 session 6); the
    # doc list per capped gram is ≤ max_df ids and the expansion is
    # row-local, so Σ df² incidences never cross a join operator
    gkeys = ["gram"] + ([block_col] if block_col else [])
    gl = sh.groupBy(*gkeys).agg(
        F.sort_array(F.collect_list(id_col)).alias("__ds")
    )
    pair_expand = F.expr(
        "flatten(transform(__ds, (x, i) -> "
        "transform(slice(__ds, i + 2, size(__ds)), "
        "y -> struct(x as doc_a, y as doc_b))))"
    )
    inter = (
        gl.select(F.explode(pair_expand).alias("__p"))
        .select("__p.doc_a", "__p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = maybe_broadcast(
        sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    )
    sb = maybe_broadcast(
        sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "containment", F.col("n_inter") / F.least("n_a", "n_b")
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "containment")
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Flag training documents whose word ``n``-grams overlap an eval set.

    The standard pre-training decontamination pass (exact n-gram overlap,
    n≈8-13): build the DISTINCT eval n-gram vocabulary, broadcast it, and
    probe every training document's n-grams against it.  Returns one row per
    contaminated training doc: ``(doc_id, n_grams, n_hits, hit_frac)`` where
    ``n_grams`` is the doc's distinct-gram count and ``hit_frac = n_hits /
    n_grams``.

    Scale: two map-side passes over the train corpus, near-zero shuffle.
    Pass 1 explodes per-doc DISTINCT grams (``array_distinct`` in the array
    domain — no (id, gram) dedup shuffle) and inner-joins the broadcast
    eval vocabulary, so only gram HITS — a vanishing fraction of the
    corpus — reach the per-doc aggregate.  Pass 2 reads ``n_grams`` off
    the gram-array length with no explode at all, and the tiny
    contaminated-docs aggregate broadcasts back onto it.  Carrying
    ``n_grams`` through pass 1 instead would either re-evaluate the gram
    expression per consumer (Generate + Project both inline it) or force
    a groupBy over ALL grams (full-corpus shuffle); 2× map CPU for ~0
    shuffle is the right trade at 100 TB.
    """
    # Gram generation is CPU-bound map work: if the input arrives in fewer
    # splits than the cluster has slots (single-file small inputs), fan out
    # first so every core works.  On a real 100 TB table the scan already
    # yields thousands of splits and this is a no-op.
    from killrweather_spark.sources.readers import fan_out

    train_df = fan_out(train_df)
    # the eval side's vocabulary build is the same CPU-bound gram pass —
    # fan it too (r13 session 5; no-op on wide scans)
    eval_grams = (
        word_ngram_set(fan_out(eval_df), text_col, id_col, n)
        .select("gram")
        .distinct()
    )
    hits = (
        train_df.select(
            F.col(id_col), F.explode(_distinct_grams(text_col, n)).alias("gram")
        )
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    sizes = train_df.select(
        F.col(id_col),
        F.size(_distinct_grams(text_col, n)).cast("bigint").alias("n_grams"),
    )
    return sizes.join(F.broadcast(hits), id_col).select(
        id_col,
        "n_grams",
        "n_hits",
        (F.col("n_hits") / F.col("n_grams")).alias("hit_frac"),
    )


# --------------------------------------------------------------------------
# TF-IDF weighted cosine near-dup (sparse lexical vectors)
# --------------------------------------------------------------------------

# Blocking cap: candidate pairs are generated only through terms whose
# document frequency is in [2, cap], bounding per-term fan-out at
# cap·(cap-1)/2 pairs — the prefix-filter idea.  A term rarer than 2
# cannot pair; a term commoner than the cap carries no dedup signal and
# would quadratically blow the candidate set (boilerplate phrases).
TFIDF_DF_CAP = 20


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    df_cap: int = TFIDF_DF_CAP,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by TF-IDF-WEIGHTED cosine over sparse
    word-trigram vectors — the weighted-lexical modality between set
    overlap (MinHash/Jaccard: every shingle counts equally) and dense
    embeddings (cosine over learned vectors): repeated rare phrases
    dominate the score, boilerplate contributes ~nothing.

    Pipeline, all JVM: word trigrams per doc → integer tf·idf weights
    (``idf_milli = (1000·(N+1)) div (df+1)`` — floor arithmetic, both
    engines bit-identical) → candidates through RARE terms only
    (df ∈ [2, ``df_cap``]; the blocking bound above) → full-vector dot
    over each candidate pair's shared terms → cosine ≥ ``threshold``.

    Scale shape: the only quadratic step is per-rare-term and capped at
    df_cap² — the same bucketed-candidates contract as the LSH families —
    and it expands ROW-LOCALLY from per-term (doc, w) lists (≤ df_cap
    entries each) instead of crossing a join operator; only the df>cap
    sliver of the weight table flows through a (pair, term) join for the
    common-term share of the dot; the df table (vocabulary-sized)
    broadcasts.  Returns (doc_a, doc_b, cosine), doc_a < doc_b.
    """
    from killrweather_spark.functions.text import tokens
    from killrweather_spark.sources.readers import fan_out

    # tokenize/gram-weight work runs BEFORE the first exchange, i.e. at
    # scan parallelism — fan the (bench-narrow) scan out first so the
    # corpus pass uses every slot (r13 session 5: 11.7 -> 6.7 s at sf1;
    # no-op on production-wide scans)
    toks = fan_out(docs).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    )
    # Docs with <3 tokens produce NO trigrams.  sequence(0, -1) is the
    # trap: Spark yields [0, -1] (a DESCENDING two-step sequence), so the
    # unguarded transform indexes ts[-1]/ts[2] out of bounds — an
    # INVALID_ARRAY_INDEX abort under ANSI mode, bogus short-gram terms
    # (never produced by the oracle's empty generate_series) without it.
    tri = toks.filter(F.size("ts") >= 3).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ts) - 3), "
                "i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"
            )
        ).alias("term"),
    )
    tf = tri.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.expr("(1000 * (__n + 1)) div (df + 1)"))
            .cast("bigint")
            .alias("w"),
        )
    )
    nrm = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    rare = df_.filter(
        (F.col("df") >= 2) & (F.col("df") <= df_cap)
    ).select("term")
    # Candidates AND the rare-term share of the dot from ONE per-term pair
    # expansion (the r13 #30 jaccard/containment pattern): each capped
    # term's (doc, w) list collects once (≤ df_cap entries) and the ordered
    # pairs expand ROW-LOCALLY carrying their weight product, so the Σ df²
    # incidences never cross a join operator — the former shape self-joined
    # the posting table per term AND re-exploded every candidate pair
    # against doc_a's FULL term vector (|cand|·|terms(a)| rows — 7.6 M at
    # sf0.1 — shuffled+sorted to keep the 243 k shared-term rows).
    # sort_array over struct(doc_id, w) orders by doc_id (unique per term),
    # so i < j expansion ≡ the old a.doc_id < b.doc_id join condition, and
    # the per-pair count of rare-term expansions ≡ the old __shared count.
    wl = (
        w.join(F.broadcast(rare), "term")
        .groupBy("term")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id"), F.col("w")))
            ).alias("__ds")
        )
    )
    pair_expand = F.expr(
        "flatten(transform(__ds, (x, i) -> "
        "transform(slice(__ds, i + 2, size(__ds)), "
        "y -> struct(x.doc_id as da, y.doc_id as db, x.w * y.w as p))))"
    )
    rare_pairs = (
        wl.select(F.explode(pair_expand).alias("__p"))
        .select("__p.da", "__p.db", "__p.p")
        .groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).alias("__shared"),
            F.sum("p").alias("__dot_r"),
        )
        .filter(F.col("__shared") >= min_shared)
    )
    # Terms COMMONER than the cap still contribute to a candidate pair's
    # dot (they just cannot nominate candidates); their per-term pair
    # expansion would be df²-unbounded, so this slice keeps the join form —
    # over the df>cap slice of w only, against the ALREADY-THRESHOLDED
    # candidate pair set.  No broadcast hint on either wc side: the slice
    # is corpus-scale whenever boilerplate dominates (sf1: 2.6 M of the
    # 2.65 M weight rows sit above the cap), so the small side of each
    # join is the candidate frame and AQE's size-based choice broadcasts
    # it — hinting wc would rebuild the r13 fuzzy_name_pairs mistake
    # (§3.1: forced broadcast of a mis-estimated corpus-scale side).
    common = df_.filter(F.col("df") > df_cap).select("term")
    wc = w.join(F.broadcast(common), "term")
    wca = wc.select(
        F.col("doc_id").alias("da"), "term", F.col("w").alias("wa")
    )
    wcb = wc.select(
        F.col("doc_id").alias("db"), "term", F.col("w").alias("wb")
    )
    dot_c = (
        rare_pairs.select("da", "db")
        .join(wca, "da")
        .join(wcb, ["db", "term"])
        .groupBy("da", "db")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("__dot_c"))
    )
    dots = (
        rare_pairs.join(dot_c, ["da", "db"], "left")
        .select(
            "da",
            "db",
            (
                F.col("__dot_r")
                + F.coalesce(F.col("__dot_c"), F.lit(0).cast("bigint"))
            ).alias("dot"),
        )
    )
    return (
        dots.join(nrm.select(F.col("doc_id").alias("da"),
                             F.col("n2").alias("na")), "da")
        .join(nrm.select(F.col("doc_id").alias("db"),
                         F.col("n2").alias("nb")), "db")
        .withColumn(
            "cosine",
            F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "cosine",
        )
    )


def tfidf_cosine_pairs_sql(
    threshold: float = 0.3,
    df_cap: int = TFIDF_DF_CAP,
    min_shared: int = 2,
) -> str:
    """DuckDB oracle for :func:`tfidf_cosine_pairs` — same trigram
    terms, same integer idf floor arithmetic, same rare-term blocking."""
    return f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
             FROM documents),
    tri AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS term
            FROM toks, unnest(generate_series(1, len(ts) - 2)) AS g(i)),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tri GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * ((1000 * (n.n + 1)) // (df.df + 1)) AS w
          FROM tf JOIN df USING (term) CROSS JOIN n),
    nrm AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY 1),
    rare AS (SELECT term FROM df WHERE df BETWEEN 2 AND {df_cap}),
    cand AS (SELECT a.doc_id AS da, b.doc_id AS db
             FROM tf a JOIN tf b ON a.term = b.term
                                AND a.doc_id < b.doc_id
             JOIN rare r ON r.term = a.term
             GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}),
    dots AS (SELECT c.da, c.db, SUM(wa.w * wb.w) AS dot
             FROM cand c
             JOIN w wa ON wa.doc_id = c.da
             JOIN w wb ON wb.doc_id = c.db AND wb.term = wa.term
             GROUP BY 1, 2)
    SELECT da AS doc_a, db AS doc_b,
           dot / (SQRT(na.n2) * SQRT(nb.n2)) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = da
    JOIN nrm nb ON nb.doc_id = db
    WHERE dot / (SQRT(na.n2) * SQRT(nb.n2)) >= {threshold}
    """


# --------------------------------------------------------------------------
# Exact-substring dedup (suffix-array modality, Lee et al. 2022)
# --------------------------------------------------------------------------

# Seed anchor width in tokens: two docs are candidates only where they
# share an exact SUBSTRING_K-token run.  Anchors commoner than
# SUBSTRING_DF_CAP docs carry no dedup signal (boilerplate) and would
# quadratically blow the anchor self-join, so they are dropped BEFORE
# pairing — the same bucketed-candidates contract as GRAM_DF_CAP.
SUBSTRING_K = 6
SUBSTRING_DF_CAP = 20
# WITHIN-doc occurrence bound: the df cap bounds how many DOCS share an
# anchor, but a k-gram repeated m times in doc A and n times in doc B
# still emits m*n rows for that one (pair, digest) — occurrence-
# quadratic on repetitive text ("ha ha ha...", templated boilerplate,
# code) while sailing under the df cap.  Keeping only the FIRST
# SUBSTRING_OCC_CAP positions per (doc, digest) bounds the per-pair
# fan-out at occ_cap² per digest; non-repetitive docs (every k-gram
# unique within the doc) are byte-identical to the uncapped output.
SUBSTRING_OCC_CAP = 8


def substring_anchor_matches(
    docs: DataFrame,
    k: int = SUBSTRING_K,
    df_cap: int = SUBSTRING_DF_CAP,
    occ_cap: int = SUBSTRING_OCC_CAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The bounded anchor-match frame of the suffix-array pipeline —
    one row per (doc_a, doc_b, pa, pb) where both docs contain the same
    ``k``-token run at those positions, AFTER both caps: anchors in more
    than ``df_cap`` docs dropped (boilerplate), positions beyond the
    first ``occ_cap`` per (doc, digest) dropped (repetitive text).
    Exposed so tests can pin the candidate volume the caps guarantee;
    :func:`exact_substring_pairs` turns this into maximal runs."""
    from killrweather_spark.functions.text import tokens
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    )
    # sequence(1, size-k+1) is descending for short docs (the
    # sequence(1, 0) trap): filter size >= k first, which also matches
    # DuckDB's empty generate_series exactly.
    wocc = Window.partitionBy("doc_id", "dig").orderBy("pos")
    kg = (
        toks.filter(F.size("ts") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(ts) - {k} + 1), "
                    f"i -> md5(concat_ws(' ', slice(ts, i, {k}))))"
                )
            ).alias("pos0", "dig"),
        )
        .select(
            "doc_id", (F.col("pos0") + 1).alias("pos"), "dig"
        )
        # within-doc occurrence cap: first occ_cap positions per
        # (doc, digest) — see SUBSTRING_OCC_CAP.  One window shuffle on
        # run-sized partitions; a no-op for docs with no repeated k-gram.
        .withColumn("__occ", F.row_number().over(wocc))
        .filter(F.col("__occ") <= occ_cap)
        .drop("__occ")
        .transform(persist_once)
    )
    keep = (
        kg.groupBy("dig")
        .agg(F.countDistinct("doc_id").alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= df_cap))
        .select("dig")
    )
    a = kg.join(keep, "dig")
    return (
        a.alias("x")
        .join(a.alias("y"), "dig")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("da"),
            F.col("y.doc_id").alias("db"),
            F.col("x.pos").alias("pa"),
            F.col("y.pos").alias("pb"),
            (F.col("y.pos") - F.col("x.pos")).alias("delta"),
        )
    )


def exact_substring_pairs(
    docs: DataFrame,
    k: int = SUBSTRING_K,
    min_len: int = 10,
    df_cap: int = SUBSTRING_DF_CAP,
    occ_cap: int = SUBSTRING_OCC_CAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal exact shared token substrings of >= ``min_len`` tokens
    across document pairs — the suffix-array dedup modality of Lee et
    al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), completing the family next to set overlap (MinHash), bit
    similarity (SimHash), passage rewrite (CCNet), fingerprints
    (winnowing) and weighted-lexical cosine (TF-IDF).

    The suffix-array build is re-expressed relationally so it is both
    distributed and oracle-replayable: every ``k``-token window becomes
    a positioned anchor ``(doc_id, pos, md5(k-gram))``; anchors shared
    by 2..``df_cap`` docs self-join into ``(doc_a, doc_b, pa, pb)``
    matches; within a pair, matches at the SAME offset delta
    ``pb - pa`` whose ``pa`` positions are consecutive form one shared
    run (gaps-and-islands: ``pa - row_number()`` is constant inside a
    run), and a run of ``m`` consecutive anchors is an exact shared
    substring of ``m + k - 1`` tokens.  No binary doubling pass is
    needed — the window function recovers maximal runs in one shuffle.

    Scale shape: the only quadratic step is per-anchor-digest and capped
    in BOTH directions — ``df_cap``² across docs (boilerplate anchors
    never pair) and ``occ_cap``² within a pair (a k-gram repeated m·n
    times across two repetitive docs pairs at most occ_cap² anchors, not
    m·n); the islands window partitions by (pair, delta) — run-sized
    partitions, no skew; digests are fixed-width md5 so anchor rows stay
    narrow regardless of k.
    Returns one row per maximal run: (doc_a, doc_b, start_a, start_b,
    match_tokens), positions 1-based in token space.
    """
    from pyspark.sql.window import Window

    anch = substring_anchor_matches(
        docs, k=k, df_cap=df_cap, occ_cap=occ_cap,
        id_col=id_col, text_col=text_col,
    )
    w = Window.partitionBy("da", "db", "delta").orderBy("pa")
    runs = anch.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        runs.groupBy("da", "db", "delta", "grp")
        .agg(
            F.min("pa").cast("bigint").alias("start_a"),
            F.min("pb").cast("bigint").alias("start_b"),
            (F.count(F.lit(1)) + k - 1).cast("bigint").alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_len)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "start_a",
            "start_b",
            "match_tokens",
        )
    )


def exact_substring_pairs_sql(
    k: int = SUBSTRING_K,
    min_len: int = 10,
    df_cap: int = SUBSTRING_DF_CAP,
    occ_cap: int = SUBSTRING_OCC_CAP,
) -> str:
    """DuckDB oracle for :func:`exact_substring_pairs` — same md5
    anchors, same df and within-doc occurrence caps, same
    gaps-and-islands run recovery."""
    return f"""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                  FROM documents),
    kg0 AS (SELECT doc_id, i AS pos,
                   md5(list_aggregate(ts[i:i+{k}-1], 'string_agg', ' ')) AS dig
            FROM toks, unnest(generate_series(1, len(ts) - {k} + 1)) AS g(i)
            WHERE len(ts) >= {k}),
    kg AS (SELECT doc_id, pos, dig FROM kg0
           QUALIFY ROW_NUMBER() OVER (
               PARTITION BY doc_id, dig ORDER BY pos) <= {occ_cap}),
    keep AS (SELECT dig FROM kg
             GROUP BY dig
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {df_cap}),
    a AS (SELECT kg.* FROM kg JOIN keep USING (dig)),
    anch AS (SELECT x.doc_id AS da, y.doc_id AS db,
                    x.pos AS pa, y.pos AS pb, y.pos - x.pos AS delta
             FROM a x JOIN a y ON x.dig = y.dig AND x.doc_id < y.doc_id),
    runs AS (SELECT da, db, delta, pa, pb,
                    pa - ROW_NUMBER() OVER (
                        PARTITION BY da, db, delta ORDER BY pa) AS grp
             FROM anch),
    agg AS (SELECT da, db,
                   CAST(MIN(pa) AS BIGINT) AS start_a,
                   CAST(MIN(pb) AS BIGINT) AS start_b,
                   CAST(COUNT(*) + {k} - 1 AS BIGINT) AS match_tokens
            FROM runs GROUP BY da, db, delta, grp)
    SELECT da AS doc_a, db AS doc_b, start_a, start_b, match_tokens
    FROM agg WHERE match_tokens >= {min_len}
    """


def exact_substring_rewrite(
    docs: DataFrame,
    k: int = SUBSTRING_K,
    min_len: int = 10,
    df_cap: int = SUBSTRING_DF_CAP,
    occ_cap: int = SUBSTRING_OCC_CAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ACTION step of suffix-array dedup (Lee et al. 2022 §4.2):
    :func:`exact_substring_pairs` finds the maximal shared runs; this
    operator REMOVES every duplicated span from all but one occurrence
    and reassembles the survivors — the same pairs→rewrite completion
    that ``passage_dedup_rewrite`` gives the CCNet line-dedup family.

    Keep policy (deterministic, order-free): the run's occurrence in the
    LOWER doc_id survives; the ``doc_b`` side's token range
    ``[start_b, start_b + match_tokens - 1]`` is marked for removal.
    Chains compose — if docs A < B < C share a run, B and C each appear
    as ``doc_b`` of a pair with A, so only A's occurrence survives.
    Per doc, marked ranges are interval-merged (gaps-and-islands over a
    running max-end) and the rewrite drops exactly the covered token
    positions; the rewrite is in normalized token space (the same
    lowercase ``[a-z0-9]+`` stream the anchors were built from).

    Scale shape: inherits the pairs operator's df/occurrence caps; the
    interval merge and the reassembly are per-doc windows/HOFs — one
    shuffle each on doc-sized partitions; span lists join back to the
    token arrays on doc_id (no range join, no explode of unaffected
    docs).  Returns one row per AFFECTED doc: (doc_id, tokens_before,
    tokens_removed, tokens_after, rewritten_md5) with rewritten_md5 the
    md5 of the space-joined surviving tokens — pinning the exact
    rewritten text without shipping it.
    """
    from killrweather_spark.functions.text import tokens
    from pyspark.sql.window import Window

    runs = exact_substring_pairs(
        docs, k=k, min_len=min_len, df_cap=df_cap, occ_cap=occ_cap,
        id_col=id_col, text_col=text_col,
    )
    spans = (
        runs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("start_b").alias("s"),
            (F.col("start_b") + F.col("match_tokens") - 1).alias("e"),
        )
        .dropDuplicates(["doc_id", "s", "e"])
    )
    ws = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        ws.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        spans.withColumn(
            "new_island",
            F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("new_island").over(
                ws.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    merged = islands.groupBy("doc_id", "grp").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    sp = merged.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("spans")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    )
    kept = (
        toks.join(sp, "doc_id")
        .select(
            "doc_id",
            F.size("ts").cast("bigint").alias("tokens_before"),
            F.expr(
                "filter(transform(ts, (t, i) -> struct(t AS t, i + 1 AS p)),"
                " x -> NOT exists(spans, sp -> x.p BETWEEN sp.s AND sp.e))"
            ).alias("kept"),
        )
    )
    return kept.select(
        "doc_id",
        "tokens_before",
        (F.col("tokens_before") - F.size("kept")).cast("bigint")
        .alias("tokens_removed"),
        F.size("kept").cast("bigint").alias("tokens_after"),
        F.md5(
            F.concat_ws(" ", F.expr("transform(kept, x -> x.t)"))
        ).alias("rewritten_md5"),
    )


def exact_substring_rewrite_sql(
    k: int = SUBSTRING_K,
    min_len: int = 10,
    df_cap: int = SUBSTRING_DF_CAP,
    occ_cap: int = SUBSTRING_OCC_CAP,
) -> str:
    """DuckDB oracle for :func:`exact_substring_rewrite` — same pairs
    pipeline, same keep-lowest-doc policy, same interval merge, same
    token-space reassembly (md5 of the space-joined survivors)."""
    return f"""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                  FROM documents),
    kg0 AS (SELECT doc_id, i AS pos,
                   md5(list_aggregate(ts[i:i+{k}-1], 'string_agg', ' ')) AS dig
            FROM toks, unnest(generate_series(1, len(ts) - {k} + 1)) AS g(i)
            WHERE len(ts) >= {k}),
    kg AS (SELECT doc_id, pos, dig FROM kg0
           QUALIFY ROW_NUMBER() OVER (
               PARTITION BY doc_id, dig ORDER BY pos) <= {occ_cap}),
    keep AS (SELECT dig FROM kg
             GROUP BY dig
             HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {df_cap}),
    a AS (SELECT kg.* FROM kg JOIN keep USING (dig)),
    anch AS (SELECT x.doc_id AS da, y.doc_id AS db,
                    x.pos AS pa, y.pos AS pb, y.pos - x.pos AS delta
             FROM a x JOIN a y ON x.dig = y.dig AND x.doc_id < y.doc_id),
    runs AS (SELECT da, db, delta, pa, pb,
                    pa - ROW_NUMBER() OVER (
                        PARTITION BY da, db, delta ORDER BY pa) AS grp
             FROM anch),
    agg AS (SELECT da, db,
                   CAST(MIN(pb) AS BIGINT) AS start_b,
                   CAST(COUNT(*) + {k} - 1 AS BIGINT) AS match_tokens
            FROM runs GROUP BY da, db, delta, grp),
    spans AS (SELECT DISTINCT db AS doc_id, start_b AS s,
                     start_b + match_tokens - 1 AS e
              FROM agg WHERE match_tokens >= {min_len}),
    m1 AS (SELECT doc_id, s, e,
                  MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS prev_max
           FROM spans),
    m2 AS (SELECT doc_id, s, e,
                  SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                           THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS grp
           FROM m1),
    merged AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e
               FROM m2 GROUP BY doc_id, grp),
    tokpos AS (SELECT t.doc_id, t.ts[i] AS tok, i AS pos,
                      len(t.ts) AS n
               FROM toks t
               JOIN (SELECT DISTINCT doc_id FROM merged) aff
                 USING (doc_id),
               unnest(generate_series(1, len(t.ts))) AS g(i)),
    flagged AS (SELECT tp.doc_id, tp.n, tp.pos, tp.tok,
                       CASE WHEN EXISTS (
                            SELECT 1 FROM merged m
                            WHERE m.doc_id = tp.doc_id
                              AND tp.pos BETWEEN m.s AND m.e)
                            THEN 0 ELSE 1 END AS keep
                FROM tokpos tp)
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS tokens_before,
           CAST(SUM(1 - keep) AS BIGINT) AS tokens_removed,
           CAST(SUM(keep) AS BIGINT) AS tokens_after,
           md5(COALESCE(string_agg(CASE WHEN keep = 1 THEN tok END, ' '
                                   ORDER BY pos), '')) AS rewritten_md5
    FROM flagged
    GROUP BY doc_id
    """


def intra_doc_repeat_spans(
    docs: DataFrame,
    k: int = 2,
    min_len: int = 3,
    occ_cap: int = SUBSTRING_OCC_CAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal repeated token runs WITHIN a document — the intra-doc
    counterpart of :func:`exact_substring_pairs` (Lee et al. 2022 treat
    a document repeating its own text the same as two documents sharing
    it; ``repetition_metrics`` scores the symptom as a ratio, this
    returns the SPANS).  A k-gram occurring at positions p1 < p2 inside
    one doc is a repeat anchor; anchors at the same offset delta
    ``p2 - p1`` with consecutive ``p1`` form one repeated run
    (gaps-and-islands, the exact machinery of the cross-doc operator
    applied to the ``doc_a == doc_b`` diagonal that operator excludes).
    Defaults are tighter than the cross-doc op (k=2, min_len=3) because
    intra-doc repetition is short-period — repeated phrases, chorus
    lines, boilerplate headers — not wholesale mirroring.

    Scale shape: the self-join is per (doc, digest) and double-bounded —
    ``occ_cap``² occurrence pairs per digest (the repetitive-doc
    guard) and zero cross-doc fan-out by construction (doc_id is a
    join key); the islands window partitions by (doc, delta).
    Returns (doc_id, start_1, start_2, match_tokens), positions
    1-based, one row per maximal repeated run of >= min_len tokens.
    """
    from killrweather_spark.functions.text import tokens
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    )
    wocc = Window.partitionBy("doc_id", "dig").orderBy("pos")
    kg = (
        toks.filter(F.size("ts") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(ts) - {k} + 1), "
                    f"i -> md5(concat_ws(' ', slice(ts, i, {k}))))"
                )
            ).alias("pos0", "dig"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "dig")
        .withColumn("__occ", F.row_number().over(wocc))
        .filter(F.col("__occ") <= occ_cap)
        .drop("__occ")
        .transform(persist_once)
    )
    anch = (
        kg.alias("x")
        .join(kg.alias("y"), ["doc_id", "dig"])
        .filter(F.col("x.pos") < F.col("y.pos"))
        .select(
            "doc_id",
            F.col("x.pos").alias("p1"),
            F.col("y.pos").alias("p2"),
            (F.col("y.pos") - F.col("x.pos")).alias("delta"),
        )
    )
    w = Window.partitionBy("doc_id", "delta").orderBy("p1")
    runs = anch.withColumn("grp", F.col("p1") - F.row_number().over(w))
    return (
        runs.groupBy("doc_id", "delta", "grp")
        .agg(
            F.min("p1").cast("bigint").alias("start_1"),
            F.min("p2").cast("bigint").alias("start_2"),
            (F.count(F.lit(1)) + k - 1).cast("bigint").alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_len)
        .select("doc_id", "start_1", "start_2", "match_tokens")
    )


def intra_doc_repeat_spans_sql(
    k: int = 2,
    min_len: int = 3,
    occ_cap: int = SUBSTRING_OCC_CAP,
) -> str:
    """DuckDB oracle for :func:`intra_doc_repeat_spans` — same anchors,
    same occurrence cap, same within-doc islands."""
    return f"""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                  FROM documents),
    kg0 AS (SELECT doc_id, i AS pos,
                   md5(list_aggregate(ts[i:i+{k}-1], 'string_agg', ' ')) AS dig
            FROM toks, unnest(generate_series(1, len(ts) - {k} + 1)) AS g(i)
            WHERE len(ts) >= {k}),
    kg AS (SELECT doc_id, pos, dig FROM kg0
           QUALIFY ROW_NUMBER() OVER (
               PARTITION BY doc_id, dig ORDER BY pos) <= {occ_cap}),
    anch AS (SELECT x.doc_id, x.pos AS p1, y.pos AS p2,
                    y.pos - x.pos AS delta
             FROM kg x JOIN kg y
               ON x.doc_id = y.doc_id AND x.dig = y.dig
              AND x.pos < y.pos),
    runs AS (SELECT doc_id, delta, p1, p2,
                    p1 - ROW_NUMBER() OVER (
                        PARTITION BY doc_id, delta ORDER BY p1) AS grp
             FROM anch),
    agg AS (SELECT doc_id,
                   CAST(MIN(p1) AS BIGINT) AS start_1,
                   CAST(MIN(p2) AS BIGINT) AS start_2,
                   CAST(COUNT(*) + {k} - 1 AS BIGINT) AS match_tokens
            FROM runs GROUP BY doc_id, delta, grp)
    SELECT doc_id, start_1, start_2, match_tokens
    FROM agg WHERE match_tokens >= {min_len}
    """


def substring_ref_digests(
    ref_docs: DataFrame,
    k: int = SUBSTRING_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persisted reference side of the streaming substring screen:
    the DISTINCT k-gram digests of the reference corpus.  Membership
    only — no positions, no doc ids — so no caps are needed (there is
    no self-join to bound) and the index is one narrow md5 column,
    built once in batch and probed by every arriving micro-batch."""
    from killrweather_spark.functions.text import tokens

    toks = ref_docs.select(tokens(F.col(text_col)).alias("ts"))
    return (
        toks.filter(F.size("ts") >= k)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ts) - {k} + 1), "
                    f"i -> md5(concat_ws(' ', slice(ts, i, {k}))))"
                )
            ).alias("ref_dig")
        )
        .distinct()
    )


def streaming_substring_screen(
    ref_docs: DataFrame,
    stream_docs: DataFrame,
    k: int = SUBSTRING_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Online exact-substring dedup at INGEST: each arriving document
    is scored against the persisted k-gram digest index of yesterday's
    corpus (:func:`substring_ref_digests`) — the sliding-window
    counterpart of ``streaming_passage_screen``, which probes DISJOINT
    passages and therefore misses duplication that arrives offset by a
    few tokens; sliding k-grams are alignment-invariant.

    Per arriving doc: how many of its k-grams the reference already
    contains, and the LONGEST consecutive run of known k-gram
    positions (a run of m consecutive known grams spans m + k - 1
    tokens — the Lee-et-al duplicated-span length the batch pairs
    operator would report against some reference doc, upper-bounded
    since consecutive grams may match different reference docs).

    Streaming constraints respected: the probe is a stream-static LEFT
    join on the digest; the per-doc rollup is ONE stateful aggregation
    (counts + collect_list of known positions); the longest-run scan is
    a stateless post-aggregation array fold (array_sort + aggregate
    HOF) — no window functions, which Structured Streaming forbids.
    Integer arithmetic end-to-end, so the drained stream is
    bit-identical to the batch replay and the batch SQL is the oracle.

    Returns (doc_id, n_grams, n_known, longest_known_run,
    known_ratio_micro); docs shorter than k tokens produce no grams and
    no row (same on both engines)."""
    from killrweather_spark.functions.text import tokens

    ref = substring_ref_digests(ref_docs, k, id_col, text_col).transform(
        persist_once
    )
    # Spread the narrow micro-batch across every task slot before the
    # k-gram explode + md5 (the streaming_semantic_screen fan-out rule,
    # pq.py): a |batch|-row round-robin exchange per trigger buys
    # full-width probing; the per-doc rollup is keyed and its position
    # list is array_sort'ed before use, so placement cannot change any
    # value.
    stream_docs = stream_docs.repartition(
        stream_docs.sparkSession.sparkContext.defaultParallelism
    )
    base = stream_docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("ts")
    ).filter(F.size("ts") >= k)
    grams = base.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ts) - {k} + 1), "
                f"i -> md5(concat_ws(' ', slice(ts, i, {k}))))"
            )
        ).alias("pos0", "dig"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "dig")
    probed = grams.join(ref, grams["dig"] == ref["ref_dig"], "left")
    rolled = probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum(F.when(F.col("ref_dig").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_known"),
        F.collect_list(
            F.when(F.col("ref_dig").isNotNull(), F.col("pos"))
        ).alias("__kpos"),
    )
    # longest consecutive run of known positions: stateless array fold
    # over the sorted per-doc known-position list (bounded by doc
    # length, like the text itself)
    longest = F.expr(
        "aggregate(array_sort(__kpos), "
        "named_struct('best', 0L, 'cur', 0L, 'prev', -2L), "
        "(a, p) -> named_struct("
        "'best', greatest(a.best, IF(p = a.prev + 1, a.cur + 1, 1L)), "
        "'cur', IF(p = a.prev + 1, a.cur + 1, 1L), "
        "'prev', CAST(p AS LONG)), "
        "a -> a.best)"
    )
    return rolled.select(
        "doc_id",
        "n_grams",
        "n_known",
        F.when(longest > 0, longest + k - 1)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("longest_known_run"),
        F.expr("CAST((1000000 * n_known) div n_grams AS BIGINT)").alias(
            "known_ratio_micro"
        ),
    )


def streaming_substring_screen_sql(k: int = SUBSTRING_K) -> str:
    """DuckDB oracle for :func:`streaming_substring_screen`: reference
    index = the even-doc_id half (the registered query's 'yesterday's
    corpus' split), arrivals = the full corpus — even docs score 10⁶
    exactly, near-dup odd docs show long known runs."""
    return f"""
    WITH toks AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                  FROM documents),
    kg AS (SELECT doc_id, i AS pos,
                  md5(list_aggregate(ts[i:i+{k}-1], 'string_agg', ' ')) AS dig
           FROM toks, unnest(generate_series(1, len(ts) - {k} + 1)) AS g(i)
           WHERE len(ts) >= {k}),
    ref AS (SELECT DISTINCT dig FROM kg WHERE doc_id % 2 = 0),
    j AS (SELECT g.doc_id, g.pos,
                 CASE WHEN r.dig IS NOT NULL THEN 1 ELSE 0 END AS known
          FROM kg g LEFT JOIN ref r ON g.dig = r.dig),
    isl AS (SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS grp
            FROM j WHERE known = 1),
    longest AS (SELECT doc_id, MAX(c) + {k} - 1 AS run
                FROM (SELECT doc_id, grp, COUNT(*) AS c
                      FROM isl GROUP BY 1, 2)
                GROUP BY 1)
    SELECT j.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(known) AS BIGINT) AS n_known,
           CAST(COALESCE(ANY_VALUE(l.run), 0) AS BIGINT)
             AS longest_known_run,
           CAST((1000000 * SUM(known)) // COUNT(*) AS BIGINT)
             AS known_ratio_micro
    FROM j LEFT JOIN longest l ON j.doc_id = l.doc_id
    GROUP BY j.doc_id
    """
