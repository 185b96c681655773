"""Property tests: results must be invariant to physical layout.

The 100 TB replayability claim (SCALE.md "Determinism at scale") is that
every declared computation returns bit-identical results under ANY
partitioning / reduction order — that's what makes results reproducible
across cluster sizes and what lets the DuckDB oracle (a single-threaded
engine) check a distributed run at all.  Hypothesis drives the partition
count; the property is exact result equality.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from killrweather_spark.functions.dedup import minhash_signatures, char_shingles
from killrweather_spark.operators.aggregates import daily_stats_exact
from killrweather_spark.sources.readers import load_table
from tests.conftest import SF001

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@given(n_parts=st.sampled_from([1, 3, 7, 16, 61]))
@settings(**_SETTINGS)
def test_daily_stats_exact_invariant_to_partitioning(spark, n_parts):
    ev = (
        load_table(spark, SF001, "events")
        .select(
            "user_id",
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
            "value",
        )
    )
    base = _canon(daily_stats_exact(ev, ["user_id", "year", "month", "day"], "value"))
    shuffled = ev.repartition(n_parts)
    got = _canon(
        daily_stats_exact(shuffled, ["user_id", "year", "month", "day"], "value")
    )
    assert got == base


@given(n_parts=st.sampled_from([1, 5, 13, 32]))
@settings(**_SETTINGS)
def test_minhash_signature_invariant_to_partitioning(spark, n_parts):
    docs = load_table(spark, SF001, "documents").select("doc_id", "text").limit(50)
    sh = char_shingles(docs, "text", "doc_id", 6)
    base = _canon(minhash_signatures(sh, "doc_id"))
    got = _canon(minhash_signatures(sh.repartition(n_parts), "doc_id"))
    assert got == base


@given(n_parts=st.sampled_from([1, 4, 17]))
@settings(**_SETTINGS)
def test_fixed_point_rollup_invariant_to_partitioning(spark, n_parts):
    """The two-tier cents rollup (daily → annual) — the reference's counter
    semantics — must not depend on how rows are scattered."""
    ev = load_table(spark, SF001, "events").select(
        "user_id", F.year("ts").alias("year"), F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def rollup(df):
        daily = df.groupBy("user_id", "year", "month", "day").agg(
            F.sum("cents").alias("day_cents")
        )
        return daily.groupBy("user_id", "year").agg(
            (F.sum("day_cents") / 100.0).alias("total")
        )

    assert _canon(rollup(ev.repartition(n_parts))) == _canon(rollup(ev))


@given(n_parts=st.sampled_from([1, 4, 11, 32]))
@settings(**_SETTINGS)
def test_hll_estimate_invariant_to_partitioning(spark, n_parts):
    """The HLL registers are MAX-merged exact integers, so the estimate must
    be bit-identical under any partitioning — the property that makes an
    approximate aggregate still replayable at any cluster size."""
    from killrweather_spark.operators.aggregates import hll_distinct

    ev = load_table(spark, SF001, "events").select("event_type", "user_id")
    base = _canon(hll_distinct(ev, ["event_type"], "user_id"))
    got = _canon(hll_distinct(ev.repartition(n_parts), ["event_type"], "user_id"))
    assert got == base


@given(frac_nibble=st.sampled_from(["0", "3", "7", "b", "f"]))
@settings(**_SETTINGS)
def test_csv_audit_partitions_every_line(spark, frac_nibble):
    """Audit classes are a partition of the input: counts must sum to the
    row count at ANY corruption rate (md5-threshold-driven), and classes are
    mutually exclusive by construction."""
    from killrweather_spark.sources.readers import csv_line_audit

    ev = load_table(spark, SF001, "events").select("user_id", "value")
    lines = ev.select(
        F.concat_ws(",", "user_id", "value").alias("line0")
    ).select(
        F.when(
            F.expr("substr(md5(line0), 1, 1)") <= frac_nibble,
            F.concat_ws(",", F.lit("bad"), F.lit("")),
        ).otherwise(F.col("line0")).alias("line")
    )
    total = lines.count()
    audit = csv_line_audit(
        lines, casts=[(1, "BIGINT"), (2, "DOUBLE")], n_fields=2
    ).collect()
    assert sum(r["n"] for r in audit) == total
    assert len({r["error_class"] for r in audit}) == len(audit)


@given(n_parts=st.sampled_from([1, 5, 32]))
@settings(**_SETTINGS)
def test_decontaminate_invariant_to_partitioning(spark, n_parts):
    from killrweather_spark.functions.dedup import decontaminate

    d = load_table(spark, SF001, "documents").select("doc_id", "text")
    ev = d.filter(F.col("doc_id") % 10 == 0)
    tr = d.filter(F.col("doc_id") % 10 != 0)
    base = _canon(decontaminate(tr, ev, "text", "doc_id", n=8))
    got = _canon(
        decontaminate(tr.repartition(n_parts), ev.repartition(n_parts),
                      "text", "doc_id", n=8)
    )
    assert got == base


def test_fan_out_is_noop_on_wide_inputs(spark):
    import os

    from killrweather_spark.sources.readers import (
        FAN_OUT_SIZED_BYTES,
        fan_out,
        load_table,
    )

    slots = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(slots + 4)
    assert fan_out(wide) is wide  # already >= slots: untouched lineage
    narrow = spark.range(1000).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == slots
    # file-backed hot path: a small parquet scan is spread via the
    # stat-based byte threshold, to a SIZE-DERIVED width (r13 session 6:
    # ~192 KiB of input per slot, full width only from ~6 MiB up at 32
    # slots) — no plan→RDD conversion involved
    docs = load_table(spark, SF001, "documents")
    sz = os.stat(os.path.join(SF001, "documents.parquet")).st_size
    expect = max(2, min(slots, sz // FAN_OUT_SIZED_BYTES + 1))
    assert fan_out(docs).rdd.getNumPartitions() == expect
    assert expect < slots  # the bench-SF scan must NOT jump to full width
    # an explicit slots= pins the width exactly (the kernel-bound callers)
    assert fan_out(docs, slots=slots).rdd.getNumPartitions() == slots


@given(
    a=st.integers(min_value=0, max_value=1023),
    b=st.integers(min_value=0, max_value=1023),
)
@settings(**_SETTINGS)
def test_zorder_key_roundtrips(spark, a, b):
    """Interleave → de-interleave is the identity: the z-key loses no bits,
    so file-level min/max boxes bound BOTH dimensions exactly."""
    from killrweather_spark.sources.sinks import zorder_key

    df = spark.createDataFrame([(a, b)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], bits=10).alias("z")).first().z
    xa = sum(((z >> (2 * i)) & 1) << i for i in range(10))
    yb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(10))
    assert (xa, yb) == (a, b)


def test_cms_estimate_dominates_exact_and_stays_tight(spark):
    """Count-Min guarantees cms_n >= exact_n per key; with w=1024 buckets
    over ~2k distinct parts the expected collision mass per row is small,
    so the min-over-3-rows estimate stays within a few average loads."""
    from killrweather_spark.api.inventory import REGISTRY

    rows = REGISTRY["heavy_hitters_cms"].fn(spark, SF001).collect()
    assert len(rows) == 20
    n_total = sum(r.exact_n for r in rows)  # top-20 mass only, lower bound
    for r in rows:
        assert r.cms_n >= r.exact_n
        # deterministic Count-Min bound: overestimate <= total stream mass
        # over w per row; 3 rows of 1024 buckets on sf0.001 (6k items)
        # leaves ~6 expected colliding items per bucket — allow 10x slack
        assert r.cms_n - r.exact_n <= max(60, n_total)


def test_chunk_dup_share_bounds_and_coverage(spark):
    # dup_micro is a floor fraction in [0, 1e6]; every document appears
    from killrweather_spark.api.inventory import REGISTRY

    rows = REGISTRY["chunk_dup_share"].fn(spark, SF001).collect()
    n_docs = load_table(spark, SF001, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.dup_micro <= 1_000_000
        assert 0 <= r.n_dup_chunks <= r.n_chunks


def test_semantic_dup_candidates_within_cluster_and_bounded(spark):
    from killrweather_spark.api.inventory import REGISTRY

    rows = REGISTRY["semantic_dup_candidates"].fn(spark, SF001).collect()
    emb = load_table(spark, SF001, "embeddings")
    label_of = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert r.vec_a < r.vec_b
        assert label_of[r.vec_a] == label_of[r.vec_b] == r.label
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_kmeans_estep_matches_bruteforce_numpy(spark):
    # independent reimplementation: quantize, integer-floor centroids,
    # exact integer distances, (d2, cand) argmin
    import numpy as np

    from killrweather_spark.api.inventory import REGISTRY

    emb = load_table(spark, SF001, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    labels = np.array([r.label for r in emb])
    Q = np.array(
        [[round(float(x) * 1_000_000) for x in r.embedding] for r in emb],
        dtype=np.int64,
    )
    cents = {}
    for lab in np.unique(labels):
        s = Q[labels == lab].sum(axis=0)
        n = (labels == lab).sum()
        cents[lab] = np.floor_divide(s, n)  # floor == (s - ((s%n+n)%n))//n
    expected = {}
    for i, vid in enumerate(ids):
        best = min(
            (int(((Q[i] - c) ** 2).sum()), int(lab)) for lab, c in cents.items()
        )
        expected[int(vid)] = best
    got = {
        r.vec_id: (r.dist2, r.new_label)
        for r in REGISTRY["kmeans_assign_step"].fn(spark, SF001).collect()
    }
    assert got == expected


def test_new_batch_dup_screen_subset_of_new_batch(spark):
    from killrweather_spark.api.inventory import REGISTRY

    rows = REGISTRY["new_batch_dup_screen"].fn(spark, SF001).collect()
    for r in rows:
        assert r.doc_id % 4 == 0  # only new-batch docs are ever flagged


@given(
    name=st.text(alphabet="abcdefgh#0123", min_size=1, max_size=16),
    pos=st.integers(min_value=0, max_value=32),
    op=st.sampled_from(["substitute", "insert", "delete"]),
    ch=st.sampled_from("abcdefgh#0123"),
)
@settings(max_examples=200, deadline=None)
def test_deletion_neighborhood_covers_every_single_edit(name, pos, op, ch):
    """The blocking lemma fuzzy_name_pairs relies on: for ANY string and
    ANY single edit, the original and the edited string share at least one
    deletion variant (the string itself or a 1-char deletion) — so the
    variant equi-join has 100% recall at edit distance ≤ 1 by construction,
    not by tuning.  Pure-Python over the same variant definition the Spark
    expression implements."""

    def variants(s: str) -> set[str]:
        return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}

    i = pos % (len(name) + (1 if op == "insert" else 0)) if name or op == "insert" else 0
    if op == "substitute":
        edited = name[:i] + ch + name[i + 1 :] if name else ch
    elif op == "insert":
        edited = name[:i] + ch + name[i:]
    else:  # delete
        if not name:
            edited = name
        else:
            edited = name[:i] + name[i + 1 :]
    # lev(name, edited) <= 1 by construction
    assert variants(name) & variants(edited), (name, edited)


def _stopword_chain_docs(spark, n: int):
    """Stop-word-heavy fixture: every doc carries the hot 'the of' bigram
    (df = n), and doc i shares exactly one RARE bigram
    ('pair{i+1} pair{i+1}', df = 2) with doc i+1 — quadratic candidate
    volume uncapped, linear chain capped."""
    rows = [(i, f"the of pair{i} pair{i} pair{i + 1} pair{i + 1}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gram_df_cap_bounds_candidate_growth(spark):
    """The GRAM_DF_CAP prefix filter turns the gram-keyed verifier join's
    candidate volume from quadratic to linear on a boilerplate-heavy corpus:
    uncapped, every doc pair shares the hot gram (C(n,2) pairs); capped, only
    the n-1 chained rare-gram pairs survive.  Doubling n exactly doubles the
    capped output while quadrupling the uncapped one."""
    from killrweather_spark.functions.dedup import word_bigram_jaccard_pairs

    for n in (20, 40):
        df = _stopword_chain_docs(spark, n)
        capped = word_bigram_jaccard_pairs(df, threshold=0.0, max_df=5).count()
        uncapped = word_bigram_jaccard_pairs(df, threshold=0.0, max_df=None).count()
        assert capped == n - 1, (n, capped)
        assert uncapped == n * (n - 1) // 2, (n, uncapped)


def test_gram_df_cap_keeps_true_near_dup_recall(spark):
    """True near-dups share many RARE grams, so the df cap costs them
    nothing: an identical-text pair keeps Jaccard 1.0 with the cap on, for
    both the Jaccard and the containment verifier."""
    from killrweather_spark.functions.dedup import (
        containment_pairs,
        word_bigram_jaccard_pairs,
    )

    n = 12
    rows = [(i, f"the of filler{i} filler{i}") for i in range(n)]
    dup = "alpha beta gamma delta epsilon zeta"
    rows += [(100, f"the of {dup}"), (101, f"the of {dup}")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in word_bigram_jaccard_pairs(df, threshold=0.5, max_df=5).collect()
    }
    assert jac == {(100, 101): 1.0}
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(df, n=3, threshold=0.5, max_df=5).collect()
    }
    assert (100, 101) in cont and cont[(100, 101)] == 1.0
