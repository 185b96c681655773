"""Behavioral tests for the n-gram LM curation family (``functions/lm.py``)
and the power-iteration principal direction
(``similarity.py:power_iteration_top_pc``) — the semantic properties the
oracle hash-compare can't express: fluency ordering, domain-affinity
ordering, and convergence to the true eigenvector.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from killrweather_spark.functions.lm import bigram_lm_scores, dsir_weights
from killrweather_spark.functions.similarity import (
    PC_PSCALE,
    power_iteration_top_pc,
)
from killrweather_spark.sources.readers import load_table
from tests.conftest import SF001


def test_bigram_lm_scores_fluent_text_above_noise(spark):
    """A document whose transitions repeat corpus-frequent bigrams must
    outscore one made of never-repeated transitions — the filtering
    decision the LM screen exists for."""
    fluent = "the cat sat on the mat " * 20
    noise = " ".join(f"w{i} z{i * 7 % 97}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, fluent), (4, noise)],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r for r in bigram_lm_scores(docs).collect()
    }
    assert rows[1]["mean_p_micro"] > rows[4]["mean_p_micro"]
    # repeated fluent docs score identically (content-determined)
    assert rows[1]["mean_p_micro"] == rows[2]["mean_p_micro"]


def test_bigram_lm_scores_drops_sub_bigram_docs(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "single"), (3, "")],
        ["doc_id", "text"],
    )
    out = bigram_lm_scores(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["n_bigrams"] == 1


def test_dsir_weights_upweight_target_domain(spark):
    """Mean importance weight of target-domain docs must exceed the rest:
    every token a src0 doc contains has c_t >= 1 while off-domain tokens
    smooth to the add-one floor."""
    docs = load_table(spark, SF001, "documents")
    w = dsir_weights(docs, "src0").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    m = (
        w.groupBy(F.col("source") == "src0")
        .agg(F.avg("weight_micro").alias("mw"))
        .collect()
    )
    means = {r[0]: r["mw"] for r in m}
    assert means[True] > means[False]


def test_power_iteration_climbs_the_rayleigh_quotient(spark):
    """Convergence against numpy's spectrum of the same quantized Gram
    matrix.  The synthetic corpus is near-isotropic (λ1/λ2 ≈ 1.02-1.07),
    so exact top-eigenvector alignment needs hundreds of iterations — the
    honest convergence measures are the Rayleigh quotient reaching the
    top of the spectrum and its provable monotonicity in iteration
    count."""

    def rayleigh(iters: int, emb, gram) -> float:
        v = np.array(
            [
                r["v_scaled"]
                for r in power_iteration_top_pc(emb, dim=64, iters=iters)
                .orderBy("pos")
                .collect()
            ],
            dtype=np.float64,
        )
        return float((v @ gram @ v) / (v @ v))

    emb = load_table(spark, SF001, "embeddings")
    pdf = emb.select("embedding").toPandas()
    a = np.rint(np.stack(pdf["embedding"].values).astype(np.float64) * PC_PSCALE)
    gram = a.T @ a
    lmax = float(np.linalg.eigvalsh(gram)[-1])
    r5, r8 = rayleigh(5, emb, gram), rayleigh(8, emb, gram)
    # deep into the top of the spectrum (a random direction sits near the
    # MEAN eigenvalue), and monotone as iterations increase
    assert r5 > 0.85 * lmax, (r5, lmax)
    assert r5 > 1.05 * np.trace(gram) / 64
    assert r8 >= r5, (r8, r5)


def test_bpe_merge_table_learns_the_known_merges(spark):
    """Hand-checkable corpus: 'abab' x3 + 'ab' x2.  Round 1 must merge
    (a,b) — 8 weighted pairs; round 2 merges (ab,ab) inside 'abab';
    round 3 has nothing adjacent left (no pairs remain across the
    2-symbol words)."""
    from killrweather_spark.functions.bpe import bpe_merge_table

    docs = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], ["doc_id", "text"]
    )
    rows = {r["merge_rank"]: r for r in bpe_merge_table(docs, k=2).collect()}
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("a", "b")
    assert rows[1]["pair_count"] == 8  # 2 per 'abab' x3 + 1 per 'ab' x2
    assert (rows[2]["left_sym"], rows[2]["right_sym"]) == ("ab", "ab")
    assert rows[2]["pair_count"] == 3


def test_bpe_merge_fold_is_left_to_right_non_overlapping(spark):
    """'aaa' under merge (a,a) must become [aa, a] — the fused symbol
    does not chain-merge: rank-2's top pair over a pure-'aaaa' corpus is
    (aa, aa), not (aa, a)."""
    from killrweather_spark.functions.bpe import bpe_merge_table

    docs = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    rows = {r["merge_rank"]: r for r in bpe_merge_table(docs, k=2).collect()}
    assert (rows[1]["left_sym"], rows[1]["right_sym"]) == ("a", "a")
    assert rows[1]["pair_count"] == 9
    assert (rows[2]["left_sym"], rows[2]["right_sym"]) == ("aa", "aa")
    assert rows[2]["pair_count"] == 3


def test_bpe_subword_stats_compression_improves_with_merges(spark):
    """More merges can only shorten segmentations: under k=2 the 'abab'
    corpus packs each word into fewer subwords than k=0-style char
    counts, and compression_micro reflects exact chars/subwords."""
    from killrweather_spark.functions.bpe import bpe_subword_stats

    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bpe_subword_stats(docs, k=2).collect()}
    # doc 1: merges (a,b) then (ab,ab) -> 'abab'=1 subword x2, 'ab'=1
    assert rows[1]["n_words"] == 3
    assert rows[1]["n_subwords"] == 3
    assert rows[1]["compression_micro"] == (10 * 1_000_000) // 3
    assert rows[2]["n_subwords"] == 1
    assert rows[2]["compression_micro"] == 4_000_000


def test_bpe_merge_exhaustion_stays_oracle_exact(spark, tmp_path):
    """A corpus supporting fewer merges than k: rounds past exhaustion
    must yield null merge rows on BOTH engines (the oracle's m-CTE emits
    an explicit null row instead of letting an empty CROSS JOIN
    annihilate the vocabulary) and the subword stats must survive."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from killrweather_spark.functions.bpe import (
        bpe_merge_table,
        bpe_merge_table_sql,
        bpe_subword_stats,
        bpe_subword_stats_sql,
    )

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["ab ab", "ab"]),
        }),
        tmp_path / "documents.parquet",
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )

    got = {r["merge_rank"]: r for r in bpe_merge_table(docs, k=3).collect()}
    want = {r[0]: r for r in con.execute(bpe_merge_table_sql(3)).fetchall()}
    assert set(got) == {1, 2, 3} == set(want)
    assert (got[1]["left_sym"], got[1]["right_sym"]) == ("a", "b")
    for rank in (2, 3):  # exhausted rounds: null on both engines
        assert got[rank]["left_sym"] is None and want[rank][1] is None

    stats = {r["doc_id"]: r for r in bpe_subword_stats(docs, k=3).collect()}
    ostats = {r[0]: r for r in con.execute(bpe_subword_stats_sql(3)).fetchall()}
    assert stats[1]["n_subwords"] == 2 == ostats[1][2]
    assert stats[2]["n_subwords"] == 1 == ostats[2][2]


def test_bpe_rejects_nonpositive_k(spark):
    import pytest as _pytest

    from killrweather_spark.functions.bpe import (
        bpe_merge_table,
        bpe_merge_table_sql,
    )

    docs = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bpe_merge_table(docs, k=0)
    with _pytest.raises(ValueError):
        bpe_merge_table_sql(0)


def test_power_iteration_excludes_ragged_vectors(spark):
    """A vector whose length differs from dim must be filtered on both
    engines, not silently null-padded out of sums (Spark) while keeping
    partial components (oracle)."""
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0]), (2, [9.0])],
        ["vec_id", "embedding"],
    )
    out = {
        r["pos"]: r["v_scaled"]
        for r in power_iteration_top_pc(emb, dim=2, iters=2).collect()
    }
    assert set(out) == {1, 2}
    # symmetric corpus after the ragged row is dropped: equal components
    assert out[1] == out[2] != 0


def test_perceptron_separates_a_separable_corpus(spark):
    """Disjoint vocabularies are linearly separable in hashed-count
    space: the batch perceptron must reach zero training error and the
    curve must be non-increasing after the w=0 epoch."""
    from killrweather_spark.functions.lm import perceptron_domain_classifier

    rows = [(i, "alpha beta gamma " * 4, "src0") for i in range(5)] + [
        (10 + i, "delta epsilon zeta " * 4, "srcX") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    curve = {
        r["epoch"]: r
        for r in perceptron_domain_classifier(docs, "src0", epochs=3).collect()
    }
    assert curve[1]["n_misclassified"] == 10  # w = 0: everything fails
    assert curve[4]["n_misclassified"] == 0   # separable -> solved
    errs = [curve[e]["n_misclassified"] for e in (2, 3, 4)]
    assert errs == sorted(errs, reverse=True)
    assert curve[1]["error_micro"] == 1_000_000


def test_perceptron_epochs_ceiling_fails_loudly(spark):
    """epochs beyond PERC_MAX_EPOCHS is a measured hang (serial checkpoint
    chain + ~5 unrolled oracle CTEs per epoch) — both the trainer and the
    oracle builder must refuse it up front."""
    import pytest as _pytest

    from killrweather_spark.functions.lm import (
        PERC_MAX_EPOCHS,
        perceptron_domain_classifier,
        perceptron_domain_classifier_sql,
    )

    docs = spark.createDataFrame([(1, "a b", "src0")],
                                 ["doc_id", "text", "source"])
    with _pytest.raises(ValueError, match="epochs"):
        perceptron_domain_classifier(docs, "src0", epochs=PERC_MAX_EPOCHS + 1)
    with _pytest.raises(ValueError, match="epochs"):
        perceptron_domain_classifier_sql("src0", epochs=PERC_MAX_EPOCHS + 1)
    with _pytest.raises(ValueError, match="epochs"):
        perceptron_domain_classifier_sql("src0", epochs=0)


def test_domain_gate_recovers_a_separable_domain(spark):
    """The production sign gate applied to a separable corpus must return
    EXACTLY the target-domain docs: training reaches zero error (previous
    test), so w·x > 0 iff the doc is in-domain.  The above_mean mode must
    also run, keep a strict non-trivial subset, and keep every margin
    exact-integer."""
    from killrweather_spark.functions.lm import domain_filtered_corpus

    rows = [(i, "alpha beta gamma " * 4, "src0") for i in range(5)] + [
        (10 + i, "delta epsilon zeta " * 4, "srcX") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    kept = domain_filtered_corpus(docs, "src0", epochs=3, mode="sign").collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 3, 4]
    assert all(r["source"] == "src0" and r["margin"] > 0 for r in kept)

    rel = domain_filtered_corpus(docs, "src0", epochs=3,
                                 mode="above_mean").collect()
    # in-domain margins all sit above the mixed-corpus mean here
    assert sorted(r["doc_id"] for r in rel) == [0, 1, 2, 3, 4]


def test_kn_bigram_scores_fluent_text_above_noise(spark):
    """Kneser-Ney must preserve the filtering decision: corpus-frequent
    transitions outscore never-repeated ones, and repeated identical docs
    score identically."""
    from killrweather_spark.functions.lm import kn_bigram_scores

    fluent = "the cat sat on the mat " * 20
    noise = " ".join(f"w{i} z{i * 7 % 97}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, fluent), (2, fluent), (3, noise)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in kn_bigram_scores(docs).collect()}
    assert rows[1]["mean_p_micro"] > rows[3]["mean_p_micro"]
    assert rows[1]["mean_p_micro"] == rows[2]["mean_p_micro"]


def test_source_mixture_weights_flatten_toward_small_sources(spark):
    """alpha = 1/2 temperature: the big/small WEIGHT ratio must be ~the
    square root of the big/small token ratio (upsampling the small
    domain), and floor-weights must sum to <= 10^6."""
    from killrweather_spark.functions.curation import source_mixture_weights

    docs = spark.createDataFrame(
        [(i, "tok " * 100, "big") for i in range(16)]
        + [(100, "tok " * 100, "small")],
        ["doc_id", "text", "source"],
    )
    w = {r["source"]: r for r in source_mixture_weights(docs).collect()}
    assert w["big"]["n_tokens"] == 16 * w["small"]["n_tokens"]
    ratio = w["big"]["weight_micro"] / w["small"]["weight_micro"]
    assert 3.9 < ratio < 4.1, ratio  # sqrt(16) = 4, not 16
    assert w["big"]["weight_micro"] + w["small"]["weight_micro"] <= 1_000_000


def test_greedy_source_coverage_is_submodular_and_exact(spark):
    """On a toy corpus with known vocabularies the greedy picks and their
    marginal gains are exact, gains are non-increasing (submodularity),
    and k beyond the source count raises."""
    import pytest as _pytest

    from killrweather_spark.functions.curation import greedy_source_coverage

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "s1"),          # 5 terms
            (2, "a b x", "s2"),              # adds x (1 new after s1)
            (3, "a b c d e f g", "s3"),      # 7 terms — best first pick
            (4, "a", "s4"),                  # adds nothing after s3
        ],
        ["doc_id", "text", "source"],
    )
    rows = greedy_source_coverage(docs, k=4).orderBy("sel_rank").collect()
    assert [(r.source, r.marginal_terms) for r in rows] == [
        ("s3", 7),   # a-g
        ("s2", 1),   # x
        ("s1", 0),   # subset of s3
        ("s4", 0),   # subset of everything
    ]
    gains = [r.marginal_terms for r in rows]
    assert gains == sorted(gains, reverse=True)
    with _pytest.raises(ValueError, match="exceeds"):
        greedy_source_coverage(docs, k=5)
