"""Mergeable-state algebra (operators/mergeable.py) and Matryoshka
retrieval (functions/matryoshka.py).

The driver's oracle gate proves partial+merge == direct-recompute for the
ONE split each registry row ships.  These tests prove the algebra itself:
merge must be invariant to HOW history was batched (2-way vs 3-way vs
degenerate empty-delta splits), which is the property an incremental
pipeline actually relies on — tomorrow's batch boundary is never today's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from killrweather_spark.operators.mergeable import (
    hll_register_merge,
    incremental_stats,
    minhash_merge_signatures,
    stats_finalize,
    stats_merge,
    stats_partial,
)
from tests.conftest import SF001

KEYS = ["user_id", "year", "month", "day"]


def _events_cal(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stats_merge_invariant_to_batching(spark):
    """2-way (by hour), 3-way (by event_type hash), and direct single-state
    paths all finalize to identical rows — associativity/commutativity of
    the state algebra, not just one lucky split."""
    ev = _events_cal(spark)
    direct = stats_finalize(stats_merge([stats_partial(ev, KEYS, "value")], KEYS))

    two = incremental_stats(ev, KEYS, "value", lambda d: F.col("hour") < 12)

    shard = F.abs(F.hash("event_type", "ts")) % 3
    parts = [
        stats_partial(ev.filter(shard == i), KEYS, "value") for i in range(3)
    ]
    three = stats_finalize(stats_merge(parts, KEYS))

    expected = _rows(direct)
    assert _rows(two) == expected
    assert _rows(three) == expected


def test_stats_merge_empty_delta_is_identity(spark):
    """Folding an empty delta must be a no-op (the quiet-day case)."""
    ev = _events_cal(spark)
    state = stats_partial(ev, KEYS, "value")
    empty = stats_partial(ev.filter(F.lit(False)), KEYS, "value")
    merged = stats_finalize(stats_merge([state, empty], KEYS))
    direct = stats_finalize(stats_merge([state], KEYS))
    assert _rows(merged) == _rows(direct)


def test_stats_merge_disjoint_keys_union(spark):
    """Keys present in only one state pass through untouched (a brand-new
    day arriving in the delta)."""
    ev = _events_cal(spark)
    a = stats_partial(ev.filter(F.col("month") <= 6), KEYS, "value")
    b = stats_partial(ev.filter(F.col("month") > 6), KEYS, "value")
    merged = stats_finalize(stats_merge([a, b], KEYS))
    direct = stats_finalize(stats_merge([stats_partial(ev, KEYS, "value")], KEYS))
    assert _rows(merged) == _rows(direct)


def test_minhash_merge_matches_direct(spark):
    """Sharded signature build == one-shot signatures, for a 2-way md5
    split AND a 4-way doc-position split (shard layout must not matter)."""
    from killrweather_spark.functions.dedup import (
        char_shingles,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet").limit(120)
    sh = char_shingles(docs, "text", "doc_id", gram=6)
    direct = _rows(minhash_signatures(sh, "doc_id", 16))

    parity = sh.withColumn(
        "__s",
        F.expr("(instr('0123456789abcdef', substr(md5(shingle), 16, 1)) - 1) % 2"),
    )
    assert _rows(minhash_merge_signatures(parity, "doc_id", "__s", 16)) == direct

    four = sh.withColumn("__s", F.abs(F.hash("shingle")) % 4)
    assert _rows(minhash_merge_signatures(four, "doc_id", "__s", 16)) == direct


def test_hll_register_merge_matches_direct(spark):
    """MAX-merged monthly register states finalize to the exact same
    estimate as the one-shot sketch — and so does a differently-sharded
    (daily) build: the sketch state is shard-layout-free."""
    from killrweather_spark.operators.aggregates import hll_distinct

    ev = _events_cal(spark)
    direct = _rows(hll_distinct(ev, ["event_type"], "user_id", "n"))

    monthly = hll_register_merge(
        ev.withColumn("__m", F.col("month")), ["event_type"], "user_id", "__m", "n"
    )
    daily = hll_register_merge(
        ev.withColumn("__d", F.dayofyear("ts")), ["event_type"], "user_id", "__d", "n"
    )
    assert _rows(monthly) == direct
    assert _rows(daily) == direct


def test_matryoshka_full_width_recall_is_one(spark):
    """The widest leg of the curve is retrieval vs itself — recall must be
    exactly 1.0, and every leg must be a valid micro-unit fraction."""
    from killrweather_spark.functions.matryoshka import matryoshka_recall_curve

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    rows = {r.trunc_dim: r for r in matryoshka_recall_curve(
        emb, lambda c: c < 16, k=5
    ).collect()}
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].mean_recall_micro == 1_000_000
    nq = rows[64].n_queries
    for r in rows.values():
        assert 0 <= r.mean_recall_micro <= 1_000_000
        # zero-norm prefixes can only shrink the query set, never grow it
        assert 0 < r.n_queries <= nq


def test_matryoshka_two_stage_rescore_is_exact(spark):
    """Stage-2 cosines must equal the exact full-width cosine for the same
    (query, neighbor) pairs — the rescore is exact, only the SHORTLIST is
    approximate.  With shortlist == corpus the two-stage result must equal
    brute force outright."""
    from killrweather_spark.functions.matryoshka import matryoshka_two_stage
    from killrweather_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    n = emb.count()
    two = matryoshka_two_stage(
        emb, lambda c: c < 5, shortlist=n, k=3, stage_dim=16
    )
    brute = cosine_topk(emb, lambda c: c < 5, k=3)
    got = sorted(
        (r.query_id, r.neighbor_id, round(r.cosine, 12)) for r in two.collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, round(r.cosine, 12)) for r in brute.collect()
    )
    assert got == want


def test_matryoshka_two_stage_rank_shape(spark):
    """rank is 1..k per query with deterministic ordering."""
    from killrweather_spark.functions.matryoshka import matryoshka_two_stage

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    out = matryoshka_two_stage(emb, lambda c: c < 6, shortlist=10, k=4).collect()
    per_q: dict[int, list[int]] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
        assert -1.0000001 <= r.cosine <= 1.0000001
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
