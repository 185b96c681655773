"""Incremental tier maintenance: correctness + only-new-work guarantees."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from killrweather_spark.operators.incremental import (
    incremental_refresh,
    tier_watermark,
)
from killrweather_spark.sources.readers import load_table
from tests.conftest import SF001

KEYS = ["user_id"]
DATES = ["year", "month", "day"]


def _aggs():
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    ]


def _calendar(spark):
    return load_table(spark, SF001, "events").select(
        "user_id",
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        F.dayofmonth("ts").alias("day"),
        "value",
    )


def _canon(df):
    cols = ["user_id", "year", "month", "day", "n", "cents"]
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    ev = _calendar(spark)
    tier = str(tmp_path / "daily")

    # bootstrap: days 1-20 land first
    first = ev.filter(F.col("day") <= 20)
    n1 = incremental_refresh(spark, first, tier, KEYS, DATES, _aggs())
    assert n1 == 20
    assert tier_watermark(spark, tier) is not None

    # late+new arrivals: replay day 20 (late rows) plus days 21+
    n2 = incremental_refresh(spark, ev, tier, KEYS, DATES, _aggs())
    # only the watermark day and newer days were recomputed
    assert n2 < n1 + 15
    full = ev.groupBy(*KEYS, *DATES).agg(*_aggs())
    got = spark.read.parquet(tier)
    assert _canon(got) == _canon(full)


def test_incremental_refresh_is_idempotent_and_leaves_old_partitions(
    spark, tmp_path
):
    ev = _calendar(spark)
    tier = str(tmp_path / "daily")
    incremental_refresh(spark, ev, tier, KEYS, DATES, _aggs())

    # record old-partition file mtimes, then re-run with no new data
    def mtimes(pat):
        return {f: os.path.getmtime(f) for f in glob.glob(pat)}

    wm = tier_watermark(spark, tier)
    old = mtimes(f"{str(tmp_path / 'daily')}/date_key=*/*.parquet")
    old_untouched = {f: t for f, t in old.items() if f"date_key={wm}" not in f}

    n = incremental_refresh(spark, ev, tier, KEYS, DATES, _aggs())
    assert n == 1  # only the watermark unit is recomputed

    new = mtimes(f"{str(tmp_path / 'daily')}/date_key=*/*.parquet")
    for f, t in old_untouched.items():
        assert new.get(f) == t, f"old partition rewritten: {f}"

    # and the data is unchanged (idempotent)
    full = ev.groupBy(*KEYS, *DATES).agg(*_aggs())
    assert _canon(spark.read.parquet(tier)) == _canon(full)


# ---------------------------------------------------------------------------
# CDC merge (operators/cdc.py)
# ---------------------------------------------------------------------------


def test_merge_changes_upsert_delete_passthrough(spark):
    from killrweather_spark.operators.cdc import merge_changes

    snapshot = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, payload string"
    )
    changes = spark.createDataFrame(
        [
            # k=1: two updates — later (ts=20) wins
            (1, "a2", False, 10, 100),
            (1, "a3", False, 20, 101),
            # k=2: update then delete — key disappears
            (2, "b2", False, 10, 102),
            (2, "b2", True, 30, 103),
            # k=4: brand-new insert
            (4, "d", False, 5, 104),
            # k=5: insert then delete — never materializes
            (5, "e", False, 1, 105),
            (5, "e", True, 2, 106),
        ],
        "k int, payload string, is_delete boolean, ts long, event_id long",
    )
    out = merge_changes(
        snapshot, changes, keys=["k"], order_by=["ts", "event_id"]
    )
    got = {(r.k, r.payload) for r in out.collect()}
    # k=3 untouched, k=1 latest update, k=2/5 deleted, k=4 inserted
    assert got == {(1, "a3"), (3, "c"), (4, "d")}


def test_merge_changes_tiebreak_is_total(spark):
    from killrweather_spark.operators.cdc import merge_changes

    snapshot = spark.createDataFrame([(1, "old")], "k int, payload string")
    # Same ts — event_id must break the tie deterministically.
    changes = spark.createDataFrame(
        [(1, "x", False, 10, 7), (1, "y", False, 10, 9)],
        "k int, payload string, is_delete boolean, ts long, event_id long",
    )
    out = merge_changes(
        snapshot, changes, keys=["k"], order_by=["ts", "event_id"]
    )
    assert [(r.k, r.payload) for r in out.collect()] == [(1, "y")]
