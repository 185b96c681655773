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
