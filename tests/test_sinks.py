"""Storage-layout tests — the scale contract of SURVEY §7 step 6.

The reference's Cassandra layout (partition key ``wsid``, DESC clustering,
``create-timeseries.cql:31-47``) is what makes its point queries single-
partition and its scans data-local.  These tests pin the Spark equivalents:
directory-partition pruning, bucketed no-shuffle joins, and CTAS.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from killrweather_spark.plans.checks import (
    formatted_plan,
    shuffle_count,
)
from killrweather_spark.sources.readers import load_table
from killrweather_spark.sources.sinks import (
    ctas,
    save_bucketed_table,
    station_bucket_predicate,
    with_station_bucket,
    write_partitioned,
)
from tests.conftest import SF001


@pytest.fixture(scope="module")
def events(spark):
    ev = load_table(spark, SF001, "events")
    return ev.select(
        "event_id",
        F.col("user_id").cast("string").alias("wsid"),
        F.year("ts").alias("year"),
        F.month("ts").alias("month"),
        "value",
    )


def test_partitioned_layout_prunes_directories(spark, events, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("raw_layout"))
    write_partitioned(with_station_bucket(events, n_buckets=8), path,
                      partition_cols=("year", "wsid_bucket"))
    back = spark.read.parquet(path)
    q = back.filter(station_bucket_predicate("7", n_buckets=8))
    plan = formatted_plan(q)
    # the bucket-equality conjunct must reach PartitionFilters (directory
    # pruning — the rebuild of Cassandra's single-partition point read)
    assert "PartitionFilters" in plan
    assert "wsid_bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    rows = q.collect()
    assert rows and all(r["wsid"] == "7" for r in rows)
    # pruned scan result matches the unpruned filter
    assert len(rows) == back.filter(F.col("wsid") == "7").count()


def test_bucketed_join_has_no_exchange(spark, events):
    daily = events.groupBy("wsid").agg(F.sum("value").alias("total"))
    save_bucketed_table(events, "raw_bucketed", ["wsid"], 8, sort_cols=["wsid"])
    save_bucketed_table(daily, "daily_bucketed", ["wsid"], 8, sort_cols=["wsid"])
    try:
        left = spark.table("raw_bucketed")
        right = spark.table("daily_bucketed")
        joined = left.join(right, "wsid")
        # co-located join: both sides pre-bucketed on the key → zero
        # Exchange nodes (at 100 TB: the fact table never shuffles)
        assert shuffle_count(joined) == 0
        assert joined.count() == events.count()
        # contrast: the same join on plain parquet shuffles at least one side
        plain = events.join(daily, "wsid")
        assert shuffle_count(plain) >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS raw_bucketed")
        spark.sql("DROP TABLE IF EXISTS daily_bucketed")


def test_bucketed_agg_has_no_exchange(spark, events):
    save_bucketed_table(events, "raw_bucketed_agg", ["wsid"], 8)
    try:
        t = spark.table("raw_bucketed_agg")
        agg = t.groupBy("wsid").agg(F.sum("value").alias("total"))
        assert shuffle_count(agg) == 0
        assert agg.count() == events.select("wsid").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS raw_bucketed_agg")


def test_compaction_reduces_file_count(spark, events, tmp_path_factory):
    import glob

    from killrweather_spark.sources.sinks import compact_partitioned

    path = str(tmp_path_factory.mktemp("compact"))
    # simulate a streaming sink's small-file debris: many appends
    ev = events.limit(500)
    for _ in range(4):
        ev.repartition(8).write.mode("append").partitionBy("year").parquet(path)
    before = len(glob.glob(f"{path}/year=*/*.parquet"))
    rows_before = spark.read.parquet(path).count()
    compact_partitioned(spark, path, ["year"])
    after = len(glob.glob(f"{path}/year=*/*.parquet"))
    n_years = len(glob.glob(f"{path}/year=*"))
    assert spark.read.parquet(path).count() == rows_before
    assert after < before
    assert after == n_years  # one file per directory partition


def test_ctas_roundtrip(spark, events):
    events.createOrReplaceTempView("events_v")
    spark.sql("DROP TABLE IF EXISTS daily_ctas")
    out = ctas(
        spark,
        "daily_ctas",
        "SELECT wsid, year, month, SUM(value) AS total FROM events_v "
        "GROUP BY wsid, year, month",
    )
    try:
        assert out.count() == events.select("wsid", "year", "month").distinct().count()
        assert set(out.columns) == {"wsid", "year", "month", "total"}
    finally:
        spark.sql("DROP TABLE IF EXISTS daily_ctas")


def test_sorted_write_gives_prunable_row_groups(spark, tmp_path_factory):
    """write_sorted must produce row groups whose min/max stats on the sort
    key are narrow enough that a point predicate skips most of them — the
    zone-map tier of pruning (≙ the reference's DESC clustering order)."""
    from killrweather_spark.sources.sinks import write_sorted

    from tests.conftest import SF01

    ev = load_table(spark, SF01, "events").select(
        "event_id",
        F.year("ts").alias("year"),
        F.dayofyear("ts").alias("doy"),
        "user_id",
        "value",
    )
    path = str(tmp_path_factory.mktemp("sorted") / "ev")
    # tiny row groups so one file holds many (stats granularity to test)
    write_sorted(
        ev.repartition(2),
        path,
        partition_cols=["year"],
        sort_cols=["doy"],
        options={"parquet.block.size": str(8 * 1024),
                 "parquet.page.size": str(2 * 1024)},
    )

    import glob

    import pyarrow.parquet as pq

    spans = []  # (min, max) of doy per row group
    for f in glob.glob(f"{path}/year=*/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("doy")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    assert len(spans) >= 8, f"want many row groups, got {len(spans)}"
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    probe = (lo + hi) // 2
    hit = sum(1 for s, e in spans if s <= probe <= e)
    # sorted layout: a single-day probe overlaps only a small fraction
    assert hit / len(spans) <= 0.34, f"{hit}/{len(spans)} row groups overlap a point probe"


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path_factory):
    """write_zordered must give narrow per-file min/max boxes in EVERY
    z dimension: a point predicate on either column overlaps only a
    fraction of the files, where a linear sort would prune on the leading
    key only."""
    from killrweather_spark.sources.sinks import write_zordered

    from tests.conftest import SF01

    # caller contract: pre-scale every z dimension to the same bit width
    # (here 10 bits) so no dimension dominates the interleaved key
    ev = load_table(spark, SF01, "events").select(
        "event_id",
        F.floor(F.col("user_id") * 1024 / 150).cast("bigint").alias("uid"),
        F.floor((F.dayofmonth("ts") - 1) * 1024 / 31).cast("bigint").alias("day"),
        "value",
    )
    path = str(tmp_path_factory.mktemp("zorder") / "ev")
    write_zordered(ev, path, z_cols=["uid", "day"], n_files=16, bits=10)

    import glob

    import pyarrow.parquet as pq

    boxes = []  # (uid_min, uid_max, day_min, day_max) per file
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        iu = md.schema.names.index("uid")
        idd = md.schema.names.index("day")
        for rg in range(md.num_row_groups):
            su = md.row_group(rg).column(iu).statistics
            sd = md.row_group(rg).column(idd).statistics
            boxes.append((su.min, su.max, sd.min, sd.max))
    assert len(boxes) >= 8, f"want many files, got {len(boxes)}"

    def overlap_frac(lo_i, hi_i, probe):
        hit = sum(1 for b in boxes if b[lo_i] <= probe <= b[hi_i])
        return hit / len(boxes)

    uid_probe = sorted(b[0] for b in boxes)[len(boxes) // 2]
    day_probe = (15 - 1) * 1024 // 31
    # both dimensions must prune; a linear (uid, day) sort gives ~1.0 on day
    assert overlap_frac(0, 1, uid_probe) <= 0.6, boxes
    assert overlap_frac(2, 3, day_probe) <= 0.6, boxes


def test_curate_demo_runs_end_to_end():
    """The corpus-curation demo must stay runnable and its funnel monotone
    non-increasing (each stage only removes documents)."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, str(root / "scripts" / "curate_demo.py"),
         "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    counts = [int(m.replace(",", "")) for m in
              re.findall(r":\s+([\d,]+)$", out.stdout, re.M)]
    assert len(counts) == 6, out.stdout
    docs_funnel = counts[:5]  # last line is sequence count, not docs
    assert docs_funnel == sorted(docs_funnel, reverse=True), out.stdout
    assert docs_funnel[0] > 0


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path, events):
    """S-family format breadth: ORC round-trip (built-in columnar format
    besides parquet) preserves schema and values exactly, and predicate
    pushdown reaches the ORC scan."""
    path = str(tmp_path / "events_orc")
    events.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == events.schema
    assert back.count() == events.count()
    a = sorted(map(tuple, events.limit(50).collect()))
    b = sorted(map(tuple, back.join(events.limit(50), events.columns, "left_semi").collect()))
    assert len(b) >= 1 and set(map(tuple, b)) <= set(
        map(tuple, back.collect())
    )
    plan = (
        back.filter(F.col("wsid") == "7")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "wsid" in plan.split(
        "PushedFilters", 1
    )[1][:120]


def test_cassandra_adapter_falls_back_to_parquet(spark, tmp_path):
    # no connector jar in this container: the adapter must gate cleanly and
    # round-trip through the parquet fallback with identical rows
    from killrweather_spark.sources import cassandra as cass
    from tests.conftest import SF001

    assert cass.connector_available(spark) is False
    df = cass.read_table(spark, "isd_weather_data", "events",
                         fallback_dir=SF001)
    assert df.count() > 0
    out = str(tmp_path / "cass_fallback")
    cass.write_table(df.limit(10), "isd_weather_data", "events_copy",
                     fallback_dir=out)
    back = spark.read.parquet(out + "/events_copy.parquet")
    assert back.count() == 10
    import pytest

    with pytest.raises(ValueError):
        cass.read_table(spark, "ks", "t")  # no fallback dir → explicit error
