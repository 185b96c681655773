"""Skew-operator tests: salted plans must be result-identical to the plain
plans (the whole point — same semantics, different physical spread)."""

from __future__ import annotations

from pyspark.sql import functions as F

from killrweather_spark.operators.skew import salted_agg, salted_join
from killrweather_spark.plans.checks import node_count
from killrweather_spark.sources.readers import load_table
from tests.conftest import SF001


def _events(spark):
    return load_table(spark, SF001, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("bigint")
    )


def test_salted_agg_matches_plain_agg(spark):
    ev = _events(spark)
    plain = {
        (r["user_id"],): (r["total"], r["n"])
        for r in ev.groupBy("user_id")
        .agg(F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["user_id"],): (r["total"], r["n"])
        for r in salted_agg(
            ev, ["user_id"], {"total": ("sum", "cents"), "n": ("count", "cents")},
            spread_col="event_id", n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_min_max(spark):
    ev = _events(spark)
    plain = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    salted = salted_agg(
        ev, ["user_id"], {"lo": ("min", "value"), "hi": ("max", "value")},
        spread_col="event_id", n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_is_two_phase(spark):
    ev = _events(spark)
    df = salted_agg(ev, ["user_id"], {"total": ("sum", "cents")}, "event_id", 8)
    # two aggregation exchanges: (key, salt) then (key) — the skew spread
    assert node_count(df, "Exchange") == 2


def test_salted_join_matches_plain_join(spark):
    ev = _events(spark).select("event_id", "user_id", "value")
    cust = load_table(spark, SF001, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = ev.join(cust, "user_id").select("event_id", "c_mktsegment")
    salted = salted_join(ev, cust, ["user_id"], spread_col="event_id", n_salts=4)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select("event_id", "c_mktsegment").collect())
    )
