"""snapshot_diff classification + bloom runtime-filter exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from killrweather_spark.operators.diff import snapshot_diff
from killrweather_spark.operators.runtime_filter import bloom_semi_join

from tests.conftest import SF001


def test_snapshot_diff_classifies_all_four_states(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 99), (4, "d", 40)], "k int, s string, v int"
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["s", "v"],
            include_unchanged=True,
        ).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
    # default drops unchanged
    assert {
        r.k
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["s", "v"]
        ).collect()
    } == {1, 3, 4}


def test_snapshot_diff_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k int, s string")
    got = {
        r.k: r.change
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["s"], include_unchanged=True
        ).collect()
    }
    # NULL == NULL is a match under eqNullSafe; x -> NULL is a change
    assert got == {1: "unchanged", 2: "changed"}


def test_bloom_semi_join_equals_exact_semi_join(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    supp = (
        spark.read.parquet(f"{SF001}/supplier.parquet")
        .filter(F.col("s_suppkey") <= 4)
    )
    got = sorted(
        r.l_orderkey * 10 + r.l_linenumber
        for r in bloom_semi_join(
            li, supp, "l_suppkey", "s_suppkey", m=64
        ).select("l_orderkey", "l_linenumber").collect()
    )
    want = sorted(
        r.l_orderkey * 10 + r.l_linenumber
        for r in li.join(
            supp, li.l_suppkey == supp.s_suppkey, "left_semi"
        ).select("l_orderkey", "l_linenumber").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_sheds_rows_before_verify(spark):
    """With tiny m the bucket sets are selective but not exact: the
    prefilter alone must pass a strict superset of the true matches and a
    strict subset of the input — evidence it is doing real early pruning
    (the exact verify then removes the false positives)."""
    from killrweather_spark.operators.runtime_filter import _SALTS, _bucket

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    supp = (
        spark.read.parquet(f"{SF001}/supplier.parquet")
        .filter(F.col("s_suppkey") <= 4)
    )
    keys = supp.select(F.col("s_suppkey").alias("__k")).distinct()
    pre = li
    for salt in _SALTS:
        s = keys.select(F.expr(_bucket("__k", salt, 64)).alias("__b")).distinct()
        pre = pre.join(
            F.broadcast(s),
            F.expr(_bucket("l_suppkey", salt, 64)) == s["__b"],
            "left_semi",
        )
    n_in = li.count()
    n_pre = pre.count()
    n_true = li.join(
        supp, li.l_suppkey == supp.s_suppkey, "left_semi"
    ).count()
    assert n_true <= n_pre < n_in
