"""Pandas-dtype parity of every oracle-checked query vs DuckDB.

The correctness gate compares *materialized* results, and pandas is where
both engines' outputs meet.  Identical values can still materialize at
different dtypes — DuckDB SUM(BIGINT) widens to HUGEINT and lands as
float64, window ranks differ int32/int64, DATE arrives as object on one
side and datetime64 on the other — and a value-hash over those
representations diverges even when every cell is equal.  This test pins
dtype-level agreement at sf0.001 so a representational regression fails
CI before it fails the gate.
"""

from __future__ import annotations

from killrweather_spark.api.inventory import REGISTRY
from tests.conftest import SF001
from tests.oracle_harness import duck_connection


def test_all_query_outputs_materialize_at_identical_dtypes(spark):
    con = duck_connection(SF001)
    diffs = {}
    for name, spec in REGISTRY.items():
        if spec.sql is None:
            continue
        sdt = dict(spec.fn(spark, SF001).toPandas().dtypes.astype(str))
        odt = dict(con.execute(spec.sql).df().dtypes.astype(str))
        d = {
            c: (sdt.get(c), odt.get(c))
            for c in set(sdt) | set(odt)
            if sdt.get(c) != odt.get(c)
        }
        if d:
            diffs[name] = d
    assert not diffs, f"dtype mismatches vs oracle: {diffs}"
