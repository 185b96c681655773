"""Value-exact parity of every SQL-expressible query vs the DuckDB oracle.

This mirrors the driver's CORRECTNESS gate at sf=0.01 (TESTDATA.md): any
failure here would fail the real gate too.
"""

from __future__ import annotations

from tests.conftest import SF01
from tests.oracle_harness import run_all


def test_all_queries_match_oracle(spark):
    results = run_all(spark, SF01)
    assert results, "no queries registered"
    failed = [r for r in results if not r.ok]
    msg = "\n".join(
        f"{r.name}: rows(spark={r.spark_rows}, oracle={r.oracle_rows}) "
        f"max_abs_err={r.max_abs_err!r} :: " + " | ".join(r.messages)
        for r in failed
    )
    assert not failed, f"{len(failed)} queries diverged from oracle:\n{msg}"
