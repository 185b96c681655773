"""Cross-scale oracle sweep — the 100×-robustness gate.

The driver's correctness gate runs at sf0.01; bugs that only exist at larger
data (int64 overflow in per-group scalar steps, unbounded quadratics,
reduction-order float drift) are invisible there.  This sweep re-runs the
ENTIRE 148-query DuckDB compare at sf0.001 (empty-group edges) and sf0.1
(100× the gate's data).  It found two real bugs on first run: an int64
overflow in ``corr_stats``'s final cross products and a heap-exhausting
quadratic in ``lsh_recall_eval``'s truth side — both invisible at sf0.01.

Gated behind ``SPARK_GRAFT_SCALE_SWEEP=1`` (the sf0.1 leg takes ~15 min —
too slow for the default suite):

    SPARK_GRAFT_SCALE_SWEEP=1 python -m pytest tests/test_scale_sweep.py -q
"""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import run_all

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SWEEP") != "1",
    reason="slow cross-scale sweep; set SPARK_GRAFT_SCALE_SWEEP=1",
)


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.1",
])
def test_every_query_is_oracle_exact_at(spark, sf_dir):
    results = run_all(spark, sf_dir)
    bad = [r for r in results if not r.ok]
    assert not bad, [(r.name, r.messages[:1]) for r in bad]
