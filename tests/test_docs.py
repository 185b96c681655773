"""Docs stay single-sourced from the registry (r07 verdict hygiene #6).

Round 7 shipped a README saying "209 declared queries" and a sweep
docstring saying "148-query" while the registry held 212 — counts are now
generated (``scripts/dump_operators.py`` rewrites README + OPERATORS.md)
and pinned here so drift fails the suite instead of aging in place.
"""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_readme_query_count_matches_registry():
    from killrweather_spark.api.inventory import REGISTRY

    text = (ROOT / "README.md").read_text()
    m = re.search(r"(\d+) declared queries", text)
    assert m, "README.md no longer states the declared-query count"
    assert int(m.group(1)) == len(REGISTRY), (
        f"README says {m.group(1)} declared queries, registry has "
        f"{len(REGISTRY)} — run scripts/dump_operators.py"
    )


def test_operators_md_row_count_matches_registry():
    from killrweather_spark.api.inventory import REGISTRY

    text = (ROOT / "OPERATORS.md").read_text()
    m = re.search(r"(\d+) queries;", text)
    assert m, "OPERATORS.md no longer states the query count"
    assert int(m.group(1)) == len(REGISTRY)
    rows = [ln for ln in text.splitlines() if ln.startswith("| `")]
    assert len(rows) == len(REGISTRY), (
        f"OPERATORS.md has {len(rows)} rows, registry has {len(REGISTRY)}"
        " — run scripts/dump_operators.py"
    )


def test_no_hardcoded_query_counts_in_test_docstrings():
    """The sweep docstring described itself as a '148-query' compare three
    rounds after the registry passed 200 — registry-sized prose in tests
    must say 'entire registry', not a number."""
    text = (ROOT / "tests" / "test_scale_sweep.py").read_text()
    assert not re.search(r"\d+-query", text), (
        "test_scale_sweep.py hardcodes a query count; phrase it as the"
        " entire registry instead"
    )
