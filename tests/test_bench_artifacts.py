"""Pins for bench.py's artifact selection (no Spark session needed).

Round-13 postmortem: the driver's 8-core scaling leg overwrote
``bench_out.json`` and landed as ``BENCH_r14_full.json``, so round 14's
drift gate would have baselined 32-core numbers against an 8-core run.
The fixes pinned here: every artifact carries a ``cpus`` stamp, the
baseline selector skips artifacts recorded at a different core count,
and ``--vs-artifact`` refuses them loudly.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402


def _write(p: Path, **payload) -> None:
    base = {
        "metric": "headline_query_wall_time",
        "unit": "sec",
        "queries": {"daily_stats": 1.0},
        "value": 1.0,
        "sf": 0.1,
    }
    base.update(payload)
    p.write_text(json.dumps(base))


def test_prior_bench_skips_cross_cpu_artifacts(tmp_path, monkeypatch):
    """A same-SF artifact stamped with a different core count must never
    be selected as the comparison baseline; the selector falls through to
    the next candidate (legacy artifacts without the stamp still match)."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    _write(tmp_path / "bench_out.json", cpus=8,
           queries={"daily_stats": 9.9})
    _write(tmp_path / "BENCH_r13_full.json", cpus=bench.BENCH_CPUS,
           queries={"daily_stats": 1.5})
    got = bench._prior_bench(0.1)
    assert got is not None
    name, q = got[0], got[1]
    assert name == "BENCH_r13_full.json"
    assert q == {"daily_stats": 1.5}


def test_prior_bench_accepts_legacy_unstamped_artifact(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    _write(tmp_path / "bench_out.json", queries={"daily_stats": 2.5})
    got = bench._prior_bench(0.1)
    assert got is not None and got[0] == "bench_out.json"


def test_vs_artifact_refuses_cross_cpu(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    p = tmp_path / "BENCH_r13_c8.json"
    _write(p, cpus=bench.BENCH_CPUS + 1)
    with pytest.raises(SystemExit, match="cross-cpu"):
        bench._prior_bench(0.1, artifact=str(p))


def test_repo_artifacts_are_not_the_8core_run():
    """The quarantine itself: the round-13 8-core scaling leg must never
    masquerade as a round artifact again — any BENCH_r14+ artifact and
    the rolling bench_out.json must carry a full-core cpus stamp and must
    not equal the BENCH_r13_c8.json query map."""
    c8 = json.loads((ROOT / "BENCH_r13_c8.json").read_text())
    c8_queries = (c8.get("parsed") or c8)["queries"]
    for p in [ROOT / "bench_out.json", *ROOT.glob("BENCH_r1[4-9]*_full.json")]:
        d = json.loads(p.read_text())
        assert d["queries"] != c8_queries, p.name
        assert d.get("cpus", 32) == 32, (p.name, d.get("cpus"))


def test_shuffle_width_is_input_size_derived(tmp_path, monkeypatch):
    """r14: the initial shuffle width tracks the bench data directory's
    size (one partition per SHUFFLE_TARGET_MB, floor 4, cap 4x slots)
    and falls back to the core count when no data dir is in the env."""
    import importlib

    import killrweather_spark.session as S

    monkeypatch.delenv("SPARK_GRAFT_SF_DIR", raising=False)
    importlib.reload(S)
    assert S._derived_shuffle_partitions(32) == 32  # no env: core count

    d = tmp_path / "sfX"
    d.mkdir()
    (d / "t.parquet").write_bytes(b"\0" * (40 << 20))  # 40 MiB
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(d))
    importlib.reload(S)
    assert S._derived_shuffle_partitions(32) == 3 + 1 == 4  # floor hit via 40//16+1
    (d / "u.parquet").write_bytes(b"\0" * (400 << 20))  # +400 MiB
    assert S._derived_shuffle_partitions(32) == (440 << 20) // (16 << 20) + 1
    # cap: 4x slots
    assert S._derived_shuffle_partitions(2) == 8
