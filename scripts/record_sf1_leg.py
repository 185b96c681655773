"""Record the sf0.1 → sf1 scaling leg: run bench.py at both SFs and write
``BENCH_r{N}_sf1.json`` with per-query scaling factors and the round's
scaling notes.

Usage: ``python scripts/record_sf1_leg.py 7`` (the round number).
Requires the derived sf1 dataset at /tmp/sg_sf1 (``make_sf_scale.py``).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        capture_output=True, text=True, timeout=3600, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    rnd = int(sys.argv[1])
    sf1 = run_bench("/tmp/sg_sf1")
    sf01 = run_bench("/root/testdata/sf0.1")
    q1, q01 = sf1["queries"], sf01["queries"]
    scaling = {
        k: round(q1[k] / q01[k], 2)
        for k in q1
        if k in q01 and q01[k] > 0
    }
    rec = {
        "metric": "sf1_scaling_leg",
        "dataset": "deterministic 10x derivation of sf0.1 "
                   "(scripts/make_sf_scale.py)",
        "round": rnd,
        "sf1_total_sec": sf1["value"],
        "sf01_total_sec": sf01["value"],
        "queries_sf1": q1,
        "queries_sf01": q01,
        "scale_factor": scaling,
        "isolated_sf1": sf1.get("isolated"),
        "notes": [],
    }
    path = ROOT / f"BENCH_r{rnd:02d}_sf1.json"
    path.write_text(json.dumps(rec, indent=1))
    worst = sorted(scaling.items(), key=lambda kv: -kv[1])[:12]
    print(f"wrote {path}")
    for k, v in worst:
        print(f"  {v:6.2f}x  {k}  ({q01[k]}s -> {q1[k]}s)")


if __name__ == "__main__":
    main()
