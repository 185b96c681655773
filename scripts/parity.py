"""Run the driver-identical DuckDB-oracle compare for a subset of queries.

Usage: ``python scripts/parity.py NAME [NAME ...] [--sf DIR]``
Defaults to sf0.01 (the driver's correctness SF).  Exit code 1 on any
divergence — the per-change correctness gate for optimization work.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        sys.exit(__doc__)

    from tests.oracle_harness import run_all
    from killrweather_spark.session import get_session

    spark = get_session(app_name="parity_subset")
    results = run_all(spark, sf_dir, names=names)
    bad = 0
    for r in results:
        status = "OK " if r.ok else "FAIL"
        print(f"{status} {r.name} rows(spark={r.spark_rows}, "
              f"oracle={r.oracle_rows}) err={r.max_abs_err}"
              + ("" if r.ok else " :: " + " | ".join(r.messages)))
        bad += 0 if r.ok else 1
    missing = set(names) - {r.name for r in results}
    if missing:
        print(f"NOT RUN (no oracle or unknown): {sorted(missing)}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
