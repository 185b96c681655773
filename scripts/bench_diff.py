"""Per-query bench comparison: ``python scripts/bench_diff.py A.json B.json``.

Accepts either a raw ``bench.py`` JSON line or a driver ``BENCH_r{N}.json``
wrapper (which nests it under ``parsed``).  Prints the common-subset totals
(the apples-to-apples number — the headline set widens between rounds) and
the biggest per-query movers, so a regression hides behind neither a grown
query list nor one noisy outlier.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d["queries"]


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    qa, qb = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    sa, sb = sum(qa[k] for k in common), sum(qb[k] for k in common)
    print(
        f"common {len(common)} queries: {sa:.2f}s -> {sb:.2f}s "
        f"({(sb - sa) / sa:+.1%} vs baseline)" if sa else "no common queries"
    )
    movers = sorted(common, key=lambda k: abs(qb[k] - qa[k]), reverse=True)
    for k in movers[:10]:
        d = qb[k] - qa[k]
        print(f"  {d:+6.2f}s  {k:36s} {qa[k]:6.2f} -> {qb[k]:6.2f}")
    if only_b:
        extra = sum(qb[k] for k in only_b)
        print(f"new in B ({len(only_b)}, {extra:.2f}s): {', '.join(only_b)}")
    if only_a:
        print(f"dropped from B ({len(only_a)}): {', '.join(only_a)}")


if __name__ == "__main__":
    main()
