"""Bloom-style runtime-filter pushdown for selective joins.

Spark 3.3+ injects a bloom runtime filter automatically
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) when a selective build
side can prune a large probe side before the shuffle. This module makes the
pattern an explicit, engine-portable operator for the cases the optimizer
can't see:

- the probe-side source can prune on a *derived* column (a bucket id
  materialized at write time — pairs with `sources/sinks.py:write_zordered`
  / partitioned layouts), turning the runtime filter into partition pruning;
- the filter must be reproducible across engines (deterministic md5-derived
  hashes, no JVM hash seeds), so the DuckDB oracle replays it bit-for-bit.

Design: two independent hash-bucket sets (k=2 "bloom" with one bit per
bucket, m buckets each) are built from the small side's distinct keys —
≤ 2·m rows, broadcast. The probe side keeps rows whose key lands in BOTH
sets (two broadcast LeftSemi joins — no shuffle of the probe side), then an
exact broadcast semi-join against the true key set removes the residual
false positives. Semantics are therefore EXACTLY the semi join; the
prefilter only reduces the rows that reach it. For a probe side of R rows
and selectivity s, the exact join processes ≈ R·(s + (1−s)·fp²) rows,
fp ≈ 1 − e^(−n/m) per set.

At 100 TB the two semi-joins collapse into the scan (broadcast hash join
probes inside the file-read stage, AQE keeps them map-side); the win is
that the *shuffle* (or the downstream aggregate) sees only surviving rows.

Reference frame: killrweather reads per-key Cassandra partitions
(`WeatherStationDao`-style point lookups, SURVEY §2.2 P2); this is the
set-valued generalization a relational engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5 salts for the two hash functions — any fixed distinct strings work;
# both engines compute identical digests for identical bytes.
_SALTS = ("rfA|", "rfB|")


def _bucket(col_expr: str, salt: str, m: int) -> str:
    """Portable bucket id: md5-prefix integer of the salted key, mod m."""
    return (
        f"(conv(substr(md5(concat('{salt}', cast({col_expr} as string))),"
        f" 1, 15), 16, 10) % {m})"
    )


def bucket_sql(col_expr: str, salt: str, m: int) -> str:
    """DuckDB rendering of :func:`_bucket` (same arithmetic)."""
    return (
        f"(('0x' || substr(md5(concat('{salt}', cast({col_expr} as"
        f" varchar))), 1, 15))::BIGINT % {m})"
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 4096,
) -> DataFrame:
    """``probe`` rows whose ``probe_key`` appears in ``build.build_key``.

    Exact LEFT SEMI JOIN semantics; the two broadcast bucket-set probes in
    front only shed non-matching rows early (false-positive-prone,
    false-negative-free by construction).
    """
    keys = build.select(F.col(build_key).alias("__k")).distinct()
    sets = [
        keys.select(F.expr(_bucket("__k", salt, m)).alias("__b")).distinct()
        for salt in _SALTS
    ]
    out = probe
    for salt, s in zip(_SALTS, sets):
        out = out.join(
            F.broadcast(s),
            F.expr(_bucket(probe_key, salt, m)) == s["__b"],
            "left_semi",
        )
    return out.join(
        F.broadcast(keys), out[probe_key] == keys["__k"], "left_semi"
    )
