"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

The driver runs this per-round at sf0.1 and records BENCH_r{N}.json; run it
locally at sf0.01 while iterating (``SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01
python bench.py``).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the queries that dominate real workloads — full-scan tiered
# rollups, the star join, windowed analytics, and (as they land) dedup /
# similarity.  Keep this list in sync with the heaviest REGISTRY entries.
HEADLINE = [
    # weather-engine core: tiered rollups, star join, windowed analytics
    "daily_stats",
    "monthly_hilow",
    "annual_precip",
    "topk_daily_precip",
    "year_cumulative_precip",
    "star_join_revenue",
    "join_dim_broadcast",
    "window_running_sum",
    "json_extract",
    "distinct_users_in_range",
    "asof_join_latest_order",
    "tpch_pricing_summary",
    "local_supplier_volume",
    # LLM-data-pipeline: dedup, similarity, text analysis
    "decontaminate_ngrams",
    "dataset_card",
    "dedup_exact_groups",
    "minhash_lsh_pairs",
    "simhash",
    "text_quality",
    "cosine_topk",
    "kmeans_assign_step",
    "collocation_lift",
    "pack_sequences",
    "repetition_metrics",
    # behavioral / retrieval / graph flagships
    "bm25_search",
    "funnel_conversion",
    "cohort_retention",
    "rolling_dau_wau",
    "shingle_containment_pairs",
    "pagerank_copurchase",
    # batch-2 decision-support + dedup flagships
    "unshipped_revenue_topk",
    "returned_revenue_by_customer",
    "token_commonness",
    "new_batch_dup_screen",
    "chunk_dup_share",
    "semantic_dup_candidates",
    "filter_funnel",
    # round-2 feature-engineering / eval-hygiene flagships
    "lag_features",
    "dow_seasonality",
    "eval_contamination_report",
    # re-blocked entity resolution (deletion-neighborhood blocking)
    "fuzzy_name_pairs",
    # round-3 decision-support additions
    "promo_discount_revenue",   # Q6: the scan-throughput canary
    "nation_market_share",      # Q8: 8-table star, integer share division
    "minhash_similarity_estimate",
    # round-4 additions
    "ngram_jaccard_df_capped",  # the DF-capped verifier join
    "media_decode_dims",        # real PNG decode over the Arrow batch path
    "nation_profit_by_year",    # Q9 shape: 5-table profit rollup
    "waiting_orders_suppliers", # Q21 shape: semi+anti double correlation
    "semantic_eval_screen",     # broadcast eval screen over quantized dots
    "training_order_shard",     # deterministic shard+pos corpus permutation
]


# Regression gate thresholds: a shared-subset query counts as regressed only
# when BOTH hold — ratio catches real slowdowns, the absolute floor keeps
# sub-second queries' scheduler noise (±0.1 s) from firing the gate.
REGRESSION_RATIO = 1.5
REGRESSION_FLOOR_SEC = 0.25


def _interleaved(names: list[str]) -> list[str]:
    """Alternate the older half of the headline set with the newer half.

    The r3 bench ran queries in accretion order, so in-process contention
    from newly-added queries (JVM heap pressure, accumulated persisted
    lineages) landed entirely on the LATER measurements and read as a +11%
    drift on the shared subset.  Interleaving spreads session-lifetime
    effects evenly across old and new queries, so a shared-subset regression
    now means the query itself got slower, not that it ran later.
    """
    mid = (len(names) + 1) // 2
    older, newer = names[:mid], names[mid:]
    out: list[str] = []
    for i in range(mid):
        out.append(older[i])
        if i < len(newer):
            out.append(newer[i])
    return out


def _prior_bench(sf: float) -> tuple[str, dict[str, float]] | None:
    """Most recent driver-recorded BENCH_r{N}.json at the SAME scale factor
    (cross-SF timings are not comparable)."""
    root = Path(__file__).resolve().parent
    for p in sorted(root.glob("BENCH_r*.json"), reverse=True):
        try:
            d = json.loads(p.read_text())
            parsed = d.get("parsed") or d
            q = parsed.get("queries")
        except (json.JSONDecodeError, AttributeError, OSError):
            continue
        if q and parsed.get("sf") == sf:
            return p.name, q
    return None


def main() -> None:
    from killrweather_spark.api.inventory import REGISTRY
    from killrweather_spark.session import get_session

    spark = get_session(app_name="killrweather_spark_bench")

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # Warm the JVM + parquet reader/codegen paths with trivial actions so
    # per-query timings measure the query, not session startup (first parquet
    # scan of a session pays classloading + codegen compilation).
    spark.range(1).count()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    # Steady-state timing: best of 2 runs per query.  Run 1 absorbs one-time
    # costs (codegen compile, broadcast build, file listing); run 2 is the
    # repeatable cost a resident engine pays — the number that scales.
    timings: dict[str, float] = {}
    for name in _interleaved(HEADLINE):
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            df.count() if len(df.columns) > 6 else len(df.collect())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # Regression gate (bench_diff built in): compare the shared subset
    # against the most recent recorded round at the same SF and attribute
    # drift per query, so a slowdown is named in the bench output itself
    # instead of waiting for a human to diff two JSON files.
    regressions: dict[str, list[float]] = {}
    prior_name = None
    prior = _prior_bench(sf)
    if prior is not None:
        prior_name, prior_q = prior
        for k, now in timings.items():
            then = prior_q.get(k)
            if (
                then is not None
                and now > then * REGRESSION_RATIO
                and now - then > REGRESSION_FLOOR_SEC
            ):
                regressions[k] = [then, now]
        if regressions:
            print(
                f"bench regression gate vs {prior_name}: "
                + ", ".join(
                    f"{k} {a:.2f}s->{b:.2f}s" for k, (a, b) in regressions.items()
                ),
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "vs_prior": prior_name,
                "regressions": regressions,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
