"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in ``killrweather_spark/api/inventory.py`` — one
``QuerySpec`` (Spark callable + DuckDB oracle SQL + SURVEY §2 citation) per
declared operator.  This file is a thin adapter over that registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from killrweather_spark.api.inventory import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tiered daily stats (A1 GetDailyTemperature analog)
    over the sf0.001 events fact table."""
    return REGISTRY["daily_stats"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; omitted keys
    get the driver's weaker rows-only check."""
    return {
        name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None
    }
