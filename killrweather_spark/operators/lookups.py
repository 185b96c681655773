"""Point lookups and latest-row queries.

Reference: ``WeatherStationActor.scala:43-58`` — ``GetWeatherStation`` (point
lookup on the dimension) and ``GetCurrentWeather`` (latest raw row for a
station+day).  The reference collects and takes ``headOption`` because the
Cassandra connector's ``LIMIT`` is per-node (comment at
``WeatherStationActor.scala:51-54``); Spark's ``limit(1)`` is global, so the
workaround disappears (SURVEY §2.2 P7).

Scale: equality predicates on the partition columns prune partitions at the
parquet scan (Catalyst partition pruning ≙ the reference's Cassandra
partition-key locality, ``KafkaStreamingActor.scala:47-50``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_lookup(df: DataFrame, key: Mapping[str, object]) -> DataFrame:
    """Equality filter on key columns; Catalyst pushes each predicate to the
    source scan (``PushedFilters`` on parquet, CQL ``WHERE`` on Cassandra —
    the rebuild of P2, ``TemperatureActor.scala:57-58``)."""
    out = df
    for col, val in key.items():
        out = out.filter(F.col(col) == F.lit(val))
    return out


def latest_row(
    df: DataFrame,
    key: Mapping[str, object],
    order_cols: Sequence[str],
) -> DataFrame:
    """Most-recent row for a key: filter → orderBy DESC → limit(1).

    The reference gets the ordering free from DESC clustering
    (``create-timeseries.cql:47``); Catalyst compiles this to a per-partition
    top-1 heap (TakeOrderedAndProject), no full sort.
    """
    return (
        point_lookup(df, key)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .limit(1)
    )
