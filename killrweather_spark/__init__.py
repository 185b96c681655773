"""killrweather_spark — a PySpark-native rebuild of KillrWeather's engine.

The reference (killrweather/killrweather) is a Spark-Streaming-1.x + Kafka +
Cassandra + Akka time-series analytics application.  This package re-expresses
its entire query/data-processing surface (SURVEY.md §2) Spark-first:

- Structured Streaming replaces DStream + Cassandra-counter accumulation
  (reference: ``killrweather-app/.../KafkaStreamingActor.scala``).
- Partitioned Parquet tables (optionally a Cassandra DSv2 sink) replace the
  Cassandra wide-row tables (reference: ``data/create-timeseries.cql``).
- A plain Python :class:`~killrweather_spark.api.engine.WeatherEngine` replaces
  the Akka actor request protocol (reference:
  ``killrweather-core/.../WeatherEvent.scala``).

All operators are column-parameterized so they run unchanged on the weather
schema or any ``(entity key, event time, measure)`` fact table, and every
plan stays declarative (DataFrame/SQL) so Catalyst does pushdown, pruning,
and join selection.
"""

from killrweather_spark.session import get_session

__version__ = "0.1.0"
__all__ = ["get_session", "__version__"]
