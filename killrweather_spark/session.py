"""SparkSession factory — the rebuild of the reference's ``WeatherSettings``.

Reference: ``killrweather-app/.../WeatherSettings.scala`` (config surface) and
``KillrWeatherApp.scala:80-95`` (context construction).  Instead of Typesafe
config + manual SparkConf, we centralize one builder with scale-aware defaults:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) — at
  100 TB the static plan is never right, AQE re-plans from runtime stats.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster AQE coalescing makes the initial number a ceiling.
- UTC session timezone (reference uses joda ``DateTimeZone.UTC`` throughout,
  e.g. ``AggregationActor.scala:44``).
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(
    app_name: str = "killrweather_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Defaults target local-mode testing but every setting is the one you'd
    want on a 1000-executor cluster too (AQE, UTC, Arrow, Kryo).
    """
    cpus = int(DEFAULT_CPUS) if DEFAULT_CPUS.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # split sizing: 128 MB input splits keep per-task memory bounded at
        # any table size; maxRecordsPerFile on writes bounds the other side
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR job scheduling: the reference serves queries concurrently via
        # collectAsync + pipeTo (TemperatureActor.scala:59-60); FIFO mode
        # would let one full-scan batch job convoy every point lookup behind
        # it.  Serving threads tag their jobs into a named pool
        # (api/serving.py); pools materialize on first use.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
