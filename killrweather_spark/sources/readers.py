"""Sources — rebuilds of SURVEY §2.1 (S1-S12).

- S6/S7: ``.csv.gz`` line files → typed rows.  The reference splits lines and
  casts field-by-field in Scala closures (``Initializer.scala:55-67``,
  ``ClientHelper.scala:68-83``, ``Weather.scala:78-94``).  Here the parse is
  ``from_csv`` with an explicit schema — JVM-side, codegen'd, no Python in
  the row path (SURVEY §2.10).
- S2: Cassandra table scan → parquet scan over the engine's tables (the
  engine is storage-agnostic; a Cassandra DSv2 source drops in behind the
  same loaders).
- S11: JSON with inferred or explicit schema.
- S12: local collection → ``spark.createDataFrame``.

Kafka (S1/S9) lives in :mod:`killrweather_spark.streaming.pipeline`; it is
format-gated because this container has no broker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from killrweather_spark.model.schemas import (
    RAW_WEATHER_CSV_SCHEMA,
    SKY_CONDITION_LOOKUP,
    SKY_CONDITION_ROWS,
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver-generated parquet table (see TESTDATA.md).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark 4 rejects
    unless read as a long; we read nanos-as-long and rebuild a proper
    microsecond timestamp (exact: the synthetic data is micro-precision).
    The conf is set per-read so this works under any caller's session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All testdata tables keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def parse_raw_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """CSV line → typed raw_weather_data row (P5).

    13 positional fields per the ``COPY`` list (``load-timeseries.cql:10-11``);
    ``sky_condition_text`` left null — intentional divergence from the
    reference's misaligned parser (``Weather.scala:78-94``, SURVEY §1.3).
    ``from_csv`` is a single JVM expression: stays inside whole-stage codegen.
    """
    parsed = lines.select(
        F.from_csv(F.col(value_col), RAW_WEATHER_CSV_SCHEMA.simpleString()).alias("r")
    ).select("r.*")
    cols = parsed.columns
    head, tail = cols[:11], cols[11:]
    return parsed.select(
        *head, F.lit(None).cast("string").alias("sky_condition_text"), *tail
    )


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6: read ``.csv.gz`` observation files (gzip transparent to Spark).

    Equivalent of ``Initializer.scala:55-67``'s textFile+flatMap+parse, as one
    declarative csv read with explicit schema (no inference pass over 100 TB).
    """
    return spark.read.schema(RAW_WEATHER_CSV_SCHEMA).csv(path).withColumn(
        "sky_condition_text", F.lit(None).cast("string")
    )


def sky_condition_lookup_df(spark: SparkSession) -> DataFrame:
    """S12 + the static ``sky_condition_lookup`` table
    (``load-timeseries.cql:14-29``) — a broadcast-join dimension."""
    return spark.createDataFrame(SKY_CONDITION_ROWS, SKY_CONDITION_LOOKUP)
