"""Cassandra table source/sink adapter (S2/S3/S4) — connector-gated.

The reference reads and writes Cassandra directly (``sc.cassandraTable``,
``saveToCassandra`` — ``TemperatureActor.scala:56``,
``KafkaStreamingActor.scala:45``).  This engine is storage-agnostic: every
query runs against whatever :func:`table_reader` returns, so Cassandra is an
*deployment* choice, not a code path — exactly how the DataSource V2 API is
meant to be used.

When the spark-cassandra-connector jar is on the classpath
(``--packages com.datastax.spark:spark-cassandra-connector_2.13:3.5.x`` and
``spark.cassandra.connection.host`` set), readers/writers go through the
``org.apache.spark.sql.cassandra`` format and the connector pushes
partition-key equality predicates and column pruning server-side — the same
pushdown the reference hand-builds into CQL strings.  Without the jar (this
container), the adapter transparently falls back to the parquet layout from
:mod:`killrweather_spark.sources.sinks`, which provides the equivalent
physics: directory partitioning ≙ partition keys, sorted row groups ≙
clustering order.

Streaming upserts (S3) use ``foreachBatch`` + :func:`write_table`: the
connector's keyed writes are idempotent per primary key, so replayed batches
converge — the property the reference relies on for its raw sink and loses
for its counter sink (SURVEY §2.9 T7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_options(
    keyspace: str,
    table: str,
    direct_join: bool | None = True,
) -> dict[str, str]:
    """The DSv2 option contract for a Cassandra read/write, buildable (and
    unit-testable) without the connector on the classpath.

    - ``keyspace``/``table`` name the target exactly as the reference's
      ``sc.cassandraTable(keyspace, table)`` does
      (``TemperatureActor.scala:56``).
    - ``directJoinSetting=on`` keeps key-equality joins on the partition
      key as connector direct joins (per-key CQL reads) instead of a full
      scan + shuffle — the DSv2 form of the reference's hand-built
      single-partition ``.where(wsid = ?)`` reads
      (``KafkaStreamingActor.scala:47-50`` data-locality rationale).
      It is a READ-side knob: pass ``direct_join=None`` to omit it (the
      write path does — a join-strategy option on a writer is at best dead
      config and at worst rejected by a strict connector version).

    Predicate pushdown and column pruning need no options: the connector's
    DSv2 relation reports them to Catalyst, so ``filter``/``select`` reach
    CQL exactly like the reference's ``.select(...).where(...)`` strings.
    """
    if not keyspace:
        raise ValueError("keyspace must be non-empty")
    if not table:
        raise ValueError("table must be non-empty")
    opts = {"keyspace": keyspace, "table": table}
    if direct_join is not None:
        opts["directJoinSetting"] = "on" if direct_join else "off"
    return opts


def connector_available(spark: SparkSession) -> bool:
    """True when the spark-cassandra-connector classes are loadable in this
    session's JVM (jar shipped via ``--packages``/``--jars``)."""
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.cassandra.DefaultSource"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    keyspace: str,
    table: str,
    fallback_dir: str | None = None,
) -> DataFrame:
    """S2: typed table scan.  Connector path pushes filters/projections to
    Cassandra; fallback reads the engine's parquet layout for the same
    table (``<fallback_dir>/<table>.parquet``)."""
    if connector_available(spark):
        return (
            spark.read.format(CASSANDRA_FORMAT)
            .options(**cassandra_options(keyspace, table))
            .load()
        )
    if fallback_dir is None:
        raise ValueError(
            f"spark-cassandra-connector not on classpath and no fallback_dir "
            f"given for {keyspace}.{table}"
        )
    from killrweather_spark.sources.readers import load_table

    return load_table(spark, fallback_dir, table)


def write_table(
    df: DataFrame,
    keyspace: str,
    table: str,
    fallback_dir: str | None = None,
    partition_cols: list[str] | None = None,
) -> None:
    """S4 (and the per-batch body of S3): keyed upsert append.

    Connector writes are upserts by primary key — idempotent under
    replay.  The parquet fallback appends with dynamic partition overwrite
    semantics handled by the caller (see
    ``streaming/pipeline.py:start_ingest``), preserving the same
    replay-convergence contract.
    """
    spark = df.sparkSession
    if connector_available(spark):
        (
            df.write.format(CASSANDRA_FORMAT)
            .options(**cassandra_options(keyspace, table, direct_join=None))
            .mode("append")
            .save()
        )
        return
    if fallback_dir is None:
        raise ValueError(
            f"spark-cassandra-connector not on classpath and no fallback_dir "
            f"given for {keyspace}.{table}"
        )
    writer = df.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(f"{fallback_dir}/{table}.parquet")
