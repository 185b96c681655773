"""Sinks & table layouts — SURVEY §2.1 S3-S5 plus the 100 TB layout pass.

The reference's storage layer is Cassandra wide rows: partition key
``wsid``, DESC clustering on the calendar columns
(``data/create-timeseries.cql:31-47``) — that layout IS its partition
pruning, sort avoidance, and write path.  The Spark-native equivalents:

- **Partitioned parquet** (``partitionBy``): directory-level pruning for
  the calendar-key queries (P2).  Raw observations partition by
  ``(year, wsid_bucket)`` — `wsid` itself would create ~20k directories/yr
  (small-file death at 100 TB), so stations hash into a bounded number of
  buckets and Catalyst prunes on ``wsid_bucket = hash(wsid) % N`` which we
  attach to every station-keyed predicate.
- **Bucketed tables** (``bucketBy`` + ``saveAsTable``): co-located joins —
  two tables bucketed on the same key join with ZERO exchanges (the
  rebuild of the connector's "data-local" Cassandra reads,
  ``KafkaStreamingActor.scala:48-50``).  At 100 TB this is the difference
  between an hourly-fact × daily-tier join shuffling 100 TB and shuffling
  nothing.
- **saveAsTable / CTAS** (S5): ``saveAsCassandraTableEx``'s DDL-from-code
  (``SaveAsApi.scala:26-31``) is exactly ``df.write.saveAsTable`` /
  ``CREATE TABLE AS`` against the session catalog.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_STATION_BUCKETS = 64


def with_station_bucket(
    df: DataFrame,
    station_col: str = "wsid",
    n_buckets: int = DEFAULT_STATION_BUCKETS,
    out: str = "wsid_bucket",
) -> DataFrame:
    """Bounded station bucket for directory partitioning: ``pmod(hash(wsid), N)``.

    ``hash`` is Spark's Murmur3 — stable across sessions/versions, so the
    bucket derivation can be re-applied at query time for pruning.
    """
    return df.withColumn(out, F.pmod(F.hash(F.col(station_col)), F.lit(n_buckets)))


def station_bucket_predicate(
    station_id: str, n_buckets: int = DEFAULT_STATION_BUCKETS
):
    """The pruning predicate a station point-lookup attaches:
    ``wsid_bucket = pmod(hash('<id>'), N) AND wsid = '<id>'`` — the first
    conjunct prunes directories, the second filters rows within them."""
    return (
        F.col("wsid_bucket") == F.pmod(F.hash(F.lit(station_id)), F.lit(n_buckets))
    ) & (F.col("wsid") == station_id)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("year", "wsid_bucket"),
    mode: str = "overwrite",
) -> None:
    """S4 batch sink with the pruning layout (≙ Cassandra partition key).

    ``maxRecordsPerFile`` bounds file size so a skewed partition (one hot
    year) still splits into parallel-scannable files.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def save_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S5 create-table-and-save with co-location (``bucketBy`` + optional
    ``sortBy`` ≙ the CQL clustering order, ``create-timeseries.cql:46-47``).

    Joins/aggregations on ``bucket_cols`` between tables bucketed the same
    way run with no Exchange (verified by ``tests/test_sinks.py``).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(name)


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_cols: Sequence[str],
) -> None:
    """Small-file compaction: one file per directory partition.

    Streaming sinks append one file per (trigger × partition × task): a 1 s
    trigger writes ~86k files/day/partition — at 100 TB that kills scan
    planning (footer reads) long before data volume does.  Hash-repartition
    on the partition columns puts each directory partition's rows in exactly
    one task (one output file); ``maxRecordsPerFile`` still splits a truly
    hot partition.  Dynamic partition overwrite swaps directories per
    partition, so the rewrite only touches partitions that have data.
    """
    df = spark.read.parquet(path)
    n_parts = max(df.select(*partition_cols).distinct().count(), 1)
    (
        df.repartition(n_parts, *[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", 5_000_000)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str],
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """O1 sorted-on-write layout: the parquet rebuild of the reference's
    DESC clustering order (``create-timeseries.cql:47`` — "you don't need
    to do a sort in spark", ``TemperatureActor.scala:47-49``).

    ``sortWithinPartitions`` (no global shuffle — one local sort per task)
    clusters each output file on ``sort_cols``, so every parquet row group's
    min/max statistics span a narrow key range. Readers then skip row
    groups on any ``sort_cols`` predicate (zone-map pruning): a
    one-day lookup in a year of hourly data reads ~1/365th of the row
    groups instead of scanning and discarding. At 100 TB this is the
    second pruning tier after directory partitions — directories cut by
    (year, bucket), row-group stats cut within the directory.

    The local sort leads with ``partition_cols``: the file writer demands
    its ordering on those, and would otherwise insert its own
    partition-cols-only sort that destroys the ``sort_cols`` clustering.
    """
    w = (
        df.sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .option("maxRecordsPerFile", 5_000_000)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.partitionBy(*partition_cols).parquet(path)


def ctas(spark: SparkSession, name: str, select_sql: str) -> DataFrame:
    """S5 via SQL: ``CREATE TABLE AS`` against the session catalog
    (≙ ``saveAsCassandraTableEx`` DDL-from-code)."""
    spark.sql(f"CREATE TABLE {name} USING parquet AS {select_sql}")
    return spark.table(name)


def zorder_key(cols: Sequence[str], bits: int = 16):
    """Bit-interleaved (Morton / Z-order) key over pre-scaled int columns.

    Each input column must already be a non-negative integer < 2**bits
    (scale/bucket upstream).  Bit i of column j lands at position
    ``i*len(cols)+j``, so nearby (a, b, ...) tuples map to nearby z-values
    and a range of z-values covers a bounded rectangle in every dimension.
    Pure shift/or JVM expressions — whole-stage codegen, no UDF.
    ``bits * len(cols)`` must stay <= 63.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError("z-key wider than 63 bits")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    z_cols: Sequence[str],
    n_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered layout: multi-dimensional zone-map pruning.

    ``write_sorted`` clusters on ONE leading key — predicates on the second
    sort column still touch every row group.  Interleaving the key bits
    makes every file's min/max box narrow in EVERY ``z_cols`` dimension, so
    a point/range predicate on ANY of them prunes ~sqrt-fashion (the classic
    Delta/Iceberg OPTIMIZE ZORDER layout, rebuilt with plain Spark ops:
    range-repartition on the z-key, local sort, parquet stats do the rest).

    At 100 TB: combine with directory partitioning — directories cut the
    coarse dimension (year/bucket), the z-order cuts within directories on
    the remaining hot predicates (station × time, user × day, ...).
    """
    zk = zorder_key(z_cols, bits=bits)
    (
        df.withColumn("__z", zk)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
