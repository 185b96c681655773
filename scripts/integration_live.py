"""Opt-in LIVE integration smoke: real Kafka broker and/or Cassandra ring.

This container ships neither a broker nor a ring, so the per-round test
suite covers Kafka/Cassandra as graph construction + option contracts
(``tests/test_connector_contracts.py``).  This script is the missing last
mile for an environment that HAS the services — it drives the same engine
code end-to-end and asserts the reference's own integration floor
(``KafkaStreamingActorSpec.scala:33-74``: ≥8,000 rows ingested within 60 s).

Usage (each leg gated on its env var; ungated legs skip cleanly).  On a
machine with Docker, ``docker-compose.live.yml`` at the repo root brings up
a matching broker + ring (KRaft Kafka, Cassandra 4.1, reference schema
mounted) — see its header for the three-command recipe.  Directly:

    KW_KAFKA_BOOTSTRAP=host:9092 python scripts/integration_live.py
    KW_CASSANDRA_HOST=host       python scripts/integration_live.py

Optional:
    KW_KAFKA_TOPIC      (default killrweather.raw.smoke)
    KW_CASSANDRA_KEYSPACE (default isd_weather_data — create the reference's
                           schema first: data/create-timeseries.cql)
    KW_PACKAGES=0       skip adding spark.jars.packages (jars already on
                        the classpath)

Exit code 0 = every configured leg passed (or nothing configured);
nonzero = a configured leg failed.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_CSV_GZ = "/root/reference/data/load/sf-2008.csv.gz"
ROWS_FLOOR = 8_000       # KafkaStreamingActorSpec's published-rows volume
INGEST_BUDGET_SEC = 60   # and its await window

KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"
CASSANDRA_PKG = "com.datastax.spark:spark-cassandra-connector_2.13:3.5.1"


def _session(packages: list[str], extra_conf: dict[str, str] | None = None):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(
            os.environ.get("KW_MASTER", "local[8]")
        ).appName("killrweather_live_smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if packages and os.environ.get("KW_PACKAGES", "1") != "0":
        b = b.config("spark.jars.packages", ",".join(packages))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _reference_lines(n: int) -> list[str]:
    with gzip.open(REF_CSV_GZ, "rt") as f:
        return [ln.rstrip("\n") for _, ln in zip(range(n), f)]


def kafka_leg(bootstrap: str) -> bool:
    """Publish reference CSV lines to the raw topic (S9 batch form), then
    run the real S1 source → parse → S3/S4 sinks graph and assert the
    reference's ≥8,000-rows-in-60 s floor."""
    from pyspark.sql import functions as F

    from killrweather_spark.streaming.pipeline import (
        kafka_lines,
        start_ingest,
    )

    topic = os.environ.get("KW_KAFKA_TOPIC", "killrweather.raw.smoke")
    spark = _session([KAFKA_PKG])
    try:
        lines = _reference_lines(ROWS_FLOOR)
        (
            spark.createDataFrame([(ln,) for ln in lines], "value string")
            .select(F.col("value").cast("string"))
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        )
        print(f"[kafka] published {len(lines)} lines to {topic}")

        work = tempfile.mkdtemp(prefix="kw_live_kafka_")
        raw_path = os.path.join(work, "raw")
        precip_path = os.path.join(work, "precip")
        ckpt = os.path.join(work, "ckpt")
        t0 = time.monotonic()
        stream = kafka_lines(spark, bootstrap, topic)
        q1, q2 = start_ingest(
            stream, raw_path, precip_path, ckpt, trigger={"availableNow": True}
        )
        q1.awaitTermination(INGEST_BUDGET_SEC)
        q2.awaitTermination(INGEST_BUDGET_SEC)
        dt = time.monotonic() - t0
        n = spark.read.parquet(raw_path).count()
        ok = n >= ROWS_FLOOR and dt <= INGEST_BUDGET_SEC
        print(
            f"[kafka] ingested {n} rows in {dt:.1f}s "
            f"(floor {ROWS_FLOOR} in {INGEST_BUDGET_SEC}s) -> "
            + ("PASS" if ok else "FAIL")
        )
        return ok
    finally:
        spark.stop()


def cassandra_leg(host: str) -> bool:
    """Round-trip the reference's raw table through a live ring: parse
    reference CSV lines, write via the DSv2 connector (keyed upsert), read
    back with a station predicate (pushed to CQL), compare counts."""
    from pyspark.sql import functions as F

    from killrweather_spark.sources.cassandra import (
        connector_available,
        read_table,
        write_table,
    )
    from killrweather_spark.sources.readers import parse_raw_lines

    keyspace = os.environ.get("KW_CASSANDRA_KEYSPACE", "isd_weather_data")
    spark = _session(
        [CASSANDRA_PKG], {"spark.cassandra.connection.host": host}
    )
    try:
        if not connector_available(spark):
            print("[cassandra] connector classes not loadable -> FAIL")
            return False
        lines = _reference_lines(2_000)
        obs = parse_raw_lines(
            spark.createDataFrame([(ln,) for ln in lines], "value string")
        )
        write_table(obs, keyspace, "raw_weather_data")
        wsid = obs.first()["wsid"]
        back = read_table(spark, keyspace, "raw_weather_data").filter(
            F.col("wsid") == wsid
        )
        n_expected = obs.filter(F.col("wsid") == wsid).count()
        n_got = back.count()
        ok = n_got >= n_expected  # upserts: ring may already hold these keys
        print(
            f"[cassandra] wrote {obs.count()} rows, point-read {n_got} for "
            f"wsid={wsid} (>= {n_expected} expected) -> "
            + ("PASS" if ok else "FAIL")
        )
        return ok
    finally:
        spark.stop()


def main() -> int:
    bootstrap = os.environ.get("KW_KAFKA_BOOTSTRAP")
    chost = os.environ.get("KW_CASSANDRA_HOST")
    if not bootstrap and not chost:
        print(
            "no KW_KAFKA_BOOTSTRAP / KW_CASSANDRA_HOST configured — "
            "nothing to smoke in this environment (clean skip)"
        )
        return 0
    ok = True
    if bootstrap:
        ok &= kafka_leg(bootstrap)
    else:
        print("[kafka] KW_KAFKA_BOOTSTRAP unset -> skipped")
    if chost:
        ok &= cassandra_leg(chost)
    else:
        print("[cassandra] KW_CASSANDRA_HOST unset -> skipped")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
