"""Option-construction contracts for the broker/ring-gated connectors.

This container has no Kafka broker and no Cassandra ring, so the live
paths can't run — but a broken option string must not hide behind that
gate.  These tests pin the exact option dictionaries the gated paths feed
to ``readStream``/``writeStream``/``read.format`` (reference configs:
``reference.conf:156,160``; ``TemperatureActor.scala:56``), plus the
error paths for missing settings.
"""

from __future__ import annotations

import pytest

from killrweather_spark.sources.cassandra import (
    CASSANDRA_FORMAT,
    cassandra_options,
    connector_available,
    read_table,
)
from killrweather_spark.streaming.pipeline import (
    RAW_TOPIC,
    kafka_sink_options,
    kafka_source_options,
)


def test_kafka_source_options_contract():
    opts = kafka_source_options("broker1:9092,broker2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": RAW_TOPIC,  # killrweather.raw — reference.conf:156
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }
    # backpressure bound (the reference's 1-thread receiver equivalent)
    assert (
        kafka_source_options("b:9092", max_offsets_per_trigger=50_000)[
            "maxOffsetsPerTrigger"
        ]
        == "50000"
    )
    with pytest.raises(ValueError):
        kafka_source_options("")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", topic="")


def test_kafka_sink_options_contract():
    opts = kafka_sink_options("b:9092", "killrweather.out", "/tmp/ckpt")
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["topic"] == "killrweather.out"
    assert opts["checkpointLocation"] == "/tmp/ckpt"
    # batched async publish ≙ batch.send.size=100 (reference.conf:160)
    assert opts["kafka.batch.size"] == str(100 * 1024)
    assert int(opts["kafka.linger.ms"]) > 0
    for bad in (
        dict(bootstrap_servers="", topic="t", checkpoint_dir="c"),
        dict(bootstrap_servers="b", topic="", checkpoint_dir="c"),
        dict(bootstrap_servers="b", topic="t", checkpoint_dir=""),
    ):
        with pytest.raises(ValueError):
            kafka_sink_options(**bad)


def test_cassandra_options_contract():
    opts = cassandra_options("isd_weather_data", "raw_weather_data")
    assert opts == {
        "keyspace": "isd_weather_data",
        "table": "raw_weather_data",
        "directJoinSetting": "on",
    }
    assert cassandra_options("k", "t", direct_join=False)["directJoinSetting"] == "off"
    # the write path omits the read-side join knob entirely
    assert "directJoinSetting" not in cassandra_options("k", "t", direct_join=None)
    with pytest.raises(ValueError):
        cassandra_options("", "t")
    with pytest.raises(ValueError):
        cassandra_options("k", "")
    assert CASSANDRA_FORMAT == "org.apache.spark.sql.cassandra"


def test_cassandra_read_falls_back_and_errors_cleanly(spark):
    # no connector in this container: the gate must be False, the fallback
    # must serve the table, and a missing fallback must raise (not return a
    # broken frame)
    assert not connector_available(spark)
    df = read_table(
        spark, "isd_weather_data", "events", fallback_dir="/root/testdata/sf0.001"
    )
    assert df.count() > 0 and "ts" in df.columns
    with pytest.raises(ValueError, match="fallback_dir"):
        read_table(spark, "isd_weather_data", "events")


def test_kafka_stream_graph_constructs_without_broker(spark):
    """Graph construction (plan building) must succeed even though no
    broker exists — starting the query is what needs the package/broker.
    Spark ships the kafka source in its own distribution only sometimes;
    accept either a built plan or the documented classpath error."""
    from killrweather_spark.streaming.pipeline import kafka_lines

    try:
        df = kafka_lines(spark, "localhost:9092")
        assert df.schema.fieldNames() == ["value"]
    except Exception as e:  # pragma: no cover — classpath-dependent
        assert "kafka" in str(e).lower()
