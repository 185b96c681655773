"""S8: the HTTP ingest endpoint, end-to-end into the parse pipeline.

Mirrors the reference's feeder contract (``KafkaDataIngestionApp.scala:
120-160``): ``POST /weather/data`` with ``X-DATA-FEED`` naming the upload,
body lines become raw-topic messages — here, one atomically-landed staging
file the stream's file source reads as a microbatch.
"""

from __future__ import annotations

import gzip
import http.client
import os

import pytest

from killrweather_spark.streaming.http_ingest import (
    FEED_HEADER,
    INGEST_PATH,
    IngestHttpServer,
)

LINES = (
    "724940:23234,2008,01,01,00,11.7,-0.6,1023.8,50,7.2,2,0.0,0.0\n"
    "724940:23234,2008,01,01,01,11.1,-0.6,1023.4,80,4.6,2,0.0,0.0\n"
)


def _post(port: int, body: bytes, headers: dict[str, str]):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    try:
        conn.request("POST", INGEST_PATH, body=body, headers=headers)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


def test_post_lands_atomic_staging_file(tmp_path):
    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        status, body = _post(
            srv.port, LINES.encode(), {FEED_HEADER: "sf-2008.csv"}
        )
        assert status == 200 and body == b"2\n"
        files = os.listdir(staging)
        assert len(files) == 1 and files[0].endswith("_sf-2008.csv.csv")
        assert not files[0].endswith(".tmp")
        content = open(os.path.join(staging, files[0])).read()
        assert content == LINES


def test_gzip_body_and_missing_header(tmp_path):
    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        # the reference's feeds are .csv.gz — gzip bodies decompress
        status, body = _post(
            srv.port,
            gzip.compress(LINES.encode()),
            {FEED_HEADER: "feed.gz", "Content-Encoding": "gzip"},
        )
        assert status == 200 and body == b"2\n"
        # the header is required, as in the reference
        status, body = _post(srv.port, LINES.encode(), {})
        assert status == 400 and FEED_HEADER.encode() in body
        # unknown path rejected
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.request("POST", "/other", body=b"x", headers={FEED_HEADER: "f"})
        assert conn.getresponse().status == 404
        conn.close()
    assert len(os.listdir(staging)) == 1


def test_posted_lines_flow_through_parse_pipeline(spark, tmp_path):
    """The landed file is exactly what the stream's file source reads:
    parse it through the same pipeline stage and check typed rows."""
    from killrweather_spark.streaming.pipeline import parsed_observations

    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        status, _ = _post(srv.port, LINES.encode(), {FEED_HEADER: "batch1"})
        assert status == 200
    lines_df = spark.read.text(staging).withColumnRenamed("value", "value")
    obs = parsed_observations(lines_df).collect()
    assert len(obs) == 2
    row = {(r["hour"]): r for r in obs}[0]
    assert row["wsid"] == "724940:23234"
    assert row["temperature"] == pytest.approx(11.7)
    assert row["sky_condition_text"] is None  # corrected 13-field parse


def test_malformed_payload_rejected_cleanly(tmp_path):
    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        # claims gzip but isn't
        status, body = _post(
            srv.port,
            b"not gzip at all",
            {FEED_HEADER: "bad.gz", "Content-Encoding": "gzip"},
        )
        assert status == 400 and b"bad payload" in body
        # invalid utf-8 lines
        status, body = _post(srv.port, b"\xff\xfe\xfd", {FEED_HEADER: "bin"})
        assert status == 400
    assert os.listdir(staging) == []  # nothing landed


def test_oversized_and_bomb_uploads_rejected(tmp_path, monkeypatch):
    """Upload guardrails: a declared Content-Length above the cap is refused
    before reading the body, and a gzip bomb (tiny upload, huge inflation)
    is cut off mid-stream at the decompressed cap — its output exists only
    up to the cap and only in the (unlinked) tempfile, never in memory."""
    from killrweather_spark.streaming import http_ingest
    from killrweather_spark.streaming.http_ingest import MAX_BODY_BYTES

    staging = str(tmp_path / "incoming")
    # spoof the streamed cap down so the bomb leg stays fast: the handler
    # reads both caps at call time
    monkeypatch.setattr(http_ingest, "MAX_DECOMPRESSED_BYTES", 8 << 20)
    with IngestHttpServer(staging) as srv:
        # oversized declared length: 413 without draining the body
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=10)
        conn.putrequest("POST", INGEST_PATH)
        conn.putheader(FEED_HEADER, "big")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

        # gzip bomb: ~70 MiB of zeros compresses to ~70 KiB; streamed
        # inflation crosses the (spoofed) cap and rejects
        bomb = gzip.compress(b"\0" * (64 << 20))
        assert len(bomb) < 1 << 21
        status, body = _post(
            srv.port, bomb, {FEED_HEADER: "bomb.gz", "Content-Encoding": "gzip"}
        )
        assert status == 413 and b"too large" in body
    assert os.listdir(staging) == []


def test_large_feed_streams_past_the_body_cap(tmp_path, monkeypatch):
    """The round-4 advice follow-through: decompression streams to the
    staged tempfile, so a legitimate feed whose DECOMPRESSED size exceeds
    the on-the-wire body cap now lands fine (the old whole-body design
    capped both at 64 MiB).  Caps are spoofed down to keep the test fast:
    body cap 1 MiB, streamed cap 32 MiB, feed inflates to ~4 MiB."""
    from killrweather_spark.streaming import http_ingest

    monkeypatch.setattr(http_ingest, "MAX_BODY_BYTES", 1 << 20)
    monkeypatch.setattr(http_ingest, "MAX_DECOMPRESSED_BYTES", 32 << 20)
    n = 100_000
    payload = "".join(f"stn{i},2008,01,01,00,{i % 30}.5\n" for i in range(n))
    assert len(payload) > 2 << 20  # well past the spoofed 1 MiB body cap
    compressed = gzip.compress(payload.encode())
    assert len(compressed) < 1 << 20  # passes the (spoofed) body cap
    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        status, body = _post(
            srv.port, compressed,
            {FEED_HEADER: "big-feed.gz", "Content-Encoding": "gzip"},
        )
        assert status == 200 and body == f"{n}\n".encode()
    (f,) = os.listdir(staging)
    assert open(os.path.join(staging, f)).read() == payload


def test_truncated_and_multimember_gzip(tmp_path):
    """RFC 1952 edge cases: a gzip stream cut mid-body must 400 (zlib
    returns partial output with NO exception — landing it would silently
    drop data behind a 200), and a multi-member file (cat of .gz parts,
    pigz output — the shape of real .csv.gz feeds) must decode ALL
    members, not just the first."""
    staging = str(tmp_path / "incoming")
    with IngestHttpServer(staging) as srv:
        whole = gzip.compress(LINES.encode())
        status, body = _post(
            srv.port, whole[: len(whole) - 8],
            {FEED_HEADER: "cut.gz", "Content-Encoding": "gzip"},
        )
        assert status == 400 and b"truncated" in body
        assert os.listdir(staging) == []

        two = gzip.compress(LINES.encode()) + gzip.compress(b"extra,line\n")
        status, body = _post(
            srv.port, two, {FEED_HEADER: "multi.gz", "Content-Encoding": "gzip"}
        )
        assert status == 200 and body == b"3\n"
        (f,) = os.listdir(staging)
        assert open(os.path.join(staging, f)).read() == LINES + "extra,line\n"
