"""S8: HTTP ingest endpoint — the reference's akka-http feeder, rebuilt.

Reference: ``KafkaDataIngestionApp.scala:120-160`` exposes
``POST /weather/data`` where the ``X-DATA-FEED`` header names the upload;
each line of the body becomes one Kafka message on the raw topic (via
``KafkaPublisherActor``, batched 100/send).

Spark-first rebuild: the engine's stream source is either a Kafka topic or
the file-source staging directory (``streaming/pipeline.py:file_lines`` —
the same downstream graph either way).  This endpoint is therefore a thin
stdlib HTTP server that lands each POST body as one file in the staging
directory — one upload ≙ one batch of topic messages, picked up by the next
microbatch.  No web framework: ``http.server`` is enough for a feeder whose
real throughput path is Spark's, not the socket's, and the container has no
broker to publish to anyway (point :func:`killrweather_spark.streaming.
pipeline.kafka_sink` at a broker to switch the landing zone).

Durability contract mirrors the reference's at-least-once feeder: the file
is written to a temp name and atomically renamed into the staging dir, so
the file source never reads a half-written batch.
"""

from __future__ import annotations

import gzip
import os
import tempfile
import threading
import uuid
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

INGEST_PATH = "/weather/data"          # KafkaDataIngestionApp.scala:131
FEED_HEADER = "X-DATA-FEED"            # KafkaDataIngestionApp.scala:134

# Upload guardrails: a client declaring a large Content-Length then stalling
# would otherwise pin a handler thread forever, and an oversized (or
# gzip-bomb) body would materialize whole in driver memory.  MAX_BODY_BYTES
# bounds the on-the-wire body (compressed or plain — 64 MiB covers the
# reference's largest yearly .csv.gz feed with wide margin).  Decompressed
# gzip output never materializes in memory at all: it STREAMS to the staged
# tempfile in bounded chunks (round-4 advice), so legitimate large feeds get
# the much roomier MAX_DECOMPRESSED_BYTES while a bomb is cut off mid-stream
# at that cap — per-chunk memory stays O(GZIP_CHUNK) either way.
MAX_BODY_BYTES = 64 << 20
MAX_DECOMPRESSED_BYTES = 512 << 20
GZIP_CHUNK = 1 << 20
SOCKET_TIMEOUT_SEC = 30.0


class PayloadTooLarge(Exception):
    """Decompressed output exceeded MAX_DECOMPRESSED_BYTES (HTTP 413)."""


def _gunzip_chunks(body: bytes):
    """Yield decompressed chunks of a (possibly multi-member) gzip body.

    RFC 1952 edge handling mirrors the old whole-body path: multi-member
    files (pigz / cat of .gz parts) loop via ``unused_data``; a TRUNCATED
    stream raises ValueError (zlib returns partial output with NO exception
    — ``eof`` must be checked explicitly or a cut-off upload would land
    partial data with a 200); output past the cap raises
    :class:`PayloadTooLarge` the moment the running total crosses it, so a
    bomb's output exists only up to the cap and only on disk, never in
    memory.  ``MAX_DECOMPRESSED_BYTES`` is read at call time (tests spoof
    it).
    """
    total = 0
    remaining = body
    while True:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        data = remaining
        while not d.eof:
            chunk = d.decompress(data, GZIP_CHUNK)
            total += len(chunk)
            if total > MAX_DECOMPRESSED_BYTES:
                raise PayloadTooLarge()
            if chunk:
                yield chunk
            data = d.unconsumed_tail
            if not d.eof and not data:
                # decompressor wants more input but the body is exhausted
                raise ValueError("truncated gzip stream")
        remaining = d.unused_data.lstrip(b"\0")  # zero padding ok
        if not remaining:
            return


class _IngestHandler(BaseHTTPRequestHandler):
    # self.server is the ThreadingHTTPServer; IngestHttpServer attaches its
    # land() callable onto it at construction time.
    timeout = SOCKET_TIMEOUT_SEC  # per-connection socket timeout

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        if self.path != INGEST_PATH:
            self._reply(404, b"unknown path\n")
            return
        feed = self.headers.get(FEED_HEADER)
        if not feed:
            # the reference rejects unnamed feeds the same way
            # (KafkaDataIngestionApp.scala:133-137: header is required)
            self._reply(400, f"missing {FEED_HEADER} header\n".encode())
            return
        raw_len = self.headers.get("Content-Length")
        if raw_len is None:
            # no chunked support — an absent length would silently land an
            # empty file while the body bytes rot in the socket
            self._reply(411, b"Content-Length required\n")
            return
        try:
            length = int(raw_len)
        except ValueError:
            length = -1
        if length < 0:
            self._reply(400, b"bad Content-Length\n")
            return
        if length > MAX_BODY_BYTES:
            self._reply(413, b"payload too large\n")
            return
        try:
            # socket timeout (class attr above) bounds a stalled sender: a
            # short read here raises instead of hanging the handler thread
            body = self.rfile.read(length)
            if len(body) < length:
                self._reply(400, b"truncated body\n")
                return
            if self.headers.get("Content-Encoding") == "gzip":
                # the reference's feeds are .csv.gz (ClientHelper.scala:68);
                # decompression streams straight into the staged tempfile —
                # see _gunzip_chunks for the bomb / truncation / multi-member
                # contract.  Nothing lands unless the whole stream inflates
                # cleanly (the tempfile is unlinked on any failure).
                n_lines = self.server.land_stream(feed, _gunzip_chunks(body))
            else:
                n_lines = self.server.land(feed, body)
        except PayloadTooLarge:
            self._reply(413, b"decompressed payload too large\n")
            return
        except (
            gzip.BadGzipFile, zlib.error, UnicodeDecodeError, OSError, TimeoutError,
        ) as e:
            # malformed upload: reject it without landing a partial file —
            # a clean 400 instead of a dropped connection
            self._reply(400, f"bad payload: {type(e).__name__}\n".encode())
            return
        except ValueError:
            self._reply(400, b"bad payload: truncated gzip\n")
            return
        self._reply(200, f"{n_lines}\n".encode())

    def _reply(self, code: int, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt: str, *args) -> None:  # quiet test output
        pass


class IngestHttpServer:
    """``POST /weather/data`` → one atomically-landed file per upload.

    ``port=0`` binds an ephemeral port (read it back from ``.port`` — the
    pattern tests use).  ``land()`` is also the programmatic entry for
    feeders that skip HTTP.
    """

    def __init__(self, staging_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.staging_dir = staging_dir
        os.makedirs(staging_dir, exist_ok=True)
        self._httpd = ThreadingHTTPServer((host, port), _IngestHandler)
        self._httpd.land = self.land  # type: ignore[attr-defined]
        self._httpd.land_stream = self.land_stream  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def land(self, feed: str, body: bytes) -> int:
        """Write one upload's lines as a staged file; returns line count."""
        return self.land_stream(feed, (body,))

    def land_stream(self, feed: str, chunks) -> int:
        """Stream an upload's bytes (an iterable of chunks) into one staged
        file, counting non-blank lines — the decompress-to-tempfile path
        that keeps arbitrarily large feeds out of driver memory.

        Tempfile + rename keeps the file source from ever listing a
        half-written batch (rename is atomic within a filesystem); any
        failure mid-stream (bomb cap, truncated gzip, bad UTF-8) unlinks
        the tempfile so nothing partial ever lands.  UTF-8 decoding is
        incremental (multi-byte characters may straddle chunk boundaries);
        line splitting recognizes ``\\n``/``\\r\\n``/``\\r`` and drops blank
        lines — deliberately the newline set Spark's text source itself
        splits on, NOT Python's ``str.splitlines()`` superset (``\\x0c``,
        ``\\u2028``, …), which would disagree with how the landed file is
        read back.
        """
        import codecs

        safe_feed = "".join(c if c.isalnum() or c in "-_." else "_" for c in feed)
        # leading-dot temp name: Spark's file listing skips hidden files
        # ('.'/'_' prefixes), so neither a streaming microbatch nor a batch
        # read can see the half-written upload — only the renamed final
        # file is ever listed, and an aborted write leaves an invisible
        # orphan instead of poisoning the staging dir
        fd, tmp = tempfile.mkstemp(dir=self.staging_dir, prefix=".", suffix=".tmp")
        decoder = codecs.getincrementaldecoder("utf-8")()
        n_lines = 0
        buf = ""
        try:
            # explicit UTF-8: the default locale encoding could differ
            # (C/latin-1 containers), mis-encoding what Spark reads as UTF-8
            with os.fdopen(fd, "w", encoding="utf-8") as f:

                def emit(text: str, final: bool = False) -> None:
                    nonlocal buf, n_lines
                    buf += text.replace("\r\n", "\n").replace("\r", "\n")
                    parts = buf.split("\n")
                    buf = parts.pop()  # partial last line carries over
                    if final and buf.strip():
                        parts.append(buf)
                        buf = ""
                    for ln in parts:
                        if ln.strip():
                            f.write(ln + "\n")
                            n_lines += 1

                for chunk in chunks:
                    emit(decoder.decode(chunk))
                emit(decoder.decode(b"", True), final=True)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        final_path = os.path.join(
            self.staging_dir, f"{uuid.uuid4().hex[:12]}_{safe_feed}.csv"
        )
        os.rename(tmp, final_path)
        return n_lines

    def start(self) -> "IngestHttpServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="ingest-http", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self) -> "IngestHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
