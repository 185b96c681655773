"""Multimodal column handling: image/audio/video as opaque binary + metadata.

The engine treats media as ``content: binary`` plus a typed metadata struct
(mime, byte size, modality) — the schema/partitioning/batching plumbing is
real and tested; the actual codec step is STUBBED (`NotImplementedError`)
because decode libraries (PIL/ffmpeg/torchaudio) are not in this container.
A deterministic fake decoder stands in so the Arrow-batch plumbing
(``mapInPandas`` signature, schema, batch shape) is exercised end-to-end.

Scale design: ``mapInPandas`` streams Arrow record batches through Python —
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
regardless of partition size, and binary columns never pass through JVM
row-by-row serialization.  Frame extraction fans out rows (one per frame):
do it INSIDE the pandas iterator so the fan-out happens batch-wise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 256  # fake "frame" granularity for the stub decoder


def attach_binary_content(df: DataFrame, text_col: str = "text",
                          mime: str = "application/octet-stream") -> DataFrame:
    """Simulate a media table: utf-8 bytes of the text as the binary payload
    plus a typed metadata struct (what a real ingest would carry)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("blob").alias("modality"),
        ),
    )


def decode_media(content: bytes) -> object:
    """Real decoder hook — image/audio libs are not available here."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; use fake_frame_stats (deterministic stub) instead"
    )


def frame_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-item 'decode' stats via mapInPandas over Arrow batches:
    (id, byte_len, n_frames) with n_frames = ceil(byte_len / FRAME_BYTES).

    Deterministic stand-in for decode/feature-extract; swap the body for a
    real codec without touching the Spark-side plumbing.
    """
    schema = f"{id_col} bigint, byte_len int, n_frames int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            lens = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": lens.astype("int32"),
                    "n_frames": ((lens + FRAME_BYTES - 1) // FRAME_BYTES).astype("int32"),
                }
            )

    return df.select(id_col, "content").mapInPandas(batches, schema)


EMBED_DIM = 8


def fake_embedding(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction stub over the Arrow batch path: an 8-dim float
    vector derived from md5 of the binary payload (dim *j* = hex[4j:4j+4]
    as an int, scaled by 1/65536 — exact in IEEE, so reproducible across
    engines and the DuckDB oracle can verify the pandas plumbing
    value-exactly).

    Swap the body for a real image/audio encoder without touching the
    Spark-side contract: (id, content) in, (id, embedding array<double>)
    out, memory bounded by the Arrow batch size. The output feeds the
    similarity/ANN operators directly (cross-modal retrieval path).
    """
    import hashlib

    schema = f"{id_col} bigint, embedding array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for content in pdf["content"]:
                h = hashlib.md5(bytes(content)).hexdigest()
                embs.append(
                    [int(h[4 * j: 4 * j + 4], 16) / 65536.0 for j in range(EMBED_DIM)]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": embs})

    return df.select(id_col, "content").mapInPandas(batches, schema)


def fake_embedding_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`fake_embedding` (content = utf-8 of text, so
    ``md5(text)`` hashes the same bytes).

    Dimensions are flattened to scalar columns ``d0..d7`` — the harness's
    canonicalizer sorts/hashes cell values, which array cells break — and
    the Spark side projects the same flattening (`q_multimodal_embedding`).
    """
    dims = ", ".join(
        f"CAST(CAST(concat('0x', substr(md5({text_expr}), {4 * j + 1}, 4)) AS INTEGER)"
        f" AS DOUBLE) / 65536.0 AS d{j}"
        for j in range(EMBED_DIM)
    )
    return f"SELECT {id_expr} AS doc_id, {dims} FROM documents"


def resize_media(df: DataFrame, target_bytes: int = 128,
                 id_col: str = "doc_id") -> DataFrame:
    """Resize stub: normalize every payload to exactly ``target_bytes``
    (truncate, or zero-pad — the shape contract of a real image resize)
    with the metadata struct updated to the post-resize size. A real codec
    resize drops into the same batch iterator; the Spark-side schema,
    metadata update, and Arrow batching are the tested surface.
    """
    schema = (
        f"{id_col} bigint, content binary, "
        "media_meta struct<mime: string, n_bytes: int, modality: string>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                bytes(c[:target_bytes]).ljust(target_bytes, b"\0")
                for c in pdf["content"]
            ]
            metas = [
                {"mime": m["mime"], "n_bytes": target_bytes, "modality": m["modality"]}
                for m in pdf["media_meta"]
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "content": resized, "media_meta": metas}
            )

    return df.select(id_col, "content", "media_meta").mapInPandas(batches, schema)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  every: int = 2) -> DataFrame:
    """Frame sampling: one output row per kept frame (every ``every``-th),
    carrying the frame's byte slice — row fan-out inside the Arrow batch."""
    schema = f"{id_col} bigint, frame_no int, frame_bytes binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frame_nos, blobs = [], [], []
            for i, content in zip(pdf[id_col], pdf["content"]):
                n = (len(content) + FRAME_BYTES - 1) // FRAME_BYTES
                for f in range(0, n, every):
                    ids.append(i)
                    frame_nos.append(f)
                    blobs.append(bytes(content[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(frame_nos, dtype="int32"),
                 "frame_bytes": blobs}
            )

    return df.select(id_col, "content").mapInPandas(batches, schema)
