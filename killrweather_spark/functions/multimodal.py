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
