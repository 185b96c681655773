"""Diagnose where streaming drain wall-time goes (r13 optimization).

Wraps run_stream_to_batch to capture each StreamingQuery's progress
(durationMs breakdown: addBatch, getBatch, queryPlanning, walCommit,
commitOffsets, latestOffset) and times the full registry query, optionally
under a reduced spark.sql.shuffle.partitions (state-store partition count
for the stateful operators).

Usage::

    python scripts/stream_diag.py NAME [NAME ...] [--parts N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# the session factory derives the initial shuffle width from this dir;
# pin the default into the env so harness and session agree when unset
os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF_DIR)


def main() -> None:
    from killrweather_spark.api.inventory import REGISTRY
    from killrweather_spark.session import get_session
    from killrweather_spark.streaming import pipeline

    args = sys.argv[1:]
    parts = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--parts":
            parts = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_session(app_name="stream_diag")
    spark.range(1).count()
    if parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    progress: list[dict] = []
    orig = pipeline.run_stream_to_batch

    def wrapped(stream_df, checkpoint_dir, query_name="stream_result",
                output_mode="complete"):
        import shutil
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            progress.append({
                "query": query_name,
                "batchId": p.get("batchId"),
                "durationMs": p.get("durationMs"),
                "numInputRows": p.get("numInputRows"),
            })
        out = stream_df.sparkSession.table(query_name).localCheckpoint(
            eager=True
        )
        stream_df.sparkSession.catalog.dropTempView(query_name)
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
        return out

    pipeline.run_stream_to_batch = wrapped
    # the inventory imported the symbol into query closures via
    # `from ... import run_stream_to_batch` inside the fn body, so the
    # monkeypatch on the module attribute is what those late imports see.

    for name in names:
        del progress[:]
        spec = REGISTRY[name]
        t0 = time.time()
        df = spec.fn(spark, SF_DIR)
        n = df.count()
        wall = time.time() - t0
        print(json.dumps({
            "name": name,
            "wall_sec": round(wall, 3),
            "rows": n,
            "parts": parts or spark.conf.get("spark.sql.shuffle.partitions"),
            "progress": progress,
        }))

    pipeline.run_stream_to_batch = orig


if __name__ == "__main__":
    main()
