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

    ``events.ts`` has shipped as TIMESTAMP(NANOS) (readable only as a
    long under ``nanosAsLong``) in some testdata generations and as a
    plain TIMESTAMP(MICROS) in others, so normalize by the *actual*
    physical type rather than assuming one: a long is nanos → rebuild a
    microsecond timestamp; a timestamp passes through untouched.  Either
    way callers always see ``ts: timestamp`` and the normalization is a
    zero-shuffle projection that Catalyst folds into the scan.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Epoch arithmetic (functions/time.py) casts NTZ→LTZ; pin the session
    # timezone so that cast is the identity on the wall clock regardless
    # of which session the caller built.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        (ts_type,) = [t for c, t in df.dtypes if c == "ts"]
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# fan_out treats a file-backed input below this many bytes per task slot as
# "narrow": the scan cannot keep every core busy through a CPU-bound map
# stage (one small parquet file is one row group — byte-range splits beyond
# it produce empty tasks), and the round-robin shuffle it buys costs at most
# slots × 8 MiB.  Above it, Spark's own split packing (maxPartitionBytes +
# minPartitionNum = defaultParallelism) already yields >= slots real splits.
FAN_OUT_BYTES_PER_SLOT = 8 << 20

# Width of the spread when a narrow input IS fanned: ~192 KiB of input per
# slot (the _media_docs constant, A/B'd in r13 sessions 5-6) instead of
# jumping straight to every task slot.  A full-width round-robin of a
# half-MB bench scan costs more in exchange + per-task setup than the map
# work it spreads (bench gate caught shingle_containment_pairs 2.0 → 2.5-3.7 s
# at sf0.1 under the full-width form), while a size-derived width converges
# to full width exactly where the spread pays: at 32 slots the two rules
# pick the same width for any input >= 6 MiB.  Callers whose MAP stage is
# dominated by per-row kernel cost rather than bytes (the brute/vectorized
# eval screens' |evals|×dims folds) pass ``slots`` explicitly to pin full
# width.
FAN_OUT_SIZED_BYTES = 192 << 10


def fan_out(df: DataFrame, slots: int | None = None) -> DataFrame:
    """Round-robin repartition when the input is too narrow to keep every
    task slot busy — CPU-bound map stages (shingling, hashing, tokenizing)
    otherwise run on a fraction of the cores.

    Narrowness is decided WITHOUT converting the plan to an RDD (the old
    ``df.rdd.getNumPartitions()`` probe forced a full analysis pass and
    bypassed AQE's view of the scan on every shingle/hash query): for
    file-backed inputs — every hot-path caller — the decision is a pure
    driver-side stat of the scan's input files against a byte threshold.
    On a production table the files exceed it and this returns ``df``
    unchanged with zero planning cost; only in-memory lineages (local
    collections, post-shuffle intermediates in tests) fall back to the
    RDD-partition probe, and those are small by construction.
    """
    from urllib.parse import unquote, urlparse

    target = slots or df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plans land in the fallback
        files = []
    if files:
        if len(files) >= target:
            # many small files already yield >= target scan splits (each
            # file is at least one split): a round-robin shuffle here would
            # buy nothing and cost a full pass over the data
            return df
        total = 0
        for uri in files:
            p = urlparse(uri)
            if p.scheme not in ("", "file"):
                break  # remote store: sizes unknown driver-side, use probe
            try:
                total += os.stat(unquote(p.path)).st_size
            except OSError:
                break
        else:
            if total < target * FAN_OUT_BYTES_PER_SLOT:
                # explicit ``slots`` = the caller chose the width; the
                # default derives it from input size (full width from
                # ~6 MiB up at 32 slots, narrower below — see
                # FAN_OUT_SIZED_BYTES)
                width = slots or max(
                    2, min(target, total // FAN_OUT_SIZED_BYTES + 1)
                )
                return df.repartition(int(width))
            return df
    # cold path: in-memory / non-statable lineage — the probe's plan→RDD
    # conversion is acceptable here because these inputs never sit on the
    # per-query hot path (file scans above never reach this line)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
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


def csv_line_audit(
    lines: DataFrame,
    casts: list[tuple[int, str]],
    n_fields: int,
    domain_sql: str | None = None,
    line_col: str = "line",
) -> DataFrame:
    """Ingest data-quality audit: classify raw CSV lines in one pass.

    At 100 TB, malformed input is a certainty and a silent ``cast`` → null
    (or a thrown task under ANSI mode) loses the signal.  This classifier
    buckets every line as ``ok`` / ``missing_field`` / ``bad_numeric`` /
    ``domain`` using ``try_cast`` semantics, entirely in JVM expressions
    (codegen, map-only + a 4-row aggregate), so the audit rides along with
    ingest instead of costing a second scan.  The reference has no such
    path — its parser silently mis-assigns fields (the ``Weather.scala:77-94``
    "tech debt" bug); this is the guardrail that would have caught it.

    ``casts`` is ``[(1-based position, sql type), ...]``; ``domain_sql`` is a
    boolean SQL expression over ``f1..fN`` (the cast fields) that flags
    semantically invalid rows (e.g. ``f5 BETWEEN 0 AND 23``).
    """
    arr = F.split(F.col(line_col), ",")
    parsed = lines.select(
        F.size(arr).alias("nf"),
        *[
            # get() (not [i]) — ANSI mode throws on out-of-bounds indexing,
            # and short lines are exactly what we're here to count
            F.expr(
                f"try_cast(get(split({line_col}, ','), {pos - 1}) AS {typ})"
            ).alias(f"f{pos}")
            for pos, typ in casts
        ],
    )
    any_null = None
    for pos, _ in casts:
        c = F.col(f"f{pos}").isNull()
        any_null = c if any_null is None else (any_null | c)
    cls = (
        F.when(F.col("nf") < n_fields, F.lit("missing_field"))
        .when(any_null, F.lit("bad_numeric"))
    )
    if domain_sql is not None:
        cls = cls.when(~F.expr(domain_sql), F.lit("domain"))
    cls = cls.otherwise(F.lit("ok"))
    return (
        parsed.groupBy(cls.alias("error_class"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
