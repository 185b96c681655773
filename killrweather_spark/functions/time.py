"""Time helpers shared by batch and streaming operators.

The engine's canonical event-time type is TIMESTAMP_NTZ (what the
testdata parquet carries and what DuckDB reads as a naive TIMESTAMP).
Spark's ``unix_micros`` only accepts the LTZ timestamp type, so epoch
arithmetic goes through an explicit cast; with the session timezone
pinned to UTC (see :func:`killrweather_spark.sources.readers.load_table`)
the cast is the identity on the wall clock and the result equals
DuckDB's ``epoch_us`` on the same naive value — bit-exact, DST-free.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column, NTZ- and LTZ-safe.

    A plain ``unix_micros(ts)`` raises DATATYPE_MISMATCH on
    TIMESTAMP_NTZ input; the cast makes the expression total over both
    timestamp types while staying a pure JVM expression (codegen'd, no
    Python in the row path).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
