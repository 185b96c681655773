"""StructType schemas — the rebuild of the reference's data model.

Reference: CQL DDL in ``data/create-timeseries.cql`` and the case-class
hierarchy in ``killrweather-core/.../Weather.scala:20-158``.  Type mapping per
SURVEY §1.3: ``text→StringType``, ``int→IntegerType``, ``double→DoubleType``,
Cassandra ``counter`` → running-sum aggregate.

The raw CSV wire format is 13 positional fields (``data/load/*.csv.gz``; the
``COPY`` column list in ``load-timeseries.cql:10-11``).  The reference's parser
(``Weather.scala:78-94``) misreads field 11 into both ``skyConditionText`` and
``oneHourPrecip`` — self-labelled "Tech debt".  We parse the 13 fields
positionally and leave ``sky_condition_text`` null: an intentional, documented
divergence from the reference bug (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw_weather_data (create-timeseries.cql:31-47) -------------------------
# Primary key ((wsid), year, month, day, hour) with DESC clustering; in Spark
# the table is partitioned parquet + explicit orderBy at query time (SURVEY
# §2.6 O1 — sort avoidance was a storage trick, Catalyst re-derives it).

RAW_WEATHER_CSV_FIELDS: list[tuple[str, T.DataType]] = [
    ("wsid", T.StringType()),
    ("year", T.IntegerType()),
    ("month", T.IntegerType()),
    ("day", T.IntegerType()),
    ("hour", T.IntegerType()),
    ("temperature", T.DoubleType()),
    ("dewpoint", T.DoubleType()),
    ("pressure", T.DoubleType()),
    ("wind_direction", T.IntegerType()),
    ("wind_speed", T.DoubleType()),
    ("sky_condition", T.IntegerType()),
    ("one_hour_precip", T.DoubleType()),
    ("six_hour_precip", T.DoubleType()),
]

RAW_WEATHER_CSV_SCHEMA = T.StructType(
    [T.StructField(n, t, True) for n, t in RAW_WEATHER_CSV_FIELDS]
)

RAW_WEATHER_DATA = T.StructType(
    [T.StructField(n, t, True) for n, t in RAW_WEATHER_CSV_FIELDS[:11]]
    + [T.StructField("sky_condition_text", T.StringType(), True)]
    + [T.StructField(n, t, True) for n, t in RAW_WEATHER_CSV_FIELDS[11:]]
)

# --- weather_station (create-timeseries.cql:15-24) ---------------------------
WEATHER_STATION = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("country_code", T.StringType(), True),
        T.StructField("state_code", T.StringType(), True),
        T.StructField("call_sign", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("long", T.DoubleType(), True),
        T.StructField("elevation", T.DoubleType(), True),
    ]
)

# --- sky_condition_lookup (create-timeseries.cql:55-58) ----------------------
SKY_CONDITION_LOOKUP = T.StructType(
    [
        T.StructField("code", T.IntegerType(), False),
        T.StructField("condition", T.StringType(), True),
    ]
)

# Static rows from load-timeseries.cql:14-29 (the 20 lookup inserts).
SKY_CONDITION_ROWS: list[tuple[int, str]] = [
    (0, "None, SKC or CLR"),
    (1, "One okta - 1/10 or less but not zero"),
    (2, "Two oktas - 2/10 - 3/10, or FEW"),
    (3, "Three oktas - 4/10"),
    (4, "Four oktas - 5/10, or SCT"),
    (5, "Five oktas - 6/10"),
    (6, "Six oktas - 7/10 - 8/10"),
    (7, "Seven oktas - 9/10 or more but not 10/10, or BKN"),
    (8, "Eight oktas - 10/10, or OVC"),
    (9, "Sky obscured, or cloud amount cannot be estimated"),
    (10, "Partial obscuration"),
    (11, "Thin scattered"),
    (12, "Scattered"),
    (13, "Dark scattered"),
    (14, "Thin broken"),
    (15, "Broken"),
    (16, "Dark broken"),
    (17, "Thin overcast"),
    (18, "Overcast"),
    (19, "Dark overcast"),
]

# --- tiered rollup outputs (create-timeseries.cql:60-91) ---------------------
DAILY_AGGREGATE_TEMPERATURE = T.StructType(
    [
        T.StructField("wsid", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("variance", T.DoubleType(), True),
        T.StructField("stdev", T.DoubleType(), True),
    ]
)

MONTHLY_AGGREGATE_TEMPERATURE = T.StructType(
    [
        T.StructField("wsid", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
    ]
)

DAILY_AGGREGATE_PRECIP = T.StructType(
    [
        T.StructField("wsid", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("precipitation", T.DoubleType(), True),
    ]
)

YEAR_CUMULATIVE_PRECIP = T.StructType(
    [
        T.StructField("wsid", T.StringType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("precipitation", T.DoubleType(), True),
    ]
)
