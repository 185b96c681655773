from killrweather_spark.sources.readers import (
    load_table,
    load_testdata,
    parse_raw_lines,
    read_raw_csv,
    sky_condition_lookup_df,
)

__all__ = [
    "load_table",
    "load_testdata",
    "parse_raw_lines",
    "read_raw_csv",
    "sky_condition_lookup_df",
]
