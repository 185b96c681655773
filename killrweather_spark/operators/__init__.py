from killrweather_spark.operators.aggregates import (
    annual_sum,
    daily_stats,
    daily_sum,
    monthly_hilow,
    top_k,
    top_k_values,
)
from killrweather_spark.operators.lookups import latest_row, point_lookup

__all__ = [
    "daily_stats",
    "monthly_hilow",
    "daily_sum",
    "annual_sum",
    "top_k",
    "top_k_values",
    "point_lookup",
    "latest_row",
]
