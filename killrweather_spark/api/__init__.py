from killrweather_spark.api.engine import WeatherEngine

__all__ = ["WeatherEngine"]
