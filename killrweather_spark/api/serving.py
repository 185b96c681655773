"""Concurrent query serving — the reference's async request path.

Reference: every actor answers with ``collectAsync`` and pipes the future to
the requester (``TemperatureActor.scala:59-60``; the generic glue is
``FutureSyntax.scala:12-21``), so queries overlap instead of queueing; the
demo client sustains six concurrent requests every 2 s
(``KillrWeatherClientApp.scala:56-60,93-127``) under the 5 s actor ask
timeout (``AggregationActor.scala:30``).

Spark-first rebuild: Spark's scheduler already runs jobs from different
threads concurrently; what the engine must supply is (a) a thread pool so
callers get futures instead of blocking (≙ ``pipeTo``), and (b) a FAIR
scheduler pool so one expensive analytical job cannot convoy a dashboard of
point lookups behind it (``session.py`` sets ``spark.scheduler.mode=FAIR``;
each serving thread tags its jobs into a named pool via
``setLocalProperty("spark.scheduler.pool", ...)``).  At 100 TB with many
concurrent dashboards this is the first serving bottleneck — FIFO mode
would let a full-table scan starve every point query behind it.
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable

from pyspark.sql import DataFrame, Row

from killrweather_spark.api.engine import WeatherEngine

#: name of the scheduler pool serving requests run in.  With FAIR mode and
#: no allocation file, pools materialize on first use with default weight —
#: enough to round-robin serving jobs against batch/ingest jobs.
SERVING_POOL = "serving"


class AsyncWeatherEngine:
    """Futures-based facade over :class:`WeatherEngine` (≙ ``pipeTo``).

    Each request surface method mirrors the sync engine but returns a
    ``concurrent.futures.Future`` whose result is the collected row list —
    the Spark action runs on a worker thread inside the FAIR pool, so N
    callers overlap exactly like the reference's actor futures.  The
    sentinel semantics carry over: an empty list ≙ ``NoDataAvailable``.
    """

    def __init__(
        self,
        engine: WeatherEngine,
        max_workers: int = 8,
        pool: str = SERVING_POOL,
    ):
        self.engine = engine
        self._pool = pool
        self._executor = ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="weather-serve"
        )

    # -- plumbing -----------------------------------------------------------
    def submit(self, build: Callable[[WeatherEngine], DataFrame]) -> Future:
        """Run ``build(engine).collect()`` on a serving thread.

        The scheduler-pool local property is thread-local (PySpark pins
        Python threads to JVM threads), so tagging it here scopes the FAIR
        pool to this job only — batch work on other threads keeps its own
        pool.
        """
        sc = self.engine.spark.sparkContext

        def task() -> list[Row]:
            sc.setLocalProperty("spark.scheduler.pool", self._pool)
            try:
                return build(self.engine).collect()
            finally:
                sc.setLocalProperty("spark.scheduler.pool", None)

        return self._executor.submit(task)

    def shutdown(self) -> None:
        self._executor.shutdown(wait=True)

    def __enter__(self) -> "AsyncWeatherEngine":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.shutdown()

    # -- §2.11 request surface, async form ----------------------------------
    def get_weather_station(self, wsid: str) -> Future:
        return self.submit(lambda e: e.get_weather_station(wsid))

    def get_current_weather(self, wsid: str, **key: int) -> Future:
        return self.submit(lambda e: e.get_current_weather(wsid, **key))

    def get_daily_temperature(
        self, wsid: str, year: int, month: int, day: int
    ) -> Future:
        return self.submit(lambda e: e.get_daily_temperature(wsid, year, month, day))

    def get_monthly_hilow_temperature(
        self, wsid: str, year: int, month: int
    ) -> Future:
        return self.submit(
            lambda e: e.get_monthly_hilow_temperature(wsid, year, month)
        )

    def get_precipitation(self, wsid: str, year: int) -> Future:
        return self.submit(lambda e: e.get_precipitation(wsid, year))

    def get_top_k_precipitation(self, wsid: str, year: int, k: int = 10) -> Future:
        return self.submit(lambda e: e.get_top_k_precipitation(wsid, year, k))

    # -- the demo client's request mix --------------------------------------
    def client_loop(self, wsid: str, year: int, month: int, day: int) -> list[Future]:
        """One iteration of the demo client's six-query cadence
        (``KillrWeatherClientApp.scala:93-127``): all six in flight at once,
        futures returned in protocol order."""
        return [
            self.get_weather_station(wsid),
            self.get_current_weather(wsid),
            self.get_daily_temperature(wsid, year, month, day),
            self.get_monthly_hilow_temperature(wsid, year, month),
            self.get_precipitation(wsid, year),
            self.get_top_k_precipitation(wsid, year, k=10),
        ]
