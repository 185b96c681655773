"""Remote request/response transport for the §2.11 query surface.

The reference's demo client asks its API over the network — remote actor
selection + ask with a 5 s timeout (``KillrWeatherClientApp.scala:122-123``,
``AggregationActor.scala:30``); the in-process :class:`AsyncWeatherEngine`
reproduced the concurrency but not the wire.  This module supplies the
wire: a thread-per-request JSON-over-HTTP endpoint exposing ALL EIGHT
declared requests (SURVEY §2.11, including the two the reference declares
but never implemented) with the reference's ask-timeout semantics —
a request that cannot answer inside :data:`ASK_TIMEOUT_S` returns 504,
the ``NoDataAvailable`` sentinel maps to an empty ``rows`` list, and an
unknown request or bad argument is a 400, not a worker crash.

Protocol (one POST endpoint, the actor-message shape):

    POST /ask        {"request": "GetCurrentWeather",
                      "args": {"wsid": "725030:14732"}}
    → 200            {"request": ..., "n": 1, "rows": [{...}]}

Spark-first shape: the handler body is a thin serializer — every query
runs through :class:`AsyncWeatherEngine`'s FAIR-pool thread pool, so N
concurrent HTTP clients overlap in the Spark scheduler exactly like the
reference's piped futures, and a full-table analytical job on another
pool cannot convoy the point lookups.  ``ThreadingHTTPServer`` gives a
thread per connection; the engine pool (not the socket layer) bounds
Spark-side concurrency.

Stdlib-only by design (the container has no web framework; the reference
counterpart is infrastructure, not analytics).  The same handler mounts
behind any production WSGI/ASGI runner unchanged.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import TimeoutError as FutureTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from killrweather_spark.api.serving import AsyncWeatherEngine

ASK_TIMEOUT_S = 5.0  # AggregationActor.scala:30 — the reference's ask SLA
MAX_BODY = 64 * 1024  # requests are key lookups; anything bigger is abuse

# request name → (engine method, required args, optional args w/ defaults).
# Names follow the reference's WeatherApi message protocol
# (WeatherApi.scala); GetMonthlyTemperature and GetSkyConditionLookup are
# the two DECLARED-but-unimplemented ones the engine answers anyway.
REQUESTS: dict[str, tuple[str, tuple[str, ...], dict[str, Any]]] = {
    "GetWeatherStation": ("get_weather_station", ("wsid",), {}),
    "GetCurrentWeather": ("get_current_weather", ("wsid",), {}),
    "GetDailyTemperature": (
        "get_daily_temperature",
        ("wsid", "year", "month", "day"),
        {},
    ),
    "GetMonthlyTemperature": (
        "get_monthly_temperature",
        ("wsid", "year", "month"),
        {},
    ),
    "GetMonthlyHiLowTemperature": (
        "get_monthly_hilow_temperature",
        ("wsid", "year", "month"),
        {},
    ),
    "GetPrecipitation": ("get_precipitation", ("wsid", "year"), {}),
    "GetTopKPrecipitation": (
        "get_top_k_precipitation",
        ("wsid", "year"),
        {"k": 10},
    ),
    "GetSkyConditionLookup": ("get_sky_condition_lookup", ("code",), {}),
}


class _AskHandler(BaseHTTPRequestHandler):
    server_version = "KillrWeatherSpark/1"
    timeout = 30  # socket read bound: a stalled sender can't pin a thread

    def do_POST(self) -> None:  # noqa: N802 — http.server API
        if self.path != "/ask":
            self._reply(404, {"error": "unknown path; POST /ask"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length > MAX_BODY:
                self._reply(413, {"error": f"body > {MAX_BODY} bytes"})
                return
            payload = json.loads(self.rfile.read(length) or b"{}")
            name = payload.get("request")
            spec = REQUESTS.get(name)
            if spec is None:
                self._reply(
                    400,
                    {
                        "error": f"unknown request {name!r}",
                        "known": sorted(REQUESTS),
                    },
                )
                return
            method, required, optional = spec
            args = dict(payload.get("args") or {})
            missing = [a for a in required if a not in args]
            unknown = [
                a for a in args if a not in required and a not in optional
            ]
            if missing or unknown:
                self._reply(
                    400,
                    {
                        "error": "bad args",
                        "missing": missing,
                        "unknown": unknown,
                    },
                )
                return
            fut = self.server.aengine.submit(  # type: ignore[attr-defined]
                lambda e: getattr(e, method)(**args)
            )
            try:
                rows = fut.result(timeout=ASK_TIMEOUT_S)
            except FutureTimeout:
                # the reference's AskTimeoutException, as a status code
                self._reply(
                    504, {"error": f"ask timed out after {ASK_TIMEOUT_S}s"}
                )
                return
            self._reply(
                200,
                {
                    "request": name,
                    "n": len(rows),
                    "rows": [r.asDict(recursive=True) for r in rows],
                },
            )
        except json.JSONDecodeError as e:
            self._reply(400, {"error": f"bad JSON: {e}"})
        except Exception as e:  # noqa: BLE001 — a bad ask must not kill the thread
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    def _reply(self, code: int, body: dict) -> None:
        data = json.dumps(body, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt: str, *args) -> None:  # quiet test output
        pass


class WeatherHttpServer:
    """The network face of the engine: bind, serve on a daemon thread,
    answer the eight-request protocol until closed.

    ``port=0`` binds an ephemeral port (tests); production passes a fixed
    one.  The server owns no Spark state — it borrows the caller's
    :class:`AsyncWeatherEngine`, whose FAIR pool remains the single
    concurrency gate."""

    def __init__(
        self,
        aengine: AsyncWeatherEngine,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self._httpd = ThreadingHTTPServer((host, port), _AskHandler)
        self._httpd.aengine = aengine  # type: ignore[attr-defined]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever,
            name="weather-http",
            daemon=True,
        )

    @property
    def address(self) -> tuple[str, int]:
        return self._httpd.server_address[:2]

    def start(self) -> "WeatherHttpServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._thread.join(timeout=10)
        self._httpd.server_close()

    def __enter__(self) -> "WeatherHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.close()
