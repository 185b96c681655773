"""Demo parity: the reference's feeder + 6-query client loop, Spark-first.

Reference: ``KafkaDataIngestionApp`` feeds ``data/load/*.csv.gz`` lines into
Kafka; ``KillrWeatherClientApp.scala:93-127`` then fires six queries every
2 s: current weather, daily temperature, monthly hi/low, precipitation,
top-k precipitation, station lookup.

Here the feeder POSTs the same ``.csv.gz`` files through the S8 HTTP
endpoint (``streaming/http_ingest.py`` ≙ the akka-http ``/weather/data``
route), which lands them in the staging dir the streaming file source reads
(≙ the Kafka topic; point ``kafka_lines`` at a broker to switch), and the
client loop — sync then async/overlapped — runs against the resulting raw
table through ``WeatherEngine``.

Run: ``python scripts/demo.py [n_loops]``
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from killrweather_spark.api.engine import WeatherEngine  # noqa: E402
from killrweather_spark.session import get_session  # noqa: E402
from killrweather_spark.streaming.pipeline import (  # noqa: E402
    file_lines,
    parsed_observations,
    start_ingest,
)

DATA = "/root/reference/data/load"
WSID = "724940:23234"  # KillrWeatherClientApp's sample station


def main() -> None:
    n_loops = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session(app_name="killrweather_demo")

    # ---- feeder (≙ KafkaDataIngestionApp): POST the csv.gz files through
    # the S8 HTTP endpoint; each upload lands atomically in the staging dir
    # the stream's file source reads (≙ publishing the lines to the topic)
    import http.client

    from killrweather_spark.streaming.http_ingest import (
        FEED_HEADER,
        INGEST_PATH,
        IngestHttpServer,
    )

    incoming = tempfile.mkdtemp(prefix="kw_incoming_")
    with IngestHttpServer(incoming) as srv:
        for gz in Path(DATA).glob("*.csv.gz"):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
            conn.request(
                "POST",
                INGEST_PATH,
                body=gz.read_bytes(),
                headers={FEED_HEADER: gz.name, "Content-Encoding": "gzip"},
            )
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            print(f"[feeder] POST {gz.name}: {resp.read().decode().strip()} lines")
            conn.close()
    work = tempfile.mkdtemp(prefix="kw_tables_")
    raw_path, precip_path = f"{work}/raw", f"{work}/daily_precip"

    t0 = time.perf_counter()
    obs = parsed_observations(file_lines(spark, incoming))
    q1, q2 = start_ingest(
        obs, raw_path, precip_path, f"{work}/ckpt", trigger={"availableNow": True}
    )
    q1.awaitTermination()
    q2.awaitTermination()
    raw = spark.read.parquet(raw_path)
    n = raw.count()
    dt = time.perf_counter() - t0
    print(f"[feeder] ingested {n} observations in {dt:.1f}s ({n / dt:.0f} rows/s; "
          f"reference SLA floor: 133 rows/s)")

    # ---- client loop (≙ KillrWeatherClientApp.scala:93-127) --------------
    from killrweather_spark.model.schemas import WEATHER_STATION

    stations = spark.read.schema(WEATHER_STATION).csv(
        "/root/reference/data/weather_stations.csv"
    )
    engine = WeatherEngine(spark, raw, stations=stations)
    engine.refresh_daily_tiers()
    for i in range(n_loops):
        t = time.perf_counter()
        cw = engine.get_current_weather(WSID).first()
        daily = engine.get_daily_temperature(WSID, 2008, 6, 15).first()
        hilow = engine.get_monthly_hilow_temperature(WSID, 2008, 6).first()
        precip = engine.get_precipitation(WSID, 2008).first()
        topk = engine.get_top_k_precipitation(WSID, 2008, 10).first()
        sky = engine.get_sky_condition_lookup(int(cw["sky_condition"]) % 20).first()
        loop_s = time.perf_counter() - t
        print(
            f"[loop {i}] {loop_s:.2f}s (budget 5s/query) | "
            f"current={cw['year']}-{cw['month']:02d}-{cw['day']:02d}T{cw['hour']:02d} "
            f"{cw['temperature']}°C | daily mean={daily['mean']:.2f} "
            f"stdev={daily['stdev']:.2f} | month hi/lo={hilow['high']}/{hilow['low']} | "
            f"annual precip={precip['total']:.1f} | top10[0]={topk['top'][0]:.1f} | "
            f"sky='{sky['condition'][:30]}'"
        )
        assert loop_s < 30.0, "6-query loop blew the reference's per-query budget"

    # ---- async client loop (≙ collectAsync + pipeTo overlapping queries,
    # TemperatureActor.scala:59-60; client cadence KillrWeatherClientApp:56-60)
    from concurrent.futures import wait

    from killrweather_spark.api.serving import AsyncWeatherEngine

    with AsyncWeatherEngine(engine) as aeng:
        t = time.perf_counter()
        futures = []
        for _ in range(3):  # three clients, all 18 queries in flight at once
            futures.extend(aeng.client_loop(WSID, 2008, 6, 15))
        wait(futures)
        rows = [f.result() for f in futures]
        dt = time.perf_counter() - t
        print(
            f"[async] 3 clients × 6 queries overlapped in {dt:.2f}s "
            f"(FAIR pool; sequential budget would be {len(rows) * 5:.0f}s); "
            f"all non-empty: {all(len(r) >= 1 for r in rows)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
