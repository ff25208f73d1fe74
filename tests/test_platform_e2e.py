"""Whole-platform integration: the reference's §3 lifecycle in one test.

Generator -> gzip JSONL archive (Kafka-Connect layout) -> engine:
  batch:  archive scan -> hourly job -> Redis JSON documents (3.1)
  stream: same events -> alert path -> severity (3.2)
          -> slot-state materialized view (3.3)
  weekly: time series + revenue-by-type doc (3.4)
Every output honors the dashboard key contracts the reference serves.
"""

from __future__ import annotations

import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.datagen.parking import generate, to_spark
from inde1_spark.jobs import run_hourly_job, run_weekly_job
from inde1_spark.schemas import PARKING_EVENT_WIRE
from inde1_spark.sources.readers import (
    flatten_parking_events,
    read_parking_events_json,
)
from inde1_spark.streaming.pipelines import (
    RedisJsonSink,
    RedisTimeSeriesSink,
    SlotStateSink,
    alert_stream,
    run_stream_once,
    with_severity,
)

FIXTURE = generate(n_sessions=250, seed=29)


def _wire(e):
    return {
        "eventType": e["event_type"],
        "timestamp": e["ts"].strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z",
        "vehicle": {"licensePlate": e["license_plate"],
                    "vehicleType": e["vehicle_type"], "color": e["color"]},
        "parking": {"parkingLotId": e["parking_lot_id"],
                    "parkingSpotId": e["parking_spot_id"],
                    "isSlotHandicapped": e["is_slot_handicapped"]},
        **({"duration": e["duration_ms"]} if e["duration_ms"] is not None else {}),
    }


def test_platform_end_to_end(spark, tmp_path):
    # --- archive (srvc-store): gzip JSONL in yyyy/MM/dd/HH dirs ---
    root = tmp_path / "topics" / "parking-event-topic"
    by_hour: dict[tuple, list] = {}
    for e in FIXTURE.events:
        by_hour.setdefault((e["ts"].year, e["ts"].month, e["ts"].day, e["ts"].hour), []).append(e)
    for (y, m, d, h), chunk in by_hour.items():
        p = root / f"{y:04d}" / f"{m:02d}" / f"{d:02d}" / f"{h:02d}"
        p.mkdir(parents=True, exist_ok=True)
        with gzip.open(p / "part-000.json.gz", "wt") as f:
            f.write("\n".join(json.dumps(_wire(e)) for e in chunk))

    # --- batch lifecycle (3.1): scan -> hourly documents ---
    events = read_parking_events_json(spark, f"{root}/*/*/*/*/*.json.gz").cache()
    assert events.count() == len(FIXTURE.events)
    jsink = RedisJsonSink()
    n_docs = run_hourly_job(events, "2025-06-01 00:00:00", "2025-06-08 00:00:00", jsink)
    assert n_docs == len(by_hour)  # one document per archived hour
    doc = json.loads(next(iter(jsink.store.values())))
    assert {"nbr_entries", "nbr_exit", "occupancy", "revenue_simulation",
            "vehicle_types"} <= set(doc)

    # --- streaming lifecycle (3.2 + 3.3): alerts + slot state ---
    _, users, _ = to_spark(spark, FIXTURE)
    # the stream consumes the SAME nested wire archive the batch path reads
    stream = flatten_parking_events(
        spark.readStream.schema(PARKING_EVENT_WIRE).json(f"{root}/*/*/*/*")
    )
    alerts: list = []
    q = (
        with_severity(alert_stream(stream, users))
        .writeStream.foreachBatch(lambda df, _id: alerts.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck_alerts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert alerts and all(a["severity"] in ("HIGH", "MEDIUM") for a in alerts)

    slot_sink = SlotStateSink()
    run_stream_once(stream, slot_sink, str(tmp_path / "ck_slots"))
    snap = slot_sink.snapshot()
    assert snap and all("-" in k for k in snap)

    # --- weekly lifecycle (3.4): dashboards' TS + JSON keys ---
    tsink = RedisTimeSeriesSink()
    doc = run_weekly_job(events, "2025-22", "2025-06-01 00:00:00",
                         "2025-06-08 00:00:00", tsink, jsink)
    assert doc
    assert tsink.ts_range("parking-stats:weekly:2025-22:entries")
    assert "parking-stats:weekly:2025-22:revenue-by-type" in jsink.store

    # cross-check: stream-side alert count equals batch detection on the
    # same archive (batch/stream symmetry through the real file formats)
    from inde1_spark.operators.parking import detect_violations

    assert len(alerts) == detect_violations(events, users).count()
