"""Kafka value parsing + schema evolution handling."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.streaming.pipelines import parse_kafka_value, with_severity
from inde1_spark.sources.readers import read_parking_events_json


def test_parse_kafka_value_and_severity(spark):
    """S1 parse core on a static frame (no broker needed): good JSON parses,
    malformed/null values drop, severity mapping attaches."""
    good = {
        "eventType": "PARKING_ENTRY",
        "timestamp": "2025-06-26T14:35:22Z",
        "vehicle": {"licensePlate": "AB-123-CD", "vehicleType": "car", "color": "red"},
        "parking": {"parkingLotId": "lot-01", "parkingSpotId": "41",
                    "isSlotHandicapped": True},
    }
    rows = [
        (json.dumps(good).encode(),),
        (b"{not json",),
        (None,),
    ]
    raw = spark.createDataFrame(rows, "value binary")
    parsed = parse_kafka_value(raw).collect()
    assert len(parsed) == 1
    r = parsed[0]
    assert r["license_plate"] == "AB-123-CD" and r["is_slot_handicapped"] is True
    assert r["ts"] is not None

    alerts = spark.createDataFrame(
        [("AB-123-CD", "41", "lot-01", "unauthorized_user"),
         ("ZZ-999-ZZ", "3", "lot-02", "unknown_user")],
        "vehicle_plate string, spot_id string, lot_id string, violation_type string",
    )
    sev = {r["vehicle_plate"]: (r["severity"], r["message"])
           for r in with_severity(alerts).collect()}
    assert sev["AB-123-CD"][0] == "HIGH"
    assert sev["ZZ-999-ZZ"][0] == "MEDIUM"
    assert "lot-01/41" in sev["AB-123-CD"][1]


def test_schema_evolution_rich_events(spark, tmp_path):
    """SURVEY §1.2: the docs describe a richer aspirational event (driver,
    vehicle.brand, parking.zone/geo) the code never produces. The engine's
    explicit-schema read must tolerate rich events (extra fields ignored)
    and old events (missing fields null) in the same archive."""
    old = {
        "eventType": "PARKING_EXIT",
        "timestamp": "2025-06-26T15:00:00Z",
        "vehicle": {"licensePlate": "CD-456-EF", "vehicleType": "suv", "color": "blue"},
        "parking": {"parkingLotId": "lot-02", "parkingSpotId": "7",
                    "isSlotHandicapped": False},
        "duration": 60000,
    }
    rich = {
        **old,
        "timestamp": "2025-06-26T15:05:00Z",
        "driver": {"id": "d1", "name": "Sam"},
        "vehicle": {**old["vehicle"], "brand": "Make", "model": "X"},
        "parking": {**old["parking"], "zone": "Blue Zone",
                    "entryGateId": "g1", "geo": {"lat": 1.0, "lon": 2.0}},
    }
    p = tmp_path / "mixed.json"
    p.write_text(json.dumps(old) + "\n" + json.dumps(rich))
    df = read_parking_events_json(spark, str(p))
    rows = df.orderBy("ts").collect()
    assert len(rows) == 2  # rich event's extra fields ignored, not fatal
    assert rows[0]["duration_ms"] == 60000
    assert rows[1]["parking_lot_id"] == "lot-02"
    assert set(df.columns) == {
        "event_type", "ts", "license_plate", "vehicle_type", "color",
        "parking_lot_id", "parking_spot_id", "is_slot_handicapped", "duration_ms",
    }
