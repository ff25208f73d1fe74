"""S1/S2 Kafka option plumbing — testable without a broker.

The container has no Kafka, so ``.start()`` never runs here; what CAN rot
silently is the wiring itself: topic names, option keys, key/value
serialization. These tests pin the built reader/writer config against the
reference's contract (srvc-io Main.scala:30-47 produces
parking-event-topic; srvc-alert ParkingEventConsumer.scala:24-53 consumes
it; AlertEventPublisher.scala:21-35 publishes alert-event-topic keyed by
plate).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.streaming.pipelines import (
    ALERT_EVENT_TOPIC,
    PARKING_EVENT_TOPIC,
    alert_kafka_payload,
    alerts_to_kafka_sink,
    kafka_sink_options,
    kafka_source_options,
)


def test_source_options_match_reference_contract():
    opts = kafka_source_options("broker-1:9092,broker-2:9092")
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "parking-event-topic",
        "startingOffsets": "latest",
    }
    assert PARKING_EVENT_TOPIC == "parking-event-topic"
    # backfill spelling
    assert kafka_source_options("b:9092", starting_offsets="earliest")[
        "startingOffsets"
    ] == "earliest"


def test_sink_options_match_reference_contract():
    assert kafka_sink_options("b:9092") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "alert-event-topic",
    }
    assert ALERT_EVENT_TOPIC == "alert-event-topic"


def test_alert_payload_key_and_json_value(spark):
    alerts = spark.createDataFrame(
        [("AB-123-CD", "s1", "lot-1", "unauthorized_user", "2024-03-01 08:30:05")],
        ["vehicle_plate", "spot_id", "lot_id", "violation_type", "ts_s"],
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    row = alert_kafka_payload(alerts).collect()[0]
    assert row["key"] == "AB-123-CD"  # plate = partition key, as the publisher
    doc = json.loads(row["value"])
    assert doc == {
        "vehicle_plate": "AB-123-CD",
        "spot_id": "s1",
        "lot_id": "lot-1",
        "violation_type": "unauthorized_user",
        "timestamp": "2024-03-01T08:30:05Z",
    }


def test_sink_writer_built_with_kafka_format_and_options(spark):
    """The un-started DataStreamWriter must carry format=kafka and the exact
    option map (introspected JVM-side; .start() needs a broker)."""
    stream = (
        spark.readStream.format("rate").load()
        .select(
            F.lit("AB-123-CD").alias("vehicle_plate"),
            F.lit("s1").alias("spot_id"),
            F.lit("lot-1").alias("lot_id"),
            F.lit("unknown_user").alias("violation_type"),
            F.col("timestamp").alias("ts"),
        )
    )
    writer = alerts_to_kafka_sink(stream, "b:9092")
    opts = writer._jwrite.extraOptions().toString()
    assert "topic -> alert-event-topic" in opts
    assert "kafka.bootstrap.servers -> b:9092" in opts
    assert writer._jwrite.toString() is not None  # built, never started
