"""Explicit schemas — never infer on the hot path.

The reference declares its read schema by hand (StructType of two nested
structs, apps/srvc-stats/.../MainHourly.scala:29-57) and parses JSON against
case classes everywhere else (SURVEY.md §1.4). We do the same: one StructType
per record type, used with ``from_json`` / ``spark.read.schema`` so a 100 TB
scan never pays a JSON-inference pass.

Timestamps become real TimestampType (the reference compares ISO-8601 strings
lexicographically, e.g. MainDaily.scala:86,133 — order-correct but fragile).
Durations are standardized to milliseconds (the reference mixes ms and
minutes, SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wire form of a parking event as archived by the reference's Kafka->S3 sink:
# nested JSON {eventType, timestamp, vehicle{..}, parking{..}, duration}
# (apps/srvc-io/src/main/scala/srvc-io/entities/ParkingEvent.scala:3-21).
PARKING_EVENT_WIRE = StructType(
    [
        StructField("eventType", StringType()),
        StructField("timestamp", StringType()),  # ISO-8601 UTC instant
        StructField(
            "vehicle",
            StructType(
                [
                    StructField("licensePlate", StringType()),
                    StructField("vehicleType", StringType()),
                    StructField("color", StringType()),
                ]
            ),
        ),
        StructField(
            "parking",
            StructType(
                [
                    StructField("parkingLotId", StringType()),
                    StructField("parkingSpotId", StringType()),
                    StructField("isSlotHandicapped", BooleanType()),
                ]
            ),
        ),
        StructField("duration", LongType()),  # milliseconds
    ]
)

# Flat analytics form (apps/srvc-stats/.../ParkingEventSpark.scala:3-13),
# with a real timestamp column.
PARKING_EVENT_FLAT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("license_plate", StringType()),
        StructField("vehicle_type", StringType()),
        StructField("color", StringType()),
        StructField("parking_lot_id", StringType()),
        StructField("parking_spot_id", StringType()),
        StructField("is_slot_handicapped", BooleanType()),
        StructField("duration_ms", LongType()),
    ]
)

EVENT_ENTRY = "PARKING_ENTRY"
EVENT_EXIT = "PARKING_EXIT"

# Users dimension (apps/repo-account/.../UserModel.scala:6-14).
USER = StructType(
    [
        StructField("parking_plate", StringType()),
        StructField("username", StringType()),
        StructField("email", StringType()),
        StructField("first_name", StringType()),
        StructField("last_name", StringType()),
        StructField("created_at", LongType()),  # epoch ms
        StructField("handicapped", BooleanType()),
    ]
)

# Alert event (apps/srvc-alert/.../AlertEvent.scala:3-9).
ALERT_EVENT = StructType(
    [
        StructField("vehicle_plate", StringType()),
        StructField("spot_id", StringType()),
        StructField("lot_id", StringType()),
        StructField("violation_type", StringType()),  # unauthorized_user|unknown_user
        StructField("ts", TimestampType()),
    ]
)

# Lot capacity dimension (doc/schemas/srvc_stats.json:6-31; slot ranges from
# apps/srvc-io/.env:14).
LOT_CAPACITY = StructType(
    [
        StructField("parking_lot_id", StringType()),
        StructField("capacity", LongType()),
        StructField("zone", StringType()),
    ]
)

# Driver testdata tables (/root/testdata/sf*, TESTDATA.md). Parquet carries
# its own schema; these names are the contract used across operators.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
