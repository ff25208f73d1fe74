"""Deterministic parking-event fixture generator (seed 42).

Reproduces the reference generator's laws (GeneratorService.scala:11-75 and
its tests, GeneratorServiceTest.scala:16-162; see FIXTURES.md §1):

1. sessionful: every ENTRY is followed by exactly one EXIT for the same
   (plate, lot, spot) after ``duration`` ms; the EXIT carries the session
   duration;
2. no double booking: a (lot, spot) is never re-ENTERed before its EXIT;
3. plate uniqueness among concurrently active sessions;
4. plates match ``[A-Z]{2}-[0-9]{3}-[A-Z]{2}`` (the ``aa-ddd-aa`` DSL,
   GeneratorService.scala:143-162);
5. lots/slots/handicap ranges/colors/types/duration bounds follow
   apps/srvc-io/.env:13-24 (lot-01..03, handicap ranges per lot,
   duration 5000-20000 ms).

Plus the fixture-only extras FIXTURES.md asks for: events straddle hour
boundaries (so A4 clamped-count occupancy and A5 state-machine occupancy
disagree), some EXITs have no ENTRY (head-truncated window), some event rows
are junk (unknown eventType) to exercise the P1 filter, and ~20% of plates
are absent from the users table (unknown_user alerts).

Pure Python + random.Random(seed) — runs on the driver once per test
session, a few thousand rows; the 100 TB ingest path is Kafka, not this.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

LOTS = {
    "lot-01": (range(10, 51), {10, 11, 12, *range(40, 51)}),
    "lot-02": (range(0, 101), {3}),
    "lot-03": (range(0, 151), {1}),
}
VEHICLE_TYPES = ("car", "truck", "motorcycle", "van", "suv")
COLORS = (
    "red", "blue", "black", "white", "gray",
    "silver", "green", "yellow", "orange", "purple",
)
DURATION_MS = (5_000, 20_000)
EVENT_ENTRY = "PARKING_ENTRY"
EVENT_EXIT = "PARKING_EXIT"
BASE_TS = datetime(2025, 6, 1, 0, 0, 0, tzinfo=timezone.utc)


@dataclass
class ParkingFixture:
    events: list[dict]  # flat analytics rows (schemas.PARKING_EVENT_FLAT)
    users: list[dict]  # schemas.USER rows
    capacities: list[dict]  # schemas.LOT_CAPACITY rows


def _plate(rng: random.Random) -> str:
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return (
        f"{rng.choice(letters)}{rng.choice(letters)}-"
        f"{rng.randint(0, 999):03d}-"
        f"{rng.choice(letters)}{rng.choice(letters)}"
    )


def generate(
    n_sessions: int = 1000,
    seed: int = 42,
    orphan_exit_rate: float = 0.05,
    junk_rate: float = 0.02,
    user_coverage: float = 0.8,
) -> ParkingFixture:
    rng = random.Random(seed)
    plates = sorted({_plate(rng) for _ in range(max(50, n_sessions // 10))})

    occupied: set[tuple[str, str]] = set()
    active_plates: set[str] = set()
    releases: list[tuple[datetime, tuple[str, str], str]] = []
    events: list[dict] = []
    now = BASE_TS

    def release_due(ts: datetime) -> None:
        for due, spot_key, plate in list(releases):
            if due <= ts:
                occupied.discard(spot_key)
                active_plates.discard(plate)
                releases.remove((due, spot_key, plate))

    made = 0
    while made < n_sessions:
        now += timedelta(milliseconds=rng.randint(500, 120_000))
        release_due(now)
        lot = rng.choice(sorted(LOTS))
        slots, handicap = LOTS[lot]
        spot = str(rng.choice(list(slots)))
        plate = rng.choice(plates)
        if (lot, spot) in occupied or plate in active_plates:
            continue  # no double booking / plate uniqueness (laws 2, 3)
        duration = rng.randint(*DURATION_MS)
        vehicle_type = rng.choice(VEHICLE_TYPES)
        color = rng.choice(COLORS)
        is_handicap = int(spot) in handicap
        entry_ts = now
        exit_ts = entry_ts + timedelta(milliseconds=duration)
        common = {
            "license_plate": plate,
            "vehicle_type": vehicle_type,
            "color": color,
            "parking_lot_id": lot,
            "parking_spot_id": spot,
            "is_slot_handicapped": is_handicap,
        }
        orphan = rng.random() < orphan_exit_rate
        if not orphan:
            events.append(
                {"event_type": EVENT_ENTRY, "ts": entry_ts, "duration_ms": None, **common}
            )
        events.append(
            {"event_type": EVENT_EXIT, "ts": exit_ts, "duration_ms": duration, **common}
        )
        occupied.add((lot, spot))
        active_plates.add(plate)
        releases.append((exit_ts, (lot, spot), plate))
        made += 1
        if rng.random() < junk_rate:
            events.append(
                {
                    "event_type": rng.choice(["HEARTBEAT", "LOT_MAINTENANCE"]),
                    "ts": now,
                    "duration_ms": None,
                    **common,
                }
            )

    events.sort(key=lambda e: (e["ts"], e["license_plate"], e["event_type"]))

    users = []
    for i, plate in enumerate(plates):
        if rng.random() > user_coverage:
            continue  # plates absent from users -> unknown_user alerts
        first, last = f"first{i}", f"last{i}"
        users.append(
            {
                "parking_plate": plate,
                "username": f"{first}.{last}{i:03d}",
                "email": f"{first}.{last}@example.com",
                "first_name": first,
                "last_name": last,
                "created_at": 1_640_995_200_000 + i * 86_400_000,
                "handicapped": rng.random() < 0.08,
            }
        )

    capacities = [
        {"parking_lot_id": lot, "capacity": len(slots), "zone": zone}
        for (lot, (slots, _)), zone in zip(
            sorted(LOTS.items()), ("Blue Zone", "Green Zone", "Red Zone")
        )
    ]
    return ParkingFixture(events=events, users=users, capacities=capacities)


def to_spark(spark, fixture: ParkingFixture):
    """Materialize the fixture as three DataFrames with the engine schemas."""
    from inde1_spark.schemas import LOT_CAPACITY, PARKING_EVENT_FLAT, USER

    events = spark.createDataFrame(
        [
            (
                e["event_type"],
                e["ts"].replace(tzinfo=None),
                e["license_plate"],
                e["vehicle_type"],
                e["color"],
                e["parking_lot_id"],
                e["parking_spot_id"],
                e["is_slot_handicapped"],
                e["duration_ms"],
            )
            for e in fixture.events
        ],
        PARKING_EVENT_FLAT,
    )
    users = spark.createDataFrame(
        [tuple(u.values()) for u in fixture.users], USER
    )
    caps = spark.createDataFrame(
        [tuple(c.values()) for c in fixture.capacities], LOT_CAPACITY
    )
    return events, users, caps
