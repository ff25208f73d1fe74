"""Parking-domain tests: generator laws + operator semantics.

The generator-law tests port GeneratorServiceTest.scala:16-162 as data
invariants (SURVEY.md §5); the operator tests check reference semantics on
the fixture, several against DuckDB SQL on the same data.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.datagen.parking import LOTS, generate, to_spark
from inde1_spark.operators import parking as P
from inde1_spark.schemas import EVENT_ENTRY, EVENT_EXIT
from tests.conftest import compare_frames

FIXTURE = generate(n_sessions=600, seed=42)


@pytest.fixture(scope="module")
def parking(spark):
    events, users, caps = to_spark(spark, FIXTURE)
    return events.cache(), users.cache(), caps.cache()


# --- generator laws (GeneratorServiceTest ports) ---------------------------

def test_plate_format():
    pat = re.compile(r"^[A-Z]{2}-[0-9]{3}-[A-Z]{2}$")
    for e in FIXTURE.events:
        assert pat.match(e["license_plate"]), e["license_plate"]


def test_sessionful_and_no_double_booking():
    """Replay the event log: every non-orphan EXIT closes exactly the open
    ENTRY for its (plate, lot, spot); a spot is never double-ENTERed."""
    open_spots: dict[tuple, str] = {}
    orphan_exits = 0
    for e in FIXTURE.events:
        key = (e["parking_lot_id"], e["parking_spot_id"])
        if e["event_type"] == EVENT_ENTRY:
            assert key not in open_spots, f"double booking at {key}"
            open_spots[key] = e["license_plate"]
        elif e["event_type"] == EVENT_EXIT:
            if key in open_spots:
                assert open_spots.pop(key) == e["license_plate"]
            else:
                orphan_exits += 1
    assert orphan_exits > 0  # fixture plants head-truncated sessions


def test_exit_carries_duration():
    for e in FIXTURE.events:
        if e["event_type"] == EVENT_EXIT:
            assert 5_000 <= e["duration_ms"] <= 20_000
        elif e["event_type"] == EVENT_ENTRY:
            assert e["duration_ms"] is None


def test_occupancy_never_negative_or_above_capacity():
    occupied: dict[str, set] = {lot: set() for lot in LOTS}
    for e in FIXTURE.events:
        lot, spot = e["parking_lot_id"], e["parking_spot_id"]
        if e["event_type"] == EVENT_ENTRY:
            occupied[lot].add(spot)
        elif e["event_type"] == EVENT_EXIT:
            occupied[lot].discard(spot)
        assert 0 <= len(occupied[lot]) <= len(LOTS[lot][0])


def test_fixture_has_junk_and_unknown_plates():
    types = {e["event_type"] for e in FIXTURE.events}
    assert types - {EVENT_ENTRY, EVENT_EXIT}, "junk event types expected"
    user_plates = {u["parking_plate"] for u in FIXTURE.users}
    event_plates = {e["license_plate"] for e in FIXTURE.events}
    assert event_plates - user_plates, "some plates must be unknown"


# --- operator semantics ------------------------------------------------------

def _duck(events_df):
    con = duckdb.connect()
    con.register("events_pd", events_df.toPandas())
    con.execute("CREATE VIEW pevents AS SELECT * FROM events_pd")
    return con


def test_hourly_stats_document_shape(parking):
    events, _, _ = parking
    stats = P.hourly_stats(events)
    rows = stats.collect()
    assert rows, "stats must not be empty"
    r = rows[0].asDict()
    assert set(r) == {
        "date", "hour", "nbr_entries", "nbr_exit", "occupancy",
        "revenue_simulation", "vehicle_types",
    }
    for row in rows:
        assert all(v >= 0 for v in row["occupancy"].values())
        total_occ = sum(row["occupancy"].values())
        assert row["revenue_simulation"] == pytest.approx(total_occ * 2.0)


def test_hourly_counts_vs_duckdb(parking):
    events, _, _ = parking
    got = (
        P.hourly_stats(events)
        .selectExpr("date", "hour", "nbr_entries", "nbr_exit")
        .toPandas()
    )
    con = _duck(events)
    want = con.execute(
        """
        SELECT strftime(ts, '%Y-%m-%d') AS date, CAST(hour(ts) AS INT) AS hour,
               CAST(count(*) FILTER (WHERE event_type = 'PARKING_ENTRY') AS BIGINT) AS nbr_entries,
               CAST(count(*) FILTER (WHERE event_type = 'PARKING_EXIT') AS BIGINT) AS nbr_exit
        FROM pevents WHERE event_type IN ('PARKING_ENTRY', 'PARKING_EXIT')
        GROUP BY 1, 2
        """
    ).fetchdf()
    assert not compare_frames(got, want)


def test_session_durations_match_generator(parking):
    events, _, _ = parking
    sessions = P.session_durations(events).collect()
    assert sessions
    for s in sessions:
        # analytic duration equals the generator's planted duration
        assert abs(s["duration_min"] * 60_000 - s["duration_ms"]) < 1.0
        assert s["exit_ts"] > s["entry_ts"]


def test_occupancy_asof_matches_replay(parking):
    events, _, _ = parking
    # replay in python to an arbitrary mid-fixture instant
    cutoff = sorted(e["ts"] for e in FIXTURE.events)[len(FIXTURE.events) // 2]
    occupied: dict[str, set] = {}
    for e in sorted(FIXTURE.events, key=lambda x: x["ts"]):
        if e["ts"] > cutoff or e["event_type"] not in (EVENT_ENTRY, EVENT_EXIT):
            continue
        key = (e["parking_lot_id"], e["parking_spot_id"])
        if e["event_type"] == EVENT_ENTRY:
            occupied.setdefault(e["parking_lot_id"], set()).add(key)
        else:
            occupied.get(e["parking_lot_id"], set()).discard(key)
    want = {lot: len(s) for lot, s in occupied.items() if s}
    got = {
        r["parking_lot_id"]: r["occupied_spots"]
        for r in P.occupancy_asof(
            events, cutoff.strftime("%Y-%m-%d %H:%M:%S.%f")
        ).collect()
    }
    assert got == want


def test_a4_and_a5_occupancy_disagree(spark):
    """FIXTURES.md law 7: a session straddling the hour boundary makes the
    clamped hourly count (A4) and the exact state machine (A5) diverge —
    both are reference semantics and both are kept, deliberately apart.

    Session ENTRY 10:50 -> EXIT 11:10. Within hour 11 A4 sees 0 entries and
    1 exit -> clamp to 0; but at 11:05 the spot IS occupied (A5 = 1).
    """
    from datetime import datetime

    rows = [
        ("PARKING_ENTRY", datetime(2025, 6, 1, 10, 50), "AB-123-CD", "car",
         "red", "lot-01", "20", False, None),
        ("PARKING_EXIT", datetime(2025, 6, 1, 11, 10), "AB-123-CD", "car",
         "red", "lot-01", "20", False, 1_200_000),
    ]
    from inde1_spark.schemas import PARKING_EVENT_FLAT

    events = spark.createDataFrame(rows, PARKING_EVENT_FLAT)
    a4 = {
        (r["date"], r["hour"]): r["occupancy"]
        for r in P.occupancy_clamped_hourly(events).collect()
    }
    assert a4[("2025-06-01", 11)] == 0  # clamped: exit without entry that hour
    a5 = P.occupancy_asof(events, "2025-06-01 11:05:00").collect()
    assert a5 and a5[0]["occupied_spots"] == 1  # but the spot is occupied


def test_detect_violations(parking):
    events, users, _ = parking
    alerts = P.detect_violations(events, users).collect()
    assert alerts
    user_map = {u["parking_plate"]: u["handicapped"] for u in FIXTURE.users}
    for a in alerts:
        assert a["violation_type"] in ("unknown_user", "unauthorized_user")
        if a["violation_type"] == "unknown_user":
            assert a["vehicle_plate"] not in user_map
        else:
            assert user_map[a["vehicle_plate"]] is False
    # completeness: every handicapped-slot ENTRY by a non-authorized plate alerts
    expected = sum(
        1
        for e in FIXTURE.events
        if e["event_type"] == EVENT_ENTRY
        and e["is_slot_handicapped"]
        and not user_map.get(e["license_plate"], False)
    )
    assert len(alerts) == expected


def test_slot_state_last_event_wins(parking):
    events, _, _ = parking
    state = {r["slot_key"]: r for r in P.slot_state(events).collect()}
    last: dict[str, dict] = {}
    for e in sorted(
        (e for e in FIXTURE.events if e["event_type"] in (EVENT_ENTRY, EVENT_EXIT)),
        key=lambda x: x["ts"],
    ):
        last[f"{e['parking_lot_id']}-{e['parking_spot_id']}"] = e
    assert set(state) == set(last)
    for key, e in last.items():
        assert state[key]["occupied"] == (e["event_type"] == EVENT_ENTRY)
        if e["event_type"] == EVENT_ENTRY:
            assert state[key]["plate"] == e["license_plate"]


def test_occupancy_percent_bounds(parking):
    events, _, caps = parking
    cutoff = sorted(e["ts"] for e in FIXTURE.events)[-1]
    rows = P.occupancy_percent(
        events, caps, cutoff.strftime("%Y-%m-%d %H:%M:%S.%f")
    ).collect()
    assert {r["parking_lot_id"] for r in rows} == set(LOTS)
    for r in rows:
        assert 0.0 <= r["occupancy_pct"] <= 100.0


def test_revenue_by_duration(parking):
    events, _, _ = parking
    rows = P.revenue_by_duration(events).collect()
    assert rows
    for r in rows:
        # both sides independently rounded to 4 decimals
        assert r["revenue"] == pytest.approx(r["avg_spent"] * r["n_sessions"], abs=0.0001 * r["n_sessions"] + 1e-4)
