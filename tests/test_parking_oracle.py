"""DuckDB oracle checks for parking-domain operators on the fixture.

The driver's gate covers the testdata mapping; these pin the SAME
determinism standard on the reference-domain operators (adjacency session
pairing, clamped hourly occupancy, duration-model revenue) against DuckDB
SQL over the identical fixture rows.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.datagen.parking import generate, to_spark
from inde1_spark.operators import parking as P
from tests.conftest import compare_frames

FIXTURE = generate(n_sessions=500, seed=23)


@pytest.fixture(scope="module")
def env(spark):
    events, users, caps = to_spark(spark, FIXTURE)
    con = duckdb.connect()
    con.register("events_pd", events.toPandas())
    con.execute("CREATE VIEW pevents AS SELECT * FROM events_pd")
    return events.cache(), con


def test_session_durations_vs_duckdb(env):
    events, con = env
    got = (
        P.session_durations(events)
        .selectExpr(
            "license_plate", "parking_lot_id", "parking_spot_id", "vehicle_type",
            "date_format(entry_ts, 'yyyy-MM-dd HH:mm:ss.SSS') AS entry_s",
            "date_format(exit_ts, 'yyyy-MM-dd HH:mm:ss.SSS') AS exit_s",
            "duration_ms",
        )
        .toPandas()
    )
    want = con.execute(
        """
        WITH flagged AS (
          SELECT license_plate, parking_lot_id, parking_spot_id, vehicle_type,
                 event_type, ts, duration_ms,
                 lag(event_type) OVER w AS prev_type,
                 lag(ts) OVER w AS prev_ts
          FROM pevents
          WHERE event_type IN ('PARKING_ENTRY', 'PARKING_EXIT')
          WINDOW w AS (PARTITION BY license_plate, parking_lot_id, parking_spot_id ORDER BY ts)
        )
        SELECT license_plate, parking_lot_id, parking_spot_id, vehicle_type,
               strftime(prev_ts, '%Y-%m-%d %H:%M:%S.%g') AS entry_s,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS exit_s,
               duration_ms
        FROM flagged
        WHERE event_type = 'PARKING_EXIT' AND prev_type = 'PARKING_ENTRY'
        """
    ).fetchdf()
    assert not compare_frames(got, want)


def test_occupancy_clamped_hourly_vs_duckdb(env):
    events, con = env
    got = P.occupancy_clamped_hourly(events).toPandas()
    want = con.execute(
        """
        SELECT strftime(ts, '%Y-%m-%d') AS date, CAST(hour(ts) AS INT) AS hour,
               parking_lot_id,
               GREATEST(0, CAST(SUM(CASE WHEN event_type = 'PARKING_ENTRY' THEN 1 ELSE -1 END) AS BIGINT)) AS occupancy
        FROM pevents WHERE event_type IN ('PARKING_ENTRY', 'PARKING_EXIT')
        GROUP BY 1, 2, 3
        """
    ).fetchdf()
    assert not compare_frames(got, want)


def test_revenue_by_duration_vs_duckdb(env):
    events, con = env
    got = P.revenue_by_duration(events).toPandas()
    want = con.execute(
        """
        WITH flagged AS (
          SELECT license_plate, parking_lot_id, parking_spot_id, vehicle_type,
                 event_type, ts,
                 lag(event_type) OVER w AS prev_type,
                 lag(ts) OVER w AS prev_ts
          FROM pevents
          WHERE event_type IN ('PARKING_ENTRY', 'PARKING_EXIT')
          WINDOW w AS (PARTITION BY license_plate, parking_lot_id, parking_spot_id ORDER BY ts)
        ),
        sessions AS (
          SELECT vehicle_type, prev_ts AS entry_ts,
                 (epoch_ms(ts) - epoch_ms(prev_ts)) / 60000.0 AS duration_min
          FROM flagged
          WHERE event_type = 'PARKING_EXIT' AND prev_type = 'PARKING_ENTRY'
        )
        SELECT strftime(entry_ts, '%Y-%m-%d') AS day, vehicle_type,
               ROUND(CAST(SUM(CAST(duration_min * 2.0 / 60.0 AS DECIMAL(18,8))) AS DOUBLE), 4) AS revenue,
               ROUND(CAST(SUM(CAST(duration_min * 2.0 / 60.0 AS DECIMAL(18,8))) AS DOUBLE) / COUNT(*), 4) AS avg_spent,
               count(*) AS n_sessions
        FROM sessions GROUP BY 1, 2
        """
    ).fetchdf()
    assert not compare_frames(got, want)
