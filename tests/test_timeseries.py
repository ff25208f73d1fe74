"""Planted-data semantics for the time-series grid resampler."""

from __future__ import annotations

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.operators.analytics import resample_ffill


def test_resample_ffill_fills_gaps_and_keeps_leading_nulls(spark):
    T = datetime(2024, 3, 1, 5, 0, 0)
    rows = [
        # type 'a': hours 05 and 08 observed -> 06,07 carry 05's value
        (1, datetime(2024, 3, 1, 5, 10), 100, "a", 1.5, "{}"),
        (2, datetime(2024, 3, 1, 5, 40), 100, "a", 2.5, "{}"),  # later in hour wins
        (3, datetime(2024, 3, 1, 8, 5), 100, "a", 9.0, "{}"),
        # type 'b': first appears at hour 07 -> 05,06 stay null
        (4, datetime(2024, 3, 1, 7, 30), 100, "b", 4.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {
        (r["event_type"], r["hour_ts"]): r for r in resample_ffill(events).collect()
    }
    assert len(out) == 8  # 4-hour span (05..08) x 2 types: dense grid
    a = lambda h: out[("a", f"2024-03-01 0{h}:00:00")]
    b = lambda h: out[("b", f"2024-03-01 0{h}:00:00")]
    assert a(5)["value_ffill"] == 2.5 and a(5)["observed"]  # last in hour
    assert a(6)["value_ffill"] == 2.5 and not a(6)["observed"]  # filled
    assert a(7)["value_ffill"] == 2.5 and not a(7)["observed"]
    assert a(8)["value_ffill"] == 9.0 and a(8)["observed"]
    assert b(5)["value_ffill"] is None and not b(5)["observed"]  # leading null
    assert b(6)["value_ffill"] is None
    assert b(7)["value_ffill"] == 4.0 and b(7)["observed"]
    assert b(8)["value_ffill"] == 4.0 and not b(8)["observed"]
