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


def test_changepoint_meanshift_finds_planted_level_break(spark):
    from datetime import timedelta

    from inde1_spark.operators.analytics import changepoint_meanshift

    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    # type 'shift': 10 days at ~5.0, then 10 days at ~50.0 — split must land
    # on day 10 (the last low day); noise below the jump keeps argmax stable
    for d in range(20):
        for j in range(3):
            eid += 1
            level = 5.0 if d < 10 else 50.0
            rows.append(
                (eid, t0 + timedelta(days=d, minutes=j), 1, "shift",
                 level + 0.25 * j, "{}")
            )
    # type 'flat': constant level — any split scores 0; tie-break picks k=1
    for d in range(6):
        eid += 1
        rows.append((eid, t0 + timedelta(days=d), 2, "flat", 7.0, "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r["event_type"]: r for r in changepoint_meanshift(events).collect()}
    s = out["shift"]
    assert s["split_day"] == "2024-03-10"  # last BEFORE-segment day
    assert s["n_before"] == 10 and s["n_after"] == 10
    assert abs(s["mean_before"] - 15.75) < 1e-9   # 3 events/day summed
    assert abs(s["mean_after"] - 150.75) < 1e-9
    assert s["shift_stat"] > 0
    f = out["flat"]
    assert f["shift_stat"] == 0.0 and f["n_before"] == 1  # k=1 tie-break


def test_burstiness_separates_metronome_from_bursts(spark):
    """A perfectly regular user must score B = -1 (sigma = 0); a
    burst-and-silence user must score clearly higher; both must beat the
    min-events exclusion while a 2-event user is dropped."""
    from datetime import datetime, timedelta

    from inde1_spark.operators.analytics import user_burstiness

    t0 = datetime(2026, 1, 1)
    rows = []
    eid = 0
    for i in range(20):  # metronome: exactly 60 s apart
        rows.append((eid, t0 + timedelta(seconds=60 * i), "metro", "view", 1.0))
        eid += 1
    bursty_offsets = [0, 1, 2, 3, 4, 3600, 3601, 3602, 3603, 7200]
    for off in bursty_offsets:  # two tight bursts + long silences
        rows.append((eid, t0 + timedelta(seconds=off), "burst", "view", 1.0))
        eid += 1
    rows.append((eid, t0, "tiny", "view", 1.0))
    rows.append((eid + 1, t0 + timedelta(seconds=9), "tiny", "view", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string, value double"
    )
    out = {r["user_id"]: r for r in user_burstiness(df).collect()}
    assert set(out) == {"metro", "burst"}  # 'tiny' (1 gap) excluded
    assert out["metro"]["burstiness"] == -1.0
    assert out["burst"]["burstiness"] > 0.3


def test_acf_weekly_cycle_peaks_at_lag_7(spark):
    """12 weeks of a pure weekly pattern: the ACF must peak at lag 7 (and
    14) and sit clearly above the off-cycle lags."""
    import datetime as dt

    from inde1_spark.operators.analytics import acf_daily

    pattern = [100.0, 10.0, 10.0, 10.0, 10.0, 10.0, 10.0]
    rows = [
        (i, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i), "view",
         pattern[i % 7])
        for i in range(84)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    acf = {r["lag"]: r["acf"] for r in acf_daily(df).collect()}
    assert len(acf) == 14
    assert acf[7] > 0.8 and acf[14] > 0.7
    assert acf[7] > acf[1] and acf[7] > acf[6] and acf[7] > acf[8]
    for lag in (1, 2, 3, 4, 5, 6):
        assert acf[lag] < 0.1


def test_mann_kendall_monotonic_and_flat(spark):
    """Strictly increasing daily series: S = n(n-1)/2, strong positive
    trend. All-equal series: S=0, Var=0 (all ties), z=0, no trend."""
    import datetime as dt

    from inde1_spark.operators.analytics import mann_kendall

    def _events(values):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 3, 1, 9) + dt.timedelta(days=i), "view", v)
                for i, v in enumerate(values)
            ],
            "event_id long, ts timestamp, event_type string, value double",
        )

    up = mann_kendall(_events([float(10 + i) for i in range(30)])).collect()[0]
    assert up["s_stat"] == 30 * 29 // 2
    assert up["z"] > 5.0 and up["trend_5pct"]

    flat = mann_kendall(_events([7.0] * 30)).collect()[0]
    assert flat["s_stat"] == 0 and flat["var_s"] == 0.0
    assert flat["z"] == 0.0 and not flat["trend_5pct"]


def test_runs_test_oscillation_and_regimes(spark):
    """Alternating series: maximal runs (n) -> large positive z. Two-regime
    series (half high, half low): 2 runs -> large negative z."""
    import datetime as dt

    from inde1_spark.operators.analytics import runs_test

    def _events(values):
        return spark.createDataFrame(
            [
                (i, dt.datetime(2024, 5, 1, 8) + dt.timedelta(days=i), "view", v)
                for i, v in enumerate(values)
            ],
            "event_id long, ts timestamp, event_type string, value double",
        )

    osc = runs_test(_events([10.0 if i % 2 else 90.0 for i in range(40)])).collect()[0]
    assert osc["n_runs"] == 40 and osc["n_above"] == 20
    assert osc["z"] > 5.0 and osc["nonrandom_5pct"]

    reg = runs_test(_events([90.0] * 20 + [10.0] * 20)).collect()[0]
    assert reg["n_runs"] == 2
    assert reg["z"] < -5.0 and reg["nonrandom_5pct"]

    flat = runs_test(_events([5.0] * 10)).collect()[0]
    assert flat["z"] == 0.0 and not flat["nonrandom_5pct"]
