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


def test_kaplan_meier_censoring_vs_naive(spark):
    # A churns at t=2 (quiet >7d before the day-20 corpus end); B and C
    # are still active near the end -> CENSORED at their observed spans,
    # removed from risk without counting as deaths
    import math

    from inde1_spark.operators.analytics import kaplan_meier_retention

    def e(i, day, uid):
        return (i, datetime(2024, 1, 1 + day, 12, 0, 0), uid, "view", 1.0, "{}")

    rows = [
        e(1, 0, 1), e(2, 2, 1),            # A: t=2, churned
        e(3, 0, 2), e(4, 16, 2),           # B: last day 16 > 13 -> censored, t=20
        e(5, 0, 3), e(6, 20, 3),           # C: censored, t=20
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.duration_days: r for r in kaplan_meier_retention(events).collect()}
    assert out[2].n_at_risk == 3 and out[2].n_churned == 1
    assert out[20].n_churned == 0 and out[20].n_censored == 2
    # S(2) = 2/3 exactly (one nano-snapped log step)
    assert abs(out[2].log_survival - math.log(2 / 3)) < 2e-9
    # censored rows never move the curve
    assert out[20].log_survival == out[2].log_survival


def test_kaplan_meier_absorbing_zero_when_everyone_churns(spark):
    from inde1_spark.operators.analytics import kaplan_meier_retention

    def e(i, day, uid):
        return (i, datetime(2024, 1, 1 + day, 12, 0, 0), uid, "view", 1.0, "{}")

    # both users churn at t=1; one lone censored user defines the window end
    rows = [
        e(1, 0, 1), e(2, 1, 1),
        e(3, 0, 2), e(4, 1, 2),
        e(5, 20, 3),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.duration_days: r for r in kaplan_meier_retention(events).collect()}
    # at t=1 the at-risk set is 2 churned + 0 censored... plus user 3 at
    # t=0? user 3: first=last=20 -> censored t=0. So risk at t=1 is 2.
    assert out[1].n_at_risk == 2 and out[1].n_churned == 2
    assert out[1].log_survival <= -1e8  # absorbing sentinel: S = 0


def test_session_paths_orders_and_truncates(spark):
    from inde1_spark.operators.analytics import session_paths

    base = datetime(2024, 5, 1, 9, 0, 0)

    def e(i, minutes, uid, typ):
        return (
            i,
            datetime(2024, 5, 1, 9 + minutes // 60, minutes % 60, 0),
            uid,
            typ,
            1.0,
            "{}",
        )

    rows = [
        # user 1, session 1: a>b>c (tight); session 2 after a >60min gap: a
        e(1, 0, 1, "a"), e(2, 1, 1, "b"), e(3, 2, 1, "c"),
        e(4, 120, 1, "a"),
        # user 2: same a>b>c journey
        e(5, 0, 2, "a"), e(6, 5, 2, "b"), e(7, 6, 2, "c"),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.path: r.n_sessions for r in session_paths(events).collect()}
    assert out == {"a>b>c": 2, "a": 1}
    # truncation: a 10-step session keeps its first 8 types
    long_rows = [e(i, i, 9, t) for i, t in enumerate("abcdefghij")]
    events2 = spark.createDataFrame(
        long_rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    paths = [r.path for r in session_paths(events2).collect()]
    assert paths == ["a>b>c>d>e>f>g>h"]


def test_halflife_weights_are_exact_powers_of_two(spark):
    # planted ages 0,1,2 days for one type: score = (2^0 + 2^-1 + 2^-2)
    # exactly; an over-age event contributes exactly zero
    from inde1_spark.operators.analytics import (
        HALFLIFE_MAX_AGE,
        halflife_popularity,
    )

    def e(i, day, typ):
        return (i, datetime(2024, 6, 1 + day, 12, 0, 0), 1, typ, 1.0, "{}")

    rows = [e(1, 10, "a"), e(2, 9, "a"), e(3, 8, "a")]
    # day index 10 is the anchor; this event is max_age+1 days older
    rows.append(
        (
            4,
            datetime(2024, 3, 1, 12, 0, 0),
            1,
            "b",
            1.0,
            "{}",
        )
    )
    # make the 'b' event actually over-age relative to the anchor
    age_b = (datetime(2024, 6, 11) - datetime(2024, 3, 1)).days
    assert age_b > HALFLIFE_MAX_AGE
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.event_type: r for r in halflife_popularity(events).collect()}
    assert out["a"].decayed_score == 1.0 + 0.5 + 0.25
    assert out["b"].decayed_score == 0.0


def test_conformal_interval_covers_and_orders(spark):
    # structural guarantees: lo <= forecast <= hi; the quantile comes
    # from held-out residuals, so on a noiseless linear series the
    # interval collapses to (near) zero width
    from inde1_spark.operators.analytics import forecast_conformal

    rows = []
    # type 'lin': exactly linear daily values -> residuals 0
    for d in range(12):
        rows.append((d + 1, datetime(2024, 7, 1 + d, 12), 1, "lin",
                     10.0 + 2.0 * d, "{}"))
    # type 'noisy': alternating +/-3 around a level
    for d in range(12):
        rows.append((100 + d, datetime(2024, 7, 1 + d, 12), 1, "noisy",
                     50.0 + (3.0 if d % 2 else -3.0), "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.event_type: r for r in forecast_conformal(events).collect()}
    for r in out.values():
        assert r.lo <= r.forecast <= r.hi
    assert out["lin"].hi - out["lin"].lo < 1e-3
    assert out["noisy"].hi - out["noisy"].lo > 1.0
    # the linear type's forecast extrapolates the trend: day 12 -> 34
    assert abs(out["lin"].forecast - 34.0) < 1e-3


def test_moments_profile_shapes(spark):
    # planted shapes: a right-skewed type (one huge outlier) must show
    # positive skew and large excess kurtosis; a symmetric two-point
    # type has skew exactly 0 and kurtosis_excess exactly -2
    from inde1_spark.operators.analytics import moments_profile
    from inde1_spark.operators.dedup import release_persisted

    rows = []
    for i in range(20):
        rows.append((i, datetime(2024, 8, 1, 10, i), 1, "skewed",
                     1.0 if i < 19 else 1000.0, "{}"))
    for i in range(10):
        rows.append((100 + i, datetime(2024, 8, 1, 11, i), 1, "sym",
                     10.0 if i % 2 else 20.0, "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {r.event_type: r for r in moments_profile(events).collect()}
    release_persisted()
    sk = out["skewed"]
    assert sk.skewness > 3.0 and sk.kurtosis_excess > 10.0
    sym = out["sym"]
    assert abs(sym.mean - 15.0) < 1e-6
    assert abs(sym.skewness) < 1e-9
    assert abs(sym.kurtosis_excess - (-2.0)) < 1e-9
    assert abs(sym.stddev - 5.0) < 1e-3


def test_mann_whitney_detects_shift_and_ignores_identical(spark):
    # planted: type 'hi' is a +5 location shift of 'lo' -> strongly
    # negative z for (hi, lo)... ordering is alphabetical, so the pair is
    # (hi, lo) with A='hi' dominating: U_A large, z > 0. Identical
    # distributions ('lo' vs 'same') give U_A = na*nb/2 and z = 0.
    from inde1_spark.operators.analytics import mann_whitney_pairs
    from inde1_spark.operators.dedup import release_persisted

    rows = []
    for i in range(30):
        rows.append((i, datetime(2024, 8, 2, 10, i % 60), 1, "lo",
                     float(i % 10), "{}"))
        rows.append((100 + i, datetime(2024, 8, 2, 11, i % 60), 1, "hi",
                     float(i % 10) + 5.0, "{}"))
        rows.append((200 + i, datetime(2024, 8, 2, 12, i % 60), 1, "same",
                     float(i % 10), "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {(r.type_a, r.type_b): r for r in mann_whitney_pairs(events).collect()}
    release_persisted()
    shifted = out[("hi", "lo")]
    assert shifted.z > 3.0                     # clear dominance
    ident = out[("lo", "same")]
    assert abs(ident.u_a - 30 * 30 / 2) < 1e-9  # exactly the null mean
    assert abs(ident.z) < 1e-12


def test_theil_sen_robust_to_outlier_day(spark):
    # a clean slope-2 daily series with ONE corrupted day: least squares
    # bends, Theil-Sen must still report exactly 2.0 per day
    from inde1_spark.operators.analytics import (
        daily_trend_regression,
        theil_sen_slope,
    )

    rows = []
    for d in range(11):
        v = 10.0 + 2.0 * d if d != 10 else 500.0  # endpoint = max leverage
        rows.append((d + 1, datetime(2024, 8, 3 + d, 12), 1, "t", v, "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    ts = {r.event_type: r for r in theil_sen_slope(events).collect()}["t"]
    ols = {
        r.event_type: r for r in daily_trend_regression(events).collect()
    }["t"]
    assert abs(ts.theil_sen_slope - 2.0) < 1e-9
    assert abs(ols.slope_per_day - 2.0) > 1.0  # the outlier bent OLS
    assert ts.n_days == 11 and ts.n_pairs == 55


def test_burst_viterbi_entry_penalty_separates_bursts_from_blips(spark):
    """20 days at ~10 events/day with a planted 4-day 40/day burst and a
    single-day 25-event blip: the automaton must label exactly the 4-day
    run as burst (sustained rate change amortizes the entry penalty) and
    keep the one-day blip in the base state (gamma suppresses it) —
    the behavior a bare count > 2*mean threshold cannot reproduce."""
    from datetime import datetime, timedelta

    from inde1_spark.operators.analytics import burst_viterbi

    rows = []
    eid = 0
    for d in range(20):
        if 8 <= d <= 11:
            n = 40  # burst window
        elif d == 15:
            n = 25  # blip
        else:
            n = 10
        for j in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2024, 3, 1) + timedelta(days=d, minutes=j),
                    100,
                    "x",
                    1.0,
                    "{}",
                )
            )
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = sorted(burst_viterbi(events).collect(), key=lambda r: r["day"])
    states = [r["in_burst"] for r in out]
    assert len(states) == 20
    assert states[8:12] == [1, 1, 1, 1]  # the planted burst
    assert states[15] == 0  # blip suppressed by the entry penalty
    assert sum(states) == 4  # nothing else flagged
