"""Planted-fixture edge cases for the r06 batch-2 operators.

The oracle gate proves engine parity on the synthetic corpus; these
fixtures prove the operators' SEMANTICS on inputs engineered to hit the
edges parity can't show (alarms that actually fire, peaks vs plateaus,
degenerate cells, sub-threshold inputs)."""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def _daily_counts(spark, counts, typ="view"):
    base = datetime(2024, 6, 1)
    rows, eid = [], 0
    for d, n in enumerate(counts):
        for i in range(n):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d, minutes=i), eid, typ, 1.0)
            )
    return _events(spark, rows)


def test_cusum_alarm_fires_on_sustained_drift_not_blip(spark):
    """A one-day blip must NOT alarm; the same mass spread over sustained
    days must — the defining CUSUM property a z-score test lacks."""
    from inde1_spark.operators.analytics import cusum_drift

    # blip: one 4.5x day in a flat series — a big single deviation that
    # still sits under the 4-daily-means threshold and then decays
    blip = [10] * 20 + [45] + [10] * 20
    r_blip = {r["day"]: r for r in cusum_drift(_daily_counts(spark, blip)).collect()}
    # drift: a sustained +80% level shift accumulates past the threshold
    drift = [10] * 20 + [18] * 21
    r_drift = {r["day"]: r for r in cusum_drift(_daily_counts(spark, drift)).collect()}
    assert not any(v["alarm_pos"] for v in r_blip.values())
    assert any(v["alarm_pos"] for v in r_drift.values())


def test_peak_detection_rejects_plateaus_and_edges(spark):
    """Plateau days (tied maxima) are not peaks; a strict unique local
    max is; series edges behave (shrunken windows)."""
    from inde1_spark.operators.analytics import peak_detection

    #         0  1  2  3  4  5  6  7  8  9
    counts = [5, 5, 9, 5, 7, 7, 5, 5, 8, 5]  # 9 = peak; 7,7 plateau = not
    got = [
        r["is_peak"]
        for r in sorted(
            peak_detection(_daily_counts(spark, counts)).collect(),
            key=lambda r: r["day"],
        )
    ]
    assert got[2] is True
    assert got[4] is False and got[5] is False  # plateau rejected
    assert got[8] is True  # near-edge peak with shrunken window
    assert sum(got) == 2


def test_sprt_decides_h1_exactly_when_llr_crosses(spark):
    """The verdict flips on the precise day the integer LLR crosses the
    bound, and `decided` is sticky afterward."""
    from inde1_spark.operators.analytics import (
        SPRT_BOUND,
        SPRT_L_ENTRY,
        SPRT_L_EXIT,
        sprt_entry_bias,
    )

    base = datetime(2024, 6, 1)
    rows, eid = [], 0
    per_day = [(9, 1)] * 10  # strongly entry-biased
    for d, (ne, nx) in enumerate(per_day):
        for i in range(ne + nx):
            eid += 1
            rows.append(
                (
                    eid,
                    base + timedelta(days=d, minutes=i),
                    eid,
                    "view" if i < ne else "click",
                    1.0,
                )
            )
    got = sorted(
        sprt_entry_bias(_events(spark, rows)).collect(), key=lambda r: r["day"]
    )
    cum_e = cum_x = 0
    first_cross = None
    for i, (ne, nx) in enumerate(per_day):
        cum_e += ne
        cum_x += nx
        llr = cum_e * SPRT_L_ENTRY + cum_x * SPRT_L_EXIT
        if first_cross is None and llr >= SPRT_BOUND:
            first_cross = i
    assert first_cross is not None
    for i, r in enumerate(got):
        assert r["verdict"] == ("accept_h1" if i >= first_cross else "continue")
        assert r["decided"] == (i >= first_cross)


def test_hill_empty_below_k_and_alpha_matches_pareto(spark):
    """Fewer than k+1 positive values -> empty; on exact Pareto data the
    estimate recovers the tail index to first order."""
    import math

    from inde1_spark.operators.analytics import hill_tail_index

    base = datetime(2024, 6, 1)
    few = _events(
        spark,
        [(i, base, i, "view", float(i)) for i in range(1, 10)],
    )
    assert hill_tail_index(few, k=20).count() == 0

    # deterministic Pareto(alpha=2) quantiles: x_i = (1 - i/(n+1))^(-1/2)
    n = 500
    rows = [
        (i, base, i, "view", (1.0 - i / (n + 1)) ** -0.5)
        for i in range(1, n + 1)
    ]
    got = hill_tail_index(_events(spark, rows), k=100).collect()[0]
    assert abs(got["alpha"] - 2.0) < 0.35, got["alpha"]


def test_did_requires_all_four_cells(spark):
    """A missing cell (control absent post-cutoff) must emit NOTHING,
    never a null-poisoned estimate."""
    from inde1_spark.operators.analytics import did_estimate

    base = datetime(2024, 6, 1)
    rows = []
    eid = 0
    for d in range(6):
        for typ in (["view", "click"] if d < 3 else ["view"]):
            eid += 1
            rows.append((eid, base + timedelta(days=d), eid, typ, 1.0 + d))
    assert did_estimate(_events(spark, rows)).count() == 0


def test_wilson_interval_contains_phat_and_stays_in_unit(spark):
    from inde1_spark.operators.analytics import wilson_intervals

    base = datetime(2024, 6, 1)
    rows, eid = [], 0
    for d, (ne, nx) in enumerate([(1, 0), (0, 1), (5, 5), (20, 1)]):
        for i in range(ne + nx):
            eid += 1
            rows.append(
                (
                    eid,
                    base + timedelta(days=d, minutes=i),
                    eid,
                    "view" if i < ne else "click",
                    1.0,
                )
            )
    for r in wilson_intervals(_events(spark, rows)).collect():
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0


def test_hilbert_curve_bijective_unit_steps_duckdb():
    """The packed-fold Hilbert transform is a true Hilbert curve: a
    bijection over the grid whose consecutive indices are ADJACENT cells
    (the locality property zorder lacks) — checked exhaustively at 4
    bits on the oracle spelling (the Spark fold is the same arithmetic,
    pinned by the hash gate)."""
    import duckdb

    x = "((acc // 65536) % 65536)"
    y = "(acc % 65536)"
    rx = f"(({x} // s) % 2)"
    ry = f"(({y} // s) % 2)"
    quad = f"({rx} * (3 - {ry}) + (1 - {rx}) * {ry})"
    d2 = f"(acc // 4294967296 + s * s * {quad})"
    x2 = (
        f"(CASE WHEN {ry} = 1 THEN {x} % s"
        f" WHEN {rx} = 1 THEN s - 1 - ({y} % s) ELSE {y} % s END)"
    )
    y2 = (
        f"(CASE WHEN {ry} = 1 THEN {y} % s"
        f" WHEN {rx} = 1 THEN s - 1 - ({x} % s) ELSE {x} % s END)"
    )
    body = f"{d2} * 4294967296 + {x2} * 65536 + {y2}"
    rows = duckdb.connect().execute(f"""
      SELECT gx.x AS x, gy.y AS y,
             list_reduce([CAST(gx.x * 65536 + gy.y AS BIGINT), 8, 4, 2, 1],
                         (acc, s) -> {body}) // 4294967296 AS d
      FROM range(16) gx(x), range(16) gy(y)
    """).fetchall()
    m = {d: (xx, yy) for xx, yy, d in rows}
    assert sorted(m) == list(range(256))
    assert all(
        abs(m[d][0] - m[d + 1][0]) + abs(m[d][1] - m[d + 1][1]) == 1
        for d in range(255)
    )
