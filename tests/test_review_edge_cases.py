"""Edge cases pinned by the r04 code review: degenerate inputs must not
crash under ANSI mode or diverge asymmetrically between engines."""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_trend_single_day_type_excluded_not_crashed(spark):
    """A type active on ONE day has a zero slope denominator: ANSI Spark
    would throw DIVIDE_BY_ZERO while DuckDB returns NULL — the guard
    excludes it on both sides instead."""
    from inde1_spark.operators.analytics import daily_trend_regression

    t = datetime.datetime(2025, 1, 1, 12, 0, 0)
    d = datetime.timedelta
    rows = [
        (1, t, 1, "solo", 5.0, "{}"),          # one day only
        (2, t, 2, "pair", 1.0, "{}"),
        (3, t + d(days=1), 3, "pair", 2.0, "{}"),
    ]
    out = {r["event_type"]: r for r in daily_trend_regression(_events(spark, rows)).collect()}
    assert "solo" not in out
    assert out["pair"]["n_days"] == 2 and abs(out["pair"]["slope_per_day"] - 1.0) < 1e-9


def test_zscore_constant_series_no_nan_rows(spark):
    """All-equal daily values: variance cancels to ~0 (possibly epsilon
    negative); the clamp keeps sqrt defined and no day is flagged."""
    from inde1_spark.operators.analytics import zscore_anomaly

    t = datetime.datetime(2025, 1, 1, 12, 0, 0)
    d = datetime.timedelta
    rows = [(i, t + d(days=i), i, "flat", 1e6, "{}") for i in range(5)]
    assert zscore_anomaly(_events(spark, rows)).count() == 0


def test_json_audit_drifted_props_no_crash(spark):
    """Dotted keys and beyond-int64 int-looking values are exactly the
    drift the audit exists for: classified, not crashed (try_cast)."""
    from inde1_spark.operators.analytics import json_props_audit

    t = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 1, "view", 1.0, '{"a.b": 5}'),
        (2, t, 2, "view", 1.0, '{"k": 99999999999999999999}'),
        (3, t, 3, "view", 1.0, '{"k": 7}'),
    ]
    out = {(r["key"], r["vtype"]): r for r in json_props_audit(_events(spark, rows)).collect()}
    assert out[("a.b", "int")]["n_rows"] == 1
    assert ("k", "int") in out and out[("k", "int")]["n_rows"] == 2
    # the overflowing value degrades to NULL inside the sum, 7 survives
    assert out[("k", "int")]["sum_int_values"] in (7, None)


def test_dec_floordiv_past_2_63_no_wrap(spark):
    """The wide-decimal floor-div spelling must stay exact ABOVE 2^63,
    where a LONG `div` silently wraps (CLAUDE.md rule). Checked against
    Python's arbitrary-precision `//` at adversarial magnitudes."""
    from inde1_spark.functions.exprs import dec_floordiv

    cases = [
        (2**63 + 12345, 7),                  # just past the long wrap point
        (10**37 - 1, 10**18 + 3),            # near decimal(38,0) capacity
        (2 * (2**62) + 41, 2 * 41),          # the cluster_balance shape (2s+n, 2n)
        (999, 1000),                         # floor to 0
    ]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in cases], "a string, b string"
    ).select(
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
    )
    got = [
        int(r["q"])
        for r in df.select(
            dec_floordiv(F.col("a"), F.col("b")).cast("decimal(38,0)").alias("q")
        ).collect()
    ]
    assert got == [a // b for a, b in cases]


def test_cluster_balance_decimal_mean_matches_python(spark):
    """cluster_balance's mean_dist_scaled is round-half-up(sum/n) in exact
    decimal arithmetic — replay the full operator against Python ints."""
    from inde1_spark.operators.clustering import cluster_balance, kmeans_assign

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = {r["cluster"]: r for r in cluster_balance(emb, k=3, iters=2).collect()}
    asg = kmeans_assign(emb, 3, 2).collect()
    sums, counts = {}, {}
    for r in asg:
        sums[r["cluster"]] = sums.get(r["cluster"], 0) + r["dist_scaled"]
        counts[r["cluster"]] = counts.get(r["cluster"], 0) + 1
    for c, n in counts.items():
        expect = (2 * sums[c] + n) // (2 * n)  # round-half-up(sum/n)
        assert out[c]["mean_dist_scaled"] == expect
        assert out[c]["n_members"] == n


def test_chi2_independence_planted_contingency(spark):
    """Fully-dependent 2x2 design: type A only on Monday, type B only on
    Tuesday, 30 events each. E = 15 for every cell, every contribution
    (30-15)^2/15 or (0-15)^2/15 = 15, chi2 = 60, dof = 1."""
    import datetime as dt

    from inde1_spark.operators.analytics import chi2_independence

    rows = [
        (i, dt.datetime(2024, 1, 1, 10, 0, i % 60), "A") for i in range(30)
    ] + [
        (100 + i, dt.datetime(2024, 1, 2, 10, 0, i % 60), "B")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = chi2_independence(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["expected"] == 15.0
        assert r["contrib"] == 15.0
        assert r["chi2"] == 60.0
        assert r["dof"] == 1


def test_benford_densifies_and_pins_exact_shares(spark):
    """All values lead with digit 1: digits 2-9 must still appear (zero
    cells contribute to TV). Uniform 1..9: every share exactly 1/9."""
    from inde1_spark.operators.analytics import (
        BENFORD_EXPECTED_PPM,
        benford_deviation,
    )

    ones = spark.createDataFrame(
        [(i, float(10 ** (i % 3))) for i in range(6)],
        "event_id long, value double",
    )  # 1, 10, 100 repeated: every value leads with 1
    out = {r["digit"]: r for r in benford_deviation(ones).collect()}
    assert sorted(out) == list(range(1, 10))
    assert out[1]["n_obs"] == 6 and out[1]["share"] == 1.0
    for d in range(2, 10):
        assert out[d]["n_obs"] == 0 and out[d]["dev_ppm"] == -BENFORD_EXPECTED_PPM[d - 1]

    uniform = spark.createDataFrame(
        [(i, float(1 + i % 9)) for i in range(9)], "event_id long, value double"
    )
    u = {r["digit"]: r for r in benford_deviation(uniform).collect()}
    for d in range(1, 10):
        assert u[d]["n_obs"] == 1
        assert u[d]["dev_ppm"] == 111111 - BENFORD_EXPECTED_PPM[d - 1]


def test_join_cardinality_audit_exact_small_case(spark):
    """Counts [3,2,1]: est = 9+4+1 = 14, uniform baseline 36/3 = 12,
    skew = 14/12."""
    from inde1_spark.operators.analytics import join_cardinality_audit

    rows = [(i, u) for i, u in enumerate([1] * 3 + [2] * 2 + [3])]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    r = join_cardinality_audit(df).collect()[0]
    assert r["n_rows"] == 6 and r["n_keys"] == 3 and r["max_key_rows"] == 3
    assert r["est_join_rows"] == "14"
    assert r["est_join_rows_approx"] == 14.0
    assert abs(r["skew_factor"] - 14.0 / 12.0) < 1e-12


def test_audience_overlap_dense_and_exact(spark):
    """Users: u1 does A+B, u2 does A, u3 does C. Pair (A,B): both=1,
    jaccard 1/2. Pair (A,C) and (B,C): zero overlap but PRESENT."""
    from inde1_spark.operators.analytics import audience_overlap

    rows = [(1, 1, "A"), (2, 1, "B"), (3, 2, "A"), (4, 3, "C")]
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    out = {(r["type_a"], r["type_b"]): r for r in audience_overlap(df).collect()}
    assert sorted(out) == [("A", "B"), ("A", "C"), ("B", "C")]
    ab = out[("A", "B")]
    assert ab["n_a"] == 2 and ab["n_b"] == 1 and ab["n_both"] == 1
    assert ab["jaccard"] == 0.5 and ab["containment"] == 1.0
    assert out[("A", "C")]["n_both"] == 0 and out[("A", "C")]["jaccard"] == 0.0


def test_markov_stationary_favors_absorbing_ish_state(spark):
    """Chain A->B always, B->B twice as often as B->A: the process spends
    most of its time in B, which one-step transition_matrix can't say."""
    import datetime as dt

    from inde1_spark.operators.analytics import markov_stationary
    from inde1_spark.operators.dedup import release_persisted

    seq = ("A B B B " * 10).split()
    rows = [
        (i, dt.datetime(2024, 7, 1) + dt.timedelta(minutes=i), 1, s)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["state"]: r["stationary_p"] for r in markov_stationary(df).collect()}
    release_persisted()
    assert set(out) == {"A", "B"}
    assert out["B"] > 2 * out["A"]
    assert abs(out["A"] + out["B"] - 1.0) < 0.05
