"""Semantic edge cases for the r07 operators: each test plants a signal the
operator exists to detect (or a law it must satisfy) and asserts the
detection — the behavioral complement to the hash-parity pins in
test_oracle_parity.py."""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE

from inde1_spark.sources.readers import load_table

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
T0 = datetime(2024, 3, 4, 12, 0, 0)  # a Monday


def _daily_events(spark, values, event_type="view"):
    """One event per day with the given value sequence."""
    rows = [
        (i, T0 + timedelta(days=i), 100, event_type, float(v), "{}")
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, COLS)


def test_turning_points_alternating_vs_monotone(spark):
    from inde1_spark.operators.analytics import turning_points_test

    saw = _daily_events(spark, [1, 9, 1, 9, 1, 9, 1, 9, 1, 9])
    r = turning_points_test(saw).collect()[0]
    assert r["n_turning"] == 8  # every interior day is a strict extremum
    assert r["z"] > 1.96 and r["nonrandom_5pct"]

    ramp = _daily_events(spark, list(range(1, 11)))
    r2 = turning_points_test(ramp).collect()[0]
    assert r2["n_turning"] == 0 and r2["z"] < -1.96


def test_bartels_trend_vs_alternation(spark):
    from inde1_spark.operators.analytics import bartels_rank_vn

    ramp = _daily_events(spark, list(range(1, 21)))
    r = bartels_rank_vn(ramp).collect()[0]
    # successive ranks differ by exactly 1 -> NM = n-1, RVN << 2
    assert r["nm"] == 19 and r["verdict"] == "trend"

    saw = _daily_events(spark, [1, 9, 2, 8, 3, 7, 4, 6][:8])
    r2 = bartels_rank_vn(saw).collect()[0]
    assert r2["rvn"] > 2.0


def test_poisson_ci_contains_rate_and_clamps(spark):
    from inde1_spark.operators.analytics import poisson_rate_ci

    events = load_table(spark, SF_SMOKE, "events")
    for r in poisson_rate_ci(events).collect():
        assert r["ci_lo"] >= 0.0
        assert r["ci_lo"] <= r["rate_per_day"] <= r["ci_hi"]


def test_grubbs_flags_planted_spike(spark):
    from inde1_spark.operators.analytics import grubbs_daily_outlier

    vals = [10.0] * 20
    vals[7] = 1000.0
    r = grubbs_daily_outlier(_daily_events(spark, vals)).collect()[0]
    assert r["peak_day"] == (T0 + timedelta(days=7)).strftime("%Y-%m-%d")
    assert r["g_stat"] > 3.0 and r["outlier_3sigma"]


def test_odds_ratio_weekend_entry_bias(spark):
    from inde1_spark.operators.analytics import odds_ratio_daily

    sat = datetime(2024, 3, 9, 12, 0, 0)
    mon = datetime(2024, 3, 4, 12, 0, 0)
    rows = (
        [(i, sat, 1, "view", 1.0, "{}") for i in range(40)]
        + [(100 + i, sat, 1, "click", 1.0, "{}") for i in range(5)]
        + [(200 + i, mon, 1, "view", 1.0, "{}") for i in range(5)]
        + [(300 + i, mon, 1, "click", 1.0, "{}") for i in range(40)]
    )
    r = odds_ratio_daily(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["odds_ratio"] > 1.0 and r["log_or"] > 0
    assert r["significant_5pct"]


def test_mood_median_separates_shifted_types(spark):
    from inde1_spark.operators.analytics import mood_median_test

    lo = _daily_events(spark, [1.0] * 15, "view")
    hi = _daily_events(spark, [100.0] * 15, "click")
    out = mood_median_test(lo.unionByName(hi)).collect()
    by = {r["event_type"]: r for r in out}
    # 'click' days all sit above the grand median, 'view' days none
    assert by["click"]["n_above"] == 15 and by["view"]["n_above"] == 0
    assert out[0]["chi2"] > 3.84 and out[0]["df"] == 1


def test_page_trend_detects_weekly_ramp(spark):
    from inde1_spark.operators.analytics import page_trend_test

    # 4 complete epoch-aligned weeks, count ramps with position-in-block
    base = datetime(1970, 1, 1)  # day 0 -> pos 0
    rows = []
    eid = 0
    for w in range(4):
        for pos in range(7):
            for _ in range(1 + pos * 3):  # strictly increasing along block
                rows.append((eid, base + timedelta(days=w * 7 + pos), 1,
                             "view", 1.0, "{}"))
                eid += 1
    r = page_trend_test(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["n_weeks"] == 4
    # perfect ordering: L_x2 hits its maximum b * 2 * sum(j * j)
    assert r["l_x2"] == 4 * 2 * sum(j * j for j in range(1, 8))
    assert r["z"] > 1.645 and r["increasing_trend_5pct"]


def test_granger_detects_lagged_coupling(spark):
    from inde1_spark.operators.analytics import granger_daily

    # exits today = entries yesterday (deterministic lag-1 causation)
    ent = [5, 17, 3, 29, 11, 23, 7, 31, 13, 19, 2, 28, 9, 25, 6]
    rows = []
    eid = 0
    for i, e in enumerate(ent):
        day = T0 + timedelta(days=i)
        for _ in range(e):
            rows.append((eid, day, 1, "view", 1.0, "{}")); eid += 1
        # lag-1 coupling plus small noise (an EXACT fit would hit the
        # rss_u == 0 degenerate guard and emit f_stat = 0 by design)
        nx = (ent[i - 1] if i > 0 else 1) + (i % 3)
        for _ in range(nx):
            rows.append((eid, day, 1, "click", 1.0, "{}")); eid += 1
    r = granger_daily(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["f_stat"] > 3.84 and r["granger_5pct"]
    assert r["rss_unrestricted"] < r["rss_restricted"]


def test_zonemap_skip_monotone_and_sorted_layout_prunes(spark):
    from inde1_spark.operators.analytics import zonemap_prune_audit

    # day-sorted values: zone maps are disjoint -> high threshold skips most
    vals = [float(10 * (i + 1)) for i in range(20)]
    out = zonemap_prune_audit(_daily_events(spark, vals)).collect()
    assert [r["quintile"] for r in out] == [1, 2, 3, 4]
    skips = [r["rows_skipped"] for r in out]
    assert skips == sorted(skips)  # higher threshold never skips less
    assert out[-1]["n_parts_skipped"] >= out[-1]["n_parts"] * 3 // 5


def test_ivm_merge_certifies_equality(spark):
    from inde1_spark.operators.analytics import ivm_merge_check

    events = load_table(spark, SF_SMOKE, "events")
    rows = ivm_merge_check(events).collect()
    assert len(rows) > 0
    assert all(r["counts_equal"] and r["revenue_equal"] for r in rows)


def test_winsorized_bounds_and_variance_reduction(spark):
    from inde1_spark.operators.analytics import moments_profile, winsorized_stats

    events = load_table(spark, SF_SMOKE, "events")
    raw_std = {
        r["event_type"]: r["stddev"] for r in moments_profile(events).collect()
    }
    for r in winsorized_stats(events).collect():
        assert r["winsor_lo"] <= r["wins_mean"] <= r["winsor_hi"]
        assert r["wins_std"] >= 0.0
        assert r["k_trimmed"] == r["n"] * 5 // 100
        # capping the tails can only shrink spread (micro-rounding slack)
        assert r["wins_std"] <= raw_std[r["event_type"]] + 1e-5


def test_assortativity_in_range(spark):
    from inde1_spark.operators.dedup import degree_assortativity

    docs = load_table(spark, SF_SMOKE, "documents")
    r = degree_assortativity(docs).collect()[0]
    assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    assert r["n_edges"] >= 0 and r["n_nodes"] >= 0


def test_cka_identical_halves_score_one(spark):
    from inde1_spark.operators.similarity import embedding_cka

    # mirrored halves -> Cxy == Cxx == Cyy -> CKA == 1 (up to snapping)
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(32)] * 2, i % 3)
        for i in range(50)
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = embedding_cka(emb.selectExpr(
        "vec_id", "CAST(embedding AS array<float>) AS embedding", "label"
    )).collect()[0]
    assert r["cka"] == pytest.approx(1.0, abs=1e-6)


def test_ivf_recall_monotone_in_nprobe(spark):
    from inde1_spark.operators.similarity import ivf_nprobe_sweep

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = {r["n_probe"]: r for r in ivf_nprobe_sweep(emb).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["recall"] <= out[2]["recall"] <= out[4]["recall"]
    assert all(r["total_hits"] <= r["total_k"] for r in out.values())


def test_rake_prefers_long_phrases(spark):
    from inde1_spark.operators.text import rake_keywords

    docs = spark.createDataFrame(
        [
            (1, "deep learning model training of the deep learning model", "en", "a", 10),
            (2, "training and deep learning model a training", "en", "a", 10),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = rake_keywords(docs).collect()
    assert out[0]["rank"] == 1
    # the longest stopword-free run outranks every shorter phrase and
    # every single word (degree-driven RAKE scoring)
    assert out[0]["phrase"] == "deep learning model training"
    assert out[0]["n_words"] == 4
    phrases = [r["phrase"] for r in out]
    assert "deep learning model" in phrases


def test_cvm_separates_shifted_distributions(spark):
    from inde1_spark.operators.analytics import cvm_two_sample

    # entries live on low daily counts, exits on high -> large T
    rows = []
    eid = 0
    for i in range(15):
        day = T0 + timedelta(days=i)
        for _ in range(3 + i % 2):
            rows.append((eid, day, 1, "view", 1.0, "{}")); eid += 1
        for _ in range(40 + i % 3):
            rows.append((eid, day, 1, "click", 1.0, "{}")); eid += 1
    r = cvm_two_sample(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["t_stat"] > 0.461 and r["different_5pct"]


def test_two_proportion_null_on_balanced_mix(spark):
    from inde1_spark.operators.analytics import two_proportion_z

    sat = datetime(2024, 3, 9, 12, 0, 0)
    mon = datetime(2024, 3, 4, 12, 0, 0)
    rows = (
        [(i, sat, 1, "view", 1.0, "{}") for i in range(30)]
        + [(100 + i, sat, 1, "click", 1.0, "{}") for i in range(30)]
        + [(200 + i, mon, 1, "view", 1.0, "{}") for i in range(30)]
        + [(300 + i, mon, 1, "click", 1.0, "{}") for i in range(30)]
    )
    r = two_proportion_z(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["z"] == 0.0 and not r["significant_5pct"]
    assert r["p_weekend"] == r["p_weekday"] == 0.5


def test_capture_recapture_full_overlap_estimates_observed(spark):
    from inde1_spark.operators.analytics import capture_recapture

    # every user active in both halves -> est_total == n_observed
    rows = []
    for u in range(10):
        rows.append((u * 2, T0 + timedelta(days=0), u, "view", 1.0, "{}"))
        rows.append((u * 2 + 1, T0 + timedelta(days=10), u, "view", 1.0, "{}"))
    r = capture_recapture(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["n1"] == r["n2"] == r["m_overlap"] == r["n_observed"] == 10
    assert r["est_total"] == pytest.approx(10.0)
    assert r["coverage_pct"] == pytest.approx(100.0)


def test_join_order_audit_prices_plans_exactly(spark):
    from inde1_spark.operators.analytics import join_order_audit

    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    out = {r["plan"]: r for r in
           join_order_audit(orders, customer, nation).collect()}
    assert set(out) == {"orders_customer_first", "customer_nation_first"}
    # exact ground truths computed by actually running the joins
    oc = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    cn = customer.join(nation, customer.c_nationkey == nation.n_nationkey).count()
    fin = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .count()
    )
    assert int(out["orders_customer_first"]["intermediate_rows"]) == oc
    assert int(out["customer_nation_first"]["intermediate_rows"]) == cn
    assert all(int(r["final_rows"]) == fin for r in out.values())
    cheapest = [p for p, r in out.items() if r["is_cheapest"]]
    want = "customer_nation_first" if cn < oc else "orders_customer_first"
    # exactly ONE recommendation (ties break to orders_customer_first)
    assert cheapest == [want]


def test_cochran_armitage_detects_weekly_ramp(spark):
    from inde1_spark.operators.analytics import cochran_armitage_trend

    # entry share ramps with epoch-dow position 0..6
    base = datetime(1970, 1, 1)  # day 0 -> position 0
    rows = []
    eid = 0
    for w in range(3):
        for pos in range(7):
            day = base + timedelta(days=w * 7 + pos)
            for _ in range(5 + pos * 4):
                rows.append((eid, day, 1, "view", 1.0, "{}")); eid += 1
            for _ in range(30 - pos * 4):
                rows.append((eid, day, 1, "click", 1.0, "{}")); eid += 1
    r = cochran_armitage_trend(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["z"] > 1.96 and r["trend_5pct"]
    assert r["direction"] == "increasing"


def test_lognormal_fit_symmetric_on_geometric_lengths(spark):
    from inde1_spark.operators.corpus import lognormal_length_fit

    # log-symmetric lengths (powers of 2 around 2^10): mean(log)==median(log)
    lens = [2 ** (10 + d) for d in (-3, -2, -1, 0, 0, 0, 1, 2, 3)]
    docs = spark.createDataFrame(
        [(i, "x", "en", "a", n) for i, n in enumerate(lens)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    r = lognormal_length_fit(docs).collect()[0]
    assert r["n_docs"] == 9
    assert abs(r["mean_median_gap"]) < 1e-6
    assert not r["asymmetric_flag"]
    assert r["sigma_log"] > 0


def test_r07_ops_survive_empty_inputs(spark):
    """Every r07 operator must plan and execute on empty inputs without
    raising — the gate never sees empties, users do."""
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StringType,
        StructField, StructType, TimestampType, DoubleType,
    )

    ev_schema = StructType([
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])
    doc_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    emb_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    empty_ev = spark.createDataFrame([], ev_schema)
    empty_doc = spark.createDataFrame([], doc_schema)
    empty_emb = spark.createDataFrame([], emb_schema)

    from inde1_spark.operators import analytics as A
    from inde1_spark.operators import corpus as C
    from inde1_spark.operators import dedup as D
    from inde1_spark.operators import similarity as S
    from inde1_spark.operators import text as T

    event_ops = [
        A.turning_points_test, A.bartels_rank_vn, A.poisson_rate_ci,
        A.grubbs_daily_outlier, A.odds_ratio_daily, A.mood_median_test,
        A.page_trend_test, A.granger_daily, A.zonemap_prune_audit,
        A.ivm_merge_check, A.winsorized_stats, A.cvm_two_sample,
        A.two_proportion_z, A.capture_recapture, A.cochran_armitage_trend,
    ]
    for op in event_ops:
        rows = op(empty_ev).collect()
        assert len(rows) <= 5, op.__name__
    assert D.degree_assortativity(empty_doc).collect()[0]["n_edges"] == 0
    assert T.rake_keywords(empty_doc).collect() == []
    assert C.lognormal_length_fit(empty_doc).collect() == []
    assert S.embedding_cka(empty_emb).count() <= 1
    assert S.ivf_nprobe_sweep(empty_emb).count() <= 3
    from inde1_spark.operators.tpch import __name__ as _  # noqa: F401
    from inde1_spark.operators.analytics import join_order_audit

    empty_orders = spark.createDataFrame(
        [], "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate date, o_orderpriority string, "
            "o_clerk string, o_shippriority int, o_comment string"
    )
    cust = spark.createDataFrame(
        [], "c_custkey long, c_name string, c_address string, "
            "c_nationkey long, c_phone string, c_acctbal double, "
            "c_mktsegment string, c_comment string"
    )
    nat = spark.createDataFrame(
        [], "n_nationkey long, n_name string, n_regionkey long, n_comment string"
    )
    out = join_order_audit(empty_orders, cust, nat).collect()
    assert len(out) == 2
    assert all(r["intermediate_rows"] == "0" for r in out)
    # 0 == 0 is a tie: the documented tie-break picks plan A exactly once
    assert [r["plan"] for r in out if r["is_cheapest"]] == [
        "orders_customer_first"
    ]
