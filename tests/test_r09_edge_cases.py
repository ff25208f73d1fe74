"""Semantics + plan invariants for the r09 batch (staged in r08, promoted
to the production surface in r09).

Same style as test_r07_edge_cases: planted micro-datasets exercise the
property each operator's docstring claims; plan-shape pins hold the engine
invariants (column pruning, join strategy, no cartesian).
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.plans.explain import plan_report
from tests.conftest import SF_SMOKE
from inde1_spark.sources.readers import load_table

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
T0 = datetime(2024, 3, 4, 12, 0, 0)
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_nelson_aalen_matches_hand_computation(spark):
    from inde1_spark.operators.analytics import nelson_aalen_hazard

    # 3 users churn at duration 0 (one-day lives long before corpus end),
    # 2 users censored at duration 20 (active at the end)
    rows = []
    eid = 0
    for u in range(3):
        rows.append((eid, T0 + timedelta(days=0), u, "view", 1.0, "{}"))
        eid += 1
    for u in (10, 11):
        rows.append((eid, T0, u, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, T0 + timedelta(days=20), u, "view", 1.0, "{}"))
        eid += 1
    out = {
        r["duration_days"]: r
        for r in nelson_aalen_hazard(
            spark.createDataFrame(rows, COLS)
        ).collect()
    }
    assert set(out) == {0, 20}
    # at t=0: 5 at risk, 3 churn -> inc = 3/5 = 0.6
    assert out[0]["n_at_risk"] == 5 and out[0]["n_churned"] == 3
    assert out[0]["hazard_inc"] == pytest.approx(0.6)
    # at t=20: 2 at risk, 0 churn (censored) -> inc 0, cum stays 0.6
    assert out[20]["n_churned"] == 0
    assert out[20]["hazard_inc"] == 0.0
    assert out[20]["cum_hazard"] == pytest.approx(0.6)


def test_nelson_aalen_cumulative_monotone(spark):
    from inde1_spark.operators.analytics import nelson_aalen_hazard

    events = load_table(spark, SF_SMOKE, "events")
    rows = nelson_aalen_hazard(events).collect()
    cums = [r["cum_hazard"] for r in rows]
    assert cums == sorted(cums)
    assert all(r["hazard_inc"] >= 0.0 for r in rows)
    # increments sum to the cumulative (exact long accumulation)
    assert cums[-1] == pytest.approx(sum(r["hazard_inc"] for r in rows))


def test_ndv_exact_on_planted_cardinalities(spark):
    from inde1_spark.operators.analytics import ndv_estimator_audit

    rows = [
        (i, T0 + timedelta(minutes=i), i % 7, "view" if i % 2 else "click",
         1.0, "{}")
        for i in range(200)
    ]
    out = {
        r["column_name"]: r
        for r in ndv_estimator_audit(spark.createDataFrame(rows, COLS)).collect()
    }
    assert out["user_id"]["exact_ndv"] == 7
    assert out["event_type"]["exact_ndv"] == 2
    for r in out.values():
        assert r["n_sample"] < r["n_rows"]  # the 10% sample really sampled
        assert r["sample_ndv"] <= r["exact_ndv"]
        # estimators never fall below what the sample saw
        assert r["chao1_est"] >= r["sample_ndv"]
        assert r["gee_est"] >= r["sample_ndv"] - 1e-9


def test_compaction_plan_conserves_rows_and_orders_files(spark):
    from inde1_spark.operators.analytics import file_compaction_plan

    events = load_table(spark, SF_SMOKE, "events")
    rows = file_compaction_plan(events).collect()
    assert [r["file_id"] for r in rows] == list(range(len(rows)))
    assert sum(r["n_rows"] for r in rows) == events.count()
    # time-locality: day ranges of consecutive files don't interleave
    for a, b in zip(rows, rows[1:]):
        assert a["last_day"] <= b["first_day"]


def test_compaction_flags_oversized_day(spark):
    from inde1_spark.operators.analytics import file_compaction_plan

    # one day with > target bytes of rows (target 1 KiB, 64 B rows -> 17)
    rows = [
        (i, T0 + timedelta(minutes=i), 1, "view", 1.0, "{}") for i in range(40)
    ]
    out = file_compaction_plan(
        spark.createDataFrame(rows, COLS), target_bytes=1024
    ).collect()
    assert any(r["has_oversized_day"] for r in out)


def test_lpa_two_identical_text_families(spark):
    from inde1_spark.operators.dedup import label_propagation_communities

    docs = [(i, "alpha beta gamma delta epsilon zeta", "en", "a", 10)
            for i in range(3)]
    docs += [(10 + i, "one two three four five six seven", "en", "b", 10)
             for i in range(4)]
    docs.append((99, "completely different text with no shared grams at all",
                 "en", "c", 10))  # isolated: not in the graph
    out = {
        r["community_size"]: r["n_communities"]
        for r in label_propagation_communities(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    assert out == {3: 1, 4: 1}


def test_lpa_empty_graph(spark):
    from inde1_spark.operators.dedup import label_propagation_communities

    docs = spark.createDataFrame(
        [(1, "only one doc here", "en", "a", 10)], DOC_COLS
    )
    assert label_propagation_communities(docs).collect() == []


def test_jm_ranks_term_bearing_docs_first(spark):
    from inde1_spark.operators.scoring import jm_query_likelihood

    docs = [
        (1, "query join stream query join", "en", "a", 10),  # all terms
        (2, "apple banana cherry durian fig", "en", "a", 10),  # none
        (3, "query apple banana cherry fig", "en", "a", 10),  # one term
    ]
    out = jm_query_likelihood(spark.createDataFrame(docs, DOC_COLS)).collect()
    order = [r["doc_id"] for r in out]
    assert order[0] == 1 and order.index(3) < order.index(2)
    scores = [r["jm_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


R09_BATCH = (
    "nelson_aalen_hazard",
    "ndv_estimator_audit",
    "file_compaction_plan",
    "label_propagation_communities",
    "jm_query_likelihood",
    "dedup_substring_windows",
    "sort_benefit_audit",
    "mcnemar_halves_test",
    "kmv_distinct_by_source",
    "bridge_edges_audit",
    "cochran_q_weeks",
    "morisita_horn_overlap",
)


def test_r09_batch_plan_invariants(spark):
    import __spark_entry__ as entrymod

    Q = entrymod.queries()
    for name in R09_BATCH:
        r = plan_report(Q[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in r.raw, f"{name}: cartesian"
        assert "BatchEvalPython" not in r.raw, f"{name}: row Python UDF"
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in r.raw, f"{name}: unexpected {node}"


def test_substring_windows_catch_offset_duplicates(spark):
    from inde1_spark.operators.dedup import dedup_substring_windows

    shared = " ".join(f"s{i}" for i in range(15))  # one full shared window
    docs = [
        (1, "a1 a2 a3 " + shared + " a4 a5", "en", "x", 10),
        (2, "b1 " + shared + " b2 b3 b4 b5 b6", "en", "y", 10),  # other offset
        (3, " ".join(f"u{i}" for i in range(30)), "en", "z", 10),  # unique
        (4, "too short", "en", "z", 10),  # < w tokens: excluded
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_substring_windows(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_shared_positions"] >= 1
    assert out[2]["n_shared_positions"] >= 1
    assert out[3]["n_shared_positions"] == 0
    assert out[3]["substring_dup_pct"] == 0.0
    # identical texts share EVERY window
    twins = [(5, "c " + shared + " d e f", "en", "x", 10),
             (6, "c " + shared + " d e f", "en", "y", 10)]
    tout = dedup_substring_windows(
        spark.createDataFrame(twins, DOC_COLS)
    ).collect()
    assert all(r["substring_dup_pct"] == 100.0 for r in tout)


def test_sort_benefit_uplift_on_unclustered_values(spark):
    from inde1_spark.operators.analytics import sort_benefit_audit

    # values interleave across days -> day zone-maps prune nothing, while
    # a value-sorted layout prunes ~CDF(t): uplift must be large
    rows = []
    eid = 0
    for d in range(10):
        for j in range(20):
            rows.append(
                (eid, T0 + timedelta(days=d, minutes=j), j, "view",
                 float((eid * 7) % 100), "{}")
            )
            eid += 1
    out = sort_benefit_audit(spark.createDataFrame(rows, COLS)).collect()
    assert [r["quintile"] for r in out] == [1, 2, 3, 4]
    for r in out:
        assert r["rows_skipped_current"] == 0  # every day spans the range
        assert r["rows_skipped_sorted"] > 0
        assert r["uplift_pp"] == pytest.approx(r["sorted_skip_pct"])
    assert all(0.0 <= r["sorted_skip_pct"] <= 100.0 for r in out)


def test_mcnemar_counts_discordant_users(spark):
    from inde1_spark.operators.analytics import mcnemar_halves_test

    # window [T0, T0+10d], mid at +5d: 3 first-only, 1 second-only, 2 both
    rows = [(0, T0, 100, "view", 1.0, "{}"),
            (1, T0 + timedelta(days=10), 101, "view", 1.0, "{}")]  # both ends
    eid = 2
    for u in (1, 2, 3):  # first-half only
        rows.append((eid, T0 + timedelta(days=1), u, "view", 1.0, "{}"))
        eid += 1
    rows.append((eid, T0 + timedelta(days=9), 50, "view", 1.0, "{}"))  # second
    r = mcnemar_halves_test(spark.createDataFrame(rows, COLS)).collect()[0]
    # boundary users 100/101 are single-half too: b = 3+1, c = 1+1
    assert r["b_first_only"] == 4 and r["c_second_only"] == 2
    assert r["n_both"] == 0
    assert r["chi2"] == pytest.approx((4 - 2) ** 2 / 6)
    assert not r["marginal_shift_5pct"]


def test_kmv_exact_below_k_and_bounded_above(spark):
    from inde1_spark.operators.analytics import KMV_K, kmv_distinct_by_source

    docs = [(i, f"small text {i}", "en", "small", 10) for i in range(5)]
    docs += [(100 + i, f"big text {i}", "en", "big", 10) for i in range(300)]
    out = {
        r["source"]: r
        for r in kmv_distinct_by_source(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    assert out["small"]["exact_distinct"] == 5 < KMV_K
    assert out["small"]["kmv_est"] == 5.0  # sketch holds the full set
    assert out["small"]["kmv_err_pct"] == 0.0
    big = out["big"]
    assert big["exact_distinct"] == 300
    # k=32 sketch: ~1/sqrt(k-1) = 18% stderr; 60% is a 3-sigma-plus bound
    assert abs(big["kmv_est"] - 300) / 300 < 0.6
    assert big["kmv_err_pct"] == pytest.approx(
        round(abs(big["kmv_est"] - 300) / 3, 2), abs=0.02
    )


def test_bridge_audit_separates_triangles_from_bridges(spark):
    from inde1_spark.operators.dedup import bridge_edges_audit

    tri_text = "alpha beta gamma delta epsilon zeta eta"
    pair_text = "one two three four five six seven eight"
    docs = [(i, tri_text, "en", "a", 10) for i in range(3)]  # triangle
    docs += [(10 + i, pair_text, "en", "b", 10) for i in range(2)]  # bridge
    out = {
        r["common_neighbors"]: r["n_edges"]
        for r in bridge_edges_audit(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    # triangle: each of 3 edges has exactly 1 common neighbor; the isolated
    # pair's single edge has none (the bridge)
    assert out == {0: 1, 1: 3}


def test_r09_batch_plan_shapes(spark):
    """Column pruning + join-strategy pins for the r09 batch (the
    test_plan_quality discipline; pinned before promotion, held after)."""
    import re

    import __spark_entry__ as entrymod

    Q = entrymod.queries()

    def schemas(name):
        r = plan_report(Q[name](spark, SF_SMOKE))
        return r, set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))

    r, s = schemas("file_compaction_plan")
    assert s == {"ts:timestamp_ntz"}  # one column feeds the whole plan
    assert r.exchanges <= 2 and r.sort_merge_joins == 0

    _, s = schemas("dedup_substring_windows")
    assert all(set(x.split(",")) <= {"doc_id:bigint", "text:string"} for x in s)

    _, s = schemas("kmv_distinct_by_source")
    assert all(
        set(x.split(",")) <= {"text:string", "source:string"} for x in s
    )

    r, s = schemas("nelson_aalen_hazard")
    assert all(
        set(x.split(",")) <= {"ts:timestamp_ntz", "user_id:bigint"} for x in s
    )

    r, _ = schemas("jm_query_likelihood")
    # bounded cq/ntot ride broadcasts, but the corpus-proportional dq
    # postings join the grid via ONE shuffled equi-join (ADVICE r08: a
    # broadcast there would ship a corpus-sized table to the driver)
    assert r.sort_merge_joins <= 1

    r, _ = schemas("sort_benefit_audit")
    assert r.sort_merge_joins == 0  # threshold grid + span ride broadcasts

    r, _ = schemas("bridge_edges_audit")
    # the persisted jaccard edge table is REUSED, not recomputed, by the
    # wedge join's three references
    assert r.raw.count("InMemoryTableScan") >= 3


def test_cochran_q_hand_computed(spark):
    from inde1_spark.operators.analytics import cochran_q_weeks

    # 4 users, activity on two adjacent epoch-dows: G has {3, 2} on two
    # treatments and 0 on five; T=5, sum L^2 = 7
    # Q = 6 * (16^2 + 9^2 + 5*5^2) / (7 * (7*5 - 7)) = 2772 / 196
    rows = []
    eid = 0
    for u, offsets in ((1, (0,)), (2, (0,)), (3, (0, 1)), (4, (1,))):
        for d in offsets:
            rows.append((eid, T0 + timedelta(days=d), u, "view", 1.0, "{}"))
            eid += 1
    r = cochran_q_weeks(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["n_users"] == 4 and r["n_active_cells"] == 5
    assert r["q_stat"] == pytest.approx(2772 / 196)
    assert r["dow_effect_5pct"]  # 14.14 > 12.59


def test_cochran_q_uniform_users_degenerate(spark):
    from inde1_spark.operators.analytics import cochran_q_weeks

    # every user active every dow -> k*T == sum L^2 -> den 0 -> Q = 0
    rows = []
    eid = 0
    for u in range(3):
        for d in range(7):
            rows.append((eid, T0 + timedelta(days=d), u, "view", 1.0, "{}"))
            eid += 1
    r = cochran_q_weeks(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["q_stat"] == 0.0 and not r["dow_effect_5pct"]


def test_morisita_horn_identical_and_disjoint(spark):
    from inde1_spark.operators.scoring import morisita_horn_overlap

    same = "alpha beta beta gamma gamma gamma"
    docs = [
        (1, same, "en", "a", 10),
        (2, same, "en", "b", 10),  # identical distribution -> MH exactly 1
        (3, "zeta eta theta", "en", "c", 10),  # disjoint from a and b
        (4, "alpha zeta", "en", "d", 10),  # partial overlap with a, b, c
    ]
    out = {
        (r["source_a"], r["source_b"]): r["morisita_horn"]
        for r in morisita_horn_overlap(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    assert out[("a", "b")] == 1.0
    assert ("a", "c") not in out and ("b", "c") not in out  # disjoint drop
    for key in (("a", "d"), ("b", "d"), ("c", "d")):
        assert 0.0 < out[key] < 1.0
