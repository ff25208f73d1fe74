"""Semantics + plan invariants for the r10 batch (promoted to the
production surface in the r10 window rotation; staged through r09).

Same style as test_r09_edge_cases: planted micro-datasets exercise the
property each operator's docstring claims; plan-shape pins hold the engine
invariants (column pruning, join strategy, no cartesian) so a later change
that breaks the 100 TB posture fails here before it reaches a gate window.
"""

from __future__ import annotations

import hashlib
import os
import sys
from datetime import datetime, timedelta

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.plans.explain import plan_report
from tests.conftest import SF_SMOKE

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
T0 = datetime(2024, 3, 4, 12, 0, 0)


def _py_hash_bucket(key: int, mod: int = 100) -> int:
    """Python mirror of operators/text.py:hash_bucket (md5 first-8 hex)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod


# ---------------------------------------------------------------------------
# archive_prune_audit
# ---------------------------------------------------------------------------


def test_archive_prune_counts_partitions_in_lookback(spark):
    from inde1_spark.operators.analytics import archive_prune_audit

    # three day-partitions: max day (1 row), max-1 (2 rows), max-5 (4 rows)
    rows, eid = [], 0
    for back, n in ((0, 1), (1, 2), (5, 4)):
        for _ in range(n):
            rows.append((eid, T0 - timedelta(days=back), 7, "view", 1.0, "{}"))
            eid += 1
    out = {
        r["lookback_days"]: r
        for r in archive_prune_audit(
            spark.createDataFrame(rows, COLS)
        ).collect()
    }
    assert [out[w]["parts_scanned"] for w in (1, 3, 7, 14, 30)] == [1, 2, 3, 3, 3]
    assert [out[w]["rows_scanned"] for w in (1, 3, 7, 14, 30)] == [1, 3, 7, 7, 7]
    assert out[1]["parts_total"] == 3 and out[1]["rows_total"] == 7
    assert out[1]["row_prune_pct"] == pytest.approx(85.71)
    assert out[30]["part_prune_pct"] == 0.0


# ---------------------------------------------------------------------------
# salting_plan
# ---------------------------------------------------------------------------


def test_salting_plan_exact_ceilings(spark):
    from inde1_spark.operators.analytics import salting_plan

    # 33 events on the hot key, 1 on the cold one: total 34 -> target
    # ceil(34/32) = 2; hot salt = ceil(33/2) = 17, cold clamps to 1
    rows = [(i, T0, 1, "view", 1.0, "{}") for i in range(33)]
    rows.append((99, T0, 2, "view", 1.0, "{}"))
    out = {
        r["user_id"]: r
        for r in salting_plan(spark.createDataFrame(rows, COLS)).collect()
    }
    assert out[1]["target_rows"] == 2 and out[1]["salt_factor"] == 17
    assert out[1]["load_pct"] == pytest.approx(1650.0)
    assert out[2]["salt_factor"] == 1


# ---------------------------------------------------------------------------
# bucketing_plan
# ---------------------------------------------------------------------------


def test_bucketing_plan_next_pow2_and_underfilled(spark):
    from inde1_spark.operators.analytics import bucketing_plan

    events = spark.range(5000).select(
        F.col("id").alias("user_id"), F.lit("view").alias("event_type")
    )
    orders = spark.range(10).select(
        F.col("id").alias("o_custkey"), F.col("id").alias("o_orderkey")
    )
    lineitem = spark.range(2048).select(
        F.col("id").alias("l_orderkey"), (F.col("id") % 4).alias("l_partkey")
    )
    out = {
        (r["table_name"], r["key_col"]): r
        for r in bucketing_plan(events, orders, lineitem).collect()
    }
    # 5000 rows -> ceil/2000 = 3 -> next pow2 = 4
    assert out[("events", "user_id")]["n_buckets"] == 4
    # single-valued key: 1 distinct value cannot fill 4 buckets
    assert out[("events", "event_type")]["ndv"] == 1
    assert out[("events", "event_type")]["underfilled"] is True
    # 2048 rows -> ceil/2000 = 2 -> pow2 stays 2 (boundary, not 4)
    assert out[("lineitem", "l_orderkey")]["n_buckets"] == 2
    # 10 rows -> 1 bucket
    assert out[("orders", "o_orderkey")]["n_buckets"] == 1
    assert out[("orders", "o_custkey")]["rows_per_key"] == 1.0


# ---------------------------------------------------------------------------
# window_completeness_audit
# ---------------------------------------------------------------------------


def test_window_completeness_global_yardstick(spark):
    from inde1_spark.operators.analytics import window_completeness_audit

    rows = [
        (0, T0, 1, "x", 1.0, "{}"),
        (1, T0 + timedelta(hours=2), 1, "x", 1.0, "{}"),
        (2, T0 + timedelta(hours=1), 1, "y", 1.0, "{}"),
    ]
    out = {
        r["event_type"]: r
        for r in window_completeness_audit(
            spark.createDataFrame(rows, COLS)
        ).collect()
    }
    # global span = hours {0,1,2} -> expected 3 for BOTH types
    assert out["x"]["expected_windows"] == 3
    assert out["x"]["observed_windows"] == 2 and out["x"]["missing_windows"] == 1
    assert out["x"]["completeness_pct"] == pytest.approx(66.67)
    assert out["y"]["observed_windows"] == 1 and out["y"]["missing_windows"] == 2


# ---------------------------------------------------------------------------
# value_drift_audit
# ---------------------------------------------------------------------------


def test_value_drift_tvd_extremes(spark):
    from inde1_spark.operators.analytics import value_drift_audit

    rows, eid = [], 0
    # type "moved": first half all in bin 0, second half all in bin 2
    for i in range(4):
        rows.append((eid, T0 + timedelta(hours=i), 1, "moved", 10.0, "{}"))
        eid += 1
    for i in range(4):
        rows.append(
            (eid, T0 + timedelta(hours=20 + i), 1, "moved", 120.0, "{}")
        )
        eid += 1
    # type "same": identical histograms either side of the boundary
    for h in (0, 23):
        for v in (10.0, 120.0):
            rows.append((eid, T0 + timedelta(hours=h), 1, "same", v, "{}"))
            eid += 1
    out = {
        r["event_type"]: r
        for r in value_drift_audit(spark.createDataFrame(rows, COLS)).collect()
    }
    assert out["moved"]["tvd"] == pytest.approx(1.0)
    assert out["same"]["tvd"] == pytest.approx(0.0)
    assert out["moved"]["n_first"] == 4 and out["moved"]["n_second"] == 4


# ---------------------------------------------------------------------------
# temporal_leakage_audit
# ---------------------------------------------------------------------------


def test_temporal_leakage_inclusion_exclusion(spark):
    from inde1_spark.operators.analytics import temporal_leakage_audit

    # span 0..100s -> boundary at 80s; u1 train-only, u2 both, u3 test-only
    rows = [
        (0, T0, 1, "x", 1.0, "{}"),
        (1, T0, 2, "x", 1.0, "{}"),
        (2, T0 + timedelta(seconds=90), 2, "x", 1.0, "{}"),
        (3, T0 + timedelta(seconds=90), 3, "x", 1.0, "{}"),
        (4, T0 + timedelta(seconds=100), 3, "x", 1.0, "{}"),
    ]
    r = temporal_leakage_audit(spark.createDataFrame(rows, COLS)).collect()[0]
    assert r["n_train_users"] == 2 and r["n_test_users"] == 2
    assert r["n_leak_users"] == 1
    assert r["leak_pct"] == pytest.approx(50.0)


# ---------------------------------------------------------------------------
# broadcast_plan_audit
# ---------------------------------------------------------------------------


def test_broadcast_plan_exact_size_model(spark):
    from inde1_spark.operators.analytics import broadcast_plan_audit

    region = spark.createDataFrame(
        [(1, "abcd")], ["r_regionkey", "r_name"]
    )
    nation = spark.createDataFrame(
        [(1, "xy", 1)], ["n_nationkey", "n_name", "n_regionkey"]
    )
    customer = spark.createDataFrame(
        [(1, "cc", 1, 0.0, "mm")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    supplier = spark.createDataFrame(
        [(1, "s", 1, 0.0)], ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    part = spark.createDataFrame(
        [(1, "p", "b", "t", 1, 0.0)],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.0, T0, "1-URGENT")],
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    lineitem = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", T0)],
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    out = {
        r["table_name"]: r
        for r in broadcast_plan_audit(
            region, nation, customer, supplier, part, orders, lineitem
        ).collect()
    }
    # region: 4 chars + 1 numeric col * 8 bytes = 12
    assert out["region"]["est_bytes"] == 12
    # nation: 2 chars + 2*8 = 18; customer: 2+2 chars + 3*8 = 28
    assert out["nation"]["est_bytes"] == 18
    assert out["customer"]["est_bytes"] == 28
    # orders: 1+8 chars + 4*8 = 41 (timestamp counts as a numeric cell)
    assert out["orders"]["est_bytes"] == 41
    assert all(r["strategy"] == "broadcast" for r in out.values())


# ---------------------------------------------------------------------------
# dedup_substring_incremental
# ---------------------------------------------------------------------------


def _pick_ids(n_batch: int, n_index: int) -> tuple[list[int], list[int]]:
    from inde1_spark.operators.dedup import SUBSTRING_INCR_PCT

    batch, index = [], []
    i = 0
    while len(batch) < n_batch or len(index) < n_index:
        if _py_hash_bucket(i) < SUBSTRING_INCR_PCT:
            if len(batch) < n_batch:
                batch.append(i)
        elif len(index) < n_index:
            index.append(i)
        i += 1
    return batch, index


def test_substring_incremental_admission(spark):
    from inde1_spark.operators.dedup import (
        SUBSTRING_WINDOW_TOKENS as W,
        dedup_substring_incremental,
    )

    (copy_id, fresh_id, short_id), (idx_id,) = _pick_ids(3, 1)
    boiler = " ".join(f"s{i}" for i in range(W + 5))  # 6 shared windows
    docs = [
        (idx_id, boiler, "en", "idx", 10),  # standing index
        (copy_id, boiler, "en", "new", 10),  # verbatim copy: reject
        (fresh_id, " ".join(f"u{i}" for i in range(W + 5)), "en", "new", 10),
        (short_id, "too short", "en", "new", 9),  # < w tokens: admit at 0
    ]
    out = {
        r["doc_id"]: r
        for r in dedup_substring_incremental(
            spark.createDataFrame(docs, DOC_COLS)
        ).collect()
    }
    assert set(out) == {copy_id, fresh_id, short_id}  # index doc not scored
    assert out[copy_id]["dup_pct"] == 100.0 and out[copy_id]["admitted"] is False
    assert out[fresh_id]["n_hits"] == 0 and out[fresh_id]["admitted"] is True
    assert out[short_id]["n_windows"] == 0 and out[short_id]["admitted"] is True


# ---------------------------------------------------------------------------
# dedup_pipeline_funnel
# ---------------------------------------------------------------------------


def test_funnel_stages_monotone_and_exact(spark):
    from inde1_spark.operators.dedup import dedup_pipeline_funnel

    good = " ".join(f"w{i}" for i in range(20))  # no stopwords: quality ~1
    docs = [
        (1, good, "en", "s", len(good)),
        (2, good, "en", "s", len(good)),  # exact dup of doc 1: dropped
        (3, "the a of and to in is", "en", "s", 21),  # all stopwords: low q
        (4, good + " x", "fr", "s", len(good) + 2),  # fails the lang gate
        (5, good + " y", "en", "s", len(good) + 2),  # survives everything
    ]
    r = dedup_pipeline_funnel(
        spark.createDataFrame(docs, DOC_COLS)
    ).collect()[0]
    assert r["n_total"] == 5
    assert r["n_after_exact"] == 4  # doc 2 deduped (keeper = min doc_id)
    assert r["n_after_quality"] == 3  # doc 3 under the 0.5 gate
    assert r["n_after_lang"] == 2  # doc 4 not en
    assert r["retention_pct"] == pytest.approx(40.0)
    assert (
        r["n_total"]
        >= r["n_after_exact"]
        >= r["n_after_quality"]
        >= r["n_after_lang"]
    )


# ---------------------------------------------------------------------------
# minhash_band_sweep
# ---------------------------------------------------------------------------


def test_band_sweep_identical_docs_full_recall(spark):
    from inde1_spark.operators.dedup import (
        BAND_SWEEP_CONFIGS,
        minhash_band_sweep,
    )

    same = " ".join(f"t{i}" for i in range(25))
    docs = [
        (1, same, "en", "a", 10),
        (2, same, "en", "b", 10),  # identical: every band fires in every cfg
        (3, " ".join(f"z{i}" for i in range(25)), "en", "c", 10),
    ]
    out = minhash_band_sweep(spark.createDataFrame(docs, DOC_COLS)).collect()
    assert len(out) == len(BAND_SWEEP_CONFIGS)
    for r in out:
        assert r["n_true_pairs"] == 1 and r["recall_pct"] == 100.0
        assert r["n_candidates"] >= 1
    # more rows per band = stricter buckets: candidate volume is monotone
    by_rows = sorted(out, key=lambda r: r["rows_per_band"])
    cands = [r["n_candidates"] for r in by_rows]
    assert cands == sorted(cands, reverse=True)


# ---------------------------------------------------------------------------
# semdedup_threshold_sweep
# ---------------------------------------------------------------------------


def test_semdedup_sweep_retention_monotone(spark):
    from inde1_spark.operators.clustering import (
        SEMDEDUP_SWEEP_THRESHOLDS,
        semdedup_threshold_sweep,
    )
    from inde1_spark.oracles import EMB_DIM

    e1 = [1.0] + [0.0] * (EMB_DIM - 1)
    e2 = [0.0, 1.0] + [0.0] * (EMB_DIM - 2)
    rows = [(1, e1, 0), (2, e1, 0), (3, e2, 1), (4, e2, 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    df = df.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    out = {r["threshold"]: r for r in semdedup_threshold_sweep(df).collect()}
    assert set(out) == set(SEMDEDUP_SWEEP_THRESHOLDS)
    # two identical pairs -> the higher vec_id of each is pruned at EVERY
    # threshold (cos_sim 1.0), retention 50% across the whole grid
    for t in SEMDEDUP_SWEEP_THRESHOLDS:
        assert out[t]["n_pruned"] == 2, t
        assert out[t]["retention_pct"] == pytest.approx(50.0)
    # retention is monotone non-decreasing in the threshold by construction
    rets = [out[t]["retention_pct"] for t in sorted(out)]
    assert rets == sorted(rets)


# ---------------------------------------------------------------------------
# fertility_by_source
# ---------------------------------------------------------------------------


def test_fertility_exact_counts(spark):
    from inde1_spark.operators.text import fertility_by_source

    # "ab cd," -> 2 whitespace words; BPE units: 'ab', 'cd', ',' -> 3
    docs = [(1, "ab cd,", "en", "s", 6)]
    r = fertility_by_source(spark.createDataFrame(docs, DOC_COLS)).collect()[0]
    assert r["n_words"] == 2 and r["n_subwords"] == 3
    assert r["fertility"] == pytest.approx(1.5)
    assert r["chars_per_subword"] == pytest.approx(2.0)


def test_fertility_empty_doc_guard(spark):
    from inde1_spark.operators.text import fertility_by_source

    r = fertility_by_source(
        spark.createDataFrame([(1, "", "en", "s", 0)], DOC_COLS)
    ).collect()[0]
    assert r["n_words"] == 0 and r["n_subwords"] == 0
    assert r["fertility"] == 0.0 and r["chars_per_subword"] == 0.0


# ---------------------------------------------------------------------------
# plan invariants + shapes (the test_plan_quality discipline; pinned while
# staged, held after promotion)
# ---------------------------------------------------------------------------

R10_BATCH = (
    "archive_prune_audit",
    "salting_plan",
    "bucketing_plan",
    "window_completeness_audit",
    "value_drift_audit",
    "temporal_leakage_audit",
    "broadcast_plan_audit",
    "dedup_substring_incremental",
    "dedup_pipeline_funnel",
    "minhash_band_sweep",
    "semdedup_threshold_sweep",
    "fertility_by_source",
)


def test_r10_batch_plan_invariants(spark):
    import __spark_entry__ as entrymod

    Q = entrymod.queries()
    assert set(R10_BATCH) <= set(Q)
    for name in R10_BATCH:
        r = plan_report(Q[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in r.raw, f"{name}: cartesian"
        assert "BatchEvalPython" not in r.raw, f"{name}: row Python UDF"
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            assert node not in r.raw, f"{name}: unexpected {node}"


def test_r10_batch_plan_shapes(spark):
    """Column pruning + join-strategy pins for the r10 batch."""
    import re

    import __spark_entry__ as entrymod

    Q = entrymod.queries()

    def schemas(name):
        r = plan_report(Q[name](spark, SF_SMOKE))
        return r, set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))

    # events audits prune to exactly the columns the statistic needs
    r, s = schemas("archive_prune_audit")
    assert s == {"ts:timestamp_ntz"}
    assert r.sort_merge_joins == 0  # span + grid ride broadcasts

    r, s = schemas("salting_plan")
    assert s == {"user_id:bigint"}
    assert "TakeOrderedAndProject" in r.raw  # top-k, never a global sort

    _, s = schemas("window_completeness_audit")
    assert all(
        set(x.split(",")) <= {"event_type:string", "ts:timestamp_ntz"}
        for x in s
    )

    _, s = schemas("value_drift_audit")
    assert all(
        set(x.split(","))
        <= {"event_type:string", "ts:timestamp_ntz", "value:double"}
        for x in s
    )

    _, s = schemas("temporal_leakage_audit")
    assert all(
        set(x.split(","))
        <= {"event_type:string", "ts:timestamp_ntz", "user_id:bigint"}
        for x in s
    )

    # per-key one-row aggregates: every scan pruned to its single key col
    _, s = schemas("bucketing_plan")
    assert all(len(x.split(",")) == 1 for x in s), s

    # the size model never reads a numeric column (count(*) covers them)
    _, s = schemas("broadcast_plan_audit")
    numericish = ("bigint", "double", "int", "timestamp")
    assert all(
        not any(t in col for t in numericish)
        for x in s
        for col in x.split(",")
        if x
    ), s

    _, s = schemas("dedup_substring_incremental")
    assert all(set(x.split(",")) <= {"doc_id:bigint", "text:string"} for x in s)

    _, s = schemas("dedup_pipeline_funnel")
    assert all(
        set(x.split(","))
        <= {
            "doc_id:bigint",
            "text:string",
            "lang:string",
            "source:string",
            "n_chars:bigint",
        }
        for x in s
    )

    r, s = schemas("minhash_band_sweep")
    assert all(set(x.split(",")) <= {"doc_id:bigint", "text:string"} for x in s)
    # signatures + truth are persisted and REUSED across the 30 band
    # selects and 4 config aggregates — not recomputed per config
    assert r.raw.count("InMemoryTableScan") >= 8

    # the plan_report regex stops at the first '>', so array<float> captures
    # truncated; '' is the zero-column count(*) scan feeding n_vecs
    r, s = schemas("semdedup_threshold_sweep")
    assert all(
        set(x.split(",")) <= {"vec_id:bigint", "embedding:array<float", ""}
        for x in s
    )

    _, s = schemas("fertility_by_source")
    assert all(
        set(x.split(","))
        <= {"source:string", "text:string", "n_chars:bigint"}
        for x in s
    )
