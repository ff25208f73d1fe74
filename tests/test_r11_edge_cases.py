"""Semantics + plan invariants for the r11 STAGED batch.

Same style as test_r09/r10_edge_cases: planted micro-datasets exercise the
property each operator's docstring claims; plan-shape pins hold the engine
invariants (column pruning, join strategy, no cartesian) so a later change
that breaks the 100 TB posture fails here before it reaches a gate window.
"""

from __future__ import annotations

import hashlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

from inde1_spark.plans.explain import plan_report
from tests.conftest import SF_SMOKE

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _py_hash_bucket(key: int, mod: int = 100) -> int:
    """Python mirror of operators/text.py:hash_bucket (md5 first-8 hex)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod


def _docs(spark, rows):
    # (doc_id, source, n_chars) triples; text/lang are irrelevant here
    return spark.createDataFrame(
        [(i, "x", "en", s, n) for i, s, n in rows], DOC_COLS
    )


# ---------------------------------------------------------------------------
# source_length_drift
# ---------------------------------------------------------------------------


def test_length_drift_identical_histograms_zero(spark):
    from inde1_spark.operators.analytics import source_length_drift

    # same binned histogram ({bin0: 1, bin1: 1}) on both sides -> TVD 0
    out = source_length_drift(
        _docs(spark, [(1, "a", 10), (2, "a", 60), (3, "b", 20), (4, "b", 55)])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    assert r["n_a"] == 2 and r["n_b"] == 2 and r["tvd"] == 0.0


def test_length_drift_disjoint_bins_and_cap(spark):
    from inde1_spark.operators.analytics import source_length_drift

    # 5000 chars lands in the capped top bin (19), 10 chars in bin 0:
    # disjoint histograms -> TVD exactly 1; the 49-vs-50 pair pins the
    # exact integer bin boundary (50 belongs to bin 1)
    out = {
        (r["source_a"], r["source_b"]): r["tvd"]
        for r in source_length_drift(
            _docs(spark, [(1, "a", 10), (2, "b", 5000), (3, "c", 49), (4, "d", 50)])
        ).collect()
    }
    assert out[("a", "b")] == 1.0
    assert out[("c", "d")] == 1.0  # 49 -> bin 0, 50 -> bin 1
    assert len(out) == 6  # every unordered pair exactly once


def test_length_drift_exact_ratio_uneven_sizes(spark):
    from inde1_spark.operators.analytics import source_length_drift

    # A: bins {0: 2, 1: 1} over n=3; B: {0: 1} over n=1
    # TVD = (|2*1-1*3| + |1*1-0*3|) / (2*3*1) = 2/6 -> 0.3333 (round-half-up)
    out = source_length_drift(
        _docs(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 60), (4, "b", 30)])
    ).collect()
    assert len(out) == 1
    assert out[0]["tvd"] == 0.3333


def test_length_drift_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["source_length_drift"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert r.sort_merge_joins == 0  # grid + fill-in ride broadcasts
    # the corpus scan is pruned to exactly (source, n_chars) and happens
    # once: every downstream consumer reads the persisted histogram
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"source:string,n_chars:bigint"}
    assert "InMemoryTableScan" in r.raw


# ---------------------------------------------------------------------------
# copartition_audit
# ---------------------------------------------------------------------------


def _copart_tables(spark, events_keys, cust_keys, orders_cust, orders_key,
                   li_order, li_part, part_keys):
    ev = spark.createDataFrame([(k,) for k in events_keys], ["user_id"])
    cu = spark.createDataFrame([(k,) for k in cust_keys], ["c_custkey"])
    od = spark.createDataFrame(
        list(zip(orders_cust, orders_key)), ["o_custkey", "o_orderkey"]
    )
    li = spark.createDataFrame(
        list(zip(li_order, li_part)), ["l_orderkey", "l_partkey"]
    )
    pt = spark.createDataFrame([(k,) for k in part_keys], ["p_partkey"])
    return ev, cu, od, li, pt


def test_copartition_broadcast_wins_over_skew(spark):
    from inde1_spark.operators.analytics import copartition_audit

    # tiny tables: every join's small side is under the broadcast row
    # limit, so even a pathologically skewed probe key reads 'broadcast'
    # (a broadcast join has no shuffle for skew to break)
    ev, cu, od, li, pt = _copart_tables(
        spark,
        events_keys=[1] * 9,  # one hot key
        cust_keys=[1, 2],
        orders_cust=[1, 1, 2],
        orders_key=[10, 11, 12],
        li_order=[10, 10, 11],
        li_part=[5, 5, 6],
        part_keys=[5, 6],
    )
    out = {r["join_name"]: r for r in copartition_audit(ev, cu, od, li, pt).collect()}
    assert len(out) == 4
    assert all(r["strategy"] == "broadcast" for r in out.values())
    e = out["events_customer"]
    assert e["n_left"] == 9 and e["n_right"] == 2
    assert e["probe_max_key_rows"] == 9  # skew measured even when broadcast
    assert e["nb_left"] == 1 and e["nb_right"] == 1 and e["rehash_factor"] == 1
    assert e["co_located"]


def test_copartition_cobucket_and_salt_branches(spark, monkeypatch):
    from inde1_spark.operators import analytics as A

    # shrink the ladder's constants so a 10-row fixture exercises it:
    # broadcast only under 1 row (never), 2 rows per bucket
    monkeypatch.setattr(A, "COPART_BROADCAST_ROWS", 1)
    monkeypatch.setattr(A, "BUCKET_TARGET_ROWS", 2)
    ev, cu, od, li, pt = _copart_tables(
        spark,
        events_keys=list(range(8)),       # 8 rows, flat -> nb 4, maxk 1
        cust_keys=[1, 2],                 # 2 rows -> nb 1
        orders_cust=[7, 7, 7, 7, 7],      # hot probe key: maxk 5 > target 2
        orders_key=[10, 11, 12, 13, 14],  # flat unique
        li_order=[10, 10, 11, 12],        # maxk 2 <= target 2
        li_part=[5, 5, 5, 6],             # probe is l_orderkey side for order join
        part_keys=[5, 6],
    )
    out = {
        r["join_name"]: r
        for r in A.copartition_audit(ev, cu, od, li, pt).collect()
    }
    # events(8 rows, nb 4) x customer(2 rows, nb 1): flat keys -> cobucket,
    # the larger layout hashes down 4x onto the smaller
    e = out["events_customer"]
    assert e["strategy"] == "cobucket"
    assert (e["nb_left"], e["nb_right"]) == (4, 1)
    assert e["rehash_factor"] == 4 and e["co_located"]
    # orders(probe side, one key holding 5 rows) x customer: no bucket
    # count can balance a key that alone overflows the target -> salt
    o = out["orders_customer"]
    assert o["probe_max_key_rows"] == 5 and o["strategy"] == "salt"
    # lineitem(4 rows) x orders(5 rows): the probe is the LARGER side —
    # orders, whose o_orderkey is flat -> cobucket (lineitem's maxk 2 is
    # not consulted; the smaller side rides the bucketed layout)
    lo = out["lineitem_orders"]
    assert lo["probe_max_key_rows"] == 1 and lo["strategy"] == "cobucket"
    # lineitem x part on l_partkey: probe (lineitem) maxk 3 > 2 -> salt
    lp = out["lineitem_part"]
    assert lp["probe_max_key_rows"] == 3 and lp["strategy"] == "salt"


def test_copartition_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["copartition_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # 4 single-row x single-row combines; nothing sort-merges
    assert r.sort_merge_joins == 0
    # every per-side scan is pruned to exactly its key column
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {
        "user_id:bigint",
        "c_custkey:bigint",
        "o_custkey:bigint",
        "o_orderkey:bigint",
        "l_orderkey:bigint",
        "l_partkey:bigint",
        "p_partkey:bigint",
    }


# ---------------------------------------------------------------------------
# semdedup_incremental
# ---------------------------------------------------------------------------

EMB_COLS = "vec_id long, embedding array<float>, label int"

# md5 hash lanes (mirror checked below): 2, 9, 10, 44 land in the default
# 10-percent batch lane; 1, 3, 4, 5 stand in the corpus
BATCH_IDS = (2, 9, 10, 44)
STANDING_IDS = (1, 3, 4, 5)


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows], EMB_COLS
    )


def test_semdedup_incremental_lanes_mirror():
    for i in BATCH_IDS:
        assert _py_hash_bucket(i) < 10
    for i in STANDING_IDS:
        assert _py_hash_bucket(i) >= 10


def test_semdedup_incremental_admission_verdicts(spark):
    from inde1_spark.operators.clustering import semdedup_incremental

    rows = [
        (1, [1.0, 0.0]),    # standing
        (3, [1.0, 0.0]),    # standing twin of 1 (same cluster after Lloyd)
        (4, [0.0, 1.0]),    # standing
        (5, [0.6, 0.8]),    # standing
        (2, [2.0, 0.0]),    # batch: scaled copy of [1,0] -> exact cos 1.0
        (9, [-1.0, 0.001]),  # batch: near-orthogonal to its cluster -> admit
        (10, [0.6, 0.8]),   # batch: identical to standing 5
        (44, [-0.7, 0.7]),  # batch: routes to [0,1], cos ~0.707 -> dup of 4
    ]
    out = {r["vec_new"]: r for r in semdedup_incremental(_emb(spark, rows)).collect()}
    assert set(out) == set(BATCH_IDS)
    # equal-cos tie between standing 1 and 3 breaks to the HIGHER id
    assert out[2]["dup_of"] == 3 and out[2]["cos_sim"] == 1.0 and not out[2]["admit"]
    assert out[10]["dup_of"] == 5 and out[10]["cos_sim"] == 1.0 and not out[10]["admit"]
    assert out[44]["dup_of"] == 4 and not out[44]["admit"]
    assert 0.7 < out[44]["cos_sim"] < 0.72
    # the admitted vector reports no match at all
    assert out[9]["admit"] and out[9]["dup_of"] is None and out[9]["cos_sim"] is None


def test_semdedup_incremental_degenerate_splits(spark):
    from inde1_spark.operators.clustering import semdedup_incremental

    rows = [(i, [1.0, 0.0]) for i in BATCH_IDS + STANDING_IDS]
    # empty standing corpus: nothing to match against -> everything admits
    all_batch = semdedup_incremental(_emb(spark, rows), batch_pct=100).collect()
    assert len(all_batch) == len(BATCH_IDS + STANDING_IDS)
    assert all(r["admit"] and r["dup_of"] is None for r in all_batch)
    # empty batch: no arrivals -> empty verdict table
    assert semdedup_incremental(_emb(spark, rows), batch_pct=0).count() == 0


def test_semdedup_incremental_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["semdedup_incremental"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # centroids travel as broadcasts; the only sort-merge is the verify
    # payload join downstream of the explicit candidate repartition
    assert r.broadcast_hash_joins >= 2
    assert r.sort_merge_joins <= 1
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    # embedding scans never read the label column
    assert all("label" not in s for s in schemas)


# ---------------------------------------------------------------------------
# repetition_rules
# ---------------------------------------------------------------------------


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame(
        [(doc_id, text, "en", "s", len(text))], DOC_COLS
    )


def test_repetition_rules_degenerate_doc_fails_all(spark):
    from inde1_spark.operators.text import repetition_rules

    r = repetition_rules(_doc(spark, "a b a b a b")).collect()[0]
    # unigrams a:3 b:3 of 6 -> 50.0; bigrams 'a b':3 of 5 -> 60.0;
    # trigrams 'a b a':2 + 'b a b':2, all repeated -> 100.0
    assert r["n_tokens"] == 6
    assert r["top1_pct"] == 50.0 and not r["flag_top1"]
    assert r["top2_pct"] == 60.0 and not r["flag_top2"]
    assert r["dup3_pct"] == 100.0 and not r["flag_dup3"]
    assert not r["keep"]


def test_repetition_rules_short_and_empty_docs(spark):
    from inde1_spark.operators.text import repetition_rules

    rows = {
        r["doc_id"]: r
        for r in repetition_rules(
            spark.createDataFrame(
                [(1, "", "en", "s", 0), (2, "x", "en", "s", 1)], DOC_COLS
            )
        ).collect()
    }
    # empty doc: no grams at any level -> all 0, keep (the spine join)
    e = rows[1]
    assert e["n_tokens"] == 0 and e["top1_pct"] == 0.0 and e["keep"]
    # single token: top1 is trivially 100 (fails); bigram/trigram levels
    # are absent -> 0 percent, their flags pass, keep fails on top1
    s = rows[2]
    assert s["n_tokens"] == 1 and s["top1_pct"] == 100.0
    assert not s["flag_top1"] and s["flag_top2"] and s["flag_dup3"]
    assert not s["keep"]


def test_repetition_rules_threshold_boundary_inclusive(spark):
    from inde1_spark.operators.text import REP_TOP1_MAX, repetition_rules

    assert REP_TOP1_MAX == 12.0
    # 3 of 25 tokens = exactly 12.00 percent -> flag passes (<=)
    text = " ".join(["a"] * 3 + [f"t{i}" for i in range(22)])
    r = repetition_rules(_doc(spark, text)).collect()[0]
    assert r["n_tokens"] == 25 and r["top1_pct"] == 12.0
    assert r["flag_top1"]


def test_repetition_rules_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["repetition_rules"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert r.sort_merge_joins <= 1  # the doc-id spine join at most
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    # gram scan prunes to (doc_id, text); the spine scan to doc_id alone
    assert schemas <= {"doc_id:bigint,text:string", "doc_id:bigint"}
