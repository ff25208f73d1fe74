"""Semantics + plan invariants for the r14 STAGED batch (+ r15 tranche 1).

Same style as test_r11/r12/r13_edge_cases: planted micro-datasets exercise
the property each operator's docstring claims; plan-shape pins hold the
engine invariants (column pruning, join strategy, no cartesian) so a later
change that breaks the 100 TB posture fails here before it reaches a gate
window.
"""

from __future__ import annotations

import os
import re
import sys
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.plans.explain import plan_report
from tests.conftest import SF_SMOKE

EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
T0 = datetime(2024, 3, 4, 0, 0, 0)


def _rhu(num: int, den: int) -> int:
    """round_half_up(num/den) for nonnegative exact ints."""
    return (num * 2 + den) // (2 * den)


def _ev(eid: int, uid: int, sec: int):
    return (eid, T0 + timedelta(seconds=sec), uid, "view", 1.0, "{}")


# ---------------------------------------------------------------------------
# cache_hit_curve
# ---------------------------------------------------------------------------


def test_cache_hit_curve_exact_concentration(spark):
    from inde1_spark.operators.analytics import CACHE_PCTS, cache_hit_curve

    # frequencies 10/5/3/1/1 -> ranked cum coverage 10,15,18,19,20
    freqs = {1: 10, 2: 5, 3: 3, 4: 1, 5: 1}
    rows, eid = [], 0
    for uid, k in freqs.items():
        for _ in range(k):
            rows.append(_ev(eid, uid, eid))
            eid += 1
    out = {
        r["cache_pct"]: r
        for r in cache_hit_curve(spark.createDataFrame(rows, EVENT_COLS)).collect()
    }
    assert set(out) == set(CACHE_PCTS)
    cum = [10, 15, 18, 19, 20]
    n_events = 20
    for pct in CACHE_PCTS:
        r = out[pct]
        keys = max(1, 5 * pct // 100)
        covered = cum[keys - 1]
        assert r["keys_cached"] == keys, pct
        assert r["events_covered"] == covered, pct
        assert r["n_keys"] == 5 and r["n_events"] == n_events
        assert r["hit_pct"] == _rhu((covered - keys) * 100 * 100, n_events) / 100
        assert r["coverage_pct"] == _rhu(covered * 100 * 100, n_events) / 100
    # a frequency-aware cache of 20% of this universe already covers half
    assert out[20]["coverage_pct"] == 50.0
    assert out[100]["hit_pct"] == 75.0  # 5 compulsory misses out of 20


def test_cache_hit_curve_tie_break_is_total(spark):
    from inde1_spark.operators.analytics import cache_hit_curve

    # all keys equally hot: rank order must fall back to user_id, so the
    # 1-key row always picks user 1's coverage regardless of partitioning
    rows = [_ev(i, (i % 4) + 1, i) for i in range(8)]
    out = {
        r["cache_pct"]: r
        for r in cache_hit_curve(spark.createDataFrame(rows, EVENT_COLS)).collect()
    }
    assert out[1]["keys_cached"] == 1 and out[1]["events_covered"] == 2
    assert out[100]["events_covered"] == 8


def test_cache_hit_curve_empty_is_empty(spark):
    from inde1_spark.operators.analytics import cache_hit_curve

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert cache_hit_curve(empty).count() == 0


def test_cache_hit_curve_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["cache_hit_curve"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # the bounded grid broadcasts into the rank equi-join, never SMJ
    assert r.broadcast_hash_joins >= 1 and r.sort_merge_joins == 0
    # only the key column is consumed, so the scan prunes to user_id
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"user_id:bigint"}


# ---------------------------------------------------------------------------
# allowed_lateness_sweep
# ---------------------------------------------------------------------------


def test_allowed_lateness_sweep_keyed_running_max(spark):
    from inde1_spark.operators.analytics import (
        LATENESS_DELAYS_S,
        allowed_lateness_sweep,
    )

    rows = [
        # user 1: one 50 s event-time regression in id order
        _ev(1, 1, 100),
        _ev(2, 1, 50),
        _ev(3, 1, 200),
        # user 2: monotone
        _ev(4, 2, 0),
        _ev(5, 2, 10),
        # user 3: earlier than user 1's max — keyed, so NOT late
        _ev(6, 3, 5),
    ]
    out = {
        r["delay_s"]: r
        for r in allowed_lateness_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(LATENESS_DELAYS_S)
    for d in LATENESS_DELAYS_S:
        r = out[d]
        assert r["n_events"] == 6
        assert r["max_lateness_s"] == 50
        expect = 1 if d < 50 else 0
        assert r["n_dropped"] == expect, d
        assert r["drop_pct"] == _rhu(expect * 100 * 10**4, 6) / 10**4


def test_allowed_lateness_sweep_monotone_in_delay(spark):
    from inde1_spark.operators.analytics import allowed_lateness_sweep

    # regressions of three magnitudes: 30 s, 400 s, 4000 s
    rows = [
        _ev(1, 1, 5000),
        _ev(2, 1, 4970),
        _ev(3, 1, 4600),
        _ev(4, 1, 1000),
    ]
    out = [
        (r["delay_s"], r["n_dropped"])
        for r in allowed_lateness_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    ]
    assert out == [(0, 3), (60, 2), (300, 2), (900, 1), (3600, 1)]


def test_allowed_lateness_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import allowed_lateness_sweep

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert allowed_lateness_sweep(empty).count() == 0


def test_allowed_lateness_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["allowed_lateness_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # keyed window: the per-user hash partitioning, never a global sort of
    # the corpus (a single-partition window would print an empty clause)
    assert "hashpartitioning(user_id" in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"event_id:bigint,ts:timestamp_ntz,user_id:bigint"}


# ---------------------------------------------------------------------------
# blocking_key_sweep
# ---------------------------------------------------------------------------


def _bks_docs(spark):
    same = "w1 w2 w3 w4 w5"
    rows = [
        (1, same, "en", "a", 100),
        (2, same, "en", "b", 100),
        (3, same, "fr", "a", 400),
        (4, "x1 x2 x3 x4 x5", "en", "a", 100),
    ]
    return spark.createDataFrame(rows, DOC_COLS)


def test_blocking_key_sweep_metrics_exact(spark):
    from inde1_spark.operators.dedup import blocking_key_sweep

    # truth pairs: (1,2),(1,3),(2,3) — identical texts, Jaccard 1.0
    out = {r["feature"]: r for r in blocking_key_sweep(_bks_docs(spark)).collect()}
    assert set(out) == {"lang", "source", "len_band", "lang_source"}
    # blocks: lang en={1,2,4} fr={3}; source a={1,3,4} b={2};
    # len_band (FS_LEN_BAND=256) 0={1,2,4} 1={3}; lang_source {1,4},{2},{3}
    for feat, (nb, mb, cand, cob) in {
        "lang": (2, 3, 3, 1),       # co-blocked truth pair: (1,2)
        "source": (2, 3, 3, 1),     # (1,3)
        "len_band": (2, 3, 3, 1),   # (1,2)
        "lang_source": (3, 2, 1, 0),
    }.items():
        r = out[feat]
        assert r["n_blocks"] == nb, feat
        assert r["max_block"] == mb, feat
        assert r["cand_pairs"] == str(cand), feat
        assert r["cand_pairs_approx"] == float(cand), feat
        assert r["n_true_pairs"] == 3, feat
        assert r["n_coblocked"] == cob, feat
        # reduction vs all-pairs bill n(n-1)/2 = 6
        assert r["reduction_pct"] == _rhu((12 - 2 * cand) * 100 * 10**4, 12) / 10**4
        assert r["completeness_pct"] == _rhu(cob * 100 * 100, 3) / 100


def test_blocking_key_sweep_no_truth_pairs_is_null(spark):
    from inde1_spark.operators.dedup import blocking_key_sweep

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "en", "a", 100),
            (2, "one two three four five", "en", "a", 100),
        ],
        DOC_COLS,
    )
    for r in blocking_key_sweep(docs).collect():
        assert r["n_true_pairs"] == 0 and r["n_coblocked"] == 0
        assert r["completeness_pct"] is None
        # block metrics still priced: both docs share every candidate key
        assert r["cand_pairs"] == "1" and r["reduction_pct"] == 0.0


def test_blocking_key_sweep_empty_is_empty(spark):
    from inde1_spark.operators.dedup import blocking_key_sweep

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert blocking_key_sweep(empty).count() == 0


def test_blocking_key_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["blocking_key_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert r.nested_loop_joins == 0


# ---------------------------------------------------------------------------
# ttl_staleness_sweep
# ---------------------------------------------------------------------------


def test_ttl_staleness_sweep_exact_and_boundary(spark):
    from inde1_spark.operators.analytics import TTL_DELAYS_S, ttl_staleness_sweep

    # user 1: gaps 100, 400; user 2: single touch; user 3: gap EXACTLY 60
    # (== TTL is fresh — strict >, the entry expires AFTER ttl seconds)
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 100),
        _ev(3, 1, 500),
        _ev(4, 2, 50),
        _ev(5, 3, 1000),
        _ev(6, 3, 1060),
    ]
    out = {
        r["ttl_s"]: r
        for r in ttl_staleness_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(TTL_DELAYS_S)
    refetch = {60: 2, 300: 1, 900: 0, 3600: 0, 86400: 0}
    for t, nr in refetch.items():
        r = out[t]
        assert r["n_events"] == 6 and r["n_keys"] == 3
        assert r["n_refetch"] == nr, t
        assert r["n_miss"] == 3 + nr
        assert r["max_gap_s"] == 400
        assert r["miss_pct"] == _rhu((3 + nr) * 100 * 10**4, 6) / 10**4
        assert r["refetch_pct"] == _rhu(nr * 100 * 10**4, 6) / 10**4


def test_ttl_staleness_sweep_single_touch_keys_max_gap_null(spark):
    from inde1_spark.operators.analytics import ttl_staleness_sweep

    rows = [_ev(1, 1, 0), _ev(2, 2, 10)]
    for r in ttl_staleness_sweep(spark.createDataFrame(rows, EVENT_COLS)).collect():
        assert r["n_keys"] == 2 and r["n_refetch"] == 0
        assert r["max_gap_s"] is None  # no second touch anywhere
        assert r["miss_pct"] == 100.0 and r["refetch_pct"] == 0.0


def test_ttl_staleness_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import ttl_staleness_sweep

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert ttl_staleness_sweep(empty).count() == 0


def test_ttl_staleness_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["ttl_staleness_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # keyed lag window, never a global ordered scan
    assert "hashpartitioning(user_id" in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"event_id:bigint,ts:timestamp_ntz,user_id:bigint"}


# ---------------------------------------------------------------------------
# trigger_interval_sweep
# ---------------------------------------------------------------------------


def test_trigger_interval_sweep_exact_buckets(spark):
    from inde1_spark.operators.analytics import (
        TRIGGER_INTERVALS_S,
        trigger_interval_sweep,
    )

    # offsets 0,5,9,10,65,610 — 10 is a bucket BOUNDARY at T=10
    rows = [_ev(i, 1, s) for i, s in enumerate([0, 5, 9, 10, 65, 610])]
    out = {
        r["trigger_s"]: r
        for r in trigger_interval_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(TRIGGER_INTERVALS_S)
    # T -> (n_batches, max_batch, n_slots)
    expect = {
        10: (4, 3, 62),
        60: (3, 4, 11),
        300: (2, 5, 3),
        900: (1, 6, 1),
        3600: (1, 6, 1),
    }
    for t, (nb, mx, ns) in expect.items():
        r = out[t]
        assert r["n_events"] == 6
        assert r["n_batches"] == nb, t
        assert r["max_batch"] == mx, t
        assert r["n_slots"] == ns, t
        assert r["n_empty"] == ns - nb
        assert r["mean_batch"] == _rhu(6 * 100, nb) / 100
        assert r["peak_to_mean_pct"] == _rhu(mx * nb * 100 * 100, 6) / 100
        assert r["duty_pct"] == _rhu(nb * 100 * 100, ns) / 100


def test_trigger_interval_sweep_crosses_midnight(spark):
    from inde1_spark.operators.analytics import trigger_interval_sweep

    # 23:59:30 and 00:00:30 next day land in DIFFERENT 60 s buckets but
    # ADJACENT slots — the day-index spelling keeps the absolute axis
    # continuous across the date boundary
    rows = [_ev(1, 1, 86400 - 30), _ev(2, 1, 86400 + 30)]
    out = {
        r["trigger_s"]: r
        for r in trigger_interval_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert out[60]["n_batches"] == 2 and out[60]["n_slots"] == 2
    assert out[3600]["n_batches"] == 2 and out[3600]["n_slots"] == 2
    assert out[900]["n_slots"] == 2  # 95 and 96


def test_trigger_interval_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import trigger_interval_sweep

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert trigger_interval_sweep(empty).count() == 0


def test_trigger_interval_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["trigger_interval_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # only the timestamp feeds the bucket axis
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz"}


# ---------------------------------------------------------------------------
# truncation_loss_sweep
# ---------------------------------------------------------------------------


def test_truncation_loss_sweep_exact_and_boundary(spark):
    from inde1_spark.operators.corpus import SEQ_LEN_GRID, truncation_loss_sweep

    # token counts 0 (empty text), 1, 128 (== L boundary, NOT truncated),
    # 129, 10000
    def doc(i, n):
        return (i, " ".join(["t"] * n), "en", "a", n)

    docs = spark.createDataFrame(
        [doc(1, 0), doc(2, 1), doc(3, 128), doc(4, 129), doc(5, 10000)],
        DOC_COLS,
    )
    out = {r["max_len"]: r for r in truncation_loss_sweep(docs).collect()}
    assert set(out) == set(SEQ_LEN_GRID)
    lost = {128: (2, 1 + 9872), 512: (1, 9488), 2048: (1, 7952), 8192: (1, 1808)}
    for L, (nt, tl) in lost.items():
        r = out[L]
        assert r["n_docs"] == 5 and r["n_tokens"] == 10258
        assert r["n_docs_truncated"] == nt, L
        assert r["tokens_lost"] == tl, L
        assert r["max_doc_tokens"] == 10000
        assert r["trunc_doc_pct"] == _rhu(nt * 100 * 10**4, 5) / 10**4
        assert r["token_loss_pct"] == _rhu(tl * 100 * 10**4, 10258) / 10**4


def test_truncation_loss_sweep_all_short_is_zero_loss(spark):
    from inde1_spark.operators.corpus import truncation_loss_sweep

    docs = spark.createDataFrame(
        [(1, "a b c", "en", "a", 5), (2, "d e", "en", "a", 3)], DOC_COLS
    )
    for r in truncation_loss_sweep(docs).collect():
        assert r["n_docs_truncated"] == 0 and r["tokens_lost"] == 0
        assert r["trunc_doc_pct"] == 0.0 and r["token_loss_pct"] == 0.0


def test_truncation_loss_sweep_empty_is_empty(spark):
    from inde1_spark.operators.corpus import truncation_loss_sweep

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert truncation_loss_sweep(empty).count() == 0


def test_truncation_loss_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["truncation_loss_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"text:string"}


# ---------------------------------------------------------------------------
# lsh_bucket_balance_audit
# ---------------------------------------------------------------------------


def test_lsh_bucket_balance_identical_docs_own_every_band(spark):
    from inde1_spark.operators.dedup import N_BANDS, lsh_bucket_balance_audit

    same = "a b c d e f g"
    docs = spark.createDataFrame(
        [
            (1, same, "en", "a", 10),
            (2, same, "en", "a", 10),
            (3, same, "en", "a", 10),
            (4, "p q r s t u v", "en", "a", 10),
        ],
        DOC_COLS,
    )
    out = lsh_bucket_balance_audit(docs).collect()
    assert [r["band"] for r in out] == list(range(N_BANDS))
    for r in out:
        # the three identical docs share every band bucket; the distinct
        # doc lands elsewhere (disjoint shingles -> disjoint sids)
        assert r["n_docs"] == 4
        assert r["max_bucket"] == 3 and r["buckets_multi"] == 1
        assert r["n_buckets"] == 2
        assert r["cand_pairs"] == "3" and r["cand_pairs_approx"] == 3.0
        assert r["top_bucket_share_pct"] == 100.0


def test_lsh_bucket_balance_no_collisions_is_null_share(spark):
    from inde1_spark.operators.dedup import lsh_bucket_balance_audit

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "a", 10),
            (2, "one two three four", "en", "a", 10),
        ],
        DOC_COLS,
    )
    for r in lsh_bucket_balance_audit(docs).collect():
        assert r["buckets_multi"] == 0 and r["max_bucket"] == 1
        assert r["cand_pairs"] == "0"
        assert r["top_bucket_share_pct"] is None


def test_lsh_bucket_balance_empty_is_empty(spark):
    from inde1_spark.operators.dedup import lsh_bucket_balance_audit

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert lsh_bucket_balance_audit(empty).count() == 0


def test_lsh_bucket_balance_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["lsh_bucket_balance_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # counts-only: the signature groupBy feeds aggregates, never a join
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"doc_id:bigint,text:string"}


# ---------------------------------------------------------------------------
# shuffle_width_sweep
# ---------------------------------------------------------------------------


def test_shuffle_width_sweep_matches_python_hash(spark):
    import hashlib

    from inde1_spark.operators.analytics import SHUFFLE_WIDTHS, shuffle_width_sweep

    freqs = {1: 7, 2: 5, 3: 3, 4: 2, 5: 1, 6: 1, 7: 1}
    rows, eid = [], 0
    for uid, k in freqs.items():
        for _ in range(k):
            rows.append(_ev(eid, uid, eid))
            eid += 1
    out = {
        r["width"]: r
        for r in shuffle_width_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(SHUFFLE_WIDTHS)
    for w in SHUFFLE_WIDTHS:
        loads = {}
        for uid, k in freqs.items():
            b = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % w
            loads[b] = loads.get(b, 0) + k
        r = out[w]
        assert r["n_events"] == 20 and r["n_keys"] == 7
        assert r["reducers_used"] == len(loads), w
        assert r["n_idle"] == w - len(loads)
        assert r["max_load"] == max(loads.values()), w
        assert r["mean_load"] == _rhu(20 * 100, len(loads)) / 100
        assert (
            r["peak_to_mean_pct"]
            == _rhu(max(loads.values()) * len(loads) * 100 * 100, 20) / 100
        )


def test_shuffle_width_sweep_one_hot_key_is_width_immune(spark):
    from inde1_spark.operators.analytics import shuffle_width_sweep

    # all events on one key: max_load == n_events at EVERY width — the
    # residual peak a wider shuffle cannot fix (salting_plan's regime)
    rows = [_ev(i, 42, i) for i in range(9)]
    for r in shuffle_width_sweep(spark.createDataFrame(rows, EVENT_COLS)).collect():
        assert r["reducers_used"] == 1 and r["max_load"] == 9
        assert r["mean_load"] == 9.0 and r["peak_to_mean_pct"] == 100.0


def test_shuffle_width_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import shuffle_width_sweep

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert shuffle_width_sweep(empty).count() == 0


def test_shuffle_width_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["shuffle_width_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"user_id:bigint"}


# ---------------------------------------------------------------------------
# retention_policy_sweep
# ---------------------------------------------------------------------------


def _ret_ev(eid: int, uid: int, age_d: int):
    # frontier is the newest day; age_d = days before it
    return (eid, T0 + timedelta(days=400 - age_d), uid, "view", 1.0, "{}")


def test_retention_policy_sweep_exact_and_boundary(spark):
    from inde1_spark.operators.analytics import (
        RETENTION_HORIZONS_D,
        retention_policy_sweep,
    )

    # ages 0, 6, 7, 29, 400 — age 7 is the H=7 BOUNDARY (dropped: the
    # policy keeps strictly-younger-than-H days, frontier inclusive)
    rows = [
        _ret_ev(1, 1, 0),
        _ret_ev(2, 2, 6),
        _ret_ev(3, 3, 7),
        _ret_ev(4, 4, 29),
        _ret_ev(5, 1, 400),
    ]
    out = {
        r["horizon_d"]: r
        for r in retention_policy_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(RETENTION_HORIZONS_D)
    expect = {
        7: (2, 2, 2),    # events kept, keys kept, days kept
        30: (4, 4, 4),
        90: (4, 4, 4),
        365: (4, 4, 4),
    }
    for h, (ne, nk, nd) in expect.items():
        r = out[h]
        assert r["n_events"] == 5 and r["n_keys"] == 4
        assert r["n_events_kept"] == ne, h
        assert r["n_keys_kept"] == nk, h
        assert r["n_days_kept"] == nd, h
        assert r["kept_pct"] == _rhu(ne * 100 * 10**4, 5) / 10**4
        assert r["keys_lost_pct"] == _rhu((4 - nk) * 100 * 10**4, 4) / 10**4
    # user 1 has an event at the frontier AND one 400 days back: the key
    # SURVIVES every horizon (keys_lost counts fully evicted keys only)
    assert out[7]["n_keys_kept"] == 2


def test_retention_policy_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import retention_policy_sweep

    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, event_type string, value double, props string")
    assert retention_policy_sweep(empty).count() == 0


def test_retention_policy_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["retention_policy_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # the frontier is a 1-row broadcast, never a shuffled join; its scan
    # prunes to ts alone while the fact side reads (ts, user_id)
    assert r.sort_merge_joins == 0
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz,user_id:bigint", "ts:timestamp_ntz"}


# ---------------------------------------------------------------------------
# column_completeness_audit
# ---------------------------------------------------------------------------

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_column_completeness_audit_exact(spark):
    from inde1_spark.operators.analytics import column_completeness_audit

    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0, 2, "", 2.0, "{}"),          # empty event_type
        (3, T0, None, None, 3.0, "{}"),      # null user_id + event_type
        (4, T0, 4, "view", None, ""),        # null value, empty props
    ]
    out = {
        r["col_name"]: r
        for r in column_completeness_audit(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    assert set(out) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    expect = {
        # col -> (n_null, n_empty or None)
        "event_id": (0, None),
        "ts": (0, None),
        "user_id": (1, None),
        "event_type": (1, 1),
        "value": (1, None),
        "props": (0, 1),
    }
    for c, (nn, ne) in expect.items():
        r = out[c]
        assert r["n_rows"] == 4, c
        assert r["n_null"] == nn, c
        assert r["null_pct"] == _rhu(nn * 100 * 10**4, 4) / 10**4
        assert r["n_empty"] == ne, c
        if ne is None:
            assert r["empty_pct"] is None, c
        else:
            assert r["empty_pct"] == _rhu(ne * 100 * 10**4, 4) / 10**4


def test_column_completeness_audit_empty_is_empty(spark):
    from inde1_spark.operators.analytics import column_completeness_audit

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert column_completeness_audit(empty).count() == 0


def test_column_completeness_audit_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["column_completeness_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert r.sort_merge_joins == 0 and r.nested_loop_joins == 0


# ---------------------------------------------------------------------------
# scan_split_sweep
# ---------------------------------------------------------------------------


def test_scan_split_sweep_exact_ceil_and_runts(spark):
    from inde1_spark.operators.analytics import scan_split_sweep

    # day 1: 10 rows -> 640 modeled bytes; day 2: 2 rows -> 128
    rows = [_ev(i, 1, i) for i in range(10)] + [
        _ev(100, 1, 86400 + 1),
        _ev(101, 1, 86400 + 2),
    ]
    out = {
        r["split_bytes"]: r
        for r in scan_split_sweep(
            spark.createDataFrame(rows, EVENT_COLS), splits=(100, 1000)
        ).collect()
    }
    r = out[100]
    # ceil(640/100)=7 tasks rem 40 (runt), ceil(128/100)=2 rem 28 (runt)
    assert r["n_days"] == 2 and r["total_bytes"] == 768
    assert r["n_tasks"] == 9 and r["runt_tasks"] == 2
    assert r["max_task_bytes"] == 100
    assert r["mean_task_bytes"] == float(_rhu(768, 9))
    assert r["runt_pct"] == _rhu(2 * 100 * 100, 9) / 100
    r = out[1000]
    # whole days fit: rem == day_bytes; 128*2 < 1000 is the only runt
    assert r["n_tasks"] == 2 and r["runt_tasks"] == 1
    assert r["max_task_bytes"] == 640
    assert r["mean_task_bytes"] == 384.0 and r["runt_pct"] == 50.0


def test_scan_split_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import scan_split_sweep

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert scan_split_sweep(empty).count() == 0


def test_scan_split_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["scan_split_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz"}


# ---------------------------------------------------------------------------
# rate_limit_sweep
# ---------------------------------------------------------------------------


def test_rate_limit_sweep_lindley_exact(spark):
    from inde1_spark.operators.analytics import RATE_PCTS, rate_limit_sweep

    # minute 0: 10 arrivals; minute 1 empty; minute 2: 4 — span 3, total 14
    rows = [_ev(i, 1, i) for i in range(10)] + [
        _ev(100 + i, 1, 120 + i) for i in range(4)
    ]
    out = {
        r["rate_pct"]: r
        for r in rate_limit_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(RATE_PCTS)
    # R = ceil(14*pct/300); hand-rolled Lindley per R over [10, 0, 4]
    expect = {
        50: (3, 7, 2, 5, 2),    # R, peak, backlogged minutes, end, drain
        75: (4, 6, 2, 2, 1),
        100: (5, 5, 1, 0, 0),
        150: (7, 3, 1, 0, 0),
        300: (14, 0, 0, 0, 0),
    }
    for pct, (R, peak, nb, end, drain) in expect.items():
        r = out[pct]
        assert r["n_events"] == 14 and r["n_minutes"] == 2
        assert r["span_min"] == 3
        assert r["rate_per_min"] == R, pct
        assert r["peak_backlog"] == peak, pct
        assert r["backlogged_minutes"] == nb, pct
        assert r["backlogged_pct"] == _rhu(nb * 100 * 100, 2) / 100
        assert r["drain_min"] == drain, pct


def test_rate_limit_sweep_gap_drains_fully(spark):
    from inde1_spark.operators.analytics import rate_limit_sweep

    # burst of 10, nine empty minutes, then 1 arrival: at R=1 the gap
    # drains the whole backlog before the second burst lands
    rows = [_ev(i, 1, i) for i in range(10)] + [_ev(99, 1, 600)]
    out = {
        r["rate_pct"]: r
        for r in rate_limit_sweep(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    # pct100: R = ceil(11*100/1100) = 1
    r = out[100]
    assert r["rate_per_min"] == 1 and r["span_min"] == 11
    assert r["peak_backlog"] == 9
    assert r["backlogged_minutes"] == 1  # only the burst minute
    assert r["drain_min"] == 0


def test_rate_limit_sweep_empty_is_empty(spark):
    from inde1_spark.operators.analytics import rate_limit_sweep

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert rate_limit_sweep(empty).count() == 0


def test_rate_limit_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["rate_limit_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert r.sort_merge_joins == 0
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz"}


# ---------------------------------------------------------------------------
# watermark_state_tradeoff (r15 tranche 1)
# ---------------------------------------------------------------------------


def test_watermark_state_tradeoff_exact_sliding_peak(spark):
    from inde1_spark.operators.analytics import (
        LATENESS_DELAYS_S,
        watermark_state_tradeoff,
    )

    # cells: (u1, m0) (u2, m0) (u1, m1) (u1, m5); the two u1 events in
    # minute 0 collapse to ONE state cell
    rows = [
        _ev(1, 1, 0),
        _ev(2, 1, 30),
        _ev(3, 2, 10),
        _ev(4, 1, 60),
        _ev(5, 1, 300),
    ]
    out = {
        r["delay_s"]: r
        for r in watermark_state_tradeoff(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == set(LATENESS_DELAYS_S)
    peaks = {0: 2, 60: 3, 300: 4, 900: 4, 3600: 4}
    for d, peak in peaks.items():
        r = out[d]
        assert r["n_cells"] == 4 and r["n_minutes"] == 3
        assert r["window_min"] == d // 60
        assert r["peak_state_rows"] == peak, d
        assert r["peak_state_bytes"] == peak * 64
        assert r["peak_share_pct"] == _rhu(peak * 100 * 100, 4) / 100


def test_watermark_state_tradeoff_empty_is_empty(spark):
    from inde1_spark.operators.analytics import watermark_state_tradeoff

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert watermark_state_tradeoff(empty).count() == 0


def test_watermark_state_tradeoff_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["watermark_state_tradeoff"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz,user_id:bigint"}


# ---------------------------------------------------------------------------
# key_churn_audit (r15 tranche 1)
# ---------------------------------------------------------------------------


def test_key_churn_audit_exact_ledger(spark):
    from inde1_spark.operators.analytics import key_churn_audit

    def ev(eid, uid, day):
        return (eid, T0 + timedelta(days=day), uid, "view", 1.0, "{}")

    # d0: {1, 2}; d1: {1, 3}; d2: {3} — u2 one-day, u1 spans d0-d1
    rows = [ev(1, 1, 0), ev(2, 2, 0), ev(3, 1, 1), ev(4, 3, 1), ev(5, 3, 2)]
    out = key_churn_audit(spark.createDataFrame(rows, EVENT_COLS)).collect()
    assert [r["day"] for r in out] == ["2024-03-04", "2024-03-05", "2024-03-06"]
    d0, d1, d2 = out
    assert (d0["n_active"], d0["n_new"], d0["n_retired"], d0["universe_size"]) == (2, 2, 1, 2)
    assert (d1["n_active"], d1["n_new"], d1["n_retired"], d1["universe_size"]) == (2, 1, 1, 3)
    assert (d2["n_active"], d2["n_new"], d2["n_retired"], d2["universe_size"]) == (1, 0, 1, 3)
    assert d0["new_pct"] == 100.0 and d0["retired_pct"] == 50.0
    assert d1["active_share_pct"] == _rhu(2 * 100 * 100, 3) / 100
    assert d2["retired_pct"] == 100.0 and d2["new_pct"] == 0.0


def test_key_churn_audit_single_day_all_new_all_retired(spark):
    from inde1_spark.operators.analytics import key_churn_audit

    rows = [_ev(1, 1, 0), _ev(2, 2, 10)]
    (r,) = key_churn_audit(spark.createDataFrame(rows, EVENT_COLS)).collect()
    assert r["n_new"] == 2 and r["n_retired"] == 2
    assert r["new_pct"] == 100.0 and r["retired_pct"] == 100.0
    assert r["active_share_pct"] == 100.0


def test_key_churn_audit_empty_is_empty(spark):
    from inde1_spark.operators.analytics import key_churn_audit

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert key_churn_audit(empty).count() == 0


def test_key_churn_audit_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["key_churn_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"ts:timestamp_ntz,user_id:bigint"}


# ---------------------------------------------------------------------------
# lateness_attribution_audit (r15 tranche 2)
# ---------------------------------------------------------------------------


def test_lateness_attribution_audit_per_day_and_cross_day(spark):
    from inde1_spark.operators.analytics import lateness_attribution_audit

    rows = [
        # day 0: in-day regression of 50 s (under the 900 s deployed delay)
        _ev(1, 1, 1000),
        _ev(2, 1, 950),
        _ev(3, 1, 2000),
        # day 1 frontier, then a regressed event LANDING back on day 0:
        # the alarm rings on the bad data's own day
        _ev(4, 2, 86500),
        _ev(5, 2, 86300),
        # day 1: a 2000 s regression (over the deployed delay -> dropped)
        _ev(6, 3, 90000),
        _ev(7, 3, 88000),
    ]
    out = {
        r["day"]: r
        for r in lateness_attribution_audit(
            spark.createDataFrame(rows, EVENT_COLS)
        ).collect()
    }
    assert set(out) == {"2024-03-04", "2024-03-05"}
    d0 = out["2024-03-04"]
    # events on day 0: ids 1,2,3 and the cross-day regressed id 5
    assert d0["n_events"] == 4
    assert d0["n_late"] == 2          # id 2 (50 s) + id 5 (200 s)
    assert d0["n_dropped"] == 0
    assert d0["max_lateness_s"] == 200
    assert d0["late_pct"] == _rhu(2 * 100 * 10**4, 4) / 10**4
    d1 = out["2024-03-05"]
    assert d1["n_events"] == 3 and d1["n_late"] == 1
    assert d1["n_dropped"] == 1       # 2000 s > 900 s deployed delay
    assert d1["max_lateness_s"] == 2000
    assert d1["drop_pct"] == _rhu(1 * 100 * 10**4, 3) / 10**4


def test_lateness_attribution_audit_empty_is_empty(spark):
    from inde1_spark.operators.analytics import lateness_attribution_audit

    empty = spark.createDataFrame([], EVENT_SCHEMA)
    assert lateness_attribution_audit(empty).count() == 0


def test_lateness_attribution_audit_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["lateness_attribution_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    assert "hashpartitioning(user_id" in r.raw
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"event_id:bigint,ts:timestamp_ntz,user_id:bigint"}


# ---------------------------------------------------------------------------
# ivf_list_balance_audit (r15 tranche 2)
# ---------------------------------------------------------------------------


def test_ivf_list_balance_audit_exact(spark):
    from inde1_spark.operators.similarity import ivf_list_balance_audit

    emb = spark.createDataFrame(
        [(i, [0.0, 1.0], 0 if i < 3 else 1) for i in range(4)],
        "vec_id long, embedding array<double>, label long",
    )
    out = {r["label"]: r for r in ivf_list_balance_audit(emb).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_vecs"] == 3 and out[1]["n_vecs"] == 1
    for r in out.values():
        assert r["n_lists"] == 2 and r["total"] == 4
    assert out[0]["list_share_pct"] == 75.0 and out[1]["list_share_pct"] == 25.0
    # balance vs the uniform mean of 2 vecs/list: 150% and 50%
    assert out[0]["balance_pct"] == 150.0 and out[1]["balance_pct"] == 50.0


def test_ivf_list_balance_audit_empty_is_empty(spark):
    from inde1_spark.operators.similarity import ivf_list_balance_audit

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label long"
    )
    assert ivf_list_balance_audit(empty).count() == 0


def test_ivf_list_balance_audit_plan_prunes_embedding(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["ivf_list_balance_audit"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # counts ride the label column alone — the wide embedding array must
    # be pruned out of the scan entirely
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"label:int"}


# ---------------------------------------------------------------------------
# pack_budget_sweep (r15 tranche 3)
# ---------------------------------------------------------------------------


def test_pack_budget_sweep_exact_single_lane(spark):
    from inde1_spark.operators.corpus import pack_budget_sweep

    def doc(i, n):
        return (i, " ".join(["t"] * n), "en", "a", n)

    # one lane: token counts 7, 5, 12 -> lane total 24
    docs = spark.createDataFrame([doc(1, 7), doc(2, 5), doc(3, 12)], DOC_COLS)
    out = {
        r["budget"]: r
        for r in pack_budget_sweep(docs, budgets=(10, 12, 100), packers=1).collect()
    }
    r = out[10]
    assert r["n_lanes"] == 1 and r["n_docs"] == 3 and r["total_tokens"] == 24
    assert r["n_shards"] == 3 and r["slack_tokens"] == 6
    assert r["fill_pct"] == 80.0
    assert r["n_docs_over"] == 1 and r["over_doc_pct"] == _rhu(100 * 10**4, 3) / 10**4
    r = out[12]
    # n_tok == budget is NOT over (strict >); ceil(24/12) = 2 exact shards
    assert r["n_shards"] == 2 and r["slack_tokens"] == 0 and r["fill_pct"] == 100.0
    assert r["n_docs_over"] == 0
    r = out[100]
    assert r["n_shards"] == 1 and r["slack_tokens"] == 76
    assert r["fill_pct"] == 24.0


def test_pack_budget_sweep_lanes_partition_tokens(spark):
    from inde1_spark.operators.corpus import PACK_PACKERS, pack_budget_sweep

    def doc(i, n):
        return (i, " ".join(["t"] * n), "en", "a", n)

    docs = spark.createDataFrame([doc(i, 10) for i in range(20)], DOC_COLS)
    out = pack_budget_sweep(docs).collect()
    for r in out:
        # lanes partition the corpus: totals are lane-invariant
        assert r["total_tokens"] == 200 and r["n_docs"] == 20
        assert 1 <= r["n_lanes"] <= PACK_PACKERS
        # shards never beat the single-lane lower bound
        assert r["n_shards"] >= (200 + r["budget"] - 1) // r["budget"]


def test_pack_budget_sweep_empty_is_empty(spark):
    from inde1_spark.operators.corpus import pack_budget_sweep

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert pack_budget_sweep(empty).count() == 0


def test_pack_budget_sweep_plan(spark):
    import __spark_entry__ as entrymod

    r = plan_report(
        entrymod.staged_queries()["pack_budget_sweep"](spark, SF_SMOKE)
    )
    assert "CartesianProduct" not in r.raw and "BatchEvalPython" not in r.raw
    # lane branch reads (doc_id, text); the over-budget branch prunes
    # doc_id away entirely
    schemas = set(re.findall(r"ReadSchema: struct<([^>]*)>", r.raw))
    assert schemas == {"doc_id:bigint,text:string", "text:string"}


# ---------------------------------------------------------------------------
# closed-form vs brute-force step simulation (seeded pseudorandom series)
# ---------------------------------------------------------------------------


def _lcg(seed: int):
    # deterministic 32-bit LCG so the fixtures never drift between runs
    state = seed & 0xFFFFFFFF
    while True:
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        yield state


def test_rate_limit_sweep_equals_step_recursion(spark):
    """The closed form B_t = max(0, C_t - min(0, min prefix P)) priced only
    at arrival rows must equal the naive minute-by-minute Lindley
    recursion over the WHOLE span, for arbitrary bursty series."""
    from inde1_spark.operators.analytics import RATE_PCTS, rate_limit_sweep

    for seed in (7, 99, 12345):
        g = _lcg(seed)
        # sparse bursty series: ~20 arrival minutes over a ~200-min span
        arrivals: dict[int, int] = {}
        m = 0
        for _ in range(20):
            m += 1 + next(g) % 20
            arrivals[m] = 1 + next(g) % 30
        rows, eid = [], 0
        for minute, a in arrivals.items():
            for j in range(a):
                rows.append(_ev(eid, 1, minute * 60 + j % 60))
                eid += 1
        out = {
            r["rate_pct"]: r
            for r in rate_limit_sweep(
                spark.createDataFrame(rows, EVENT_COLS)
            ).collect()
        }
        total = sum(arrivals.values())
        m_min, m_max = min(arrivals), max(arrivals)
        span = m_max - m_min + 1
        for pct in RATE_PCTS:
            R = -(-(total * pct) // (span * 100))  # ceil
            # brute force over EVERY minute in the span
            b, peak, backlogged, at = 0, 0, 0, {}
            for t in range(m_min, m_max + 1):
                b = max(0, b + arrivals.get(t, 0) - R)
                peak = max(peak, b)
                at[t] = b
            backlogged = sum(
                1 for t in arrivals if at[t] > 0
            )
            r = out[pct]
            assert r["rate_per_min"] == R, (seed, pct)
            assert r["peak_backlog"] == peak, (seed, pct)
            assert r["backlogged_minutes"] == backlogged, (seed, pct)
            end = at[m_max]
            assert r["drain_min"] == -(-end // R), (seed, pct)


def test_watermark_state_tradeoff_equals_liveness_scan(spark):
    """The trailing sliding-sum closed form must equal a brute-force
    per-minute liveness count of (key, minute) cells, for arbitrary
    multi-key activity patterns."""
    from inde1_spark.operators.analytics import (
        LATENESS_DELAYS_S,
        watermark_state_tradeoff,
    )

    for seed in (3, 4242):
        g = _lcg(seed)
        cells = set()
        for _ in range(40):
            cells.add((1 + next(g) % 5, next(g) % 90))  # (key, minute)
        rows = [
            _ev(i, uid, minute * 60 + 1)
            for i, (uid, minute) in enumerate(sorted(cells))
        ]
        out = {
            r["delay_s"]: r
            for r in watermark_state_tradeoff(
                spark.createDataFrame(rows, EVENT_COLS)
            ).collect()
        }
        minutes = {m for _, m in cells}
        for d in LATENESS_DELAYS_S:
            dm = d // 60
            # brute force: at every minute t, cells live iff m in [t-dm, t]
            peak = 0
            for t in range(min(minutes), max(minutes) + 1):
                live = sum(1 for _, m in cells if t - dm <= m <= t)
                peak = max(peak, live)
            r = out[d]
            assert r["n_cells"] == len(cells), (seed, d)
            assert r["peak_state_rows"] == peak, (seed, d)


def test_lsh_bucket_balance_matches_pure_python_minhash(spark):
    """Independent pure-python mirror of the md5-affine minhash banding —
    catches a common-mode spelling error the DuckDB twin (which shares
    the sid/perm spelling) could not."""
    import hashlib

    from inde1_spark.operators.dedup import (
        MINHASH_PRIME,
        N_BANDS,
        N_PERM,
        PERMS,
        lsh_bucket_balance_audit,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "pack my box with five dozen liquor jugs today",
        "the quick brown fox jumps over the lazy dog",  # dup of doc 0
        "sphinx of black quartz judge my vow now then",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "a", len(t)) for i, t in enumerate(texts)], DOC_COLS
    )

    def shingles(text):
        toks = [t for t in text.split(" ") if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    def sig(text):
        sids = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MINHASH_PRIME
            for s in shingles(text)
        ]
        return [
            min((a * s + b) % MINHASH_PRIME for s in sids)
            for _i, a, b in PERMS
        ]

    rpb = N_PERM // N_BANDS
    expected = {}
    for band in range(N_BANDS):
        buckets: dict[str, int] = {}
        for t in texts:
            key = ",".join(str(v) for v in sig(t)[band * rpb : (band + 1) * rpb])
            buckets[key] = buckets.get(key, 0) + 1
        pairs = sum(c * (c - 1) // 2 for c in buckets.values())
        expected[band] = (
            len(buckets),
            max(buckets.values()),
            sum(1 for c in buckets.values() if c >= 2),
            str(pairs),
        )
    out = {r["band"]: r for r in lsh_bucket_balance_audit(docs).collect()}
    assert set(out) == set(expected)
    for band, (nb, mx, multi, pairs) in expected.items():
        r = out[band]
        assert r["n_buckets"] == nb, band
        assert r["max_bucket"] == mx, band
        assert r["buckets_multi"] == multi, band
        assert r["cand_pairs"] == pairs, band
    # the exact-dup pair must co-bucket in EVERY band
    assert all(r["max_bucket"] >= 2 for r in out.values())


# ---------------------------------------------------------------------------
# cross-operator consistency web over the real smoke corpus
# ---------------------------------------------------------------------------


def test_r14_ops_agree_on_shared_totals(spark):
    """Independent staged ops must agree on the totals they share — a
    regression in any one's corpus pass breaks the web even if its own
    oracle twin drifts in lockstep."""
    import __spark_entry__ as entrymod

    SQ = entrymod.staged_queries()

    def rows(name):
        return SQ[name](spark, SF_SMOKE).collect()

    cache = rows("cache_hit_curve")
    ttl = rows("ttl_staleness_sweep")
    trig = rows("trigger_interval_sweep")
    rate = rows("rate_limit_sweep")
    ret = rows("retention_policy_sweep")
    churn = rows("key_churn_audit")
    scan = rows("scan_split_sweep")
    lat = rows("allowed_lateness_sweep")
    attr = rows("lateness_attribution_audit")
    state = rows("watermark_state_tradeoff")

    n_events = cache[0]["n_events"]
    n_keys = cache[0]["n_keys"]
    assert n_events > 0 and n_keys > 0

    # every events-table sweep sees the same corpus
    assert all(r["n_events"] == n_events for r in ttl)
    assert all(r["n_events"] == n_events for r in trig)
    assert all(r["n_events"] == n_events for r in rate)
    assert all(r["n_events"] == n_events for r in ret)
    assert all(r["n_events"] == n_events for r in lat)
    assert sum(r["n_events"] for r in attr) == n_events

    # key universes agree: cache ranking, TTL compulsory misses, churn's
    # final running universe, retention's per-horizon total
    assert all(r["n_keys"] == n_keys for r in ttl)
    assert churn[-1]["universe_size"] == n_keys
    assert sum(r["n_new"] for r in churn) == n_keys
    assert sum(r["n_retired"] for r in churn) == n_keys
    assert all(r["n_keys"] == n_keys for r in ret)

    # the modeled storage pass rides the same row count
    assert all(r["total_bytes"] == n_events * 64 for r in scan)

    # lateness: the corpus-wide worst regression equals the worst daily
    # one, and the 900 s drop counts agree between sweep and attribution
    assert max(r["max_lateness_s"] for r in lat) == max(
        r["max_lateness_s"] for r in attr
    )
    (d900,) = [r["n_dropped"] for r in lat if r["delay_s"] == 900]
    assert sum(r["n_dropped"] for r in attr) == d900

    # state cells: every delay row carries the same cell universe, and
    # the peak can never exceed the cells that exist
    n_cells = state[0]["n_cells"]
    assert all(r["n_cells"] == n_cells for r in state)
    assert all(r["peak_state_rows"] <= n_cells for r in state)
    # peaks are monotone in the delay
    peaks = [r["peak_state_rows"] for r in sorted(state, key=lambda r: r["delay_s"])]
    assert peaks == sorted(peaks)
