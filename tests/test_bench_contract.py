"""Contracts on bench.py's recorder interface (no Spark, no benching).

The driver keeps only the LAST 2000 chars of bench.py's stdout and parses
the JSON line from that tail (r05's 8 KB line was lost to this window —
CLAUDE.md invariant). These tests pin the pieces that keep the line inside
budget and the calibration-normalized delta math honest, without running
a single query.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_headline_names_resolve_and_core_prefix_stable():
    import __spark_entry__ as entrymod

    qs = {**entrymod.staged_queries(), **entrymod.queries()}
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
    # the first N_CORE_LINE entries are the stable stdout core — they must
    # never be reordered or dropped (driver BENCH_r{N} comparability)
    assert bench.HEADLINE[0] == "hourly_stats"
    assert bench.N_CORE_LINE == 46
    assert len(bench.HEADLINE) >= bench.N_CORE_LINE


def test_stdout_line_fits_recorder_window_at_worst_case():
    # worst case: every core query at a 4-digit-second timing; the line
    # must still fit LINE_BUDGET (and LINE_BUDGET must clear the driver's
    # 2000-char tail with margin)
    core = {name: 999.999 for name in bench.HEADLINE[: bench.N_CORE_LINE]}
    line_obj = {
        "metric": "headline_query_wall_seconds",
        "value": 99999.999,
        "unit": "sec",
        "queries": core,
        "sf": 0.1,
        "n_all": len(bench.HEADLINE),
        "delta": {
            "n_flagged": 99,
            "flag_threshold": bench.DELTA_FLAG_RATIO,
            "cal_sec": 99.999,
            "cal_ratio": 9.999,
            "n_common": 999,
            "common_total_sec": 99999.999,
            "prior_best_total_sec": 99999.999,
        },
        "detail": "BENCH_DETAIL.json",
    }
    assert len(json.dumps(line_obj)) <= bench.LINE_BUDGET
    assert bench.LINE_BUDGET <= 1900


def test_prior_best_calibration_reads_both_payload_shapes(tmp_path, monkeypatch):
    # BENCH_HISTORY self-snapshot carries top-level calibration_sec; the
    # driver's BENCH_r*.json carries it under delta.cal_sec — both must feed
    # the normalizer, and the minimum wins
    hist = tmp_path / "BENCH_HISTORY.jsonl"
    hist.write_text(
        json.dumps({"sf": 0.1, "queries": {}, "calibration_sec": 0.25}) + "\n"
    )
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {"parsed": {"sf": 0.1, "queries": {}, "delta": {"cal_sec": 0.2}}}
        )
    )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p: str(tmp_path)
    )
    assert bench._prior_best_calibration() == 0.2


def test_prior_best_calibration_none_when_unseeded(tmp_path, monkeypatch):
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    assert bench._prior_best_calibration() is None


def test_prior_median_is_median_of_run_medians(tmp_path, monkeypatch):
    hist = tmp_path / "BENCH_HISTORY.jsonl"
    hist.write_text(
        "\n".join(
            json.dumps({"sf": 0.1, "queries": {"q": v}})
            for v in (1.0, 5.0, 2.0)
        )
        + "\n"
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    assert bench._prior_median(0.1) == {"q": 2.0}
    assert bench._prior_best(0.1) == {"q": 1.0}


def test_delta_flags_on_median_not_min(tmp_path, monkeypatch):
    # history: q ran [1.0, 1.1, 1.2] -> min 1.0, median 1.1. A 1.3 s run is
    # 1.30x the min (old basis would flag) but 1.18x the median (no flag);
    # a real regression to 1.6 s flags on both bases.
    hist = tmp_path / "BENCH_HISTORY.jsonl"
    hist.write_text(
        "\n".join(
            json.dumps({"sf": 0.1, "queries": {"q": v}})
            for v in (1.0, 1.1, 1.2)
        )
        + "\n"
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    normal = bench._delta_section({"q": 1.3}, 0.1, 0.2, 1.0)
    assert normal["flagged_over_ratio"] == {}
    assert normal["ratio"]["q"] == 1.3  # min-based ratio still recorded
    regressed = bench._delta_section({"q": 1.6}, 0.1, 0.2, 1.0)
    assert "q" in regressed["flagged_over_ratio"]
    # calibration normalization still absorbs a uniform box slowdown
    slow_box = bench._delta_section({"q": 1.6}, 0.1, 0.3, 1.5)
    assert slow_box["flagged_over_ratio"] == {}
