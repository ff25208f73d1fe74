"""Compaction job: many small files -> few target-size files, content equal."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.sources.writers import compact_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_compact_parquet_reduces_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(50).write.parquet(src)

    stats = compact_parquet(spark, src, dst, target_mb=256)

    assert stats["files_before"] == 50
    assert stats["files_after"] == stats["target_files"] == 1  # tiny input
    before = {r["doc_id"] for r in docs.select("doc_id").collect()}
    after = {r["doc_id"] for r in spark.read.parquet(dst).select("doc_id").collect()}
    assert before == after


def test_compact_parquet_keeps_partition_layout(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(20).write.partitionBy("lang").parquet(src)

    stats = compact_parquet(spark, src, dst, target_mb=256, partition_by=("lang",))

    assert stats["files_after"] < stats["files_before"]
    langs = {p for p in os.listdir(dst) if p.startswith("lang=")}
    assert langs == {f"lang={r['lang']}" for r in docs.select("lang").distinct().collect()}
    assert spark.read.parquet(dst).count() == docs.count()


def test_zorder_layout_matches_python_replay_and_clusters_both_dims(spark):
    """Bucket assignment must equal a python Morton replay, and the
    envelope audit must show what z-order exists for: per-bucket spans
    narrow in BOTH dims (a time-sorted layout is narrow in time only)."""
    from datetime import datetime, timedelta

    from inde1_spark.operators.analytics import zorder_layout

    t0 = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(4096):
        # users and hours each sweep their domain independently -> rows
        # cover the 2-D grid, so locality is measurable
        rows.append((i, t0 + timedelta(hours=i % 256), (i * 37) % 1024,
                     "view", 1.0, "{}"))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = zorder_layout(events).collect()

    # python replay of the exact integer pipeline
    import collections
    h_all = [int((t0 + timedelta(hours=i % 256)).timestamp()) // 3600 for i in range(4096)]
    u_all = [(i * 37) % 1024 for i in range(4096)]
    h_min, h_max = min(h_all), max(h_all)
    u_min, u_max = min(u_all), max(u_all)
    buckets = collections.defaultdict(list)
    for h, u in zip(h_all, u_all):
        hx = ((h - h_min) * 1024) // (h_max - h_min + 1)
        ux = ((u - u_min) * 1024) // (u_max - u_min + 1)
        z = 0
        for b in range(10):
            z += ((hx >> b) & 1) << (2 * b)
            z += ((ux >> b) & 1) << (2 * b + 1)
        buckets[z // ((1 << 20) // 64)].append((h, u))
    expect = {
        b: (len(v), max(x for x, _ in v) - min(x for x, _ in v),
            max(y for _, y in v) - min(y for _, y in v))
        for b, v in buckets.items()
    }
    got = {r["bucket"]: (r["n_events"], r["h_span"], r["u_span"]) for r in out}
    assert got == expect

    # locality: every bucket's envelope is a small patch of the 256x1024
    # domain in BOTH dims (z-order guarantee at these resolutions)
    assert sum(r["n_events"] for r in out) == 4096
    assert all(r["h_span"] <= 256 // 4 for r in out)
    assert all(r["u_span"] <= 1024 // 4 for r in out)
