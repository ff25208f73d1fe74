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
