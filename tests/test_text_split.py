"""Reproducible-split properties: pseudorandom mixing + group cohesion.

The round-1 split used ``(doc_id * 2654435761) % 100`` — a cyclic
permutation of ``doc_id % 100``, so consecutive doc_ids round-robined
across train/val/test deterministically (id-periodic, the opposite of
contamination-safe for id-correlated corpora). The md5 bucket replaces it;
these tests pin the properties that matter.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.operators.text import TRAIN_PCT, VAL_PCT, hash_bucket, train_test_split_grouped
from inde1_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _py_bucket(key: int, mod: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod


def test_hash_bucket_matches_reference_md5(spark):
    """Spark's bucket must equal the plain-hashlib spelling (portability)."""
    ids = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["b"]
        for r in ids.select("doc_id", hash_bucket(F.col("doc_id"), 100).alias("b")).collect()
    }
    assert got == {i: _py_bucket(i, 100) for i in range(500)}


def test_split_assignment_not_id_periodic(spark):
    """Consecutive ids must not round-robin: the old multiplicative scheme
    had a CONSTANT bucket delta (61 mod 100) between consecutive ids; the
    md5 bucket's deltas must look uniform."""
    buckets = [_py_bucket(i, 100) for i in range(400)]
    deltas = {(b2 - b1) % 100 for b1, b2 in zip(buckets, buckets[1:])}
    assert len(deltas) > 50, f"bucket deltas too regular: {len(deltas)} distinct"
    # and the realized ratios still track 80/10/10 closely
    train = sum(1 for b in buckets if b < TRAIN_PCT) / len(buckets)
    val = sum(1 for b in buckets if TRAIN_PCT <= b < TRAIN_PCT + VAL_PCT) / len(buckets)
    assert abs(train - 0.8) < 0.06 and abs(val - 0.1) < 0.05


def test_grouped_split_keeps_groups_whole(spark):
    """Every source maps to exactly one split (the contamination-safety
    invariant), and the grouped aggregate reconciles with doc-level counts."""
    docs = load_table(spark, SF_SMOKE, "documents")
    per_doc = docs.select(
        "source", hash_bucket(F.col("source"), 100).alias("b")
    )
    n_violations = (
        per_doc.groupBy("source")
        .agg(F.countDistinct("b").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert n_violations == 0

    agg = {r["split"]: r for r in train_test_split_grouped(docs).collect()}
    assert sum(r["n_docs"] for r in agg.values()) == docs.count()
    assert set(agg) <= {"train", "val", "test"}
