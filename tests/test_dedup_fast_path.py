"""Production-hash MinHash path: equality against the exact ground truth.

``dedup_minhash_fast`` uses xxhash64 shingle ids (no sorted global
dictionary) — the 100 TB spelling. Not oracle-checkable (engine-specific
hash), so these tests pin its quality instead:

- banded candidates from the fast signatures must recover every planted
  near-duplicate pair the exact n-gram Jaccard ground truth finds
  (recall = 1 at the gate scale), and
- because the verify step is the same exact Jaccard, the full operator
  output must EQUAL the ground truth output (precision is exact by
  construction, so equality == full recall).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.operators import dedup as D
from inde1_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE


def test_fast_minhash_recall(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_ngram_jaccard(docs).collect()
    }
    assert truth, "ground truth must find the planted near-dups"

    sigs = D.minhash_signatures_fast(docs)
    bands = D.banded_signature(sigs, D.FAST_N_PERM, D.FAST_N_BANDS)
    candidates = {
        (r["doc_a"], r["doc_b"]) for r in D.band_candidates(bands).collect()
    }
    missed = truth - candidates
    assert not missed, f"fast LSH missed planted near-dups: {missed}"


def test_fast_minhash_output_equals_ground_truth(spark):
    """The gated rows-only query: exact verify makes precision 1, and full
    banding recall makes output == dedup_ngram_jaccard, jaccard values
    included."""
    docs = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.dedup_ngram_jaccard(docs).collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.dedup_minhash_fast(docs).collect()
    }
    assert fast == truth


def test_release_persisted_frees_cached_intermediates(spark):
    """Dedup operators persist self-joined intermediates; release_persisted
    must drop them all (long-lived sessions would otherwise accumulate
    cached blocks per invocation — ADVICE r1)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    D.release_persisted()  # clean slate
    D.dedup_minhash_fast(docs).count()
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0
    released = D.release_persisted()
    assert released >= 2  # shingle table + band table
    assert jsc.getPersistentRDDs().size() == 0
    assert D.release_persisted() == 0  # idempotent
