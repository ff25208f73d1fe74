"""Production-hash MinHash path: recall against the exact ground truth.

``minhash_signatures_fast`` uses xxhash64 shingle ids (no sorted global
dictionary) — the 100 TB spelling. Not oracle-checkable (engine-specific
hash), so this test pins its quality instead: banded candidates from the
fast signatures must recover every planted near-duplicate pair that the
exact n-gram Jaccard ground truth finds.
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
    rows_per_band = D.FAST_N_PERM // D.FAST_N_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh_{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("sig"),
                    )
                    for b in range(D.FAST_N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    ba = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    candidates = {
        (r["doc_a"], r["doc_b"])
        for r in ba.join(bb, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    missed = truth - candidates
    assert not missed, f"fast LSH missed planted near-dups: {missed}"
