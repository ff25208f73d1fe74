"""Corpus-scale preset for the geometry operators (VERDICT r02 item 5).

The gate queries run k-means/SemDeDup at toy k=8 (the DuckDB oracle unrolls
Lloyd's CTE-for-CTE). These tests pin the SCALE configuration instead:
``scale_k`` sizes k to hold |cluster| ~ TARGET_CLUSTER_ROWS, and a k=64 run
on sf0.1 proves the property that makes SemDeDup linear — the pair join's
sum|cluster|^2 cost stays a small fraction of corpus^2.
"""

from __future__ import annotations

from inde1_spark.operators.clustering import (
    TARGET_CLUSTER_ROWS,
    kmeans_assign,
    scale_k,
)
from inde1_spark.sources.readers import load_table

SF_01 = "/root/testdata/sf0.1"


def test_scale_k_presets():
    # holds |cluster| ~ target across corpus sizes
    assert scale_k(5_000, target=78) == 65
    assert scale_k(10**6) == 245  # 1e6/4096
    assert scale_k(10**8) == 24415
    # clamps: floor of 8, ceiling of 2^17, never above the corpus
    assert scale_k(100) == 8
    assert scale_k(5) == 5
    assert scale_k(10**12) == 1 << 17


def test_kmeans_k64_cluster_sizes_bounded(spark):
    """k=64 on sf0.1 (5k vectors): the quadratic-reduction property.

    SemDeDup's pair join does sum|c|^2 work; with k=64 healthy clustering
    must (a) keep many clusters alive, (b) not collapse the corpus into one
    mega-cluster, and (c) cut the pair count by >= 10x vs all-pairs —
    that factor IS the operator's scale story, so it is pinned here.
    """
    emb = load_table(spark, SF_01, "embeddings")
    n = emb.count()
    sizes = [
        r["n"]
        for r in kmeans_assign(emb, k=64, iters=2)
        .groupBy("cluster")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    ]
    assert sum(sizes) == n
    assert len(sizes) >= 16, f"only {len(sizes)} clusters survived"
    assert max(sizes) <= n // 4, f"mega-cluster: {max(sizes)} of {n}"
    sum_sq = sum(s * s for s in sizes)
    assert sum_sq * 10 <= n * n, f"pair-join reduction only {n*n/sum_sq:.1f}x"
