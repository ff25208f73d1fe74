"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion (count() the result — forces the full
plan without driver-side materialization of wide rows). Queries cover the
reference-parity surface (scan/filter/agg/join/window) plus the scale-path
LLM ops (LSH dedup, bucketed ANN).

Each query runs twice and the second (steady-state) time is reported:
single-shot numbers in a fresh JVM are dominated by C2 JIT warmup of the
expression interpreters (±5-10s swings depending on run order), which says
nothing about throughput on a long-lived cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + each operator family's most representative,
# scale-relevant member.
HEADLINE = (
    "hourly_stats",
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "session_pairing",
    "occupancy_asof",
    "cumulative_series",
    "alerts",
    "rollup_nation_region",
    "dedup_exact",
    "dedup_minhash_fast",  # production xxhash64 path (no global-sort dictionary)
    "dedup_minhash_capped",  # same path with the corpus-scale hot-shingle cap
    "dedup_embedding_lsh",
    "dedup_spans",
    "knn_brute_cosine",
    "knn_lsh_bucketed",
    "knn_ivf",
    "text_token_stats",
    "text_token_bpe",
    "text_fingerprint",
    "pack_sequences",
    "contamination_check",
    "mixture_sample",
    "order_priority_check",   # fact-fact semi join
    "customer_order_distribution",  # outer join + two-level agg
    "tfidf_top_terms",        # corpus frequency pass + term join + window
    "bm25_score",             # prefiltered retrieval scoring
    "unigram_logprob",        # corpus LM scoring
    "kmeans_assign",          # iterative clustering (3 Lloyd rounds)
    "semdedup",               # cluster-scoped embedding dedup
    "chunk_tokens",           # corpus-volume-multiplying projection (r03)
    "term_cooccurrence",      # capped within-doc pair join + PMI (r03)
    "cross_source_overlap",   # source-level inverted-index join (r03)
    "embedding_dim_stats",    # per-dim fixed-point reduction (r03)
    "sole_late_supplier",     # Q21 double-correlation as one agg pass (r04)
    "min_cost_supplier",      # Q2 correlated-subquery-as-window-min (r04)
    "rolling_daily_revenue",  # RANGE-frame rolling window (r04)
    "dedup_levenshtein",      # edit-distance verify over capped candidates (r04)
    "similarity_join_allpairs",  # exact prefix-filtered Jaccard join (r04)
    "nation_stock_value",     # Q11 HAVING-vs-global via bounded window (r04)
    "chunk_dedup_cdc",        # row-local CDC chunking + chunk-hash groupBy (r04)
    "cdc_doc_overlap",        # df-capped chunk inverted-index pair join (r04)
    "knn_two_stage",          # coarse projection scan + exact re-rank (r04)
    "hash_vectorize",         # feature-hashing corpus vectorizer (r04)
    "embedding_top_component",  # power-iteration covariance audit (r04)
    "rfm_segments",           # histogram-tercile user segmentation (r04)
)


def main() -> None:
    from inde1_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="inde1-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # warm the JVM + parquet footers with one tiny action outside timing
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    from inde1_spark.operators.dedup import release_persisted

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        fn(spark, SF_DIR).count()  # warmup: JIT + shuffle-file page cache
        # steady state = best of 2 measured runs (single-run wall swings
        # ±50% on some queries from JIT/GC scheduling noise in one JVM);
        # each measured run pays its own persist cost after clearCache.
        # release_persisted between queries: clearCache drops cache-manager
        # blocks but NOT lazy-localCheckpoint RDDs (kmeans/components
        # chains), which would otherwise accumulate across 38 queries and
        # GC-pressure the tail of the run
        best, n = float("inf"), 0
        for _ in range(2):
            spark.catalog.clearCache()
            release_persisted()
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        release_persisted()
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
