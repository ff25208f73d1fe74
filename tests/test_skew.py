"""Skew handling: salted join correctness + partition spreading."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.functions.skew import salted_join, with_salt


def test_salted_join_matches_plain_join(spark):
    # pathologically skewed fact: 90% of rows share one key
    n = 20_000
    fact = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3 % 1000).alias("v"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )

    plain = (
        fact.join(dim, "k")
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    salted = (
        salted_join(fact, dim, on="k", row_id="row_id", n_salts=8)
        .groupBy("name")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    a = {r["name"]: (r["n"], r["sv"]) for r in plain.collect()}
    b = {r["name"]: (r["n"], r["sv"]) for r in salted.collect()}
    assert a == b

    # and the hot key actually spreads: its rows land in >1 salt bucket
    spread = (
        with_salt(fact.filter(F.col("k") == 7), "row_id", 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_salt_is_deterministic(spark):
    fact = spark.range(1000).select(F.col("id").alias("row_id"))
    s1 = {r["row_id"]: r["_salt"] for r in with_salt(fact, "row_id", 8).collect()}
    s2 = {r["row_id"]: r["_salt"] for r in with_salt(fact.repartition(5), "row_id", 8).collect()}
    assert s1 == s2  # no rand(): stable across partitionings and retries


def test_impact_postings_salted_equals_plain_topk(spark):
    # a hot term whose top docs land in DIFFERENT salt buckets: the
    # two-stage plan must still recover the exact global top-k
    from pyspark.sql import functions as F

    from inde1_spark.operators.dedup import release_persisted
    from inde1_spark.operators.scoring import impact_postings

    # doc i repeats 'hot' i times -> top-5 by tf = docs 20..16, which sit
    # in salts 20%8..16%8 (4,3,2,1,0): all different buckets
    rows = [
        (i, " ".join(["hot"] * i) + " filler" + str(i), "en", "x", 10)
        for i in range(1, 21)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = [
        (r.rank, r.doc_id, r.tf, r.df, r.cf)
        for r in impact_postings(docs).filter(F.col("term") == "hot").collect()
    ]
    release_persisted()
    assert out == [
        (1, 20, 20, 20, 210),
        (2, 19, 19, 20, 210),
        (3, 18, 18, 20, 210),
        (4, 17, 17, 20, 210),
        (5, 16, 16, 20, 210),
    ]
