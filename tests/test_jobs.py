"""Job-layer tests: the hourly/daily/weekly deployment units end-to-end."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.datagen.parking import generate, to_spark
from inde1_spark.jobs import run_daily_job, run_hourly_job, run_weekly_job
from inde1_spark.schemas import EVENT_ENTRY
from inde1_spark.streaming.pipelines import RedisJsonSink, RedisTimeSeriesSink

FIXTURE = generate(n_sessions=400, seed=17)


@pytest.fixture(scope="module")
def events(spark):
    ev, _, _ = to_spark(spark, FIXTURE)
    return ev.cache()


def test_hourly_job_idempotent(events):
    sink = RedisJsonSink()
    n1 = run_hourly_job(events, "2025-06-01 00:00:00", "2025-06-02 00:00:00", sink)
    assert n1 > 0
    sample = next(iter(sink.store))
    assert sample.startswith("parking-stats:hourly:2025-06-01:")
    before = dict(sink.store)
    # re-running the same window overwrites the same keys (idempotent)
    n2 = run_hourly_job(events, "2025-06-01 00:00:00", "2025-06-02 00:00:00", sink)
    assert n2 == n1 and sink.store == before


def test_daily_job_series_monotone(events):
    sink = RedisTimeSeriesSink()
    n = run_daily_job(events, "2025-06-01", sink)
    assert n > 0
    entries = sink.ts_range("parking-events:daily:2025-06-01:timeseries:entries")
    assert entries
    values = [v for _, v in entries]
    assert values == sorted(values)  # cumulative series is monotone
    n_entries_day1 = sum(
        1
        for e in FIXTURE.events
        if e["event_type"] == EVENT_ENTRY and e["ts"].date().isoformat() == "2025-06-01"
    )
    assert values[-1] == n_entries_day1


def test_weekly_job_contract(events):
    ts_sink, json_sink = RedisTimeSeriesSink(), RedisJsonSink()
    doc = run_weekly_job(
        events, "2025-22", "2025-06-01 00:00:00", "2025-06-08 00:00:00",
        ts_sink, json_sink,
    )
    assert doc and all(v >= 0 for v in doc.values())
    stored = json.loads(json_sink.store["parking-stats:weekly:2025-22:revenue-by-type"])
    assert stored == doc
    assert ts_sink.ts_range("parking-stats:weekly:2025-22:revenue")


def test_corpus_prep_job_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from inde1_spark.jobs import corpus_prep, run_corpus_prep_job
    from inde1_spark.operators.text import gopher_rules
    from inde1_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out_dir = str(tmp_path / "corpus")
    stats = run_corpus_prep_job(docs, out_dir)

    assert 0 < stats["n_output"] < stats["n_input"]  # both filters bite
    out = spark.read.parquet(out_dir)
    # exact dedup held: one row per content hash
    assert out.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    # every survivor passes the quality rules
    bad = out.join(gopher_rules(out).filter("NOT keep").select("doc_id"), "doc_id")
    assert bad.count() == 0
    # contamination safety: each source sits entirely inside one split
    assert (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    # split-partitioned layout on disk + idempotent re-run
    assert any(p.name.startswith("split=") for p in (tmp_path / "corpus").iterdir())
    again = run_corpus_prep_job(docs, out_dir)
    assert again == stats
    # the composed plan stays declarative: quality+dedup+split is lazy
    assert corpus_prep(docs).columns == docs.columns + ["split"]


def test_incremental_ingest_ledger_dedup_and_idempotency(spark, tmp_path):
    from pyspark.sql import functions as F

    from inde1_spark.jobs import run_incremental_ingest
    from inde1_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    ledger, out = str(tmp_path / "ledger"), str(tmp_path / "corpus")

    s1 = run_incremental_ingest(docs, "b1", ledger, out)
    assert 0 < s1["n_accepted"] <= n  # in-batch exact dups collapse
    # re-running the same batch replaces its own partition: nothing doubles
    assert run_incremental_ingest(docs, "b1", ledger, out) == s1
    # a later batch of already-seen content is fully rejected by the ledger
    relabeled = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    s2 = run_incremental_ingest(relabeled, "b2", ledger, out)
    assert s2["n_accepted"] == 0
    assert s2["n_total"] == s1["n_accepted"]
    # genuinely new content lands
    novel = spark.createDataFrame(
        [(9_000_000, "entirely fresh text nobody has ingested before")],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("srcX")).withColumn(
        "n_chars", F.length("text")
    )
    s3 = run_incremental_ingest(novel, "b3", ledger, out)
    assert s3["n_accepted"] == 1
    assert s3["n_total"] == s1["n_accepted"] + 1
