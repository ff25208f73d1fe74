"""Job layer: the reference's scheduled deployment units, engine-native.

The reference ships three ScheduledSparkApplications (SURVEY §3): hourly
(MainHourly — live), daily (MainDaily — cron'd, code commented out) and
weekly (MainWeekly — same). Each here is a thin composition of the operator
library + sinks, windowed by EVENT time instead of cron/path math — a
backfill is just a wider filter, and re-running any window is idempotent
because every sink key is derived from the window.

Output key contracts (consumed by the reference's Grafana dashboards,
SURVEY §3.4):
  hourly: JSON.SET parking-stats:hourly:$date:$hour         (MainHourly.scala:245)
  daily:  TS.ADD  parking-events:daily:$date:timeseries:$attr (MainDaily.scala:264-283)
  weekly: TS.ADD  parking-stats:weekly:$week:{entries,exits,revenue,avgspent:$type}
          JSON.SET parking-stats:weekly:$week:revenue-by-type (MainWeekly.scala:257-319)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inde1_spark.operators.parking import (
    hourly_stats,
    revenue_by_duration,
    valid_events,
)
from inde1_spark.schemas import EVENT_ENTRY
from inde1_spark.streaming.pipelines import (
    RedisJsonSink,
    RedisTimeSeriesSink,
    weekly_timeseries,
)


def _window(events: DataFrame, start: str, end: str) -> DataFrame:
    """Event-time window selection — replaces the reference's hand-built
    partition paths (and their hardcoded-day bug, MainHourly.scala:233)."""
    return events.filter(
        (F.col("ts") >= F.lit(start).cast("timestamp"))
        & (F.col("ts") < F.lit(end).cast("timestamp"))
    )


def run_hourly_job(
    events: DataFrame, start: str, end: str, sink: RedisJsonSink
) -> int:
    """MainHourly: aggregate documents for every hour in the window."""
    stats = hourly_stats(_window(events, start, end))
    sink.write_stats(stats)
    return len(sink.store)


def daily_timeseries(events: DataFrame, date: str) -> DataFrame:
    """MainDaily's cumulative per-attribute series (A10): running
    entries/exits/revenue over the day's hours, one point per hour.

    Pre-aggregates to hours first, then an unbounded-preceding window over
    <=24 rows — the scale rule from DESIGN.md §2 (never globally window raw
    events).
    """
    base = valid_events(events).filter(F.to_date("ts") == F.lit(date))
    is_entry = (F.col("event_type") == EVENT_ENTRY).cast("long")
    hourly = base.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.sum(is_entry).cast("double").alias("entries"),
        F.sum(1 - is_entry).cast("double").alias("exits"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hourly.select(
        "hour",
        F.sum("entries").over(w).alias("entries"),
        F.sum("exits").over(w).alias("exits"),
        (F.sum("entries").over(w) * 2.0).alias("revenue_simulation"),
    )
    return cum.select(
        "hour",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(a).alias("attribute"), F.col(a).alias("value"))
                    for a in ("entries", "exits", "revenue_simulation")
                ]
            )
        ).alias("av"),
    ).select(
        F.col("av.attribute").alias("attribute"),
        F.unix_millis("hour").alias("ts_ms"),
        F.col("av.value").alias("value"),
    )


def run_daily_job(
    events: DataFrame, date: str, ts_sink: RedisTimeSeriesSink
) -> int:
    """MainDaily: cumulative time series -> parking-events:daily keys."""
    pts = daily_timeseries(events, date).collect()
    for r in pts:
        key = f"parking-events:daily:{date}:timeseries:{r['attribute']}"
        ts_sink.series.setdefault(key, {})[r["ts_ms"]] = r["value"]
    return len(pts)


def corpus_prep(documents: DataFrame) -> DataFrame:
    """The pretraining-corpus preparation pipeline as ONE declarative plan:
    quality filter -> exact dedup -> split assignment.

    Composes the operator library the way a training-data job would:

    1. Gopher rule filter (``gopher_keep()`` predicate, row-local in the
       scan stage — no join) drops degenerate docs;
    2. exact dedup keeps the smallest doc_id per md5(text) — one shuffle
       on the fixed-width hash, never on raw text;
    3. contamination-safe split via the md5 bucket of the GROUP key
       (``source``), so near-dups from one crawl never straddle train/test.

    Everything stays lazy until the caller's write/collect: Catalyst sees
    the whole pipeline and pushes the quality projections into the scan.
    Returns the surviving documents with ``split`` attached.
    """
    from inde1_spark.operators.dedup import dedup_exact
    from inde1_spark.operators.text import _split_label, gopher_keep, hash_bucket

    kept = documents.filter(gopher_keep())
    survivors = dedup_exact(kept).select(F.col("keep_doc_id").alias("doc_id"))
    deduped = kept.join(survivors, "doc_id")
    return deduped.withColumn(
        "split", _split_label(hash_bucket(F.col("source"), 100))
    )


def run_corpus_prep_job(documents: DataFrame, out_dir: str) -> dict:
    """Materialize the prepared corpus partitioned by split.

    Split-partitioned parquet is the layout a trainer reads (train readers
    prune to ``split=train`` directories); dynamic partition overwrite keeps
    re-runs idempotent per split. Returns audit counts (input, kept,
    survivors, per-split docs) — the numbers a data card needs.
    """
    from inde1_spark.sources.writers import materialize_partitioned

    prepared = corpus_prep(documents)
    materialize_partitioned(prepared, out_dir, ["split"])
    spark = documents.sparkSession
    out = spark.read.parquet(out_dir)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    return {
        "n_input": documents.count(),
        "n_output": sum(per_split.values()),
        "per_split": per_split,
    }


def run_incremental_ingest(
    new_docs: DataFrame, batch_id: str, ledger_dir: str, out_dir: str
) -> dict:
    """Incremental corpus ingestion with an exact-dup ledger, idempotent
    per batch.

    The steady-state shape of a growing training corpus: each arriving
    batch is deduped against everything already ingested (anti-join on the
    md5 ledger — a fixed-width hash table, never the raw text) and within
    itself (min doc_id per hash). Both the accepted documents and the
    ledger rows are written partitioned by ``ingest_batch`` with dynamic
    partition overwrite, so re-running a batch — including after a crash
    between the two writes — replaces exactly its own partitions; the
    anti-join excludes the current batch's ledger rows so a partial
    earlier attempt can't mask its own re-run.
    """
    from pyspark.errors import AnalysisException

    from inde1_spark.sources.writers import materialize_partitioned

    spark = new_docs.sparkSession
    hashed = new_docs.withColumn("text_md5", F.md5("text"))
    first = hashed.groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
    fresh = hashed.join(first, ["text_md5", "doc_id"])  # in-batch dedup
    try:
        seen = spark.read.parquet(ledger_dir).filter(
            F.col("ingest_batch") != batch_id
        )
        fresh = fresh.join(seen.select("text_md5"), "text_md5", "left_anti")
    except AnalysisException:
        pass  # first batch: no ledger yet
    fresh = fresh.withColumn("ingest_batch", F.lit(batch_id))
    materialize_partitioned(fresh, out_dir, ["ingest_batch"])
    out = spark.read.parquet(out_dir)
    materialize_partitioned(
        out.filter(F.col("ingest_batch") == batch_id).select(
            "text_md5", "ingest_batch"
        ),
        ledger_dir,
        ["ingest_batch"],
    )
    return {
        "batch": batch_id,
        "n_batch": new_docs.count(),
        "n_accepted": out.filter(F.col("ingest_batch") == batch_id).count(),
        "n_total": out.count(),
    }


def run_weekly_job(
    events: DataFrame,
    week: str,
    start: str,
    end: str,
    ts_sink: RedisTimeSeriesSink,
    json_sink: RedisJsonSink,
) -> dict:
    """MainWeekly: 7-day window — daily series + revenue-by-type document."""
    win = _window(events, start, end)
    ts_sink.write_weekly(weekly_timeseries(win), week=week)
    by_type = revenue_by_duration(win).groupBy("vehicle_type").agg(
        F.round(F.sum("revenue"), 4).alias("revenue")
    )
    doc = {r["vehicle_type"]: r["revenue"] for r in by_type.collect()}
    import json as _json

    json_sink.store[f"parking-stats:weekly:{week}:revenue-by-type"] = _json.dumps(
        doc, sort_keys=True
    )
    return doc
