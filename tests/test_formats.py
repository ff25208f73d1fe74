"""Format round-trips: the engine's operators are format-agnostic and the
scan-level optimizations (pushdown, pruning, malformed-drop) hold on CSV
and ORC like they do on parquet/JSON."""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.datagen.parking import generate, to_spark
from inde1_spark.operators import parking as P
from inde1_spark.sources.readers import read_parking_events_csv, read_orc

FIXTURE = generate(n_sessions=120, seed=21)


def test_csv_roundtrip_and_malformed_drop(spark, tmp_path):
    events, _, _ = to_spark(spark, FIXTURE)
    out = tmp_path / "csv"
    (
        events.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias("ts"),
            "license_plate", "vehicle_type", "color",
            "parking_lot_id", "parking_spot_id", "is_slot_handicapped",
            "duration_ms",
        ).coalesce(1).write.option("header", "true").csv(str(out))
    )
    # plant broken lines in the written part file (and drop the CRC sidecar
    # the local Hadoop FS wrote — tampering invalidates it by design)
    part = next(p for p in out.iterdir() if p.name.startswith("part-"))
    with open(part, "a") as f:
        f.write("\nnot,a,valid\nrow;;;garbage\n")
    crc = out / f".{part.name}.crc"
    if crc.exists():
        crc.unlink()

    back = read_parking_events_csv(spark, str(out))
    # NB: a bare count() reads zero columns, so CSV malformed detection
    # never runs — materialize the columns to exercise the drop
    assert len(back.collect()) == events.count()  # malformed lines dropped
    # operators run unchanged on the CSV-sourced frame
    got = {r["date"]: r for r in P.hourly_stats(back).collect()}
    want = {r["date"]: r for r in P.hourly_stats(events).collect()}
    assert set(got) == set(want)
    for d in want:
        assert got[d]["nbr_entries"] == want[d]["nbr_entries"]
        assert got[d]["occupancy"] == dict(want[d]["occupancy"])


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from inde1_spark.plans.explain import plan_report

    events, _, _ = to_spark(spark, FIXTURE)
    out = str(tmp_path / "orc")
    events.write.orc(out)
    back = read_orc(spark, out)
    assert back.count() == events.count()

    q = back.filter(F.col("event_type") == "PARKING_ENTRY").select("license_plate")
    r = plan_report(q)
    assert any("event_type" in f for f in r.pushed_filters), r.raw
    assert "ReadSchema" in r.raw
    assert q.count() == events.filter(F.col("event_type") == "PARKING_ENTRY").count()


def test_dynamic_partition_overwrite_is_partition_idempotent(spark, tmp_path):
    """Re-running one day's backfill must replace only that day's
    partition; static overwrite would wipe the other days (the classic
    backfill data-loss trap dynamic mode exists for)."""
    from inde1_spark.sources.writers import materialize_partitioned

    events, _, _ = to_spark(spark, FIXTURE)
    daily = events.withColumn("event_date", F.date_format("ts", "yyyy-MM-dd"))
    out = str(tmp_path / "daily")
    materialize_partitioned(daily, out, ["event_date"])
    days = sorted(r["event_date"] for r in
                  spark.read.parquet(out).select("event_date").distinct().collect())
    assert len(days) >= 1
    total_before = spark.read.parquet(out).count()

    # "re-run" the first day only, with half its rows (a corrected backfill)
    d0 = days[0]
    redo = daily.filter(F.col("event_date") == d0).limit(
        daily.filter(F.col("event_date") == d0).count() // 2
    )
    n_redo = redo.count()
    materialize_partitioned(redo, out, ["event_date"])

    after = spark.read.parquet(out)
    assert sorted(r["event_date"] for r in
                  after.select("event_date").distinct().collect()) == days
    assert after.filter(F.col("event_date") == d0).count() == n_redo
    other_before = total_before - daily.filter(F.col("event_date") == d0).count()
    assert after.filter(F.col("event_date") != d0).count() == other_before
