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
