"""Spark-SQL surface == DataFrame operators, + streaming dedup."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from inde1_spark.sql import SPARK_SQL, run_sql
from tests.conftest import SF_SMOKE, compare_frames


@pytest.mark.parametrize("name", sorted(SPARK_SQL))
def test_sql_equals_dataframe(spark, name):
    df_api = entrymod.queries()[name](spark, SF_SMOKE).toPandas()
    df_sql = run_sql(spark, SF_SMOKE, name).toPandas()
    assert not compare_frames(df_api, df_sql)


def test_dedup_stream(spark, tmp_path):
    """Streaming exact dedup: re-delivered records suppressed, state bounded
    by the watermark."""
    from inde1_spark.datagen.parking import generate, to_spark
    from inde1_spark.schemas import PARKING_EVENT_FLAT
    from inde1_spark.streaming.pipelines import dedup_stream

    fx = generate(n_sessions=100, seed=13)
    events, _, _ = to_spark(spark, fx)
    rows = events.toJSON().collect()
    data_dir = tmp_path / "in"
    data_dir.mkdir()
    # simulate at-least-once redelivery: second file repeats the first half
    (data_dir / "a.json").write_text("\n".join(rows))
    (data_dir / "b.json").write_text("\n".join(rows[: len(rows) // 2]))

    stream = (
        spark.readStream.schema(PARKING_EVENT_FLAT)
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )
    got: list = []
    q = (
        dedup_stream(stream)
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # duplicates suppressed; note fixture junk events share (plate, ts) with
    # their session's ENTRY, so the expected count is distinct keys, not rows
    import json

    distinct_keys = {
        (json.loads(r)["license_plate"], json.loads(r)["ts"]) for r in rows
    }
    assert len(got) == len(distinct_keys)
    keys = [(r["license_plate"], r["ts"]) for r in got]
    assert len(set(keys)) == len(keys)
