"""Batch sources.

Covers SURVEY.md §2.1 S3-S5: the reference reads time-partitioned gzip
JSON-lines from object storage with an explicit schema
(apps/srvc-stats/.../MainHourly.scala:63-67) and hand-builds partition paths
(:232-236). Spark does both natively: ``spark.read.schema(...).json(glob)``
handles gzip + PERMISSIVE malformed-row dropping (subsumes the reference's
manual GZIPInputStream reader, MainDaily.scala:209-235), and partition-column
predicates prune directories without driver-side listing
(MinioService.scala:57-90 becomes unnecessary).

At 100 TB: prefer the parquet tables; keep filters on partition columns
(``event_date``/``event_hour``) so Catalyst prunes at the file index, and
filters on data columns so the vectorized parquet reader skips row groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inde1_spark.schemas import PARKING_EVENT_WIRE, TESTDATA_TABLES


# Testdata timestamps are parquet TIMESTAMP(NANOS), which Spark's reader
# rejects. We read them as raw nanos longs (legacy conf) and truncate to
# microseconds — matching DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation, so
# oracle comparisons agree to the microsecond.
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

# Inferred-schema memo per table path. The testdata tables are immutable
# inputs; re-inferring their schema on every load costs a footer-read job
# plus two full py4j schema fetches per call (~270 ms/call measured on
# local[32] — the schemas.py doctrine is "never infer on the hot path",
# and at 100 TB an inference pass per query is a real extra scan). The
# memo holds SCHEMAS only — every query still reads all data from parquet.
_SCHEMA_CACHE: dict[str, object] = {}

# Row-group count memo per table path (metadata only, read once from the
# parquet footer). Parquet files split across scan tasks only at row-group
# boundaries: a single-row-group file is an UNSPLITTABLE input, so every
# map-side operation between the scan and the first exchange runs on ONE
# core no matter how many the session has (guide §2.5 "input skew: one
# huge unsplittable file"). The driver testdata is exactly that shape
# (one row group per table at every SF — measured: the sf0.1 corpus
# tokenize pass took 2.0 s single-task vs 0.65 s after repartition(32)).
_ROW_GROUP_CACHE: dict[str, int] = {}

def _row_groups(path: str) -> int:
    n = _ROW_GROUP_CACHE.get(path)
    if n is None:
        try:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(path).num_row_groups
        except Exception:
            n = 0  # unknown layout: assume splittable, change nothing
        _ROW_GROUP_CACHE[path] = n
    return n


def load_table(
    spark: SparkSession, sf_dir: str, name: str, scan_parallel: bool = False
) -> DataFrame:
    """Read one driver testdata parquet table (TESTDATA.md).

    ``scan_parallel=True`` opts a query into the guide §2.5 unsplittable-
    input mitigation: when the parquet layout provides fewer row groups
    than the session's parallelism, a round-robin ``repartition`` is
    inserted right after the read so the map-side CPU between the scan
    and the first exchange uses every core. Opt-IN per query because the
    extra exchange only pays for itself when that map-side work dominates
    (the tokenize/ngram scoring family measured 2-3x faster; row-local
    text ops and prefiltered retrieval measured 15-30% SLOWER — the
    round-robin shuffle of raw text is pure overhead there). At real
    scale the row-group count exceeds any core count and the condition
    disables itself: no repartition, no extra shuffle of the corpus.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        df = spark.read.parquet(path)
        schema = df.schema
        _SCHEMA_CACHE[path] = schema
    else:
        df = spark.read.schema(schema).parquet(path)
    fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    for col in _NANOS_TS_COLUMNS.get(name, ()):
        if fields.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if scan_parallel:
        floor = int(
            os.environ.get(
                "SPARK_GRAFT_SCAN_MIN_TASKS", spark.sparkContext.defaultParallelism
            )
        )
        if 0 < _row_groups(path) < floor:
            # deterministic round-robin (sortBeforeRepartition is on by
            # default); every downstream aggregate follows DESIGN.md §3's
            # order-exact arithmetic, so results are partition-invariant
            df = df.repartition(floor)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all testdata tables as a dict of lazy DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def read_parking_events_json(
    spark: SparkSession, path: str, drop_malformed: bool = True
) -> DataFrame:
    """Read reference-format parking events (gzip JSON-lines, nested) and
    flatten to the analytics schema.

    Mirrors the reference's scan + flatten projection
    (MainHourly.scala:63-80): explicit schema (no inference pass), nested
    struct fields projected to flat columns, ISO-8601 string promoted to
    TimestampType. Malformed lines are dropped, matching the reference's
    log-and-skip behavior (MinioService.scala:38-44).
    """
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    raw = spark.read.schema(PARKING_EVENT_WIRE).option("mode", mode).json(path)
    return flatten_parking_events(raw)


def flatten_parking_events(raw: DataFrame) -> DataFrame:
    """Nested wire form -> flat analytics form (P3, MainHourly.scala:70-80)."""
    return raw.select(
        F.col("eventType").alias("event_type"),
        F.to_timestamp("timestamp").alias("ts"),
        F.col("vehicle.licensePlate").alias("license_plate"),
        F.col("vehicle.vehicleType").alias("vehicle_type"),
        F.col("vehicle.color").alias("color"),
        F.col("parking.parkingLotId").alias("parking_lot_id"),
        F.col("parking.parkingSpotId").alias("parking_spot_id"),
        F.col("parking.isSlotHandicapped").alias("is_slot_handicapped"),
        F.col("duration").alias("duration_ms"),
    )


def read_parking_events_csv(
    spark: SparkSession, path: str, drop_malformed: bool = True
) -> DataFrame:
    """CSV ingress for the FLAT analytics schema (header, explicit types).

    Same contract as the JSON reader: explicit schema — never an inference
    pass, which at 100 TB costs a full extra scan — and DROPMALFORMED for
    the log-and-skip behavior. CSV carries no nesting, so the file holds
    the flat form directly; gzip/zstd are transparent by extension, and a
    directory of part files parallelizes like any other file source.

    Caveat (CSV parser column pruning): malformed detection only runs for
    columns a query actually reads — a bare ``count()`` parses nothing and
    drops nothing, so row counts over CSV must project at least one
    not-null-required column.
    """
    from inde1_spark.schemas import PARKING_EVENT_FLAT

    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return (
        spark.read.schema(PARKING_EVENT_FLAT)
        .option("header", "true")
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same pushdown/pruning contract as parquet.

    ORC is the other columnar format a warehouse migration brings along;
    Spark's vectorized ORC reader gives the same PushedFilters + column
    pruning the parquet plans are pinned on (asserted in
    tests/test_formats.py). No schema argument: columnar footers carry it.
    """
    return spark.read.orc(path)
