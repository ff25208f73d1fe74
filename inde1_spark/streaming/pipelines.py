"""Structured Streaming pipelines mirroring the reference's live services.

Three streaming surfaces (SURVEY.md §2.8, §3.2-3.3):

- **alert path** (srvc-alert): parking events -> stream-static user join ->
  violation filter -> alert records, optionally back to Kafka (T2).
- **live slot state** (repo-events): last event per (lot, spot) maintained
  as a streaming materialized view (T3) — via ``foreachBatch`` upsert, the
  bounded-state replacement for the reference's unbounded in-memory maps
  (RepoEventsApi.scala:30 grows forever; we don't replicate that).
- **windowed stats** (srvc-stats rewritten): event-time tumbling windows
  with a watermark (T5/T6) instead of cron + path math — late events get
  defined semantics instead of silent miscounts.

All transforms reuse the batch operators in ``operators.parking`` — the
same DataFrame->DataFrame functions run in both modes (the engine's core
design stance, SURVEY §7.1).

Kafka wiring (S1/S2) is config-only here: the container has no broker, so
``kafka_source``/``kafka_sink`` build the readers/writers but tests drive
the transforms with file/memory sources instead. On a real cluster they are
the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from inde1_spark.operators.parking import detect_violations, valid_events
from inde1_spark.schemas import EVENT_ENTRY, PARKING_EVENT_WIRE


# Reference topic names: parking-event-topic is produced by srvc-io
# (Main.scala:30-47) and consumed by srvc-alert (ParkingEventConsumer.
# scala:24-53); alert-event-topic is produced by the alert publisher
# (AlertEventPublisher.scala:21-35).
PARKING_EVENT_TOPIC = "parking-event-topic"
ALERT_EVENT_TOPIC = "alert-event-topic"


def kafka_source_options(
    brokers: str,
    topic: str = PARKING_EVENT_TOPIC,
    starting_offsets: str = "latest",
) -> dict[str, str]:
    """The exact option set the S1 reader is built with — a pure function
    so the wiring is unit-testable without a broker
    (tests/test_kafka_wiring.py)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str = PARKING_EVENT_TOPIC,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: Kafka source -> parsed, flattened parking-event stream.

    Mirrors srvc-alert's consumer config (ParkingEventConsumer.scala:24-53):
    string key (the plate) / JSON value. ``from_json`` with the explicit
    wire schema (never infer on a stream); malformed values null out and are
    dropped, matching the reference's log-and-skip.
    """
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(brokers, topic, starting_offsets))
        .load()
    )
    return parse_kafka_value(raw)


def alert_stream(events: DataFrame, users: DataFrame) -> DataFrame:
    """T2: violation alerts from an event stream + static user dimension.

    The static side broadcasts; every micro-batch joins against it without
    shuffling the stream (stream-static join). Identical semantics to the
    batch ``detect_violations`` — it IS the same function.
    """
    return detect_violations(events, users)


def parse_kafka_value(raw: DataFrame) -> DataFrame:
    """Kafka value bytes -> flattened parking events (the testable core of
    ``kafka_source``; works on any DataFrame with a ``value`` column)."""
    from inde1_spark.sources.readers import flatten_parking_events

    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), PARKING_EVENT_WIRE).alias("e")
    ).select("e.*")
    return flatten_parking_events(parsed).filter(F.col("event_type").isNotNull())


# Severity mapping from the notifier (srvc-notifier/.../AlertEventSubscriber.
# scala:85-91): violation type -> severity for the downstream webhook.
SEVERITY_MAP = {
    "unauthorized_user": "HIGH",
    "unknown_user": "MEDIUM",
}


def with_severity(alerts: DataFrame) -> DataFrame:
    """T2 tail: attach notifier severity + rendered message
    (AlertEventSubscriber.scala:85-91, DiscordNotifier.scala:22-57)."""
    sev = F.when(
        F.col("violation_type") == "unauthorized_user", F.lit("HIGH")
    ).when(F.col("violation_type") == "unknown_user", F.lit("MEDIUM")).otherwise(
        F.lit("LOW")
    )
    return alerts.select(
        "*",
        sev.alias("severity"),
        F.concat(
            F.lit("Vehicle "),
            F.col("vehicle_plate"),
            F.lit(" violation ("),
            F.col("violation_type"),
            F.lit(") at "),
            F.col("lot_id"),
            F.lit("/"),
            F.col("spot_id"),
        ).alias("message"),
    )


def kafka_sink_options(brokers: str, topic: str = ALERT_EVENT_TOPIC) -> dict[str, str]:
    """The exact option set the S2 writer is built with (pure, testable)."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def alert_kafka_payload(alerts: DataFrame) -> DataFrame:
    """(key, value) Kafka records for the alert stream: key = plate (the
    reference's partitioning key), value = the publisher's JSON document
    (AlertEventPublisher.scala:21-35). Pure transform — testable on a batch
    DataFrame without a broker."""
    return alerts.select(
        F.col("vehicle_plate").alias("key"),
        F.to_json(
            F.struct(
                "vehicle_plate", "spot_id", "lot_id", "violation_type",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("timestamp"),
            )
        ).alias("value"),
    )


def alerts_to_kafka_sink(alerts: DataFrame, brokers: str, topic: str = ALERT_EVENT_TOPIC):
    """S2: serialize alerts to JSON keyed by plate, as the reference's
    publisher does (AlertEventPublisher.scala:21-35)."""
    return (
        alert_kafka_payload(alerts)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic))
    )


def windowed_stats_stream(events: DataFrame, window: str = "1 hour",
                          watermark: str = "10 minutes") -> DataFrame:
    """T5/T6: tumbling event-time window stats with late-data handling.

    Replaces the reference's cron-driven previous-hour path math
    (MainHourly.scala:14-24, 232-236): the window is on EVENT time, the
    watermark bounds state and defines which late events still count —
    semantics the reference leaves undefined (T7).
    """
    is_entry = (F.col("event_type") == EVENT_ENTRY).cast("long")
    return (
        valid_events(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("parking_lot_id"))
        .agg(
            F.sum(is_entry).alias("nbr_entries"),
            F.sum(1 - is_entry).alias("nbr_exit"),
            F.greatest(
                F.lit(0).cast("long"), F.sum(is_entry) - F.sum(1 - is_entry)
            ).alias("occupancy"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "parking_lot_id",
            "nbr_entries",
            "nbr_exit",
            "occupancy",
        )
    )


class SlotStateSink:
    """T3: streaming materialized view of the live slot map.

    ``foreachBatch`` upsert of last-event-per-key into a driver-side dict
    (stand-in for Redis HSET; swap ``_store`` for a Redis client in
    production — the upsert contract is identical). State is bounded by the
    keyspace (lots x spots), never by stream length: each micro-batch
    reduces to at most one row per (lot, spot) BEFORE the upsert, executor-
    side.
    """

    def __init__(self) -> None:
        self._store: dict[str, dict] = {}

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from inde1_spark.operators.parking import slot_state

        for row in slot_state(batch_df).collect():  # <= |lots x spots| rows
            cur = self._store.get(row["slot_key"])
            if (
                cur is not None
                and cur["updated_at"] is not None
                and row["updated_at"] is not None
                and row["updated_at"] < cur["updated_at"]
            ):
                # late/out-of-order micro-batch (normal with Kafka): never
                # regress a slot to an older state than what's stored
                continue
            self._store[row["slot_key"]] = {
                "occupied": row["occupied"],
                "lot": row["lot"],
                "plate": row["plate"],
                "updated_at": row["updated_at"],
            }

    def writer(self, events: DataFrame):
        return events.writeStream.foreachBatch(self.process_batch).outputMode("update")

    def snapshot(self) -> dict[str, dict]:
        return dict(self._store)

    def lot(self, lot_id: str) -> dict[str, dict]:
        """GET /events/{lot} equivalent (RepoEventsApi.scala:117-119)."""
        return {k: v for k, v in self._store.items() if v["lot"] == lot_id}


def redis_document_key(date: str, hour: int) -> str:
    """The dashboard key contract: parking-stats:hourly:$date:$hour
    (MainHourly.scala:245; consumed by Grafana real_time.json:181,240)."""
    return f"parking-stats:hourly:{date}:{hour}"


class RedisJsonSink:
    """S6: JSON.SET-style sink behind ``foreachBatch``.

    Two write paths with different correctness contracts:

    - ``write_stats(stats_df)``: overwrite documents from an already-FULL
      hourly aggregate (the batch ``run_hourly_job`` path). Idempotent by
      key — re-running a window overwrites the same document, the property
      the reference relies on.
    - ``process_batch``: the streaming path. An hour routinely spans
      micro-batches, and clamped per-lot occupancy is NOT additive, so the
      sink read-merges at the finest ADDITIVE grain — raw entry/exit
      counts per (date, hour, lot, vehicle_type) — and rebuilds each
      affected document from the merged counts (occupancy re-clamped
      after the merge, which is the only order that is exact). In
      production the merge state lives in Redis itself (HINCRBY the raw
      counts, then JSON.SET the rebuilt doc); the in-memory dict mirrors
      that contract for tests.
    """

    def __init__(self, client=None) -> None:
        self.store: dict[str, str] = {}
        self._client = client
        # (date, hour, lot, vehicle_type) -> [entries, exits]; additive grain
        self._counts: dict[tuple, list[int]] = {}

    def write_stats(self, stats_df: DataFrame) -> None:
        rows = stats_df.select(
            "date", "hour", F.to_json(F.struct(*stats_df.columns)).alias("doc")
        ).collect()
        for r in rows:
            self._put(redis_document_key(r["date"], r["hour"]), r["doc"])

    def _put(self, key: str, doc: str) -> None:
        if self._client is not None:
            self._client.execute_command("JSON.SET", key, ".", doc)
        else:
            self.store[key] = doc

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import json as _json

        from inde1_spark.operators.parking import RATE_PER_HOUR, valid_events
        from inde1_spark.schemas import EVENT_ENTRY

        is_entry = (F.col("event_type") == EVENT_ENTRY).cast("long")
        partials = (
            valid_events(batch_df)
            .groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("date"),
                F.hour("ts").alias("hour"),
                "parking_lot_id",
                "vehicle_type",
            )
            .agg(F.sum(is_entry).alias("e"), F.sum(1 - is_entry).alias("x"))
            .collect()  # <= |hours x lots x types| rows per batch
        )
        touched: set[tuple] = set()
        for r in partials:
            k = (r["date"], r["hour"], r["parking_lot_id"], r["vehicle_type"])
            cur = self._counts.setdefault(k, [0, 0])
            cur[0] += r["e"]
            cur[1] += r["x"]
            touched.add((r["date"], r["hour"]))
        for date, hour in sorted(touched):
            lots: dict[str, list[int]] = {}
            vtypes: dict[str, int] = {}
            for (d, h, lot, vt), (e, x) in self._counts.items():
                if (d, h) != (date, hour):
                    continue
                le = lots.setdefault(lot, [0, 0])
                le[0] += e
                le[1] += x
                vtypes[vt] = vtypes.get(vt, 0) + e + x
            occupancy = {lot: max(0, e - x) for lot, (e, x) in sorted(lots.items())}
            total_occupied = sum(occupancy.values())
            doc = _json.dumps(
                {
                    "date": date,
                    "hour": hour,
                    "nbr_entries": sum(e for e, _ in lots.values()),
                    "nbr_exit": sum(x for _, x in lots.values()),
                    "occupancy": occupancy,
                    "revenue_simulation": round(total_occupied * RATE_PER_HOUR, 2),
                    "vehicle_types": dict(sorted(vtypes.items())),
                }
            )
            self._put(redis_document_key(date, hour), doc)

    def writer(self, events: DataFrame):
        return events.writeStream.foreachBatch(self.process_batch).outputMode("append")


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("license_plate", "ts"),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state.

    ``dropDuplicatesWithinWatermark``: duplicate records arriving within the
    watermark horizon are suppressed; state for a key is dropped once the
    watermark passes it — O(keys-in-horizon) state, not O(stream). This is
    the ingest-side twin of the batch ``dedup_exact`` operator (at-least-once
    sources like Kafka + S3 connectors routinely re-deliver; the reference's
    connector runs with errors.tolerance=all and dedupes nothing, T6).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def archive_writer(events: DataFrame, path: str, fmt: str = "parquet"):
    """S8: the Kafka->S3 archival connector, Spark-native.

    The reference runs a Confluent S3 sink with a time-based partitioner
    (yyyy/MM/dd/HH/mm path, gzip JSON, flush.size 100k,
    k8s/kafka/s3-sink-connector.yml:23-46). Structured Streaming replaces
    it with ``writeStream.partitionBy`` on EVENT-time partition columns —
    so the archive is partition-pruned by Catalyst on read (no hand-built
    path globs, P5/S5 come free) and written exactly-once via the
    checkpoint.

    Parquet default (columnar beats gzip-JSON at 100 TB: ~5-10x smaller
    scans with column pruning + predicate pushdown); pass fmt="json" with
    ``.option("compression", "gzip")`` downstream for byte-compatible
    reference parity.
    """
    partitioned = events.select(
        "*",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.hour("ts").alias("event_hour"),
    )
    return (
        partitioned.writeStream.format(fmt)
        .partitionBy("event_date", "event_hour")
        .option("path", path)
        .outputMode("append")
    )


def weekly_timeseries(events: DataFrame, rate: float = 2.0) -> DataFrame:
    """S7 feed: the weekly dashboard time series (one point per day) —
    entries, exits, revenue, avg spend per vehicle type
    (MainWeekly.scala:191-308; Grafana parking_stats.json:107-456)."""
    from inde1_spark.operators.parking import session_durations, valid_events
    from inde1_spark.schemas import EVENT_ENTRY

    is_entry = (F.col("event_type") == EVENT_ENTRY).cast("long")
    daily = (
        valid_events(events)
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(is_entry).cast("double").alias("entries"),
            F.sum(1 - is_entry).cast("double").alias("exits"),
        )
    )
    # decimal sums (determinism invariant, DESIGN §3): double accumulation is
    # partition-order dependent; sum exact, scale by rate/60 once at the end
    dsum_min = F.sum(F.col("duration_min").cast("decimal(18,6)")).cast("double")
    spend_scale = F.lit(rate / 60.0)
    rev = (
        session_durations(events)
        .groupBy(F.date_trunc("day", "entry_ts").alias("day"))
        .agg((dsum_min * spend_scale).alias("revenue"))
    )
    avgspent = (
        session_durations(events)
        .groupBy(F.date_trunc("day", "entry_ts").alias("day"), "vehicle_type")
        .agg(((dsum_min / F.count("duration_min")) * spend_scale).alias("value"))
        .select(
            "day", F.concat(F.lit("avgspent:"), "vehicle_type").alias("attribute"), "value"
        )
    )
    base = (
        daily.join(rev, "day", "left")
        .select(
            "day",
            F.explode(
                F.array(
                    F.struct(F.lit("entries").alias("attribute"), F.col("entries").alias("value")),
                    F.struct(F.lit("exits").alias("attribute"), F.col("exits").alias("value")),
                    F.struct(F.lit("revenue").alias("attribute"),
                             F.coalesce("revenue", F.lit(0.0)).alias("value")),
                )
            ).alias("av"),
        )
        .select("day", F.col("av.attribute").alias("attribute"), F.col("av.value").alias("value"))
    )
    return base.unionByName(avgspent).select(
        "attribute", F.unix_millis("day").alias("ts_ms"), F.round("value", 4).alias("value")
    )


class RedisTimeSeriesSink:
    """S7: TS.ADD-style sink honoring the reference's key contract —
    ``parking-stats:weekly:$week:{entries,exits,revenue,avgspent:$type}``
    (MainWeekly.scala:257-308) and
    ``parking-events:daily:$date:timeseries:$attr`` (MainDaily.scala:264-283).

    Injected client (TS.CREATE retention 0 + TS.ADD per point); in-memory
    default for tests. Writes are idempotent per (key, ts_ms).
    """

    def __init__(self, client=None) -> None:
        self.series: dict[str, dict[int, float]] = {}
        self._client = client

    def write_weekly(self, ts_df: DataFrame, week: str) -> None:
        for r in ts_df.collect():
            key = f"parking-stats:weekly:{week}:{r['attribute']}"
            if self._client is not None:
                self._client.execute_command("TS.ADD", key, r["ts_ms"], r["value"])
            else:
                self.series.setdefault(key, {})[r["ts_ms"]] = r["value"]

    def ts_range(self, key: str) -> list[tuple[int, float]]:
        """TS.RANGE equivalent for the test/REST read path."""
        return sorted(self.series.get(key, {}).items())


def run_stream_once(events_stream: DataFrame, sink, checkpoint_dir: str):
    """Drive a stream with availableNow (process everything, then stop) —
    the test/backfill trigger; production uses processingTime."""
    q = (
        sink.writer(events_stream)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return q


SS_JOIN_MAX_SESSION = "30 minutes"  # exit must land within this of its entry
SS_JOIN_WATERMARK = "10 minutes"


def session_join_stream(events: DataFrame) -> DataFrame:
    """Stream-stream interval join: the entry stream joined to the exit
    stream of the same (plate, lot, spot) within a session-length bound.

    T2's general form — TWO unbounded streams joined on key + event-time
    range, the Structured Streaming feature the stateful sessionizer does
    by hand. Both sides carry watermarks and the join condition bounds
    exit_ts to (entry_ts, entry_ts + max_session], which is what lets the
    state store evict: an entry older than watermark - max_session can
    never match again and is dropped. Without the time bound the join
    state grows with the stream — the same unbounded-map mistake as the
    reference's eventHistory (RepoEventsApi.scala:30).

    Join semantics (ALL pairs within the bound, not n-th-to-n-th) differ
    from ``sessionize_stream`` by design; the pytest pins stream == batch
    for the SAME predicate, the engine's transform-sharing contract.
    """
    entries = (
        events.filter(F.col("event_type") == EVENT_ENTRY)
        .select(
            "license_plate",
            "parking_lot_id",
            "parking_spot_id",
            F.col("ts").alias("entry_ts"),
        )
        .withWatermark("entry_ts", SS_JOIN_WATERMARK)
    )
    exits = (
        events.filter(F.col("event_type") == "PARKING_EXIT")
        .select(
            F.col("license_plate").alias("x_plate"),
            F.col("parking_lot_id").alias("x_lot"),
            F.col("parking_spot_id").alias("x_spot"),
            F.col("ts").alias("exit_ts"),
        )
        .withWatermark("exit_ts", SS_JOIN_WATERMARK)
    )
    cond = (
        (entries.license_plate == exits.x_plate)
        & (entries.parking_lot_id == exits.x_lot)
        & (entries.parking_spot_id == exits.x_spot)
        & (exits.exit_ts > entries.entry_ts)
        & (exits.exit_ts <= entries.entry_ts + F.expr(f"INTERVAL {SS_JOIN_MAX_SESSION}"))
    )
    return entries.join(exits, cond, "inner").select(
        "license_plate",
        "parking_lot_id",
        "parking_spot_id",
        "entry_ts",
        "exit_ts",
        (
            (F.unix_timestamp("exit_ts") - F.unix_timestamp("entry_ts")) / 60.0
        ).alias("duration_min"),
    )


def hopping_stats_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """T5 variant: OVERLAPPING (hopping) event-time windows on the stream —
    a 60-minute view sliding every 30, so a boundary spike never falls
    between windows (the batch twin is ``analytics.hopping_window_stats``).

    ``window(ts, size, slide)`` expands each event into its covering
    windows row-locally before the stateful aggregation; state is bounded
    by (windows-in-watermark-horizon x lots), and the watermark both
    admits late events and expires window state — the same guarantees as
    the tumbling path, scaled by the overlap factor.
    """
    is_entry = (F.col("event_type") == EVENT_ENTRY).cast("long")
    return (
        valid_events(events)
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide).alias("w"), F.col("parking_lot_id")
        )
        .agg(
            F.sum(is_entry).alias("nbr_entries"),
            F.sum(1 - is_entry).alias("nbr_exit"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "parking_lot_id",
            "nbr_entries",
            "nbr_exit",
        )
    )


SESSION_GAP = "30 minutes"
SESSION_WATERMARK = "2 hours"


def session_window_stream(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = SESSION_WATERMARK,
) -> DataFrame:
    """T4 on the NATIVE session-window aggregation: per-plate event-time
    sessions that merge while events arrive within ``gap`` of each other
    — the engine-managed complement to the custom keyed-state sessionizer
    (``stateful.sessionize_stream`` pairs entry/exit semantically; this
    one gives activity sessions with zero user code, which is the right
    tool when "session" just means a burst of activity).

    State is per open session and closes as the watermark passes a
    session's end + gap, so memory tracks ACTIVE plates only — never
    stream history. Works identically on a batch DataFrame (same
    expression, no watermark needed), which is what the stream==batch
    test pins. Append mode: a session emits exactly once, when it can no
    longer grow.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", gap).alias("w"), F.col("license_plate")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "license_plate",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


ALERT_THROTTLE = "10 minutes"


def throttled_alert_stream(
    events: DataFrame, users: DataFrame, throttle: str = ALERT_THROTTLE
) -> DataFrame:
    """Alert de-spamming: the violation stream with repeat alerts for the
    same (plate, violation_type) suppressed while the pair stays inside
    the event-time throttle horizon — a car sitting in a handicapped slot
    fires ONE page, not one per sensor re-read (the reference pages per
    event, fine at 72k events/run; at firehose rates the pager melts).

    ``dropDuplicatesWithinWatermark`` on the alert key: state is one
    entry per recently-alerting pair, dropped as the watermark passes —
    never one per alert. First arrival wins inside a horizon; a pair
    that re-violates after the horizon alerts again, which is the paging
    semantic you want (still broken? re-page).
    """
    return (
        alert_stream(events, users)
        .withWatermark("ts", throttle)
        .dropDuplicatesWithinWatermark(["vehicle_plate", "violation_type"])
    )


def cms_sketch_stream(events: DataFrame, rows: int | None = None,
                      width: int | None = None) -> DataFrame:
    """Streaming Count-Min sketch maintenance — the sketch family's
    streaming member (T5/T8 x the mergeable-sketch rollups): the SAME
    md5 counter grid as ``analytics.heavy_hitters_cms``, updated
    incrementally by ONE bounded stateful aggregation. State is the
    sketch itself (rows x width counters, ~1024 rows) regardless of key
    cardinality — the reason CMS is the streaming frequency structure:
    per-key streaming counts hold O(keys) state, this holds O(1).

    Because the sketch is LINEAR, incremental micro-batch counters equal
    the batch build at every point in time (pytest pins stream ==
    batch); heavy-hitter estimates read the grid exactly like the batch
    probe path. Complete output mode is correct AND cheap: the result
    table IS the bounded sketch.
    """
    from inde1_spark.operators.analytics import CMS_ROWS, CMS_WIDTH, cms_bucketed

    return (
        cms_bucketed(events, rows or CMS_ROWS, width or CMS_WIDTH)
        .groupBy("r", "bucket")
        .agg(F.count("*").cast("long").alias("counter"))
    )


def bloom_build_stream(
    keys, key_col: str = "user_id", m_bits: int | None = None,
    n_hashes: int | None = None,
):
    """Streaming Bloom-filter construction — the membership-filter
    sibling of ``cms_sketch_stream`` (both are LINEAR sketches, so
    incremental micro-batch maintenance lands on exactly the structure
    the batch build produces; pytest pins stream == batch word-for-word).
    State is the filter itself (<= m_bits/32 words) regardless of key
    cardinality; complete output mode is correct AND cheap because the
    result table IS the bounded filter. The built (word, bits) table is
    what ``bloom_prefilter_join``'s probe side consumes — so a
    continuously-ingested dimension can publish a fresh pruning filter
    every micro-batch without a batch rebuild.
    """
    from inde1_spark.operators.joins import BLOOM_BITS, BLOOM_HASHES, bloom_words

    return bloom_words(
        keys, key_col, m_bits or BLOOM_BITS, n_hashes or BLOOM_HASHES
    )


def hll_distinct_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_len: str = "1 hour",
    rsd: float = 0.02,
) -> DataFrame:
    """Streaming distinct-user counting per (hour, type) via HyperLogLog++
    — the cardinality member of the streaming-sketch family
    (``cms_sketch_stream`` answers "how often", ``bloom_build_stream``
    "have we seen it", this answers "how many distinct"). State per
    window is the HLL register array (~1.5 KB at rsd=0.02), NOT the key
    set — the reason this runs at firehose rates where exact
    distinct-state is O(users).

    Merge-order safety is why stream == batch EXACTLY (pytest): HLL
    merging takes the register-wise MAX, which is commutative and
    idempotent, so incremental micro-batch accumulation lands on the
    same registers as one batch pass — unlike quantile sketches, whose
    merge is order-sensitive and only approximately stable. Watermarked
    append mode: a window's final row emits once the watermark passes
    its end (the usual late-data contract, T5/T6).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col("event_type"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_distinct_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_distinct_users",
            "n_events",
        )
    )


ORPHAN_ALARM_WATERMARK = "10 minutes"


def orphan_alarm_stream(
    events: DataFrame,
    customer: DataFrame,
    watermark: str = ORPHAN_ALARM_WATERMARK,
) -> DataFrame:
    """Live referential-integrity alarms — the streaming face of
    ``analytics.fk_integrity_audit``'s events→customer edge: the batch
    audit counts the rows an enrichment join has ALREADY silently
    dropped; the monitor alarms the first time an unknown or null user
    key arrives (reference intent: the consumer's user lookup treats a
    missing user as a miss that suppresses the alert path,
    apps/srvc-alert/.../UserService.scala — this stream makes those
    misses visible instead of silent).

    Stateless detection: a stream-static LEFT ANTI join against the
    broadcast-sized key projection of the dimension (null keys never
    match an anti join, so they surface too, tagged 'null_key' vs
    'orphan'). The only state is ``dropDuplicatesWithinWatermark`` on
    the user key — one alarm per unknown key per watermark window, the
    admission-stream suppression rule (all null keys share one alarm
    slot, documented). At scale the dimension side is the same
    broadcast the enrichment itself uses — the monitor adds no shuffle.
    """
    keys = customer.select(F.col("c_custkey").alias("user_id")).distinct()
    alarms = (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id")
        .join(keys, "user_id", "left_anti")
        .select(
            "user_id",
            F.when(F.col("user_id").isNull(), F.lit("null_key"))
            .otherwise(F.lit("orphan"))
            .alias("kind"),
            "ts",
            "event_id",
        )
    )
    return alarms.dropDuplicatesWithinWatermark(["user_id"])
