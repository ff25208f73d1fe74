"""Streaming corpus-prep tests: documents as a file-source firehose.

Checks the streaming pipeline (gopher filter -> dedup-within-watermark ->
split) against the batch ``jobs.corpus_prep`` on the same documents, and
that checkpointed restarts do not re-admit already-seen content.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.jobs import corpus_prep
from inde1_spark.streaming.corpus import (
    corpus_prep_stream,
    corpus_stream_writer,
    document_stream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def doc_env(spark, tmp_path_factory):
    """sf0.001 documents (+ a planted exact duplicate and a degenerate doc)
    written as JSON-lines with a deterministic ingest_ts."""
    root = tmp_path_factory.mktemp("corpus_stream")
    data_dir = root / "data"
    data_dir.mkdir()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dup = docs.orderBy("doc_id").limit(1).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    junk = spark.createDataFrame(
        [(20_000_000, "tiny", "en", "web", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    feed = docs.unionByName(dup).unionByName(junk).withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3600),
    )
    rows = feed.toJSON().collect()
    half = len(rows) // 2
    (data_dir / "part-0.json").write_text("\n".join(rows[:half]))
    (data_dir / "part-1.json").write_text("\n".join(rows[half:]))
    return str(data_dir), docs, str(root / "ckpt"), str(root / "out")


def test_corpus_prep_stream_matches_batch(spark, doc_env):
    data_dir, docs, ckpt, out = doc_env
    stream = document_stream(spark, data_dir)
    q = (
        corpus_stream_writer(corpus_prep_stream(stream), out, ckpt + "/prep")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    want = corpus_prep(docs)

    # Same surviving content set (stream keeps first-arrival, batch keeps
    # min doc_id — compare by content hash, not doc_id) and same splits.
    got_set = {
        (r["h"], r["split"])
        for r in got.select(F.md5("text").alias("h"), "split").collect()
    }
    want_set = {
        (r["h"], r["split"])
        for r in want.select(F.md5("text").alias("h"), "split").collect()
    }
    assert got_set == want_set
    assert got.count() == want.count()  # planted dup collapsed
    # The degenerate doc never reached the store.
    assert got.filter(F.col("doc_id") == 20_000_000).count() == 0
    # Split-partitioned layout on disk.
    assert any(p.startswith("split=") for p in os.listdir(out))


def test_corpus_stream_restart_no_redelivery(spark, doc_env, tmp_path):
    """Re-delivering the same file content after a restart must not re-admit
    docs: dedup state lives in the checkpoint."""
    data_dir, docs, _, _ = doc_env
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    redeliver = str(tmp_path / "data")
    os.makedirs(redeliver)
    src = sorted(os.listdir(data_dir))
    with open(os.path.join(data_dir, src[0])) as f:
        first = f.read()
    with open(os.path.join(redeliver, "a.json"), "w") as f:
        f.write(first)

    stream = document_stream(spark, redeliver)
    q = corpus_stream_writer(
        corpus_prep_stream(stream), out, ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()

    # Same content again under a new file name (at-least-once re-delivery).
    with open(os.path.join(redeliver, "b.json"), "w") as f:
        f.write(first)
    stream = document_stream(spark, redeliver)
    q = corpus_stream_writer(
        corpus_prep_stream(stream), out, ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(300)

    assert spark.read.parquet(out).count() == n1
    assert n1 > 0


def test_chunk_stream_matches_batch(spark, doc_env, tmp_path):
    """The streaming chunker must emit exactly the batch chunk set for the
    same admitted documents (stateless projection => trivially exact)."""
    from inde1_spark.operators.corpus import chunk_tokens
    from inde1_spark.streaming.corpus import chunk_stream

    data_dir, docs, _, _ = doc_env
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    stream = document_stream(spark, data_dir)
    q = (
        chunk_stream(corpus_prep_stream(stream))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    want = chunk_tokens(corpus_prep(docs))
    # doc_ids differ for the planted dup (first-arrival vs min-id); compare
    # the chunk CONTENT multiset
    got_set = sorted(
        (r["chunk_idx"], r["tok_start"], r["chunk_len"], r["chunk_text"])
        for r in got.collect()
    )
    want_set = sorted(
        (r["chunk_idx"], r["tok_start"], r["chunk_len"], r["chunk_text"])
        for r in want.collect()
    )
    assert got_set == want_set and len(got_set) > 0


def test_novel_chunk_stream_matches_batch_distinct(spark, doc_env):
    """The streamed novelty feed must emit each qualifying CDC chunk
    exactly once (first arrival), i.e. the same chunk-hash SET as the
    batch chunk table's distinct — the planted duplicate doc contributes
    nothing, the degenerate doc has no >=min_words chunks."""
    from inde1_spark.operators.dedup import cdc_chunk_table
    from inde1_spark.streaming.corpus import novel_chunk_stream

    data_dir, docs, ckpt, out = doc_env
    stream = document_stream(spark, data_dir)
    q = (
        novel_chunk_stream(stream)
        .writeStream.format("parquet")
        .option("path", out + "_chunks")
        .option("checkpointLocation", ckpt + "/chunks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out + "_chunks")
    want = cdc_chunk_table(docs).select("chunk_hash").distinct()
    got_set = {r["chunk_hash"] for r in got.select("chunk_hash").collect()}
    want_set = {r["chunk_hash"] for r in want.collect()}
    assert got_set == want_set
    assert got.count() == len(got_set)  # exactly-once per chunk hash


def test_near_dup_stream_matches_exact_ground_truth(spark, tmp_path):
    """Stream the 10%-hash batch slice against the 90% static index: the
    detection feed must equal the EXACT cross-split Jaccard pair set
    (banding recall 1 on this corpus, verify precision exact), with the
    same jaccard values as the ground truth."""
    from inde1_spark.operators.dedup import (
        INCR_BATCH_PCT,
        dedup_ngram_jaccard,
        release_persisted,
    )
    from inde1_spark.operators.text import hash_bucket
    from inde1_spark.streaming.corpus import document_stream, near_dup_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    is_batch = hash_bucket(F.col("doc_id"), 100) < INCR_BATCH_PCT
    batch = docs.filter(is_batch)
    index = docs.filter(~is_batch)

    # exact ground truth: cross-split near-dup pairs, either orientation
    truth = {}
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    for r in dedup_ngram_jaccard(docs).collect():
        a, b = r["doc_a"], r["doc_b"]
        if (a in batch_ids) != (b in batch_ids):
            new, idx = (a, b) if a in batch_ids else (b, a)
            truth[(new, idx)] = r["jaccard"]
    assert truth, "fixture must contain cross-split near-dups"
    release_persisted()

    data_dir = tmp_path / "feed"
    data_dir.mkdir()
    feed = batch.withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3600),
    )
    rows = feed.toJSON().collect()
    half = len(rows) // 2
    (data_dir / "a.json").write_text("\n".join(rows[:half]))
    (data_dir / "b.json").write_text("\n".join(rows[half:]))

    got_rows: list = []
    q = (
        near_dup_stream(document_stream(spark, str(data_dir)), index)
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {(r["doc_new"], r["doc_idx"]): r["jaccard"] for r in got_rows}
    assert got == truth
    assert len(got_rows) == len(got)  # band collisions deduped


def test_cms_sketch_stream_matches_batch(spark, tmp_path):
    """The CMS counter grid is linear: incremental micro-batch maintenance
    must land on exactly the counters the batch build produces."""
    from inde1_spark.operators.analytics import cms_bucketed
    from inde1_spark.streaming.pipelines import cms_sketch_stream

    rows = [(i, 100 + (i * 7) % 23) for i in range(400)]
    batch = spark.createDataFrame(rows, "event_id long, user_id long")

    data_dir = tmp_path / "cms_data"
    data_dir.mkdir()
    json_rows = batch.toJSON().collect()
    third = max(1, len(json_rows) // 3)
    for i in range(3):
        chunk = json_rows[i * third : (i + 1) * third if i < 2 else len(json_rows)]
        (data_dir / f"part-{i}.json").write_text("\n".join(chunk))
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )

    final: dict = {}

    def grab(df, _id):
        final.clear()
        final.update({(r["r"], r["bucket"]): r["counter"] for r in df.collect()})

    q = (
        cms_sketch_stream(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = {
        (r["r"], r["bucket"]): r["counter"]
        for r in cms_bucketed(batch)
        .groupBy("r", "bucket")
        .count()
        .withColumnRenamed("count", "counter")
        .collect()
    }
    assert final == want and len(want) > 0


def test_bloom_build_stream_matches_batch(spark, tmp_path):
    """bit_or is mergeable: the filter built incrementally over three
    micro-batches must equal the batch build word-for-word."""
    from inde1_spark.operators.joins import bloom_words
    from inde1_spark.streaming.pipelines import bloom_build_stream

    rows = [(i, 100 + (i * 13) % 37) for i in range(300)]
    batch = spark.createDataFrame(rows, "event_id long, user_id long")

    data_dir = tmp_path / "bloom_data"
    data_dir.mkdir()
    json_rows = batch.toJSON().collect()
    third = max(1, len(json_rows) // 3)
    for i in range(3):
        chunk = json_rows[i * third : (i + 1) * third if i < 2 else len(json_rows)]
        (data_dir / f"part-{i}.json").write_text("\n".join(chunk))
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )

    final: dict = {}

    def grab(df, _id):
        final.clear()
        final.update({r["word"]: r["bits"] for r in df.collect()})

    q = (
        bloom_build_stream(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = {
        r["word"]: r["bits"]
        for r in bloom_words(batch, "user_id", 4096, 3).collect()
    }
    assert final == want and want


def _mg_reference(chunks, capacity, n_shards):
    """Pure-Python replay of the per-shard merge rule over the same chunk
    sequence (exact per-chunk counts -> mergeable-summaries step)."""
    state = {s: ({}, 0) for s in range(n_shards)}
    for chunk in chunks:
        per_shard: dict = {}
        for uid in chunk:
            per_shard.setdefault(uid % n_shards, {}).setdefault(uid, 0)
            per_shard[uid % n_shards][uid] += 1
        for s, batch_counts in per_shard.items():
            summary, dec = state[s]
            for k, c in batch_counts.items():
                summary[k] = summary.get(k, 0) + c
            if len(summary) > capacity:
                ordered = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
                t = ordered[capacity][1]
                dec += t
                summary = {k: c - t for k, c in ordered[:capacity] if c - t > 0}
            state[s] = (summary, dec)
    return {
        (s, k): (c, dec)
        for s, (summary, dec) in state.items()
        for k, c in summary.items()
    }


def test_space_saving_stream_matches_reference_fold(spark, tmp_path):
    """Stream over 3 ordered chunks == the pure-Python merge-rule replay:
    order-free inside each batch (exact pre-counts), deterministic merge."""
    import os

    from inde1_spark.streaming.stateful import (
        MG_CAPACITY,
        MG_SHARDS,
        space_saving_stream,
    )

    # skewed stream: key 7 is heavy, a long tail of one-off keys
    chunks = [
        [7] * 30 + [100 + i for i in range(40)],
        [7] * 25 + [3] * 18 + [200 + i for i in range(40)],
        [7] * 20 + [3] * 12 + [300 + i for i in range(40)],
    ]
    data_dir = tmp_path / "mg_data"
    data_dir.mkdir()
    eid = 0
    for i, chunk in enumerate(chunks):
        lines = []
        for uid in chunk:
            lines.append('{"event_id": %d, "user_id": %d}' % (eid, uid))
            eid += 1
        p = data_dir / f"part-{i}.json"
        p.write_text("\n".join(lines))
        os.utime(p, (1700000000 + i, 1700000000 + i))  # strict mtime order

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )
    final: dict = {}

    def grab(df, _id):
        rows = df.collect()
        if rows:  # each batch re-emits its shards' full summaries
            for r in rows:
                final[(r["shard"], r["user_id"])] = (
                    r["est_count"], r["err_bound"]
                )

    q = (
        space_saving_stream(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = _mg_reference(chunks, MG_CAPACITY, MG_SHARDS)
    # the final emission for each shard must equal the reference summary
    # (stale keys from earlier batches may linger in `final`, so compare
    # per shard against the keys the reference kept)
    for (s, k), (c, dec) in want.items():
        assert final[(s, k)] == (c, dec), (s, k)

    # MG guarantees on the heavy keys: est <= true <= est + err_bound,
    # and a key with true count > dec is present
    true7 = sum(ch.count(7) for ch in chunks)
    c7, dec7 = want[(7 % MG_SHARDS, 7)]
    assert c7 <= true7 <= c7 + dec7


def test_space_saving_under_capacity_is_exact(spark, tmp_path):
    """Distinct keys per shard under capacity -> no decrement, exact counts."""
    import os

    from inde1_spark.streaming.stateful import space_saving_stream

    rows = [(i, i % 6) for i in range(120)]  # 6 keys, ~2 per shard
    data_dir = tmp_path / "mg2_data"
    data_dir.mkdir()
    for i in range(2):
        chunk = rows[i * 60 : (i + 1) * 60]
        p = data_dir / f"part-{i}.json"
        p.write_text(
            "\n".join(
                '{"event_id": %d, "user_id": %d}' % (e, u) for e, u in chunk
            )
        )
        os.utime(p, (1700000000 + i, 1700000000 + i))
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )
    final: dict = {}

    def grab(df, _id):
        for r in df.collect():
            final[r["user_id"]] = (r["est_count"], r["err_bound"])

    q = (
        space_saving_stream(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "mg2_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert final == {u: (20, 0) for u in range(6)}


def test_hll_distinct_stream_matches_batch(spark, tmp_path):
    """HLL register merge is commutative+idempotent (register-wise max),
    so incremental micro-batch accumulation must equal one batch pass
    EXACTLY — including the estimator's rounding. Chunks are event-time
    ordered (the CLAUDE.md mtime convention) and a far-future flush row
    advances the watermark past every real window."""
    import os
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from inde1_spark.streaming.pipelines import hll_distinct_stream

    base = datetime(2024, 3, 4, 0, 30, 0)
    rows = []
    for i in range(600):
        rows.append(
            (i, base + timedelta(minutes=(i * 7) % 300),
             100 + (i * 13) % 37, "view" if i % 3 else "click", 1.0, "{}")
        )
    rows.sort(key=lambda r: r[1])  # event-time-ordered chunking
    flush = (10_000, base + timedelta(days=10), 1, "flush", 1.0, "{}")
    batch = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    data_dir = tmp_path / "hll_data"
    data_dir.mkdir()
    third = len(rows) // 3
    chunks = [rows[:third], rows[third: 2 * third], rows[2 * third:] + [flush]]
    for i, chunk in enumerate(chunks):
        lines = [
            '{"event_id": %d, "ts": "%s", "user_id": %d, '
            '"event_type": "%s", "value": 1.0, "props": "{}"}'
            % (e, ts.strftime("%Y-%m-%d %H:%M:%S"), u, t)
            for (e, ts, u, t, _v, _p) in chunk
        ]
        p = data_dir / f"part-{i}.json"
        p.write_text("\n".join(lines))
        os.utime(p, (1700000000 + i, 1700000000 + i))
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(data_dir))
    )
    got: dict = {}

    def grab(df, _id):
        for r in df.collect():
            got[(r["window_start"], r["event_type"])] = (
                r["n_distinct_users"], r["n_events"]
            )

    q = (
        hll_distinct_stream(stream)
        .writeStream.foreachBatch(grab)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hll_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = {
        (r["window_start"], r["event_type"]): (
            r["n_distinct_users"], r["n_events"]
        )
        for r in hll_distinct_stream(batch).collect()
    }
    assert got == want and len(want) >= 5
    # sanity: the estimate tracks the exact distinct count
    exact = {
        (r["ws"], r["event_type"]): r["d"]
        for r in batch.groupBy(
            F.date_format(F.window("ts", "1 hour").start,
                          "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
        ).agg(F.countDistinct("user_id").alias("d")).collect()
    }
    for k, (est, _n) in want.items():
        assert abs(est - exact[k]) <= max(2, int(0.1 * exact[k])), (k, est, exact[k])


def test_lpa_communities_stream_matches_batch(spark, tmp_path):
    """The LPA histogram over the fully-drained edge stream must equal the
    batch ``label_propagation_communities`` on the same corpus — stream
    and batch share ``lpa_histogram`` verbatim, so this pins the sink's
    accumulate-and-recompute plumbing (append exactly once per edge,
    publish the LAST recompute). Chunk order is irrelevant by design
    (the result is a function of the accumulated edge SET), so no mtime
    staging is needed here, unlike the watermark tests.
    """
    import json

    from inde1_spark.operators.dedup import (
        dedup_ngram_jaccard,
        label_propagation_communities,
    )
    from inde1_spark.streaming.corpus import lpa_communities_stream

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(docs)
        .select("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
        .collect()
    ]
    assert len(edges) > 0, "corpus lost its planted near-dups"
    data_dir = tmp_path / "edge_feed"
    data_dir.mkdir()
    third = max(1, len(edges) // 3)
    for i in range(3):
        chunk = edges[i * third : (i + 1) * third if i < 2 else None]
        with open(data_dir / f"chunk{i}.json", "w") as f:
            for a, b in chunk:
                f.write(json.dumps({"doc_a": a, "doc_b": b}) + "\n")
    stream = (
        spark.readStream.schema("doc_a long, doc_b long")
        .option("maxFilesPerTrigger", 1)  # force >1 micro-batch
        .json(str(data_dir))
    )
    q = (
        lpa_communities_stream(
            stream, str(tmp_path / "state"), str(tmp_path / "out")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["community_size"], r["n_communities"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    want = sorted(
        (r["community_size"], r["n_communities"])
        for r in label_propagation_communities(docs).collect()
    )
    assert got == want
    # the standing edge table (batch-keyed dirs) holds every edge once
    state = spark.read.parquet(str(tmp_path / "state" / "b*"))
    assert state.count() == len(edges)
    assert state.distinct().count() == len(edges)


def test_lpa_sink_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch (same batch_id,
    same rows — the crash-between-write-and-commit case) must leave the
    standing edge table and the published histogram unchanged."""
    from inde1_spark.streaming.corpus import lpa_batch_sink

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    sink = lpa_batch_sink(state, out)
    b0 = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    b1 = spark.createDataFrame([(10, 11)], "doc_a long, doc_b long")
    sink(b0, 0)
    sink(b1, 1)
    first = sorted(
        (r["community_size"], r["n_communities"])
        for r in spark.read.parquet(out).collect()
    )
    n_edges = spark.read.parquet(f"{state}/b*").count()
    sink(b1, 1)  # replay the last batch
    assert spark.read.parquet(f"{state}/b*").count() == n_edges
    replayed = sorted(
        (r["community_size"], r["n_communities"])
        for r in spark.read.parquet(out).collect()
    )
    assert replayed == first


def test_lpa_stream_checkpoint_restart_continues(spark, tmp_path):
    """Stop after draining the first feed, add new edges, restart on the
    SAME checkpoint: the original files must not reprocess (their batch
    dirs unchanged), new batches get fresh ids, and the published
    histogram equals the batch LPA over the full edge set."""
    import json

    from inde1_spark.operators.dedup import lpa_histogram
    from inde1_spark.streaming.corpus import lpa_communities_stream

    data_dir = tmp_path / "feed"
    data_dir.mkdir()
    first = [(1, 2), (2, 3), (10, 11)]
    second = [(11, 12), (20, 21)]

    def write_chunk(name, rows):
        with open(data_dir / name, "w") as f:
            for a, b in rows:
                f.write(json.dumps({"doc_a": a, "doc_b": b}) + "\n")

    write_chunk("c0.json", first)
    state, out, ckpt = (
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )

    def run_once():
        stream = spark.readStream.schema("doc_a long, doc_b long").json(
            str(data_dir)
        )
        q = (
            lpa_communities_stream(stream, state, out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_state_1 = spark.read.parquet(f"{state}/b*").count()
    assert n_state_1 == len(first)
    write_chunk("c1.json", second)
    run_once()
    state_df = spark.read.parquet(f"{state}/b*")
    assert state_df.count() == len(first) + len(second)  # no reprocessing
    got = sorted(
        (r["community_size"], r["n_communities"])
        for r in spark.read.parquet(out).collect()
    )
    all_edges = spark.createDataFrame(
        first + second, "doc_a long, doc_b long"
    )
    want = sorted(
        (r["community_size"], r["n_communities"])
        for r in lpa_histogram(all_edges).collect()
    )
    assert got == want


def test_embedding_admission_stream_matches_batch(spark, tmp_path):
    """Stream the 10%-hash embedding slice against the 90% static index:
    per arriving vector, the best detection on the feed must equal the
    batch ``semdedup_incremental`` verdict (same threshold), and vectors
    absent from the feed must be exactly the batch-admitted ones —
    stream==batch parity via the shared Lloyd/routing/verify code."""
    from inde1_spark.operators.clustering import (
        SEMDEDUP_INCR_PCT,
        semdedup_incremental,
    )
    from inde1_spark.operators.text import hash_bucket
    from inde1_spark.streaming.corpus import (
        embedding_admission_stream,
        embedding_stream,
    )

    thr = 0.3  # fires a real mix of dups and admits on this corpus
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lane = hash_bucket(F.col("vec_id"), 100)
    batch = emb.filter(lane < SEMDEDUP_INCR_PCT)
    index = emb.filter(lane >= SEMDEDUP_INCR_PCT)

    verdicts = {
        r["vec_new"]: r
        for r in semdedup_incremental(emb, threshold=thr).collect()
    }
    n_dups = sum(1 for r in verdicts.values() if not r["admit"])
    assert n_dups and n_dups < len(verdicts), "fixture needs both outcomes"

    data_dir = tmp_path / "feed"
    data_dir.mkdir()
    feed = batch.withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("vec_id") % 3600),
    )
    rows = feed.toJSON().collect()
    half = len(rows) // 2
    (data_dir / "a.json").write_text("\n".join(rows[:half]))
    (data_dir / "b.json").write_text("\n".join(rows[half:]))

    got_rows: list = []
    q = (
        embedding_admission_stream(
            embedding_stream(spark, str(data_dir)), index, threshold=thr
        )
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    by_vec: dict = {}
    for r in got_rows:
        by_vec.setdefault(r["vec_new"], []).append((r["cos_sim"], r["vec_idx"]))
    # each pair surfaces exactly once (no band fan-out to dedup)
    assert len(got_rows) == sum(len(v) for v in by_vec.values())
    for vec, v in verdicts.items():
        if v["admit"]:
            assert vec not in by_vec
        else:
            assert max(by_vec[vec]) == (v["cos_sim"], v["dup_of"])


def test_embedding_admission_stream_checkpoint_restart_no_dup(spark, tmp_path):
    """Durability (T8): a second availableNow run on the SAME checkpoint
    after new files arrive must process only the new arrivals — no
    re-emission of already-detected pairs, and the union of both runs
    equals a single-pass run over all files."""
    import os as _os

    from inde1_spark.operators.clustering import SEMDEDUP_INCR_PCT
    from inde1_spark.operators.text import hash_bucket
    from inde1_spark.streaming.corpus import (
        embedding_admission_stream,
        embedding_stream,
    )

    thr = 0.3
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lane = hash_bucket(F.col("vec_id"), 100)
    batch = emb.filter(lane < SEMDEDUP_INCR_PCT)
    index = emb.filter(lane >= SEMDEDUP_INCR_PCT)

    data_dir = tmp_path / "feed"
    data_dir.mkdir()
    feed = batch.withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("vec_id") % 3600),
    )
    rows = feed.toJSON().collect()
    half = len(rows) // 2
    (data_dir / "a.json").write_text("\n".join(rows[:half]))
    # strictly increasing mtimes: file sources order batches by mtime
    _os.utime(data_dir / "a.json", (1_700_000_000, 1_700_000_000))

    def run_once(out: list) -> None:
        q = (
            embedding_admission_stream(
                embedding_stream(spark, str(data_dir)), index, threshold=thr
            )
            .writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    first: list = []
    run_once(first)
    (data_dir / "b.json").write_text("\n".join(rows[half:]))
    _os.utime(data_dir / "b.json", (1_700_000_100, 1_700_000_100))
    second: list = []
    run_once(second)

    k = lambda r: (r["vec_new"], r["vec_idx"])  # noqa: E731
    first_keys = {k(r) for r in first}
    second_keys = {k(r) for r in second}
    assert first and second_keys, "both runs must emit detections"
    assert not first_keys & second_keys, "restart re-emitted a pair"
    # union == one-shot ground truth over the full feed
    full: list = []
    q = (
        embedding_admission_stream(
            embedding_stream(spark, str(data_dir)), index, threshold=thr
        )
        .writeStream.foreachBatch(lambda df, _id: full.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt_full"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert first_keys | second_keys == {k(r) for r in full}


def test_winnow_admission_stream_matches_batch(spark, tmp_path):
    """Stream the 10%-hash slice against the 90% static winnow index: the
    doc_ids on the detection feed must be exactly the batch
    ``dedup_winnow_incremental`` REJECTIONS, and the feed's best
    containment per doc must equal the batch best-match verdict."""
    from inde1_spark.operators.dedup import (
        WINNOW_INCR_PCT,
        dedup_winnow_incremental,
        release_persisted,
    )
    from inde1_spark.operators.text import hash_bucket
    from inde1_spark.streaming.corpus import (
        document_stream,
        winnow_admission_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    verdicts = {
        r["doc_id"]: r for r in dedup_winnow_incremental(docs).collect()
    }
    release_persisted()
    rejected = {d for d, r in verdicts.items() if not r["admitted"]}
    assert rejected and len(rejected) < len(verdicts), (
        "fixture must mix admits and rejections"
    )

    is_batch = hash_bucket(F.col("doc_id"), 100) < WINNOW_INCR_PCT
    index = docs.filter(~is_batch)
    feed = docs.filter(is_batch).withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id") % 3600),
    )
    data_dir = tmp_path / "feed"
    data_dir.mkdir()
    rows = feed.toJSON().collect()
    half = len(rows) // 2
    (data_dir / "a.json").write_text("\n".join(rows[:half]))
    (data_dir / "b.json").write_text("\n".join(rows[half:]))

    got_rows: list = []
    q = (
        winnow_admission_stream(document_stream(spark, str(data_dir)), index)
        .writeStream.foreachBatch(lambda df, _id: got_rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert {r["doc_new"] for r in got_rows} == rejected
    assert len({(r["doc_new"], r["doc_idx"]) for r in got_rows}) == len(
        got_rows
    )  # fingerprint collisions deduped to one row per pair
    # the feed's best detection per doc equals the batch best-match verdict
    # (max shared, ties to the lowest index doc — the batch total order)
    best: dict = {}
    for r in got_rows:
        k = r["doc_new"]
        cur = best.get(k)
        if cur is None or (-r["n_shared"], r["doc_idx"]) < (
            -cur["n_shared"],
            cur["doc_idx"],
        ):
            best[k] = r
    for d, r in best.items():
        v = verdicts[d]
        assert (r["doc_idx"], r["n_shared"]) == (
            v["best_doc_idx"],
            v["n_shared"],
        )
        assert r["containment_pct"] == v["containment_pct"]
