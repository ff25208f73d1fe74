"""Semantic tests for the corpus-preparation operators (operators/corpus.py)
and the TTL'd user dimension. Oracle parity is covered by
test_oracle_parity.py; these pin the semantics the SQL twins can't express:
packing-order replay, boundary-exact TTL expiry, planted contamination.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inde1_spark.operators.analytics import enrich_users_ttl
from inde1_spark.operators.corpus import (
    MIXTURE_RATES,
    PACK_BUDGET,
    contamination_check,
    mixture_sample,
    pack_sequences,
    trim_outliers,
)
from inde1_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def _py_bucket(key, mod: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod


def test_pack_sequences_replays_exactly(spark):
    """The packing must equal a sequential python replay of each lane:
    docs laid end-to-end in (hash, doc_id) order, cut every budget tokens."""
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = {
        r["doc_id"]: len([t for t in r["text"].split(" ") if t])
        for r in docs.select("doc_id", "text").collect()
    }
    got = {
        r["doc_id"]: (r["packer"], r["shard"], r["tok_offset"], r["n_tokens"])
        for r in pack_sequences(docs).collect()
    }
    assert set(got) == set(toks)

    lanes: dict[int, list[int]] = {}
    for doc_id in toks:
        lanes.setdefault(_py_bucket(doc_id, 8), []).append(doc_id)
    for packer, ids in lanes.items():
        cum = 0
        for doc_id in sorted(ids, key=lambda i: (_py_bucket(i, 1_000_003), i)):
            want = (packer, cum // PACK_BUDGET, cum % PACK_BUDGET, toks[doc_id])
            assert got[doc_id] == want, f"doc {doc_id}: {got[doc_id]} != {want}"
            cum += toks[doc_id]


def test_pack_sequences_partitioning_independent(spark):
    """Assignment is a pure function of the data, not the physical layout."""
    docs = load_table(spark, SF_SMOKE, "documents")
    one = sorted(tuple(r) for r in pack_sequences(docs.repartition(1)).collect())
    many = sorted(tuple(r) for r in pack_sequences(docs.repartition(13)).collect())
    assert one == many


def test_contamination_check_plants_and_finds(spark):
    """A test-split doc sharing a 5-gram with a train-split doc must score
    n_contaminated >= 1; a test doc with unique text must score 0."""
    # pick ids landing in the right splits (split = f(md5(doc_id)))
    train_id = next(i for i in range(1000) if _py_bucket(i, 100) < 80)
    test_ids = [i for i in range(1000) if _py_bucket(i, 100) >= 90]
    hit_id, clean_id = test_ids[0], test_ids[1]
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (train_id, f"prefix words {shared} suffix words here"),
        (hit_id, f"unrelated opening {shared} closing run"),
        (clean_id, "entirely fresh vocabulary nothing shared at all ok"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in contamination_check(docs).collect()}
    assert set(got) == {hit_id, clean_id}  # only test-split docs reported
    assert got[hit_id]["n_contaminated"] >= 1
    assert got[hit_id]["contamination"] > 0.0
    assert got[clean_id]["n_contaminated"] == 0
    assert got[clean_id]["contamination"] == 0.0


def test_mixture_sample_rates_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = {r["source"]: r for r in mixture_sample(docs).collect()}
    total = docs.count()
    assert sum(r["n_total"] for r in rows.values()) == total
    for src, r in rows.items():
        assert r["rate_pct"] in MIXTURE_RATES
        assert 0 <= r["n_kept"] <= r["n_total"]
        if r["rate_pct"] == 100:
            assert r["n_kept"] == r["n_total"]  # rate-100 sources kept whole
    # deterministic under physical layout
    again = {r["source"]: r for r in mixture_sample(docs.repartition(13)).collect()}
    assert {s: tuple(r) for s, r in rows.items()} == {
        s: tuple(r) for s, r in again.items()
    }


def test_trim_outliers_counts(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    in_counts = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    for r in trim_outliers(docs).collect():
        n = in_counts[r["lang"]]
        cut = (n * 5) // 100
        assert r["n_in"] == n
        assert r["n_kept"] == n - 2 * cut
        assert r["min_chars"] <= r["max_chars"]


def test_enrich_users_ttl_boundary_exact(spark):
    """SETEX semantics at the boundary: an event strictly before
    valid_until resolves the user; at/after valid_until the key is gone."""
    # custkey 10: temp user (10 % 5 == 0, 10 % 3 != 0), expires base + 10h
    users = spark.createDataFrame(
        [(10, "Customer#10", 1.0)], ["c_custkey", "c_name", "c_acctbal"]
    )
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 09:59:59", 10, "view", 1.0, "{}"),
            (2, "2024-01-01 10:00:00", 10, "view", 1.0, "{}"),
            (3, "2024-01-01 11:00:00", 10, "view", 1.0, "{}"),
        ],
        ["event_id", "ts_s", "user_id", "event_type", "value", "props"],
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    got = {r["user_name"]: r["n_events"] for r in enrich_users_ttl(events, users).collect()}
    assert got == {"Customer#10": 1, "unknown": 2}


def test_connected_components_transitive_chains(spark):
    """A long path (diameter >> 1) and a separate pair must resolve to
    min-id labels — the transitivity the pair list alone doesn't give."""
    from inde1_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 40)]  # path 1-2-...-40
    pairs = spark.createDataFrame(chain + [(100, 101)], ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {**{i: 1 for i in range(1, 41)}, 100: 100, 101: 100}


def test_shuffle_shards_dense_and_mixed(spark):
    """Every doc appears once; positions are dense 1..N per shard; and the
    assignment is avalanche-mixed, not id-periodic (consecutive doc_ids do
    not round-robin across shards)."""
    from inde1_spark.operators.corpus import shuffle_shards

    docs = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(docs, n_shards=8).collect()
    assert len(out) == 400
    assert len({r["doc_id"] for r in out}) == 400
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    shard_of = {r["doc_id"]: r["shard"] for r in out}
    periodic = sum(
        1 for i in range(399) if (shard_of[i + 1] - shard_of[i]) % 8 == 1
    )
    assert periodic < 120  # id-periodic assignment would make this 399


def test_mixture_temperature_flattens_skewed_sources(spark):
    """On a 9:1 skewed corpus the sqrt-temperature rates must thin the
    dominant source harder (rate_big < rate_small), pull the kept mixture
    toward balance (kept share ratio strictly flatter than 9:1), and
    respect the rate cap."""
    from inde1_spark.operators.corpus import mixture_temperature

    rows = [(i, f"doc {i} text", "en", "big", 10) for i in range(900)]
    rows += [(i + 1000, f"doc {i} text", "en", "small", 10) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["source"]: r for r in mixture_temperature(docs).collect()}
    big, small = out["big"], out["small"]
    assert small["rate_ppm"] > big["rate_ppm"]
    assert small["rate_ppm"] <= 1_000_000
    # raw ratio 9.0; sqrt-flattened target ratio is 3.0 — realized kept
    # ratio must land well under the raw ratio
    kept_ratio = big["n_kept"] / max(small["n_kept"], 1)
    assert kept_ratio < 6.0, f"kept ratio not flattened: {kept_ratio:.2f}"


def test_quality_emd_shifted_source_scores_higher(spark):
    """A source whose quality distribution matches the rest scores ~0 EMD;
    a source with systematically longer (higher-quality-score) docs
    scores strictly higher — and EMD is bounded by the domain span."""
    from inde1_spark.operators.corpus import quality_emd

    base = "alpha beta gamma delta epsilon"
    rows = []
    i = 0
    for src in ("same_a", "same_b"):  # identical distributions
        for _ in range(20):
            rows.append((i, base, "en", src, len(base))); i += 1
    for _ in range(20):  # shifted: much longer docs -> higher capped_chars
        txt = " ".join(["omega"] * 80)
        rows.append((i, txt, "en", "shifted", len(txt))); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["source"]: r for r in quality_emd(docs).collect()}
    assert out["shifted"]["emd_quality_units"] > out["same_a"]["emd_quality_units"]
    assert 0.0 <= out["same_a"]["emd_norm"] <= 1.0
    assert 0.0 <= out["shifted"]["emd_norm"] <= 1.0


def test_heaps_beta_separates_saturating_from_growing_vocab(spark):
    """Every doc reuses the same 5 words -> V saturates, beta ~ 0. Every
    doc brings fresh words -> V grows linearly with tokens, beta ~ 1."""
    from inde1_spark.operators.scoring import heaps_fit

    sat = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(200)],
        "doc_id long, text string",
    )
    grow = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(200)],
        "doc_id long, text string",
    )
    b_sat = heaps_fit(sat).collect()[0]["heaps_beta"]
    b_grow = heaps_fit(grow).collect()[0]["heaps_beta"]
    assert b_sat < 0.2
    assert b_grow > 0.9


def test_log_odds_finds_the_planted_source_marker(spark):
    """A term that dominates ONE source and barely appears elsewhere must
    rank first for that source with a clearly positive z."""
    from inde1_spark.operators.scoring import log_odds_distinctive_terms

    rows = []
    i = 0
    for _ in range(30):
        rows.append((i, "shibboleth common filler words here", "en", "marked", 35)); i += 1
    for _ in range(30):
        rows.append((i, "common filler words here again", "en", "plain", 29)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = log_odds_distinctive_terms(docs).collect()
    top_marked = [r for r in out if r["source"] == "marked" and r["rank"] == 1][0]
    assert top_marked["term"] == "shibboleth"
    assert top_marked["z"] > 2.0
    assert top_marked["y_st"] == 30 and top_marked["y_rest"] == 0


def test_quantile_normalize_is_monotone_and_pooled_valued(spark):
    # the inverse-CDF mapping must be (a) monotone non-decreasing per
    # source, (b) valued in the POOLED quality domain, and (c) calibrated:
    # a source whose raw scores sit below the pool maps its top quantiles
    # UP toward pooled values (and vice versa)
    from inde1_spark.operators.corpus import quality_quantile_normalize
    from inde1_spark.operators.dedup import release_persisted
    from inde1_spark.operators.text import _quality_col
    from inde1_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = quality_quantile_normalize(docs).collect()
    pooled = {
        r.q for r in docs.select(_quality_col().alias("q")).distinct().collect()
    }
    release_persisted()
    assert out
    by_source: dict[str, list] = {}
    for r in out:
        assert r.norm_quality in pooled
        by_source.setdefault(r.source, []).append((r.quality, r.norm_quality))
    for rows in by_source.values():
        rows.sort()
        for (q0, n0), (q1, n1) in zip(rows, rows[1:]):
            assert q0 < q1 and n0 <= n1


def test_cross_perplexity_self_lower_than_foreign(spark):
    # a source is always better modeled by its own LM: H(B|B) < H(B|A)
    # when A's vocabulary is disjoint; shared_terms sees through it
    from inde1_spark.operators.dedup import release_persisted
    from inde1_spark.operators.scoring import cross_source_perplexity

    rows = [
        (1, "alpha beta gamma alpha beta", "en", "web", 27),
        (2, "beta alpha alpha gamma beta", "en", "web", 27),
        (3, "delta epsilon zeta delta", "en", "books", 22),
        (4, "epsilon delta zeta zeta", "en", "books", 21),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = {
        (r.train_source, r.eval_source): r
        for r in cross_source_perplexity(docs).collect()
    }
    release_persisted()
    assert out[("web", "books")].shared_terms == 0
    assert out[("books", "web")].avg_xent > out[("web", "web")].avg_xent
    assert out[("web", "books")].avg_xent > out[("books", "books")].avg_xent
    # disjoint-vocab cross-entropy is exactly ln(n_train + V): every eval
    # token backs off to the add-1 floor
    import math

    v = 6
    n_books = 8
    assert abs(out[("books", "web")].avg_xent - math.log(n_books + v)) < 2e-9


def test_span_corruption_nonoverlap_density_bounds(spark):
    # spans stay inside their own window (non-overlap by construction),
    # inside the document, and the density is exactly span/window on
    # every full window
    from inde1_spark.operators.corpus import (
        CORRUPT_SPAN,
        CORRUPT_WINDOW,
        span_corruption_plan,
    )
    from inde1_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = span_corruption_plan(docs).collect()
    assert rows
    per_doc: dict[int, list] = {}
    for r in rows:
        w0 = r.span_idx * CORRUPT_WINDOW + 1
        assert w0 <= r.start_token <= w0 + CORRUPT_WINDOW - CORRUPT_SPAN
        assert r.start_token + r.span_len - 1 <= r.n_tokens
        per_doc.setdefault(r.doc_id, []).append(r)
    for spans in per_doc.values():
        spans.sort(key=lambda r: r.span_idx)
        # one span per full window, density = span/window exactly
        assert [r.span_idx for r in spans] == list(range(len(spans)))
        assert len(spans) == spans[0].n_tokens // CORRUPT_WINDOW
        for a, b in zip(spans, spans[1:]):
            assert a.start_token + a.span_len <= b.start_token


def test_coverage_select_greedy_semantics(spark):
    # planted vocab: doc 1 covers 4 terms, doc 2 covers 3 NEW terms after
    # doc 1, doc 3's terms are then fully covered -> greedy must pick
    # (1, gain 4) then (2, gain 3) and stop emitting gain for exhausted
    # rounds only when truly nothing remains (doc 3 still adds 1)
    from inde1_spark.operators.corpus import coverage_select
    from inde1_spark.operators.dedup import release_persisted

    rows = [
        (1, "a b c d", "en", "x", 7),
        (2, "a e f g", "en", "x", 7),
        (3, "b c h", "en", "x", 5),
        (4, "a b", "en", "x", 3),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = [(r.round, r.doc_id, r.marginal_gain, r.covered_terms)
           for r in coverage_select(docs).collect()]
    release_persisted()
    assert out == [(1, 1, 4, 4), (2, 2, 3, 7), (3, 3, 1, 8)]
