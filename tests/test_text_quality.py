"""Planted-data semantics for the quality-filter family.

The synthetic corpus has no newlines, punctuation, digits or emails, so the
oracle-parity gate only proves cross-engine consistency there; these tests
plant documents that exercise every branch (duplicate n-grams, PII hits,
line shapes, Gopher rule boundaries) and pin the exact expected values.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.operators.text import (
    GOPHER_MIN_TOKENS,
    gopher_rules,
    line_quality,
    pii_redact,
    repetition_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_repetition_exact_fractions(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(_docs(spark, ["a a a b", "x y z"])).collect()
    }
    r = out[0]  # tokens [a,a,a,b]: 2 dup of 4; top 'a' 3/4
    assert r["n_tokens"] == 4
    assert r["dup_token_frac"] == 0.5
    assert r["top_token_frac"] == 0.75
    # 2-grams [a a, a a, a b]: 1 dup of 3; 3-grams [a a a, a a b]: none
    assert r["dup_2gram_frac"] == 0.3333
    assert r["dup_3gram_frac"] == 0.0
    r = out[1]  # all unique
    assert (r["dup_token_frac"], r["top_token_frac"]) == (0.0, 0.3333)
    assert (r["dup_2gram_frac"], r["dup_3gram_frac"]) == (0.0, 0.0)


def test_gopher_token_count_boundary(spark):
    # 'the a' supplies 2 distinct stopwords; pad with 4-char filler tokens
    # (mean length stays in [3, 10] despite the 1-char 'a') to land exactly
    # at 49 vs 50 tokens.
    pad_short = " ".join(["data"] * (GOPHER_MIN_TOKENS - 3))
    pad_ok = " ".join(["data"] * (GOPHER_MIN_TOKENS - 2))
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            _docs(spark, [f"the a {pad_short}", f"the a {pad_ok}"])
        ).collect()
    }
    assert out[0]["n_tokens"] == GOPHER_MIN_TOKENS - 1
    assert not out[0]["flag_len"] and not out[0]["keep"]
    assert out[1]["n_tokens"] == GOPHER_MIN_TOKENS
    assert out[1]["flag_len"] and out[1]["flag_mean_len"] and out[1]["flag_stop"]
    assert out[1]["keep"]


def test_gopher_mean_len_and_stopword_rules(spark):
    pad = " ".join(["data"] * 60)
    long_words = " ".join(["abcdefghijklmnop"] * 60)  # mean len 16 > 10
    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            _docs(spark, [f"the {pad}", f"the a {long_words}"])
        ).collect()
    }
    assert out[0]["n_stop_distinct"] == 1  # only 'the' -> stop rule fails
    assert out[0]["flag_len"] and out[0]["flag_mean_len"]
    assert not out[0]["flag_stop"] and not out[0]["keep"]
    assert not out[1]["flag_mean_len"] and not out[1]["keep"]


def test_pii_redact_counts_and_fingerprint(spark):
    text = "reach me at jo.smith+x@mail.example.org or 41551234567 today"
    expected = "reach me at <EMAIL> or <ID> today"
    r = pii_redact(_docs(spark, [text])).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ids"] == 1
    assert r["n_chars_redacted"] == len(expected)
    assert r["redacted_fp"] == hashlib.md5(expected.encode()).hexdigest()


def test_pii_redact_leaves_clean_text_alone(spark):
    text = "no personal data here just words"
    r = pii_redact(_docs(spark, [text])).collect()[0]
    assert (r["n_emails"], r["n_ids"]) == (0, 0)
    assert r["redacted_fp"] == hashlib.md5(text.encode()).hexdigest()


def test_line_quality_shapes(spark):
    text = "Good sentence.\n- bullet\nmore stuff here...\nhi\n\n"
    r = line_quality(_docs(spark, [text])).collect()[0]
    assert r["n_lines"] == 4  # empty lines dropped
    # '.' terminal counts the ellipsis line too (C4 counts any '.')
    assert r["terminal_punct_frac"] == 0.5
    assert r["bullet_frac"] == 0.25
    assert r["ellipsis_frac"] == 0.25
    # 'Good sentence.' (2), '- bullet' (2) and 'hi' (1) are all < 3 words
    assert r["short_line_frac"] == 0.75


def test_dedup_spans_removes_repeats_keeps_first(spark):
    from inde1_spark.operators.dedup import dedup_spans, release_persisted

    first15 = " ".join(f"w{i}" for i in range(15))
    rest0 = " ".join(f"w{i}" for i in range(15, 30))
    rest1 = " ".join(f"x{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, f"{first15} {rest0}"), (1, f"{first15} {rest1}")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs).collect()}
    release_persisted()
    # doc 0 owns both its spans (first occurrence); doc 1 loses its copy of
    # the shared first-15-token span and keeps only its own tail
    assert (out[0]["n_spans"], out[0]["n_spans_kept"]) == (2, 2)
    assert (out[1]["n_spans"], out[1]["n_spans_kept"]) == (2, 1)
    assert out[0]["clean_fp"] == hashlib.md5(f"{first15} {rest0}".encode()).hexdigest()
    assert out[1]["clean_fp"] == hashlib.md5(rest1.encode()).hexdigest()


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    # winnowing guarantee: a shared substring of length >= k+w-1 (= 8 here)
    # leaves at least one shared fingerprint, however different the rest
    from inde1_spark.operators.text import WINNOW_K, WINNOW_W, winnow_fp_table

    assert WINNOW_K + WINNOW_W - 1 == 8
    shared = "QUOTEDPASSAGE"  # 13 chars > 8
    docs = spark.createDataFrame(
        [(0, f"aaaa {shared} bbbb"), (1, f"zzzz yyyy {shared}")],
        ["doc_id", "text"],
    )
    fps = winnow_fp_table(docs).collect()
    s0 = {r["fp"] for r in fps if r["doc_id"] == 0}
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    assert s0 & s1


def test_winnow_dedup_matches_planted_near_dups(spark):
    from inde1_spark.operators.dedup import dedup_ngram_jaccard, dedup_winnow
    from inde1_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(docs).collect()
    }
    found = {(r["doc_a"], r["doc_b"]) for r in dedup_winnow(docs).collect()}
    # precision 1 at the calibrated overlap threshold; recall may drop the
    # rare pair whose overlap is token-level but not substring-level
    assert found <= truth
    assert len(found) >= len(truth) - 1


def test_bpe_learns_planted_merges(spark):
    """'th' dominates the pair counts, then the learned 'th' symbol pairs
    with 'e': the two-round trajectory must follow exactly."""
    from inde1_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, " ".join(["the"] * 10 + ["than"] * 5))], "doc_id long, text string"
    )
    got = {r["round"]: (r["left_sym"], r["right_sym"], r["merged"]) for r in
           bpe_learn_merges(docs, rounds=2).collect()}
    assert got[1] == ("t", "h", "th")
    assert got[2] == ("th", "e", "the")


def test_bpe_merge_is_left_to_right_greedy(spark):
    """'aaaa' under pair (a,a) must merge to [aa, aa] — the double fenced
    replace must equal canonical greedy, so round 2 merges (aa, aa)."""
    from inde1_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = {r["round"]: (r["left_sym"], r["right_sym"]) for r in
           bpe_learn_merges(docs, rounds=2).collect()}
    assert got[1] == ("a", "a")
    assert got[2] == ("aa", "aa")


def test_textrank_hub_outranks_equal_frequency_cycle(spark):
    # hubword co-occurs with 8 DISTINCT partners; loopword/echoword form an
    # isolated 2-cycle with the SAME total frequency as hubword. Frequency
    # ranking ties them; TextRank centrality must put the hub first.
    from inde1_spark.operators.dedup import release_persisted
    from inde1_spark.operators.text import keyword_textrank

    hub_docs = [f"hubword partner{c}" for c in "abcdefgh"]
    cycle_docs = ["loopword echoword"] * 8
    out = {
        r["token"]: r["textrank"]
        for r in keyword_textrank(
            _docs(spark, hub_docs + cycle_docs), k=50
        ).collect()
    }
    release_persisted()
    assert "hubword" in out and "loopword" in out
    assert out["hubword"] > out["loopword"]


def test_symspell_finds_all_planted_ed1_pairs(spark):
    # the pigeonhole guarantee: every edit-distance-1 pair (deletion,
    # insertion, substitution) shares a deletion key, so the candidate
    # join equals the quadratic levenshtein ground truth for ed <= 1
    from pyspark.sql import functions as F

    from inde1_spark.operators.text import symspell_neighbors

    texts = [
        "spark spark spark sprak",      # transposition = ed 2: must NOT pair
        "batch batch btch",             # deletion
        "window windoe",                # substitution
        "stream streams",               # insertion
        "table cable fable",            # substitution cluster
        "query query",
    ]
    docs = _docs(spark, texts)
    got = {
        (r.term_a, r.term_b)
        for r in symspell_neighbors(docs, "text").collect()
    }
    vocab = [
        r.term
        for r in docs.select(
            F.explode(F.split("text", " ")).alias("term")
        ).distinct().collect()
    ]
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        tuple(sorted((a, b)))
        for a, b in itertools.combinations(vocab, 2)
        if lev(a, b) <= 1
    }
    assert got == want
    assert ("batch", "btch") in got and ("stream", "streams") in got
    assert ("windoe", "window") in got and ("cable", "fable") in got
    assert ("spark", "sprak") not in got  # transposition is ed 2


def test_symspell_hot_key_cap_binds(spark):
    # every 1-char term shares the '' deletion key; with the cap below the
    # bucket size the whole bucket drops — deterministic recall trade
    from inde1_spark.operators.text import symspell_neighbors

    docs = _docs(spark, ["a b c d e f"])
    assert symspell_neighbors(docs, "text", key_df_cap=3).count() == 0
    # uncapped, single-char terms all pair (ed 1 via substitution)
    assert symspell_neighbors(docs, "text").count() == 15
