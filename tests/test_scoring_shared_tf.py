"""shared_term_freq: the opt-in frequency-pass cache for multi-op scoring
sessions. Results must be IDENTICAL with and without the shared table
(the cache changes the physical plan, never values), and the handle must
be releasable through the dedup registry."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inde1_spark.operators import scoring as SC
from inde1_spark.operators.dedup import release_persisted
from inde1_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_shared_tf_identical_results(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    release_persisted()
    tf = SC.shared_term_freq(docs)
    shared_tfidf = {tuple(r) for r in SC.tfidf_top_terms(docs, tf_table=tf).collect()}
    shared_lp = {tuple(r) for r in SC.unigram_logprob(docs, tf_table=tf).collect()}
    assert release_persisted() >= 1
    solo_tfidf = {tuple(r) for r in SC.tfidf_top_terms(docs).collect()}
    solo_lp = {tuple(r) for r in SC.unigram_logprob(docs).collect()}
    assert shared_tfidf == solo_tfidf
    assert shared_lp == solo_lp
    # the solo paths must not have registered a persist (opt-in contract)
    assert release_persisted() == 0
