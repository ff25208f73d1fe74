"""Spark-SQL surface: every core operator is reachable as plain SQL.

``register_views`` exposes the testdata tables as temp views;
``SPARK_SQL`` holds Spark-SQL texts for representative operators. These are
the same logical plans Catalyst builds from the DataFrame API (tested equal
in tests/test_sql_surface.py) — a user can drive the engine entirely from
``spark.sql`` (e.g. a JDBC/Thrift gateway) without touching the Python API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from inde1_spark.schemas import TESTDATA_TABLES
from inde1_spark.sources.readers import load_table

ENTRY, EXIT = "view", "click"

# Shared SQL fragments for the scale-path families (same constants as the
# DataFrame operators; the SQL is built with loops exactly like oracles.py).
_TOKS = "filter(split(text, ' '), t -> t <> '')"
_FX = "CAST(round(CAST({x} AS DOUBLE) * CAST({y} AS DOUBLE) * 1e15, 0) AS BIGINT)"
_DOT_EXACT = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
    + _FX.format(x="x", y="y")
    + "), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e15"
)
_NORM_EXACT = (
    "sqrt(CAST(aggregate(transform({a}, x -> "
    + _FX.format(x="x", y="x")
    + "), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS DOUBLE) / 1e15)"
)


def _sql_ratio_round(num: str, den: str, scale: int) -> str:
    """SQL twin of exprs.ratio_round: exact integer round-half-up."""
    p = 10**scale
    a = f"(CAST({num} AS BIGINT) * {2 * p} + CAST({den} AS BIGINT))"
    b = f"(CAST({den} AS BIGINT) * 2)"
    return f"(CAST(({a} - {a} % {b}) AS DOUBLE) / CAST({b} AS DOUBLE) / {p}.0)"


def _minhash_fast_sql() -> str:
    """dedup_minhash_fast as one Spark-SQL statement: xxhash64 shingle ids,
    32 min-aggregates in one GROUP BY, 8x4 banding, bucket self-join,
    exact-Jaccard verify on candidates (dedup.py constants PERMS_FAST)."""
    from inde1_spark.operators.dedup import (
        FAST_N_BANDS,
        FAST_N_PERM,
        JACCARD_THRESHOLD,
        MINHASH_PRIME,
        PERMS_FAST,
    )

    rows_per_band = FAST_N_PERM // FAST_N_BANDS
    mins = ",\n         ".join(
        f"MIN(({a} * sid + {b}) % {MINHASH_PRIME}) AS mh_{pid}"
        for pid, a, b in PERMS_FAST
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(',', "
        + ", ".join(
            f"CAST(mh_{b * rows_per_band + r} AS STRING)"
            for r in range(rows_per_band)
        )
        + ") AS sig FROM sigs"
        for b in range(FAST_N_BANDS)
    )
    jac = _sql_ratio_round("i.n_inter", "sa.sz + sb.sz - i.n_inter", 6)
    return f"""
        WITH sh AS (
          SELECT DISTINCT doc_id,
                 concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
          LATERAL VIEW explode(CASE WHEN size(toks) >= 3
                                    THEN sequence(0, size(toks) - 3)
                                    ELSE array() END) s AS i
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        shid AS (
          SELECT doc_id, abs(xxhash64(shingle)) % {MINHASH_PRIME} AS sid FROM sh
        ),
        sigs AS (
          SELECT doc_id,
         {mins}
          FROM shid GROUP BY doc_id
        ),
        bands AS ({bands}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        inter AS (
          SELECT c.doc_a, c.doc_b, count(*) AS n_inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT i.doc_a, i.doc_b, {jac} AS jaccard
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
        ) WHERE jaccard >= {JACCARD_THRESHOLD}
    """


def _knn_lsh_sql() -> str:
    """knn_lsh_bucketed as Spark SQL: sign-bucket LSH + one-flip multiprobe
    + exact-cosine re-rank (similarity.py constants)."""
    from inde1_spark.operators.similarity import (
        K_BUCKETED,
        LSH_SIGN_DIMS,
        N_QUERIES,
    )

    bucket = " + ".join(
        f"(CASE WHEN embedding[{j}] >= 0 THEN {2**j} ELSE 0 END)"
        for j in range(LSH_SIGN_DIMS)
    )
    probes = ", ".join(
        ["bucket"] + [f"bucket ^ {2**j}" for j in range(LSH_SIGN_DIMS)]
    )
    dot = _DOT_EXACT.format(a="emb_q", b="emb_n")
    nrm = _NORM_EXACT.format(a="embedding")
    return f"""
        WITH e AS (
          SELECT vec_id, embedding, {nrm} AS nrm,
                 CAST({bucket} AS BIGINT) AS bucket
          FROM embeddings
        ),
        q AS (
          SELECT vec_id AS query_id, embedding AS emb_q, nrm AS nrm_q,
                 explode(array({probes})) AS bucket
          FROM e WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
          SELECT q.query_id, n.vec_id AS neighbor_id,
                 round(({dot}) / (q.nrm_q * n.nrm), 6) AS cos_sim
          FROM q JOIN (SELECT vec_id, embedding AS emb_n, nrm, bucket FROM e) n
            ON q.bucket = n.bucket
          WHERE q.query_id <> n.vec_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
              FROM scored)
        WHERE rank <= {K_BUCKETED}
    """


def _tfidf_sql() -> str:
    """tfidf_top_terms as Spark SQL: one (doc, term) frequency pass, df from
    the same table, nano-snapped idf, exact integer ranking key."""
    from inde1_spark.operators.scoring import LOG_SCALE, TFIDF_TOP_K

    return f"""
        WITH tf AS (
          SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, CAST(size({_TOKS}) AS BIGINT) AS dl,
                       explode({_TOKS}) AS term
                FROM documents)
          GROUP BY doc_id, dl, term
        ),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dft.df,
                 tf.tf * CAST(round(ln(nd.n_docs / dft.df) * {LOG_SCALE}.0, 0) AS BIGINT)
                   AS score_key
          FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN nd
        )
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df AS doc_freq,
               CAST(score_key AS DOUBLE) / {LOG_SCALE}.0 AS tfidf
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score_key DESC, term ASC) AS rank
              FROM scored)
        WHERE rank <= {TFIDF_TOP_K}
    """


def _bm25_sql() -> str:
    """bm25_score as one Spark-SQL statement: row-local query-term filter
    before the explode, tiny broadcastable frequency tables, nano-snapped
    idf and micro-snapped per-term contributions summed as exact longs
    (scoring.py constants interpolated — same anti-desync rule as the
    other twins)."""
    from inde1_spark.operators.scoring import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOP_K,
        LOG_SCALE,
        SCORE_SCALE,
    )

    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    ls, ss = f"{float(LOG_SCALE)!r}D", f"{float(SCORE_SCALE)!r}D"
    k1, b = f"{BM25_K1!r}D", f"{BM25_B!r}D"
    k1p1, omb = f"{BM25_K1 + 1.0!r}D", f"{1.0 - BM25_B!r}D"
    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        tf AS (
          SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, CAST(size(toks) AS BIGINT) AS dl,
                       explode(filter(toks, t -> t IN ({terms}))) AS term
                FROM toks)
          GROUP BY doc_id, dl, term
        ),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(CAST(size(toks) AS BIGINT)) AS DOUBLE) / count(*) AS avgdl
          FROM toks
        ),
        dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT tf.doc_id,
                 CAST(round(
                   (CAST(CAST(round(ln((stats.n_docs - dfq.df + 0.5D) / (dfq.df + 0.5D))
                                    * {ls}, 0) AS BIGINT) AS DOUBLE) / {ls})
                   * (CAST(tf.tf AS DOUBLE) * {k1p1})
                   / (CAST(tf.tf AS DOUBLE)
                      + {k1} * ({omb} + {b} * CAST(tf.dl AS DOUBLE) / stats.avgdl))
                   * {ss}, 0) AS BIGINT) AS c
          FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats
        )
        SELECT doc_id,
               CAST(SUM(c) AS DOUBLE) / {ss} AS bm25,
               CAST(count(*) AS BIGINT) AS n_terms_matched
        FROM contrib GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT {BM25_TOP_K}
    """


def _knn_two_stage_sql() -> str:
    """knn_two_stage as one Spark-SQL statement: md5-parity sign projection
    to 16 dims, coarse cosine scan keeping coarse_factor*k candidates,
    exact-cosine re-rank on the full vectors (similarity.py constants)."""
    from inde1_spark.operators.similarity import (
        COARSE_FP,
        K_BUCKETED,
        N_QUERIES,
        RP_COARSE_FACTOR,
        RP_OUT_DIMS,
    )

    cfp = f"{float(COARSE_FP)!r}D"
    sign = (
        "CASE WHEN CAST(conv(substring(md5(concat_ws('_', CAST(i AS STRING),"
        " CAST(j AS STRING))), 1, 1), 16, 10) AS BIGINT) % 2 = 0"
        " THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END"
    )
    dot = _DOT_EXACT.format(a="emb_q", b="emb_n")
    nrm = _NORM_EXACT.format(a="embedding")
    return f"""
        WITH smat AS (
          SELECT transform(sequence(1, {RP_OUT_DIMS}),
                   j -> transform(sequence(1, size(embedding)), i -> {sign})) AS smat
          FROM (SELECT embedding FROM embeddings LIMIT 1)
        ),
        pv AS (
          SELECT vec_id,
                 transform(smat, s -> CAST(aggregate(
                   zip_with(fx, s, (x, sgn) -> x * sgn),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE) / 1.0E15D) AS pv
          FROM (SELECT vec_id,
                       transform(embedding, x ->
                         CAST(floor(CAST(x AS DOUBLE) * 1.0E15D + 0.5D) AS BIGINT)) AS fx
                FROM embeddings) CROSS JOIN smat
        ),
        e AS (
          SELECT vec_id, pv,
                 sqrt(CAST(aggregate(
                   transform(pv, x -> CAST(floor(x * x * {cfp} + 0.5D) AS BIGINT)),
                   CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) / {cfp}) AS cnrm
          FROM pv
        ),
        coarse AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 round((CAST(aggregate(
                     zip_with(q.pv, n.pv, (x, y) ->
                       CAST(floor(x * y * {cfp} + 0.5D) AS BIGINT)),
                     CAST(0 AS BIGINT), (a, x) -> a + x) AS DOUBLE) / {cfp})
                   / (q.cnrm * n.cnrm), 6) AS c_cos
          FROM (SELECT * FROM e WHERE vec_id < {N_QUERIES}) q
          CROSS JOIN e n
          WHERE q.vec_id <> n.vec_id
        ),
        cand AS (
          SELECT query_id, neighbor_id
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY c_cos DESC, neighbor_id ASC) AS crn
                FROM coarse)
          WHERE crn <= {RP_COARSE_FACTOR * K_BUCKETED}
        ),
        full AS (
          SELECT vec_id, embedding, {nrm} AS nrm FROM embeddings
        ),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 round(({dot}) / (fq.nrm_q * fn.nrm), 6) AS cos_sim
          FROM cand c
          JOIN (SELECT vec_id, embedding AS emb_q, nrm AS nrm_q FROM full) fq
            ON fq.vec_id = c.query_id
          JOIN (SELECT vec_id, embedding AS emb_n, nrm FROM full) fn
            ON fn.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
              FROM scored)
        WHERE rank <= {K_BUCKETED}
    """


def _knn_ivf_sql() -> str:
    """knn_ivf as one Spark-SQL statement: fixed-point centroid means from
    the label assignment, coarse centroid ranking, probe the top clusters,
    exact-cosine re-rank (similarity.py constants)."""
    from inde1_spark.operators.similarity import K_IVF, N_PROBE, N_QUERIES

    fs = lambda expr: (  # noqa: E731 — twin of similarity._fixed_sum
        f"(CAST(SUM(CAST(round(({expr}) * 1.0E15D, 0) AS BIGINT)) AS DOUBLE)"
        " / 1.0E15D)"
    )
    dot = _DOT_EXACT.format(a="emb_q", b="emb_n")
    nrm = _NORM_EXACT.format(a="embedding")
    return f"""
        WITH ex AS (
          SELECT label, vec_id, pos + 1 AS i, CAST(x AS DOUBLE) AS x
          FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x
        ),
        cent AS (
          SELECT label, i, {fs("x")} / COUNT(*) AS cv
          FROM ex GROUP BY label, i
        ),
        cnorm AS (
          SELECT label, sqrt({fs("cv * cv")}) AS cnrm FROM cent GROUP BY label
        ),
        e AS (
          SELECT vec_id, label, embedding, {nrm} AS nrm FROM embeddings
        ),
        qc AS (
          SELECT q.vec_id AS query_id, c.label, {fs("q.x * c.cv")} AS dot
          FROM (SELECT * FROM ex WHERE vec_id < {N_QUERIES}) q
          JOIN cent c ON q.i = c.i
          GROUP BY q.vec_id, c.label
        ),
        probed AS (
          SELECT query_id, label FROM (
            SELECT qc.query_id, qc.label,
                   row_number() OVER (
                     PARTITION BY qc.query_id
                     ORDER BY round(qc.dot / (nq.nrm * cn.cnrm), 6) DESC,
                              qc.label ASC) AS prn
            FROM qc
            JOIN e nq ON nq.vec_id = qc.query_id
            JOIN cnorm cn ON cn.label = qc.label
          ) WHERE prn <= {N_PROBE}
        ),
        scored AS (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 round(({dot}) / (fq.nrm * n.nrm), 6) AS cos_sim
          FROM probed p
          JOIN (SELECT vec_id, embedding AS emb_q, nrm FROM e) fq
            ON fq.vec_id = p.query_id
          JOIN (SELECT vec_id, label, embedding AS emb_n, nrm FROM e) n
            ON n.label = p.label AND n.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
              FROM scored)
        WHERE rank <= {K_IVF}
    """


def _knn_pq_sql() -> str:
    """knn_pq as one Spark-SQL statement: seeded per-subspace codebooks,
    row-local argmin encoding, asymmetric-distance scan (similarity.py
    constants)."""
    from inde1_spark.operators.similarity import (
        EMB_DIM,
        K_BUCKETED,
        N_QUERIES,
        PQ_K,
        PQ_M,
    )

    sub = EMB_DIM // PQ_M
    d2 = lambda a, b: (  # noqa: E731 — twin of similarity.knn_pq's d2
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * 1.0E12D + 0.5D) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    qsub = f"slice(embedding, m * {sub} + 1, {sub})"
    csub = f"slice(element_at(cb, c).cvec, m * {sub} + 1, {sub})"
    return f"""
        WITH cb AS (
          SELECT array_sort(collect_list(named_struct('seed_id', vec_id,
                   'cvec', transform(embedding, x -> CAST(x AS DOUBLE))))) AS cb
          FROM (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT {PQ_K})
        ),
        enc AS (
          SELECT vec_id AS neighbor_id,
                 transform(sequence(0, {PQ_M - 1}), m ->
                   (array_min(transform(sequence(1, {PQ_K}), c ->
                     named_struct('d', {d2(qsub, csub)}, 'c', c)))).c) AS codes
          FROM embeddings CROSS JOIN cb
        ),
        q AS (
          SELECT vec_id AS query_id,
                 transform(sequence(0, {PQ_M - 1}), m ->
                   transform(sequence(1, {PQ_K}), c -> {d2(qsub, csub)})) AS dt
          FROM embeddings CROSS JOIN cb WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
          SELECT q.query_id, e.neighbor_id,
                 CAST(aggregate(zip_with(q.dt, e.codes,
                        (t, c) -> element_at(t, c)),
                      CAST(0 AS BIGINT), (acc, t) -> acc + t) AS DOUBLE)
                   / 1.0E12D AS est_sq_dist
          FROM q CROSS JOIN enc e WHERE q.query_id <> e.neighbor_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, est_sq_dist
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY est_sq_dist ASC,
                                                    neighbor_id ASC) AS rank
              FROM scored)
        WHERE rank <= {K_BUCKETED}
    """


def _knn_ivf_pq_sql() -> str:
    """knn_ivf_pq as one Spark-SQL statement: the IVF probe ranking
    composed with the PQ codebook/ADC CTEs, the compressed scan restricted
    to probed cells (similarity.py constants)."""
    from inde1_spark.operators.similarity import (
        EMB_DIM,
        K_IVF,
        N_PROBE,
        N_QUERIES,
        PQ_K,
        PQ_M,
    )

    fs = lambda expr: (  # noqa: E731 — twin of similarity._fixed_sum
        f"(CAST(SUM(CAST(round(({expr}) * 1.0E15D, 0) AS BIGINT)) AS DOUBLE)"
        " / 1.0E15D)"
    )
    nrm = _NORM_EXACT.format(a="embedding")
    sub = EMB_DIM // PQ_M
    d2 = lambda a, b: (  # noqa: E731 — twin of similarity.knn_ivf_pq's d2
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * 1.0E12D + 0.5D) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    qsub = f"slice(embedding, m * {sub} + 1, {sub})"
    csub = f"slice(element_at(cb, c).cvec, m * {sub} + 1, {sub})"
    return f"""
        WITH ex AS (
          SELECT label, vec_id, pos + 1 AS i, CAST(x AS DOUBLE) AS x
          FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x
        ),
        cent AS (
          SELECT label, i, {fs("x")} / COUNT(*) AS cv
          FROM ex GROUP BY label, i
        ),
        cnorm AS (
          SELECT label, sqrt({fs("cv * cv")}) AS cnrm FROM cent GROUP BY label
        ),
        e AS (
          SELECT vec_id, label, {nrm} AS nrm FROM embeddings
        ),
        qc AS (
          SELECT q.vec_id AS query_id, c.label, {fs("q.x * c.cv")} AS dot
          FROM (SELECT * FROM ex WHERE vec_id < {N_QUERIES}) q
          JOIN cent c ON q.i = c.i
          GROUP BY q.vec_id, c.label
        ),
        probed AS (
          SELECT query_id, label FROM (
            SELECT qc.query_id, qc.label,
                   row_number() OVER (
                     PARTITION BY qc.query_id
                     ORDER BY round(qc.dot / (nq.nrm * cn.cnrm), 6) DESC,
                              qc.label ASC) AS prn
            FROM qc
            JOIN e nq ON nq.vec_id = qc.query_id
            JOIN cnorm cn ON cn.label = qc.label
          ) WHERE prn <= {N_PROBE}
        ),
        cb AS (
          SELECT array_sort(collect_list(named_struct('seed_id', vec_id,
                   'cvec', transform(embedding, x -> CAST(x AS DOUBLE))))) AS cb
          FROM (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT {PQ_K})
        ),
        enc AS (
          SELECT vec_id AS neighbor_id, label,
                 transform(sequence(0, {PQ_M - 1}), m ->
                   (array_min(transform(sequence(1, {PQ_K}), c ->
                     named_struct('d', {d2(qsub, csub)}, 'c', c)))).c) AS codes
          FROM embeddings CROSS JOIN cb
        ),
        q AS (
          SELECT vec_id AS query_id,
                 transform(sequence(0, {PQ_M - 1}), m ->
                   transform(sequence(1, {PQ_K}), c -> {d2(qsub, csub)})) AS dt
          FROM embeddings CROSS JOIN cb WHERE vec_id < {N_QUERIES}
        ),
        scored AS (
          SELECT p.query_id, n.neighbor_id,
                 CAST(aggregate(zip_with(q.dt, n.codes,
                        (t, c) -> element_at(t, c)),
                      CAST(0 AS BIGINT), (acc, t) -> acc + t) AS DOUBLE)
                   / 1.0E12D AS est_sq_dist
          FROM probed p
          JOIN q ON q.query_id = p.query_id
          JOIN enc n ON n.label = p.label AND n.neighbor_id <> p.query_id
        )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, est_sq_dist
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY est_sq_dist ASC,
                                                    neighbor_id ASC) AS rank
              FROM scored)
        WHERE rank <= {K_IVF}
    """


def _salted_group_count_sql() -> str:
    """salted_group_count as Spark SQL: the two-stage hot-key-skew
    aggregation spelling (analytics.py constants)."""
    from inde1_spark.operators.analytics import SALT_BUCKETS

    return f"""
        WITH p AS (
          SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
                 event_type,
                 pmod(xxhash64(event_id), {SALT_BUCKETS}) AS _salt,
                 count(*) AS c
          FROM events GROUP BY 1, 2, 3
        )
        SELECT day, event_type, CAST(SUM(c) AS BIGINT) AS n_events
        FROM p GROUP BY 1, 2
    """


def _cdc_sql() -> str:
    """chunk_dedup_cdc as Spark SQL: content-defined boundaries from word-pair
    md5 parity, per-chunk hashes, cross-doc chunk frequency (dedup.py
    constants CDC_AVG_CHUNK / CDC_MIN_WORDS / CDC_TOP_K — interpolated so a
    constant change cannot desync this twin from the operator)."""
    from inde1_spark.operators.dedup import CDC_AVG_CHUNK, CDC_MIN_WORDS, CDC_TOP_K

    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS toks
          FROM documents
        ),
        b AS (
          SELECT doc_id, toks, size(toks) AS n,
                 concat(array(1),
                   CASE WHEN size(toks) >= 2 THEN
                     filter(sequence(2, greatest(size(toks), 2)),
                       i -> (CAST(conv(substring(md5(concat_ws(' ',
                               element_at(toks, i - 1), element_at(toks, i))),
                               1, 8), 16, 10) AS BIGINT) % {CDC_AVG_CHUNK}) = 0)
                   ELSE CAST(array() AS array<int>) END) AS bp
          FROM toks WHERE size(toks) >= 1
        ),
        ch AS (
          SELECT doc_id,
                 inline(zip_with(bp,
                   concat(transform(slice(bp, 2, greatest(size(bp) - 1, 1)),
                                    x -> x - 1),
                          array(n)),
                   (s, e) -> named_struct(
                     'nw', CAST(e - s + 1 AS BIGINT),
                     'h', md5(concat_ws(' ', slice(toks, s, e - s + 1))))))
          FROM b
        )
        SELECT h AS chunk_hash, min(nw) AS n_words,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS first_doc_id
        FROM ch WHERE nw >= {CDC_MIN_WORDS}
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash ASC LIMIT {CDC_TOP_K}
    """


def _heavy_hitters_cms_sql() -> str:
    """heavy_hitters_cms as ONE Spark SQL query: per-day Count-Min grids,
    merged by summing counters, probed by the exact top-k (analytics.py
    CMS_* constants — interpolated so a constant change cannot desync
    this twin from the operator)."""
    from inde1_spark.operators.analytics import CMS_ROWS, CMS_TOP_K, CMS_WIDTH

    bucket = (
        "CAST(conv(substring(md5(concat_ws(':', r, CAST({key} AS STRING))),"
        f" 1, 8), 16, 10) AS BIGINT) % {CMS_WIDTH}"
    )
    return f"""
        WITH hashed AS (
          SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day, r,
                 {bucket.format(key="user_id")} AS bucket
          FROM events LATERAL VIEW explode(sequence(0, {CMS_ROWS - 1})) t AS r
        ),
        merged AS (
          SELECT r, bucket, CAST(SUM(c) AS BIGINT) AS counter
          FROM (SELECT day, r, bucket, COUNT(*) AS c
                FROM hashed GROUP BY 1, 2, 3)
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
          FROM events GROUP BY 1
        ),
        total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM events),
        topk AS (
          SELECT user_id, exact_cnt FROM exact
          ORDER BY exact_cnt DESC, user_id ASC LIMIT {CMS_TOP_K}
        ),
        probes AS (
          SELECT t.user_id, t.exact_cnt, r,
                 {bucket.format(key="t.user_id")} AS bucket
          FROM topk t LATERAL VIEW explode(sequence(0, {CMS_ROWS - 1})) x AS r
        ),
        est AS (
          SELECT p.user_id, p.exact_cnt, MIN(m.counter) AS cms_est
          FROM probes p JOIN merged m ON m.r = p.r AND m.bucket = p.bucket
          GROUP BY 1, 2
        )
        SELECT e.user_id, e.exact_cnt, e.cms_est,
               e.cms_est - e.exact_cnt AS overcount,
               (e.cms_est - e.exact_cnt) * {CMS_WIDTH} <= 2 * t.n_total
                 AS within_markov_bound
        FROM est e CROSS JOIN total t
    """


def _bloom_prefilter_sql() -> str:
    """bloom_prefilter_join as ONE Spark SQL query: word-ORed filter from
    the selective build side, row-local 3-probe membership on the fact
    side (joins.py BLOOM_* constants interpolated)."""
    from inde1_spark.operators.joins import BLOOM_BITS, BLOOM_HASHES

    def idx(j: int, key: str) -> str:
        return (
            f"CAST(conv(substring(md5(concat_ws(':', {j}, CAST({key} AS STRING))),"
            f" 1, 8), 16, 10) AS BIGINT) % {BLOOM_BITS}"
        )

    hits = " AND ".join(
        f"((coalesce(element_at(bm, CAST(shiftright(h{j}, 5) AS BIGINT)),"
        f" CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(h{j} % 32 AS INT))) != 0)"
        for j in range(BLOOM_HASHES)
    )
    hcols = ", ".join(f"{idx(j, 'pkey')} AS h{j}" for j in range(BLOOM_HASHES))
    return f"""
        WITH keys AS (
          SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0
        ),
        hashed AS (
          SELECT {idx('j', 'key')} AS idx
          FROM (SELECT key, j FROM keys
                LATERAL VIEW explode(sequence(0, {BLOOM_HASHES - 1})) t AS j)
        ),
        words AS (
          SELECT CAST(shiftright(idx, 5) AS BIGINT) AS word,
                 bit_or(shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))) AS bits
          FROM hashed GROUP BY 1
        ),
        bloom AS (
          SELECT map_from_entries(collect_list(struct(word, bits))) AS bm,
                 CAST(SUM(bit_count(bits)) AS BIGINT) AS bits_set
          FROM words
        ),
        nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM keys),
        probe AS (
          SELECT o.o_custkey AS pkey, (k.key IS NOT NULL) AS matched
          FROM orders o LEFT JOIN keys k ON k.key = o.o_custkey
        ),
        f AS (
          SELECT matched, bits_set, ({hits}) AS passed
          FROM (SELECT p.*, b.bm, b.bits_set, {hcols}
                FROM probe p CROSS JOIN bloom b)
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
                 CAST(SUM(IF(passed, 1, 0)) AS BIGINT) AS n_pass_bloom,
                 CAST(SUM(IF(matched, 1, 0)) AS BIGINT) AS n_true_match,
                 CAST(SUM(IF(passed AND NOT matched, 1, 0)) AS BIGINT) AS n_false_pos,
                 CAST(SUM(IF(matched AND NOT passed, 1, 0)) AS BIGINT) AS false_negatives,
                 MIN(bits_set) AS bits_set
          FROM f
        )
        SELECT nk.n_keys, agg.bits_set,
               {_sql_ratio_round("agg.bits_set", str(BLOOM_BITS), 6)} AS fill_ratio,
               agg.n_probe, agg.n_pass_bloom, agg.n_true_match,
               agg.n_false_pos, agg.false_negatives,
               {_sql_ratio_round("agg.n_false_pos",
                                 "GREATEST(agg.n_probe - agg.n_true_match, CAST(1 AS BIGINT))",
                                 6)} AS fpr
        FROM agg CROSS JOIN nk
    """


def _impact_postings_sql() -> str:
    """impact_postings as Spark SQL: the salted two-stage grouped top-k
    (scoring.py constants IMPACT_K / IMPACT_SALTS — interpolated so a
    constant change cannot desync this twin from the operator)."""
    from inde1_spark.operators.scoring import IMPACT_K, IMPACT_SALTS

    return f"""
        WITH tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, explode({_TOKS}) AS term FROM documents)
          GROUP BY 1, 2
        ),
        stats AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df,
                 CAST(SUM(tf) AS BIGINT) AS cf
          FROM tf GROUP BY 1
        ),
        local AS (
          SELECT term, doc_id, tf FROM (
            SELECT term, doc_id, tf,
                   row_number() OVER (
                     PARTITION BY term, pmod(doc_id, {IMPACT_SALTS})
                     ORDER BY tf DESC, doc_id ASC) AS rk
            FROM tf
          ) WHERE rk <= {IMPACT_K}
        ),
        ranked AS (
          SELECT term, doc_id, tf,
                 CAST(row_number() OVER (PARTITION BY term
                   ORDER BY tf DESC, doc_id ASC) AS BIGINT) AS rank
          FROM local
        )
        SELECT r.term, r.rank, r.doc_id, r.tf, s.df, s.cf
        FROM ranked r JOIN stats s ON s.term = r.term
        WHERE r.rank <= {IMPACT_K}
        ORDER BY r.term, r.rank
    """


def _symspell_sql() -> str:
    """symspell_neighbors as Spark SQL: deletion-neighborhood candidate
    join + candidate-only levenshtein verify (text.py constants)."""
    from inde1_spark.operators.text import SYMSPELL_KEY_DF, SYMSPELL_MAX_LEN

    return f"""
        WITH vocab AS (
          SELECT term, CAST(count(*) AS BIGINT) AS n
          FROM (SELECT explode(filter(split(p_name, ' '), t -> t <> '')) AS term
                FROM part)
          GROUP BY 1 HAVING length(term) <= {SYMSPELL_MAX_LEN}
        ),
        keys AS (
          SELECT term, n, explode(array_distinct(transform(
                   sequence(0, length(term)),
                   i -> concat(substr(term, 1, i),
                               substr(term, i + 2, length(term)))))) AS key
          FROM vocab
        ),
        ok AS (SELECT key FROM keys GROUP BY key
               HAVING count(*) <= {SYMSPELL_KEY_DF}),
        cand AS (
          SELECT DISTINCT a.term AS term_a, b.term AS term_b,
                 a.n AS n_a, b.n AS n_b
          FROM keys a JOIN keys b ON a.key = b.key AND a.term < b.term
          WHERE a.key IN (SELECT key FROM ok)
        )
        SELECT term_a, term_b, n_a, n_b FROM cand
        WHERE levenshtein(term_a, term_b) <= 1
        ORDER BY term_a, term_b
    """


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


SPARK_SQL: dict[str, str] = {
    "hourly_stats": f"""
        SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour_ts,
               count(IF(event_type = '{ENTRY}', 1, NULL)) AS n_entries,
               count(IF(event_type = '{EXIT}', 1, NULL)) AS n_exits,
               greatest(CAST(0 AS BIGINT),
                        count(IF(event_type = '{ENTRY}', 1, NULL))
                        - count(IF(event_type = '{EXIT}', 1, NULL))) AS occupancy,
               round(greatest(CAST(0 AS BIGINT),
                        count(IF(event_type = '{ENTRY}', 1, NULL))
                        - count(IF(event_type = '{EXIT}', 1, NULL))) * CAST(2.0 AS DOUBLE), 2) AS revenue
        FROM events
        WHERE event_type IN ('{ENTRY}', '{EXIT}')
        GROUP BY 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
    "heatmap_hour": f"""
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, count(*) AS n_entries
        FROM events WHERE event_type = '{ENTRY}' GROUP BY 1
    """,
    "top_k_users": f"""
        SELECT user_id, count(*) AS n_entries
        FROM events WHERE event_type = '{ENTRY}'
        GROUP BY 1 ORDER BY n_entries DESC, user_id ASC LIMIT 10
    """,
    "session_pairing": f"""
        WITH entries AS (
          SELECT user_id, ts AS entry_ts, event_id AS entry_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events WHERE event_type = '{ENTRY}'
        ),
        exits AS (
          SELECT user_id, ts AS exit_ts, event_id AS exit_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events WHERE event_type = '{EXIT}'
        )
        SELECT e.user_id, CAST(e.rn AS BIGINT) AS rn,
               date_format(entry_ts, 'yyyy-MM-dd HH:mm:ss') AS entry_ts_str,
               date_format(exit_ts, 'yyyy-MM-dd HH:mm:ss') AS exit_ts_str,
               round((unix_timestamp(exit_ts) - unix_timestamp(entry_ts)) / CAST(60.0 AS DOUBLE), 2) AS duration_min
        FROM entries e JOIN exits x ON e.user_id = x.user_id AND e.rn = x.rn
    """,
    "revenue_by_nation": """
        SELECT n_name AS nation,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    """,
    "train_test_split": """
        WITH s AS (
          SELECT lang, n_chars,
                 CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT lang, n_chars,
                       CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100 AS b
                FROM documents)
        )
        SELECT lang, split, count(*) AS n_docs,
               CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS n_chars
        FROM s GROUP BY lang, split
    """,
    "mixture_sample": """
        WITH d AS (
          SELECT source, n_chars,
                 CAST(element_at(array(100, 50, 25, 10),
                      CAST(CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 + 1 AS INT)) AS BIGINT) AS rate,
                 CAST(conv(substring(md5(concat_ws(':', source, CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 AS hb
          FROM documents
        )
        SELECT source, max(rate) AS rate_pct, count(*) AS n_total,
               CAST(SUM(CASE WHEN hb < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CAST(CASE WHEN hb < rate THEN n_chars ELSE 0 END AS DECIMAL(18,0))) AS BIGINT) AS n_chars_kept
        FROM d GROUP BY source
    """,
    "trim_outliers": """
        WITH ranked AS (
          SELECT lang, n_chars,
                 CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS r,
                 CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_in
          FROM documents
        ),
        kept AS (
          SELECT * FROM ranked
          WHERE r > (n_in * 5 - (n_in * 5) % 100) / 100
            AND r <= n_in - (n_in * 5 - (n_in * 5) % 100) / 100
        )
        SELECT lang, max(n_in) AS n_in, count(*) AS n_kept,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS sum_chars
        FROM kept GROUP BY lang
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS keep_doc_id
        FROM documents GROUP BY 1
    """,
    "retention_cohorts": """
        WITH activity AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
        ),
        firsts AS (SELECT user_id, MIN(d) AS cohort_d FROM activity GROUP BY user_id)
        SELECT date_format(f.cohort_d, 'yyyy-MM-dd') AS cohort_day,
               CAST(datediff(a.d, f.cohort_d) AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM activity a JOIN firsts f ON a.user_id = f.user_id
        WHERE datediff(a.d, f.cohort_d) <= 7
        GROUP BY 1, 2
    """,
    "funnel_steps": """
        WITH per_user AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
          FROM events GROUP BY user_id
        ),
        c AS (
          SELECT CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                 CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0 AND t2 > t1 AND t3 > t2 THEN 1 ELSE 0 END) AS BIGINT) AS c3
          FROM per_user
        )
        SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name, c0 AS n_users,
               CAST(((c0 * 20000 + GREATEST(c0, 1)) DIV (2 * GREATEST(c0, 1))) AS DOUBLE) / 10000.0 AS conversion FROM c
        UNION ALL SELECT 2, 'view', c1, CAST(((c1 * 20000 + GREATEST(c0, 1)) DIV (2 * GREATEST(c0, 1))) AS DOUBLE) / 10000.0 FROM c
        UNION ALL SELECT 3, 'click', c2, CAST(((c2 * 20000 + GREATEST(c0, 1)) DIV (2 * GREATEST(c0, 1))) AS DOUBLE) / 10000.0 FROM c
        UNION ALL SELECT 4, 'purchase', c3, CAST(((c3 * 20000 + GREATEST(c0, 1)) DIV (2 * GREATEST(c0, 1))) AS DOUBLE) / 10000.0 FROM c
    """,
    "pivot_source_lang": """
        SELECT source,
               coalesce(de, CAST(0 AS BIGINT)) AS de,
               coalesce(en, CAST(0 AS BIGINT)) AS en,
               coalesce(es, CAST(0 AS BIGINT)) AS es,
               coalesce(fr, CAST(0 AS BIGINT)) AS fr,
               coalesce(zh, CAST(0 AS BIGINT)) AS zh
        FROM (SELECT source, lang FROM documents)
        PIVOT (count(1) FOR lang IN ('de' AS de, 'en' AS en, 'es' AS es,
                                     'fr' AS fr, 'zh' AS zh))
    """,
    "weighted_sample": """
        WITH keyed AS (
          SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 CAST(CAST(round(ln((CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) + 1)
                                    / 4294967297.0) * 1e9, 0) AS BIGINT) AS DOUBLE)
                   / 1e9 / CAST(n_chars AS DOUBLE) AS es_key
          FROM documents
        ),
        picked AS (SELECT * FROM keyed ORDER BY es_key DESC, doc_id ASC LIMIT 50)
        SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS BIGINT) AS rank,
               doc_id, n_chars, es_key
        FROM picked
    """,
    # --- scale-path families (dedup / ANN / scoring), r03 verdict item 5 ---
    "chunk_dedup_cdc": _cdc_sql(),
    "dedup_minhash_fast": _minhash_fast_sql(),
    "knn_lsh_bucketed": _knn_lsh_sql(),
    "tfidf_top_terms": _tfidf_sql(),
    # --- r04 verdict item 5: remaining headline scale paths as SQL ---
    "bm25_score": _bm25_sql(),
    "knn_two_stage": _knn_two_stage_sql(),
    "knn_ivf": _knn_ivf_sql(),
    "knn_pq": _knn_pq_sql(),
    "knn_ivf_pq": _knn_ivf_pq_sql(),
    "salted_group_count": _salted_group_count_sql(),
    "heavy_hitters_cms": _heavy_hitters_cms_sql(),
    "impact_postings": _impact_postings_sql(),
    "symspell_neighbors": _symspell_sql(),
    "bloom_prefilter_join": _bloom_prefilter_sql(),
    # --- windowed analytics (r04): hopping windows + rolling RANGE frame ---
    "hopping_window_stats": """
        SELECT date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS window_start,
               date_format(w.end, 'yyyy-MM-dd HH:mm:ss') AS window_end,
               event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM (SELECT window(ts, '60 minutes', '30 minutes') AS w, event_type, value
              FROM events)
        GROUP BY w, event_type
    """,
    "rolling_daily_revenue": """
        WITH daily AS (
          SELECT event_type,
                 date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
                 CAST(floor(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                            * 1e6 + 0.5) AS BIGINT) AS v_micro
          FROM events GROUP BY 1, 2
        ),
        w AS (
          SELECT event_type, day, v_micro,
                 SUM(v_micro) OVER (
                   PARTITION BY event_type
                   ORDER BY datediff(to_date(day), DATE '1970-01-01')
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rs,
                 COUNT(*) OVER (
                   PARTITION BY event_type
                   ORDER BY datediff(to_date(day), DATE '1970-01-01')
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS nd
          FROM daily
        )
        SELECT event_type, day,
               CAST(v_micro AS DOUBLE) / 1e6 AS value,
               CAST(rs AS DOUBLE) / 1e6 AS rolling_sum,
               CAST(rs AS DOUBLE) / CAST(nd AS DOUBLE) / 1e6 AS rolling_avg,
               CAST(nd AS BIGINT) AS n_days_in_window
        FROM w
    """,
    # --- r07 data-engineering audits as one SQL statement each ---
    "zonemap_prune_audit": """
        WITH zones AS (
          SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 MIN(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS zmin,
                 MAX(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS zmax
          FROM events GROUP BY 1
        ),
        span AS (SELECT MIN(zmin) AS vmin, MAX(zmax) AS vmax FROM zones),
        thr AS (
          SELECT i, CAST(vmin + ((vmax - vmin) * i) div 5 AS BIGINT) AS thr_micro
          FROM span LATERAL VIEW explode(array(1, 2, 3, 4)) t AS i
        ),
        sweep AS (
          SELECT i, thr_micro,
                 CAST(COUNT(*) AS BIGINT) AS n_parts,
                 CAST(SUM(CASE WHEN zmax <= thr_micro THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_parts_skipped,
                 CAST(SUM(n_rows) AS BIGINT) AS rows_total,
                 CAST(SUM(CASE WHEN zmax <= thr_micro THEN n_rows ELSE 0 END)
                      AS BIGINT) AS rows_skipped
          FROM zones, thr GROUP BY 1, 2
        )
        SELECT CAST(i AS BIGINT) AS quintile,
               CAST(thr_micro AS DOUBLE) / 1e6 AS threshold,
               n_parts, n_parts_skipped, rows_total, rows_skipped,
               (CAST((rows_skipped * 100 * 20000 + rows_total)
                     - (rows_skipped * 100 * 20000 + rows_total)
                       % (rows_total * 2) AS DOUBLE)
                / CAST(rows_total * 2 AS DOUBLE)) / 10000.0 AS skip_pct
        FROM sweep
        ORDER BY quintile
    """,
    "join_order_audit": """
        WITH oc AS (
          SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS oc
          FROM orders GROUP BY 1
        ),
        cc AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer),
        nc AS (
          SELECT n_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS nn
          FROM nation GROUP BY 1
        ),
        ccnt AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS cc_n FROM cc GROUP BY 1),
        ccn AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS cn FROM cc GROUP BY 1),
        plan_a AS (
          SELECT COALESCE(CAST(SUM(CAST(oc.oc AS DECIMAL(38,0)) * ccnt.cc_n)
                               AS DECIMAL(38,0)),
                          CAST(0 AS DECIMAL(38,0))) AS rows_dec
          FROM oc JOIN ccnt ON oc.ck = ccnt.ck
        ),
        plan_b AS (
          SELECT COALESCE(CAST(SUM(CAST(ccn.cn AS DECIMAL(38,0)) * nc.nn)
                               AS DECIMAL(38,0)),
                          CAST(0 AS DECIMAL(38,0))) AS rows_dec
          FROM ccn JOIN nc ON ccn.nk = nc.nk
        ),
        fin AS (
          SELECT COALESCE(CAST(SUM(CAST(COALESCE(oc.oc, 0) AS DECIMAL(38,0))
                                   * COALESCE(nc.nn, 0)) AS DECIMAL(38,0)),
                          CAST(0 AS DECIMAL(38,0))) AS final_dec
          FROM cc LEFT JOIN oc ON cc.ck = oc.ck LEFT JOIN nc ON cc.nk = nc.nk
        ),
        plans AS (
          SELECT 'orders_customer_first' AS plan, rows_dec FROM plan_a
          UNION ALL
          SELECT 'customer_nation_first' AS plan, rows_dec FROM plan_b
        )
        SELECT plan,
               CAST(rows_dec AS STRING) AS intermediate_rows,
               CAST(final_dec AS STRING) AS final_rows,
               row_number() OVER (ORDER BY rows_dec ASC, plan DESC) = 1
                 AS is_cheapest
        FROM plans, fin
        ORDER BY plan
    """,
}


def _dirichlet_ql_spark_sql() -> str:
    """Dirichlet query likelihood as ONE Spark SQL statement — the SQL
    surface of scoring.dirichlet_query_likelihood (same nano-log
    integer products, closed-form smoothing-only mass, same top-k)."""
    from inde1_spark.operators.scoring import (
        BM25_QUERY,
        BM25_TOP_K,
        DIRICHLET_MU,
    )

    mu = DIRICHLET_MU
    qin = ", ".join(f"'{t}'" for t in BM25_QUERY)

    def lnn(x: str) -> str:
        return f"CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9, 0) AS BIGINT)"

    return f"""
        WITH toks AS (
          SELECT doc_id,
                 explode(filter(split(text, ' '), t -> t != '')) AS term
          FROM documents
        ),
        dl AS (
          SELECT doc_id,
                 CAST(size(filter(split(text, ' '), t -> t != '')) AS BIGINT)
                   AS dlen
          FROM documents
        ),
        ntot AS (SELECT CAST(SUM(dlen) AS BIGINT) AS n_tok FROM dl),
        cq AS (
          SELECT term, COUNT(*) AS c_q
          FROM toks WHERE term IN ({qin}) GROUP BY 1
        ),
        cons AS (
          SELECT CAST(SUM({lnn(f'{mu} * c_q')}) AS BIGINT) AS base_nano,
                 COUNT(*) AS n_q
          FROM cq
        ),
        dq AS (
          SELECT doc_id, term, COUNT(*) AS c_dq
          FROM toks WHERE term IN ({qin}) GROUP BY 1, 2
        ),
        delta AS (
          SELECT doc_id,
                 CAST(SUM({lnn(f'c_dq * n_tok + {mu} * c_q')}
                      - {lnn(f'{mu} * c_q')}) AS BIGINT) AS delta_nano
          FROM dq JOIN cq USING (term) CROSS JOIN ntot
          GROUP BY 1
        )
        SELECT doc_id, dlen,
               CAST(score_nano AS DOUBLE) / 1e9 AS ql_score
        FROM (
          SELECT d.doc_id, d.dlen,
                 base_nano + COALESCE(delta_nano, CAST(0 AS BIGINT))
                   - n_q * {lnn(f'n_tok * (dlen + {mu})')} AS score_nano
          FROM dl d CROSS JOIN ntot CROSS JOIN cons
          LEFT JOIN delta ON delta.doc_id = d.doc_id
        )
        ORDER BY score_nano DESC, doc_id ASC LIMIT {BM25_TOP_K}
    """


SPARK_SQL["dirichlet_query_likelihood"] = _dirichlet_ql_spark_sql()


def _sql_dec2d(x: str) -> str:
    """Spark-SQL spelling of exprs.dec_to_double_exact (base-10^15 digit
    split of a DECIMAL(38,0) expression; see oracles._dec2d for the
    DuckDB twin and the why)."""
    P = 10**15
    x1 = f"CAST((({x}) - ({x}) % {P}) / {P} AS DECIMAL(38,0))"
    return (
        f"(CAST(CAST(({x1} - {x1} % {P}) / {P} AS BIGINT) AS DOUBLE) * 1e30"
        f" + CAST(CAST({x1} % {P} AS BIGINT) AS DOUBLE) * 1e15"
        f" + CAST(CAST(({x}) % {P} AS BIGINT) AS DOUBLE))"
    )


def _jsd_sources_spark_sql() -> str:
    """Pairwise source JSD as ONE Spark SQL statement — the SQL surface
    of scoring.jsd_sources (same integer-product nano logs, closed-form
    one-sided ln2 mass, intersection-only join)."""
    from inde1_spark.operators.scoring import LN2_NANO

    def lnn(x: str) -> str:
        return f"CAST(round(ln(CAST({x} AS DOUBLE)) * 1e9, 0) AS BIGINT)"

    mix = lnn("a * n2 + b * n1")
    sa_tot = (
        f"CAST(sa + CAST(n1 - a_int AS DECIMAL(38,0)) * {LN2_NANO}"
        " AS DECIMAL(38,0))"
    )
    sb_tot = (
        f"CAST(sb + CAST(n2 - b_int AS DECIMAL(38,0)) * {LN2_NANO}"
        " AS DECIMAL(38,0))"
    )
    return f"""
        WITH tc AS (
          SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT source,
                   explode(filter(split(text, ' '), t -> t != '')) AS term
            FROM documents
          ) GROUP BY 1, 2
        ),
        totals AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS n_tok,
                 COUNT(*) AS n_vocab
          FROM tc GROUP BY 1
        ),
        t AS (
          SELECT tc.source, term, c, n_tok, n_vocab
          FROM tc JOIN totals ON tc.source = totals.source
        ),
        inter AS (
          SELECT t1.source AS source_a, t2.source AS source_b,
                 t1.n_tok AS n1, t2.n_tok AS n2,
                 t1.n_vocab AS v1, t2.n_vocab AS v2,
                 t1.c AS a, t2.c AS b
          FROM t t1 JOIN t t2
            ON t1.term = t2.term AND t1.source < t2.source
        ),
        g AS (
          SELECT source_a, source_b, n1, n2, v1, v2,
                 CAST(COUNT(*) AS BIGINT) AS n_common,
                 CAST(SUM(a) AS BIGINT) AS a_int,
                 CAST(SUM(b) AS BIGINT) AS b_int,
                 SUM(CAST(a AS DECIMAL(38,0))
                     * CAST({lnn('2 * a * n2')} - {mix} AS DECIMAL(38,0)))
                   AS sa,
                 SUM(CAST(b AS DECIMAL(38,0))
                     * CAST({lnn('2 * b * n1')} - {mix} AS DECIMAL(38,0)))
                   AS sb
          FROM inter GROUP BY 1, 2, 3, 4, 5, 6
        )
        SELECT source_a, source_b,
               v1 + v2 - n_common AS n_terms_union,
               ({_sql_dec2d(sa_tot)} / CAST(n1 AS DOUBLE)
                + {_sql_dec2d(sb_tot)} / CAST(n2 AS DOUBLE))
                 / 1e9 / 2.0 AS jsd_nats
        FROM g ORDER BY source_a, source_b
    """


SPARK_SQL["jsd_sources"] = _jsd_sources_spark_sql()


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SPARK_SQL[name])


def _winsorized_spark_sql() -> str:
    """Winsorized per-type stats as ONE Spark SQL statement — the SQL
    surface of analytics.winsorized_stats (same order-statistic bounds,
    decimal moments, digit-split conversions)."""
    s = "CAST(s AS DECIMAL(38,0))"
    var_num = (
        f"CAST(CAST(n AS DECIMAL(38,0)) * CAST(ss AS DECIMAL(38,0))"
        f" - {s} * {s} AS DECIMAL(38,0))"
    )
    return f"""
        WITH ranked AS (
          SELECT event_type,
                 CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v,
                 CAST(row_number() OVER (
                        PARTITION BY event_type
                        ORDER BY CAST(floor(value * 1e6 + 0.5) AS BIGINT),
                                 event_id) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM events
        ),
        kk AS (SELECT *, (n * 5) div 100 AS k FROM ranked),
        lo AS (SELECT event_type, v AS lo_v FROM kk WHERE rn = k + 1),
        hi AS (SELECT event_type, v AS hi_v FROM kk WHERE rn = n - k),
        clamped AS (
          SELECT kk.event_type, kk.n, kk.k,
                 GREATEST(LEAST(kk.v, hi.hi_v), lo.lo_v) AS w,
                 lo.lo_v, hi.hi_v
          FROM kk JOIN lo ON kk.event_type = lo.event_type
                  JOIN hi ON kk.event_type = hi.event_type
        ),
        agg AS (
          SELECT event_type,
                 MAX(n) AS n, MAX(k) AS k_trimmed,
                 MAX(lo_v) AS lo_v, MAX(hi_v) AS hi_v,
                 CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
                 SUM(CAST(w AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))) AS ss
          FROM clamped GROUP BY 1
        )
        SELECT event_type, n, k_trimmed,
               CAST(lo_v AS DOUBLE) / 1e6 AS winsor_lo,
               CAST(hi_v AS DOUBLE) / 1e6 AS winsor_hi,
               {_sql_dec2d(s)} / CAST(n AS DOUBLE) / 1e6 AS wins_mean,
               sqrt(GREATEST({_sql_dec2d(var_num)}, 0.0)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * GREATEST(CAST(n AS DOUBLE) - 1.0, 1.0))) / 1e6
                 AS wins_std
        FROM agg
        ORDER BY event_type
    """


SPARK_SQL["winsorized_stats"] = _winsorized_spark_sql()


def _capture_recapture_spark_sql() -> str:
    """Chapman capture-recapture as ONE Spark SQL statement — the SQL
    surface of analytics.capture_recapture (same midpoint split,
    digit-split products, Seber SE, exact coverage ratio)."""
    prod = (
        "CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * CAST(n2 + 1 AS DECIMAL(38,0))"
        " AS DECIMAL(38,0))"
    )
    prod3 = (
        "CAST(CAST(n1 + 1 AS DECIMAL(38,0)) * CAST(n2 + 1 AS DECIMAL(38,0))"
        " * CAST(n1 - m AS DECIMAL(38,0)) AS DECIMAL(38,0))"
    )
    return f"""
        WITH rng AS (
          SELECT MIN(unix_timestamp(ts)) AS t0, MAX(unix_timestamp(ts)) AS t1
          FROM events
        ),
        mid AS (SELECT t0 + (t1 - t0) div 2 AS mid FROM rng),
        per_user AS (
          SELECT user_id,
                 MAX(CASE WHEN unix_timestamp(ts) < mid THEN 1 ELSE 0 END)
                   AS in1,
                 MAX(CASE WHEN unix_timestamp(ts) >= mid THEN 1 ELSE 0 END)
                   AS in2
          FROM events, mid GROUP BY 1
        ),
        agg AS (
          SELECT CAST(SUM(in1) AS BIGINT) AS n1,
                 CAST(SUM(in2) AS BIGINT) AS n2,
                 CAST(SUM(in1 * in2) AS BIGINT) AS m,
                 CAST(COUNT(*) AS BIGINT) AS n_observed
          FROM per_user
        ),
        calc AS (
          SELECT n1, n2, m, n_observed,
                 {_sql_dec2d(prod)} / CAST(m + 1 AS DOUBLE) - 1.0 AS est,
                 {_sql_dec2d(prod3)} * CAST(n2 - m AS DOUBLE)
                   / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                      * CAST(m + 2 AS DOUBLE)) AS var_est
          FROM agg
        ),
        fin AS (
          SELECT *, GREATEST(CAST(floor(est + 0.5) AS BIGINT), 1) AS est_l
          FROM calc
        )
        SELECT n1, n2, m AS m_overlap, n_observed,
               est AS est_total,
               sqrt(GREATEST(var_est, 0.0)) AS se_total,
               (CAST((n_observed * 100 * 20000 + est_l)
                     - (n_observed * 100 * 20000 + est_l) % (est_l * 2)
                     AS DOUBLE) / CAST(est_l * 2 AS DOUBLE)) / 10000.0
                 AS coverage_pct
        FROM fin
    """


SPARK_SQL["capture_recapture"] = _capture_recapture_spark_sql()


def _cvm_spark_sql() -> str:
    """CvM two-sample as ONE Spark SQL statement — the SQL surface of
    analytics.cvm_two_sample (same pooled total order, exact decimal U,
    digit-split mirrored T chain)."""
    u_dec = (
        "CAST(CAST(m AS DECIMAL(38,0)) * CAST(sqx AS DECIMAL(38,0))"
        " + CAST(n AS DECIMAL(38,0)) * CAST(sqy AS DECIMAL(38,0))"
        " AS DECIMAL(38,0))"
    )
    return f"""
        WITH daily AS (
          SELECT event_type,
                 date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY 1, 2
        ),
        pooled AS (
          SELECT (event_type = 'view') AS is_x, day, v,
                 CAST(row_number() OVER (ORDER BY v, event_type, day)
                      AS BIGINT) AS r
          FROM daily
        ),
        within AS (
          SELECT is_x, r,
                 CAST(row_number() OVER (PARTITION BY is_x ORDER BY r)
                      AS BIGINT) AS i
          FROM pooled
        ),
        agg AS (
          SELECT is_x, CAST(COUNT(*) AS BIGINT) AS cnt,
                 SUM(CAST(r - i AS DECIMAL(38,0))
                     * CAST(r - i AS DECIMAL(38,0))) AS sq
          FROM within GROUP BY 1
        ),
        two AS (
          SELECT MAX(CASE WHEN is_x THEN cnt END) AS m,
                 MAX(CASE WHEN NOT is_x THEN cnt END) AS n,
                 MAX(CASE WHEN is_x THEN sq END) AS sqx,
                 MAX(CASE WHEN NOT is_x THEN sq END) AS sqy
          FROM agg
        ),
        calc AS (
          SELECT m, n, {_sql_dec2d(u_dec)} AS u_d,
                 CAST(m AS DOUBLE) AS m_d, CAST(n AS DOUBLE) AS n_d
          FROM two WHERE m IS NOT NULL AND n IS NOT NULL
        ),
        tt AS (
          SELECT m, n, u_d,
                 u_d / ((m_d + n_d) * m_d * n_d)
                   - (4.0 * m_d * n_d - 1.0) / (6.0 * (m_d + n_d)) AS t
          FROM calc
        )
        SELECT m AS n_entry_days, n AS n_exit_days, u_d AS u_stat,
               t AS t_stat, t > CAST(0.461 AS DOUBLE) AS different_5pct
        FROM tt
    """


SPARK_SQL["cvm_two_sample"] = _cvm_spark_sql()


def _granger_spark_sql() -> str:
    """Lag-1 Granger F as ONE Spark SQL statement — the SQL surface of
    analytics.granger_daily (decimal centered moments, Cramer's-rule
    RSS chain)."""

    def cen(spp, s1, s2):
        return _sql_dec2d(
            f"CAST(CAST(n AS DECIMAL(38,0)) * CAST({spp} AS DECIMAL(38,0))"
            f" - CAST({s1} AS DECIMAL(38,0)) * CAST({s2} AS DECIMAL(38,0))"
            f" AS DECIMAL(38,0))"
        )

    return f"""
        WITH daily AS (
          SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ent,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ext
          FROM events GROUP BY 1
        ),
        pairs AS (
          SELECT ext AS yv,
                 lag(ext) OVER (ORDER BY day) AS av,
                 lag(ent) OVER (ORDER BY day) AS bv
          FROM daily
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yv) AS BIGINT) AS sy,
                 CAST(SUM(av) AS BIGINT) AS sa,
                 CAST(SUM(bv) AS BIGINT) AS sb,
                 SUM(CAST(yv AS DECIMAL(38,0)) * CAST(yv AS DECIMAL(38,0))) AS syy,
                 SUM(CAST(av AS DECIMAL(38,0)) * CAST(av AS DECIMAL(38,0))) AS saa,
                 SUM(CAST(bv AS DECIMAL(38,0)) * CAST(bv AS DECIMAL(38,0))) AS sbb,
                 SUM(CAST(av AS DECIMAL(38,0)) * CAST(yv AS DECIMAL(38,0))) AS say,
                 SUM(CAST(bv AS DECIMAL(38,0)) * CAST(yv AS DECIMAL(38,0))) AS sby,
                 SUM(CAST(av AS DECIMAL(38,0)) * CAST(bv AS DECIMAL(38,0))) AS sab
          FROM pairs WHERE av IS NOT NULL
        ),
        cen AS (
          SELECT n, CAST(n AS DOUBLE) AS n_d,
                 {cen("syy", "sy", "sy")} AS cyy,
                 {cen("saa", "sa", "sa")} AS caa,
                 {cen("sbb", "sb", "sb")} AS cbb,
                 {cen("say", "sa", "sy")} AS cay,
                 {cen("sby", "sb", "sy")} AS cby,
                 {cen("sab", "sa", "sb")} AS cab
          FROM s WHERE n >= 4
        ),
        rr AS (
          SELECT *, caa * cbb - cab * cab AS det,
                 CASE WHEN caa <= 0 THEN cyy / n_d
                      ELSE (cyy - cay * cay / caa) / n_d END AS rss_r
          FROM cen
        ),
        uu AS (
          SELECT *, CASE WHEN det <= 0 THEN rss_r
                         ELSE (cyy - (cbb * cay * cay
                                      - 2.0 * cab * cay * cby
                                      + caa * cby * cby) / det)
                              / n_d END AS rss_u
          FROM rr
        ),
        ff AS (
          SELECT n, rss_r, rss_u,
                 CASE WHEN rss_u <= 0 OR det <= 0 OR caa <= 0 THEN 0.0
                      ELSE GREATEST(rss_r - rss_u, 0.0) * (n_d - 3.0) / rss_u
                 END AS f_stat
          FROM uu
        )
        SELECT n AS n_pairs, rss_r AS rss_restricted,
               rss_u AS rss_unrestricted, f_stat,
               f_stat > CAST(3.84 AS DOUBLE) AS granger_5pct
        FROM ff
    """


SPARK_SQL["granger_daily"] = _granger_spark_sql()
