"""General-purpose temporal join operators Spark lacks as built-ins.

``asof_join`` is the library form of the union-and-window pattern: match
each probe row to the nearest carry row in time (backward or forward,
strict or inclusive, optionally within a tolerance), per key.

Why not a theta-join: ``l.ts >= r.ts`` alone is a range predicate —
Catalyst plans a broadcast-nested-loop / cartesian and the pair count
explodes quadratically per key. The union form costs ONE hash shuffle on
the key plus a per-key sort (both sides interleaved once), which is the
plan a 100 TB time-series enrichment needs; DuckDB/kdb spell the same
thing ASOF JOIN, Flink calls it a temporal join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: tuple[str, ...],
    direction: str = "backward",
    strict: bool = False,
    tolerance_sec: int | None = None,
    left_order: str | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the nearest ``right`` row per ``key``.

    backward: latest right with ``right_ts <= left_ts`` (< if ``strict``);
    forward: earliest right with ``right_ts >= left_ts`` (> if ``strict``).
    Matched columns come back as ``asof_<payload>`` plus ``asof_ts``; no
    match (or outside ``tolerance_sec``) leaves them null — left-outer
    semantics, every left row survives exactly once.

    Ties: among right rows sharing (key, ts), the one with the greatest
    ``right_order`` (default: first payload column) wins — determinism the
    hash-compared oracles require. ``left_order`` only totalizes the sort.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carry_side, probe_side = (1, 0) if strict else (0, 1)
    r_ord = F.col(right_order or payload[0])
    l_ord = F.col(left_order) if left_order else F.lit(0)

    carry = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(carry_side).alias("_side"),
        r_ord.alias("_o"),
        F.struct(F.col(right_ts).alias("_ts"), *[F.col(c) for c in payload]).alias("_r"),
    )
    r_type = carry.schema["_r"].dataType
    l_struct = F.struct(*[F.col(c) for c in left.columns])
    probe = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(probe_side).alias("_side"),
        l_ord.alias("_o"),
        F.lit(None).cast(r_type).alias("_r"),
        l_struct.alias("_l"),
    )
    l_type = probe.schema["_l"].dataType
    tagged = probe.unionByName(
        carry.withColumn("_l", F.lit(None).cast(l_type))
    )

    ts_ord = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_ord, F.col("_side").asc(), F.col("_o").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = F.last("_r", ignorenulls=True).over(w)
    if tolerance_sec is not None:
        gap = (
            F.unix_timestamp("_t") - F.unix_timestamp(matched["_ts"])
            if direction == "backward"
            else F.unix_timestamp(matched["_ts"]) - F.unix_timestamp("_t")
        )
        matched = F.when(gap <= tolerance_sec, matched)

    out = (
        tagged.withColumn("_m", matched)
        .filter(F.col("_side") == probe_side)
        .select(
            *[F.col("_l")[c].alias(c) for c in left.columns],
            F.col("_m")["_ts"].alias("asof_ts"),
            *[F.col("_m")[c].alias(f"asof_{c}") for c in payload],
        )
    )
    return out


# ---------------------------------------------------------------------------
# bloom_prefilter_join: runtime-filter join pruning with a measured-FPR audit
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 3


def bloom_words(
    df: DataFrame, key_col: str, m_bits: int, n_hashes: int
) -> DataFrame:
    """The Bloom filter as a (word, bits) table from a key column — the
    md5-portable bit derivation shared by the batch audit, the sizing
    sweep, and the streaming builder. ``bit_or`` is mergeable, so the
    same aggregation builds the filter from partition partials, from
    per-shard unions, or incrementally from micro-batches."""
    j = F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("j")
    idx = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("j"), F.col(key_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    ).alias("idx")
    return (
        df.select(F.col(key_col), j)
        .select(idx)
        .select(
            F.shiftright(F.col("idx"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(idx % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_prefilter_join(
    orders: DataFrame,
    customer: DataFrame,
    m_bits: int = BLOOM_BITS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Bloom-filter semi-join pruning, audited: build an ``m_bits``-bit
    filter over the keys of a selective build side (customers in debt),
    probe every fact row AT THE SCAN (a pure projection — the fact side
    never shuffles to learn membership), and measure what the filter
    actually delivered: pass rate, exact false-positive count, measured
    FPR over true non-members, and the structural guarantee that false
    NEGATIVES are zero. This is the engine-portable spelling of Spark's
    own runtime row-level filtering (Bloom join pruning): at 100 TB the
    win is shuffle rows avoided BEFORE the real join, and this audit is
    how you decide per-pipeline whether m/k are sized right (fill ratio
    near 50% = at capacity).

    Determinism: bit indexes come from md5 hex ranges (seed-free, both
    engines identical); the filter is 128 x 32-bit words ORed with
    ``bit_or`` (a MERGEABLE aggregate — per-partition partials combine,
    and per-shard filters union by the same OR, which is how a filter is
    built distributed); masks stay below 2^32 so no sign-bit asymmetry
    exists between engines. All counts exact longs; ratios via
    ``ratio_round``.

    Plan: build side = one explode x groupBy collapsing to <=128 words,
    then a 1-row collapse into a map. Probe side = one broadcast hash
    join (matched flag) + the benign 1-row filter broadcast, then a
    row-local 3-probe membership test and ONE map-side-combined global
    aggregate. The fact table is scanned once and never exchanged on a
    data-dependent key.
    """
    from inde1_spark.functions.exprs import ratio_round

    keys = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("key")
    )
    words = bloom_words(keys, "key", m_bits, n_hashes)
    bloom_row = words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bm"),
        F.sum(F.bit_count("bits")).cast("long").alias("bits_set"),
    )
    nkeys_row = keys.groupBy().agg(F.count("*").cast("long").alias("n_keys"))

    probe = orders.select(F.col("o_custkey").alias("pkey"))
    dkeys = keys.select("key", F.lit(True).alias("mflag"))
    p = (
        probe.join(F.broadcast(dkeys), probe["pkey"] == dkeys["key"], "left")
        .select("pkey", F.coalesce("mflag", F.lit(False)).alias("matched"))
        .crossJoin(F.broadcast(bloom_row))
    )
    for h in range(n_hashes):
        md = F.md5(F.concat_ws(":", F.lit(h), F.col("pkey").cast("string")))
        p = p.withColumn(
            f"idx{h}",
            F.conv(F.substring(md, 1, 8), 16, 10).cast("long") % m_bits,
        )
    member = None
    for h in range(n_hashes):
        hit = (
            F.coalesce(
                F.element_at(F.col("bm"), F.shiftright(F.col(f"idx{h}"), 5)),
                F.lit(0).cast("long"),
            ).bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(idx{h} % 32 AS INT))")
            )
            != 0
        )
        member = hit if member is None else (member & hit)
    audit = (
        p.withColumn("passed", member)
        .groupBy()
        .agg(
            F.count("*").cast("long").alias("n_probe"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0))
            .cast("long")
            .alias("n_pass_bloom"),
            F.sum(F.when(F.col("matched"), 1).otherwise(0))
            .cast("long")
            .alias("n_true_match"),
            F.sum(F.when(F.col("passed") & ~F.col("matched"), 1).otherwise(0))
            .cast("long")
            .alias("n_false_pos"),
            F.sum(F.when(F.col("matched") & ~F.col("passed"), 1).otherwise(0))
            .cast("long")
            .alias("false_negatives"),
            F.min("bits_set").alias("bits_set"),
        )
    )
    return (
        audit.crossJoin(F.broadcast(nkeys_row))
        .select(
            "n_keys",
            "bits_set",
            ratio_round(F.col("bits_set"), F.lit(m_bits), 6).alias("fill_ratio"),
            "n_probe",
            "n_pass_bloom",
            "n_true_match",
            "n_false_pos",
            "false_negatives",
            ratio_round(
                F.col("n_false_pos"),
                F.greatest(F.col("n_probe") - F.col("n_true_match"), F.lit(1)),
                6,
            ).alias("fpr"),
        )
    )


BLOOM_SWEEP_CONFIGS = (
    (1024, 3),
    (4096, 3),   # the production default
    (4096, 5),
    (16384, 3),
    (16384, 5),
)


def bloom_parameter_sweep(
    orders: DataFrame,
    customer: DataFrame,
    configs: tuple[tuple[int, int], ...] = BLOOM_SWEEP_CONFIGS,
) -> DataFrame:
    """Bloom sizing sweep: the full pruning audit at several (m_bits,
    n_hashes) configurations side by side — measured fill ratio, pass
    rate, and exact FPR per config, on THIS workload's key and probe
    distributions. The planner-tier answer to "is the filter sized
    right": the analytic FPR formula assumes ideal hashing and uniform
    probes, and the whole point of the audited operator is to replace
    that assumption with a measurement. Each config genuinely re-probes
    (bit indexes depend on m), so cost is |configs| audit passes — the
    price of measuring, run at planning time, not per-query.
    """
    out = None
    for m_bits, n_hashes in configs:
        row = bloom_prefilter_join(orders, customer, m_bits, n_hashes).select(
            F.lit(m_bits).cast("long").alias("m_bits"),
            F.lit(n_hashes).cast("long").alias("n_hashes"),
            "*",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("m_bits", "n_hashes")
