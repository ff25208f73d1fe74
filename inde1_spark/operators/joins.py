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
