"""Shuffle-partitioning invariance: the exact-accumulation guarantee.

Every production query promises DETERMINISTIC output (DESIGN.md §3):
decimal/fixed-point sums, exact integer rounding, total orders. The one
thing local parity runs cannot see is accumulation-order sensitivity —
a float sum that happens to agree with DuckDB under 32 shuffle
partitions can disagree under any other partitioning (different
reduce-tree shape), which on a real cluster means the SAME query gives
DIFFERENT answers run-to-run. This module executes the full gate window
twice, under spark.sql.shuffle.partitions=32 and =7 (different
partition counts => different merge trees), and requires STRING-level
identical results.

Env-gated like the strict rehearsal (two sequential sessions with
different confs cannot share a pytest process with the suite session):

    SPARK_GRAFT_PARTITION_INVARIANCE=1 python -m pytest tests/test_partition_invariance.py -q
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN = os.environ.get("SPARK_GRAFT_PARTITION_INVARIANCE") == "1"
SF = os.environ.get("SPARK_GRAFT_INVARIANCE_SF", "/root/testdata/sf0.001")
# which queries() slice to sweep: "start:stop" (python slice semantics,
# empty stop = end). Default = the driver's gate window.
RANGE = os.environ.get("SPARK_GRAFT_INVARIANCE_RANGE", "0:50")
# "production" (queries, default) or "staged" (staged_queries) — the
# pre-promotion invariance pin of the staged five-pin checklist.
SURFACE = os.environ.get("SPARK_GRAFT_INVARIANCE_SURFACE", "production")

pytestmark = pytest.mark.skipif(
    not RUN,
    reason="partition-invariance sweep runs standalone: "
    "SPARK_GRAFT_PARTITION_INVARIANCE=1 pytest tests/test_partition_invariance.py",
)


def _norm(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _run_window(n_partitions: int) -> dict:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from inde1_spark.operators.dedup import release_persisted

    s = (
        SparkSession.builder.master("local[8]")
        .appName(f"invariance-{n_partitions}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(n_partitions))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    try:
        Q = (
            entrymod.staged_queries()
            if SURFACE == "staged"
            else entrymod.queries()
        )
        start_s, _, stop_s = RANGE.partition(":")
        names = list(Q)[
            int(start_s) if start_s else 0 : int(stop_s) if stop_s else None
        ]
        out = {}
        for name in names:
            out[name] = _norm(Q[name](s, SF).toPandas())
            release_persisted()
        return out
    finally:
        s.stop()


@pytest.mark.slow
def test_window_results_invariant_to_shuffle_partitioning():
    a = _run_window(32)
    b = _run_window(7)
    diffs = []
    for name in a:
        pa, pb = a[name], b[name]
        if pa.shape != pb.shape or list(pa.columns) != list(pb.columns):
            diffs.append(f"{name}: shape {pa.shape} vs {pb.shape}")
            continue
        for c in pa.columns:
            cells = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(pa[c].tolist(), pb[c].tolist()))
                if str(x) != str(y)
            ]
            if cells:
                diffs.append(
                    f"{name}.{c}: {len(cells)} cells differ between "
                    f"partitions=32 and partitions=7; first: row "
                    f"{cells[0][0]}: {cells[0][1]!r} != {cells[0][2]!r}"
                )
    assert not diffs, "accumulation-order sensitivity detected:\n" + "\n".join(
        diffs
    )
