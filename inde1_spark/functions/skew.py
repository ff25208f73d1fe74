"""Skew mitigation utilities: salted joins for hot keys.

AQE's skew-join handles most cases by splitting oversized partitions at
runtime (enabled in session.py). Salting is the explicit fallback for the
pathological case AQE can't fix: a broadcast-ineligible dimension joined on
a key where one value dominates (the classic hot-user / hot-shingle shape).

``salted_join``: the skewed (large) side gets a random-free deterministic
salt derived from a row id; the small side is replicated ``n_salts`` times
so every (key, salt) bucket finds its match. Equi-join on (key, salt)
spreads the hot key over ``n_salts`` reducers. Cost: small side x n_salts
rows — choose n_salts ~ (hot-key rows / target partition rows).

Determinism: the salt is ``pmod(xxhash64(row_id), n_salts)`` — stable
across runs for the same data (no rand()), so retried tasks and re-runs
produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, row_id: str, n_salts: int) -> DataFrame:
    """Attach a deterministic salt in [0, n_salts) derived from ``row_id``."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salts)))


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate every row once per salt value (the small-side expansion)."""
    return df.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    row_id: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` (skewed on ``on``) with ``small``, spreading hot keys
    over ``n_salts`` shuffle partitions."""
    left = with_salt(large, row_id, n_salts)
    right = replicate_salts(small, n_salts)
    return left.join(right, [on, "_salt"], how).drop("_salt")
