"""Reusable column-expression helpers (SURVEY.md §2.7 F1-F7 + vector math).

Everything here is built-in JVM expressions — no Python UDFs. The vector
helpers use higher-order array functions (zip_with/aggregate/transform) which
stay row-local: a 10k-dim dot product never explodes rows or shuffles.

Cross-engine determinism: float addition is not associative, so anything
summed across rows or along an array that must hash-match the DuckDB oracle
is accumulated in DECIMAL (exact) and cast back to DOUBLE at the end.
Per-element IEEE double multiplication is bit-deterministic in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Fixed-point scale for exact accumulation of double-valued terms: per-term
# doubles are scaled, rounded to integers and summed as LONG — exact,
# order-independent, and identical in any engine. 1e15 keeps |64 terms| well
# under 2^63 for unit-magnitude embeddings while preserving 15 decimal digits.
FIXED_POINT_SCALE = 1e15


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Split to non-empty tokens. Matches DuckDB string_split + list_filter."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, sep), lambda t: t != F.lit(""))


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """All word n-grams of a token array, in order, duplicates kept.

    Zip-of-shifted-slices spelling: zip the array with its own 1..n-1
    shifted tails, drop the incomplete tail entries, concat each struct.
    The obvious ``transform(positions, i -> concat(element_at(toks, i)...))``
    is ~8x SLOWER: higher-order lambdas run interpreted with NO common-
    subexpression elimination, so the outer ``toks`` expression (the whole
    split+filter tokenize) re-evaluates for every element_at — O(doc^2)
    per document. Here every input is evaluated once per row and only the
    cheap concat lambda is interpreted (measured 4.6 s -> 0.55 s for the
    sf0.1 shingle explode). Docs with fewer than n tokens yield an empty
    array (every zip entry has a null tail and is filtered).
    """
    # slice length must stay int32-safe: start + 2^31-ish literals overflow
    # in the codegen path and silently produce empty slices — bound by the
    # actual array size instead (greatest(..,1): slice requires length >= 1;
    # a start past the end with positive length is an empty slice, which
    # zip-pads to null and gets filtered)
    sz = F.size(toks)
    parts = [toks.alias("t0")] + [
        F.slice(toks, j + 1, F.greatest(sz - j, F.lit(1))).alias(f"t{j}")
        for j in range(1, n)
    ]
    z = F.filter(
        F.arrays_zip(*parts), lambda s: s[f"t{n - 1}"].isNotNull()
    )
    return F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"t{j}"] for j in range(n)])
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (row-local)."""
    return F.array_distinct(word_ngrams(toks, n))


def _fixed(term: Column) -> Column:
    return F.round(term * F.lit(FIXED_POINT_SCALE), 0).cast("long")


def dot_exact(a: Column, b: Column) -> Column:
    """Order-independent dot product of two float arrays, as DOUBLE.

    Per-element products in IEEE double (deterministic), accumulated as
    fixed-point longs (exact). Row-local: no explode, no shuffle — on a
    100 TB corpus this keeps similarity scoring inside whole-stage codegen.
    """
    prods = F.zip_with(a, b, lambda x, y: _fixed(x.cast("double") * y.cast("double")))
    return F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, x: acc + x
    ).cast("double") / F.lit(FIXED_POINT_SCALE)


def norm_exact(a: Column) -> Column:
    """L2 norm with exact fixed-point accumulation of squared terms."""
    sq = F.transform(a, lambda x: _fixed(x.cast("double") * x.cast("double")))
    return F.sqrt(
        F.aggregate(sq, F.lit(0).cast("long"), lambda acc, x: acc + x).cast("double")
        / F.lit(FIXED_POINT_SCALE)
    )


def ratio_scaled(num: Column, den: Column, scale: int) -> Column:
    """round_half_up(num/den * 10^scale) as an exact LONG.

    The integer numerator behind ``ratio_round`` — useful when the scaled
    ratio itself is the decision value (e.g. an acceptance threshold
    compared against a hash bucket), where dividing back to a double and
    re-multiplying would reintroduce binary-representation ambiguity.
    """
    p = 10**scale
    a = num.cast("long") * F.lit(2 * p) + den.cast("long")
    b = den.cast("long") * F.lit(2)
    return ((a - a % b) / b).cast("long")  # exact integer division


def ratio_round(num: Column, den: Column, scale: int) -> Column:
    """Round-half-up of an integer ratio num/den, done in exact integer math.

    ``round()`` on a double is engine-ambiguous at decimal boundaries (Spark
    rounds the shortest decimal representation, DuckDB rounds the binary
    value), and integer ratios actually land on .xxx5 boundaries. Exact
    alternative: round_half_up(num/den, s) = (num*2*10^s + den) div (2*den),
    all in longs; the trailing /10^s is an exact-deterministic double op.
    Requires num*2*10^s < 2^53 and nonnegative inputs.
    """
    p = 10**scale
    a = num.cast("long") * F.lit(2 * p) + den.cast("long")
    b = den.cast("long") * F.lit(2)
    q = (a - a % b).cast("double") / b.cast("double")  # exact integer division
    return q / F.lit(float(p))


def dec_floordiv(a: Column, b: Column) -> Column:
    """Exact floor division of nonnegative DECIMAL(38,0) operands.

    Spark's `div` on DECIMAL operands returns BIGINT and silently WRAPS
    past 2^63 (no ANSI error — CLAUDE.md wide-decimal rule), so wide
    floor division must be spelled ``(a - a % b) / b``: the numerator is
    an exact multiple of ``b``, the decimal divide is therefore lossless,
    and no step ever narrows to LONG. Result is DECIMAL (scale 6 under
    Spark's division typing); cast at the call site if a LONG is wanted
    and provably in range.
    """
    return (a - a % b) / b


def dec_ratio_round(num: Column, den: Column, scale: int) -> Column:
    """ratio_round's wide-decimal sibling: round-half-up of num/den at
    ``scale`` decimals, operands DECIMAL(38,0) (cast on entry), the
    identity (num*2*10^s + den) fdiv (2*den) evaluated via dec_floordiv
    so nothing narrows to LONG mid-computation. Exact while
    num*2*10^s < 10^38 and the QUOTIENT round(num/den, s)*10^s fits the
    final LONG cast (trivially true for percents/ratios of bounded
    range) — use this over ratio_round whenever num can pass 2^53
    (CLAUDE.md wide-decimal rule; DuckDB twins mirror in HUGEINT).
    Requires nonnegative inputs and den >= 1.
    """
    p = 10**scale
    d38 = "decimal(38,0)"
    n = num.cast(d38)
    d = den.cast(d38)
    a = n * F.lit(2 * p).cast(d38) + d
    q = dec_floordiv(a, d * F.lit(2).cast(d38))
    return q.cast("long").cast("double") / F.lit(float(p))


def int_sum_exact(arr: Column) -> Column:
    """Sum of an int-array (e.g. token lengths) as LONG."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))


def dec_to_double_exact(x: Column) -> Column:
    """DECIMAL(38,0) -> DOUBLE via base-10^15 digit split — deterministic
    across engines where a direct cast is NOT.

    DuckDB's wide-integer-to-double conversion (HUGEINT and DECIMAL paths
    both) is not correctly rounded for ~0.4% of values past 2^53
    (measured; e.g. -12833214174417642 converts 1 ulp off), so any oracle
    hash over a mean/ratio of a wide exact sum is a latent flip. This
    spelling only ever converts integers < 2^53 (each exact in ANY
    engine) and reconstructs with the same three IEEE ops on both sides:
    t1*1e30 + t2*1e15 + t3, left-associative. The result is within 1 ulp
    of correctly-rounded and — the property that matters — bit-identical
    in Spark and DuckDB. SQL twin: oracles._dec2d.
    """
    p = F.lit(10**15)
    t3 = (x % p).cast("long")
    x1 = ((x - x % p) / p).cast("decimal(38,0)")
    t2 = (x1 % p).cast("long")
    t1 = ((x1 - x1 % p) / p).cast("long")
    return (
        t1.cast("double") * F.lit(1e30)
        + t2.cast("double") * F.lit(1e15)
        + t3.cast("double")
    )
