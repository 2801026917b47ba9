"""Deterministic float canonicalization for the gated driver entries.

Why this module exists: the driver's correctness gate hashes entry
output values exactly, and compares a Spark run against a DuckDB
oracle.  Two sources of last-ulp divergence make a naive
``round(sum(double), 4)`` non-deterministic there:

1. **Partial-sum order.**  Spark merges per-partition partial sums in
   whatever order tasks finish, so ``sum(DOUBLE)`` changes at the last
   ulp with the shuffle-partition count.  When the true value sits on
   a round-half boundary (the ``events.value`` column is 2-decimal
   data, so averages like ``371.99 / 8 = 46.49875`` are EXACT ties at
   4 decimals), that ulp decides the rounded digit — the gate flaps
   run to run (observed: ``rollup_avg`` 46.4988 vs 46.4987 flipping
   with ``spark.sql.shuffle.partitions`` alone).
2. **Cross-engine rounding of doubles.**  Spark's ``round`` feeds the
   double's *shortest decimal representation* to ``BigDecimal`` and
   rounds HALF_UP; DuckDB multiplies by ``10^d`` and nearbyints.  For
   a rational that is exactly a tie (whose nearest double is just
   below it but whose shortest repr lands ON it), the two disagree —
   statically.

The fix is to keep aggregation exact for as long as possible and to
make the final inexact step *bit-identical* in both engines:

* sums are taken over ``DECIMAL(18,6)`` (exact, associative, hence
  order-independent; 18 digits keeps products within both engines'
  38-digit cap) and rounded in decimal space, where both engines
  define HALF_UP / half-away-from-zero identically;
* ratios (averages, per-bucket scripts) are rounded via
  ``floor((2*num*10^d + den) / (2*den)) / 10^d`` computed in IEEE
  doubles from exact operands — both engines execute the identical
  operation sequence on identical operands, so the result is bitwise
  identical even when the true ratio is exactly on a tie.

Every emitter returns a SQL string valid in BOTH dialects (Spark SQL
via ``F.expr``; DuckDB verbatim), so one string serves entry and
oracle — there is nothing to keep in sync by hand.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: exact-sum element type: wide enough for 10^12-row sums of
#: O(100)-magnitude values, narrow enough that a product of two stays
#: within the 38-digit decimal cap of both engines.
DEC = "DECIMAL(18,6)"


def dec_sql(expr: str) -> str:
    """Exact-decimal cast of a (double) expression."""
    return f"CAST(({expr}) AS {DEC})"


def sum_dec_sql(expr: str) -> str:
    """Order-independent exact sum of a double expression."""
    return f"sum({dec_sql(expr)})"


def sum_round_sql(expr: str, digits: int = 4) -> str:
    """``round(sum(x), digits)`` made deterministic: exact decimal
    sum, decimal-space rounding (HALF_UP in both engines), then a
    correctly-rounded cast to double."""
    return f"CAST(round({sum_dec_sql(expr)}, {digits}) AS DOUBLE)"


def ratio_round_sql(num: str, den: str, digits: int = 4) -> str:
    """``round(num / den, digits)`` made engine-deterministic for
    non-negative ``num``: HALF_UP via floor((2*num*10^d + den)/(2*den)),
    evaluated in IEEE doubles.  Both engines run the identical op
    sequence on identical operands, so the output is bit-identical —
    including on exact ties, where a plain ``round(double)`` diverges
    between Spark (shortest-repr HALF_UP) and DuckDB (scale-and-nearbyint).
    """
    # NB: exponent-notation literals (2e0, 1e4) are DOUBLE in both
    # dialects; `2.0`-style literals parse as DECIMAL in Spark SQL and
    # would silently switch the arithmetic (and the output type).
    return (
        f"(floor((2e0 * CAST(({num}) AS DOUBLE) * 1e{digits}"
        f" + CAST(({den}) AS DOUBLE))"
        f" / (2e0 * CAST(({den}) AS DOUBLE))) / 1e{digits})"
    )


def avg_round_sql(expr: str, n: str = "count(*)", digits: int = 4) -> str:
    """``round(avg(x), digits)``: exact decimal sum divided by an
    exact count, rounded via the deterministic ratio trick."""
    return ratio_round_sql(f"CAST({sum_dec_sql(expr)} AS DOUBLE)", n, digits)


def round_det_sql(expr: str, digits: int = 4) -> str:
    """``round(x, digits)`` for a DOUBLE expression, made
    engine-deterministic: ``floor(x * 10^d + 0.5) / 10^d`` evaluated
    in IEEE doubles.  Both engines run the identical op sequence on
    the identical double, so the result is bitwise identical — where
    a native ``round(double)`` diverges on representation ties
    (Spark: shortest-decimal-repr HALF_UP via BigDecimal; DuckDB:
    scale-and-nearbyint, with tie behavior that has shifted across
    DuckDB releases).  Driver-gate root cause: ``agg_terms_topn``
    failed the r03/r04 value hash while bitwise-green on local DuckDB
    1.0.0 — the only mechanism left was version-dependent ``round``
    ties, which this form removes entirely.

    Semantics: half-toward-+inf (not half-away-from-zero) for
    negative inputs — identically in both dialects, which is all the
    gate needs.  Finite inputs only (floor(NaN) is 0-as-long in
    Spark but NaN in DuckDB); every gated score is finite by
    construction.  Do NOT use on DECIMAL inputs — decimal→double
    conversion is not guaranteed correctly rounded in DuckDB; native
    ``round`` on DECIMAL is already exact and deterministic.
    """
    return (
        f"(floor(CAST(({expr}) AS DOUBLE) * 1e{digits} + 5e-1)"
        f" / 1e{digits})"
    )


# ---------------------------------------------------------------------------
# Spark Column wrappers (same semantics, for DataFrame-side call sites)
# ---------------------------------------------------------------------------

def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sum_dec(col: str | Column) -> Column:
    """Exact, order-independent sum of a double column."""
    return F.sum(_c(col).cast(DEC))


def sum_round(col: str | Column, digits: int = 4) -> Column:
    """Deterministic ``round(sum(x), digits)`` as a double column."""
    return F.round(sum_dec(col), digits).cast("double")


def ratio_round(num: Column, den: Column, digits: int = 4) -> Column:
    """Deterministic ``round(num/den, digits)`` (non-negative num):
    the same floor((2*num*10^d + den)/(2*den))/10^d sequence the SQL
    emitter produces, so Spark and DuckDB agree bitwise."""
    p = float(10 ** digits)
    num_d = num.cast("double")
    den_d = den.cast("double")
    q = (num_d * F.lit(2.0) * F.lit(p) + den_d) / (F.lit(2.0) * den_d)
    # Spark floor(double) -> LONG; the final divide restores double.
    return (F.floor(q) / F.lit(p)).alias("r")


def avg_round(col: str | Column, n: Column | None = None,
              digits: int = 4) -> Column:
    """Deterministic ``round(avg(x), digits)`` for a double column."""
    den = F.count("*") if n is None else n
    return ratio_round(sum_dec(col).cast("double"), den, digits)


def round_det(col: str | Column, digits: int = 4) -> Column:
    """Column twin of :func:`round_det_sql` — the same
    floor(x*10^d + 0.5)/10^d IEEE sequence (Spark ``floor(double)``
    yields LONG; the final divide restores double, bit-identical to
    DuckDB's double/double).  Finite DOUBLE inputs only."""
    p = float(10 ** digits)
    return F.floor(_c(col).cast("double") * F.lit(p) + F.lit(0.5)) / F.lit(p)
