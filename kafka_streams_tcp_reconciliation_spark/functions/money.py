"""Exact-integer money arithmetic for cross-engine-deterministic sums.

Why this exists: revenue expressions like ``l_extendedprice *
(1 - l_discount)`` live on a 10⁻⁴-dollar grid (both factors are
2-decimal), so a per-group SUM can land EXACTLY on a half-cent rounding
boundary (…0.0050). At that point ``round(sum(double), 2)`` is decided
by float artifacts twice over:

1. the last-ulp error of the sum depends on association order, which
   differs between Spark's partial/final aggregation and DuckDB's (and
   between cluster layouts — a retry or repartition can change it); and
2. the engines round the SAME double differently at boundaries (Spark
   rounds the shortest decimal representation HALF_UP, DuckDB rounds
   the binary value),

which flipped one part of ``q11_important_parts`` by a cent at sf0.1.
The fix is to never let a float reach a SUM, a comparison, or a round:
quantize the 2-decimal factors to exact BIGINT (``round(x·100)``
absorbs the ≤1e-9 parquet representation error), sum integers (exact
and commutative in any order on any engine), compare integers, and
round to display cents in integer arithmetic. The single remaining
float op — dividing the final integer by a power of ten for display —
is bit-identical everywhere.

Residual float rounding in the codebase is confined to provably-safe
cases: sums of cent-grid values rounded to cents (the true value cannot
sit on a boundary), window-frame sums (both engines add in the same
frame order), and continuous-valued columns (boundary probability ~0).

Scale note: BIGINT 10⁻⁴-dollar units cap at ~9·10¹⁴ dollars and
10⁻⁶ units at ~9·10¹² — sum headroom for any realistic corpus; widen
the SUM (not the per-row units) to DECIMAL(38,0)/HUGEINT where a
100 TB total could approach that, as ``q11_important_parts`` does for
its threshold product.
"""

from __future__ import annotations


def cents(expr: str) -> str:
    """Exact cents of a 2-decimal column/expression (valid in BOTH Spark
    SQL and DuckDB — keep it dialect-neutral)."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def rev_units(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """price · (1 − disc) in exact 10⁻⁴-dollar units (dialect-neutral)."""
    return f"{cents(price)} * {cents(f'1 - {disc}')}"


def disc_rev_units(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """price · disc in exact 10⁻⁴-dollar units (dialect-neutral)."""
    return f"{cents(price)} * {cents(disc)}"


def charge_units(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    tax: str = "l_tax",
) -> str:
    """price · (1 − disc) · (1 + tax) in exact 10⁻⁶-dollar units."""
    return f"{rev_units(price, disc)} * {cents(f'1 + {tax}')}"


def spark_money2(units: str, unit_scale: int) -> str:
    """Spark SQL: display a units sum as dollars rounded to cents with
    integer HALF_UP — ``unit_scale`` = units per cent (100 for 10⁻⁴
    units, 10000 for 10⁻⁶ units, 1 for cents)."""
    if unit_scale == 1:
        return f"CAST({units} AS DOUBLE) / 100.0"
    return (
        f"CAST((({units}) + {unit_scale // 2}) DIV {unit_scale} AS DOUBLE) / 100.0"
    )


def duck_money2(units: str, unit_scale: int) -> str:
    """DuckDB: same integer HALF_UP display conversion (`//` floors like
    Spark's DIV truncates — identical on the non-negative sums here)."""
    if unit_scale == 1:
        return f"CAST({units} AS DOUBLE) / 100.0"
    return (
        f"CAST((({units}) + {unit_scale // 2}) // {unit_scale} AS DOUBLE) / 100.0"
    )


def spark_money2_signed(units: str, unit_scale: int) -> str:
    """Sign-safe variant for sums that can be NEGATIVE (e.g. profit):
    HALF_UP away from zero via abs/sign, because Spark's DIV truncates
    toward zero while DuckDB's // floors — they disagree on negatives,
    so both dialects divide the non-negative magnitude only."""
    half = unit_scale // 2
    return (
        f"CAST(CAST(sign({units}) AS BIGINT)"
        f" * ((abs({units}) + {half}) DIV {unit_scale}) AS DOUBLE) / 100.0"
    )


def duck_money2_signed(units: str, unit_scale: int) -> str:
    half = unit_scale // 2
    return (
        f"CAST(CAST(sign({units}) AS BIGINT)"
        f" * ((abs({units}) + {half}) // {unit_scale}) AS DOUBLE) / 100.0"
    )
