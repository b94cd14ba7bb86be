"""Decimal-exact money aggregation (SURVEY.md §5 hardening).

Sums of double PRODUCTS (price × (1-discount) …) carry 4+ fractional
digits and genuinely land on half-cent boundaries, where the two
engines' summation order rounds a final `round(sum, 2)` differently
(measured: 1-in-~10⁴ group aggregates flip by a cent). Raw 2-decimal
money columns are safe — their double sums never sit on a .005
boundary — but every summed product goes through these helpers:
multiply and accumulate in DECIMAL (exact, engine-independent), round,
and cast back to double. The oracle SQL mirrors the same casts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(15,6)")


def disc_price(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price × (1-discount), exact decimal — DECIMAL(31,12)."""
    return _dec(ext) * (F.lit(1) - _dec(disc))


def sum_disc_price(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """round(Σ price×(1-disc), 2) as double, engine-exact."""
    return F.round(F.sum(disc_price(ext, disc)), 2).cast("double")


def sum_charge(
    ext: str = "l_extendedprice", disc: str = "l_discount", tax: str = "l_tax"
) -> Column:
    """round(Σ price×(1-disc)×(1+tax), 2) as double; the 3-way product
    is re-quantized to DECIMAL(18,6) between multiplies so neither
    engine hits its 38-digit width cap (where rounding behavior would
    diverge)."""
    d6 = disc_price(ext, disc).cast("decimal(18,6)")
    return F.round(F.sum(d6 * (F.lit(1) + _dec(tax))), 2).cast("double")
