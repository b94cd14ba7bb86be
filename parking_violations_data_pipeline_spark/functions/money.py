"""Exact money aggregation via fixed-point integers (SURVEY.md §5).

Sums of double PRODUCTS (price × (1-discount) …) carry 4+ fractional
digits and genuinely land on half-cent boundaries, where the two
engines' summation order rounds a final `round(sum, 2)` differently
(measured: 1-in-~10⁴ group aggregates flip by a cent). Raw 2-decimal
money columns are safe — their double sums never sit on a .005
boundary — but every summed product goes through these helpers.

Strategy (round-2, measured faster than DECIMAL multiply+sum): the
fixture money columns are exactly 2-decimal, so

    price×(1-disc)        ≡ cents · (100 − disc_pct)      (1e-4 $ units)
    price×(1-disc)×(1+tax) ≡ cents · (100−d) · (100+t)    (1e-6 $ units)

are EXACT int64 products (≤ ~1.2e11 per row — whole-stage-codegen
integer multiplies, no decimal scale management).

Accumulation (round-5, measured 26% faster than the round-2
DECIMAL(38,0) sum on q1 at sf0.1): each unit value splits into
q = u div 1e6 and r = u mod 1e6, summed as TWO plain int64 sums
(codegen integer adds, map-side combined); the single decimal
reconstruction Σq·1e6 + Σr runs once per GROUP, not per row. The
split keeps exactness AND headroom: per-row q ≤ 1.13e5 and r < 1e6,
so the int64 partials wrap only past ~9.2e12 rows in ONE group —
~64× above a 100 TB lineitem's hottest q1 group (1.4e11 rows); under
Spark 4 ANSI mode an overflow would throw, not wrap silently. The
div is computed as (u − u%M)/M so the double division is exact (the
numerator is a multiple of M and the quotient < 2^53); a plain u/M
double divide could round up across an integer boundary and break
q·M + r == u. The final divide/round runs once per group. The oracle
mirrors the same values via its own DECIMAL arithmetic — both sides
are exact, so they agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pct100(col: str | Column) -> Column:
    """Exact ×100 integer of a 2-decimal double (0.06 → 6)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_price(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price × (1-discount) as a double — per-row value (exact via the
    1e-4-dollar integer grid)."""
    return (_pct100(ext) * (F.lit(100) - _pct100(disc))) / 10000.0


_SPLIT_M = 1_000_000


def _split_sum(units: Column) -> Column:
    """Σ units as an exact integer-valued DECIMAL via two int64 sums
    (q = u div 1e6 map-side, r = u mod 1e6), reconstructed once per
    group — the module-docstring scheme. `units` must be a nonnegative
    int64 expression with per-row values < 2^53."""
    r = units % _SPLIT_M
    q = ((units - r) / _SPLIT_M).cast("long")
    return F.sum(q).cast("decimal(38,0)") * _SPLIT_M + F.sum(r)


def sum_disc_price(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """round(Σ price×(1-disc), 2) as double, engine-exact: int64
    product rows → split hi/lo long sums → one exact decimal
    reconstruction + divide per group."""
    units = _pct100(ext) * (F.lit(100) - _pct100(disc))
    return F.round(_split_sum(units) / 10000, 2).cast("double")


def disc_units(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """price × (1-discount) in exact 1e-4-dollar int64 units — the
    per-row building block for conditional sums (market share, promo
    ratio) where the CASE arm must wrap the unit value, not the sum."""
    return _pct100(ext) * (F.lit(100) - _pct100(disc))


def sum_ext_times_disc(ext: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """round(Σ price×discount, 2) as double (TPC-H Q6 revenue shape),
    engine-exact on the same 1e-4-dollar integer grid."""
    units = _pct100(ext) * _pct100(disc)
    return F.round(_split_sum(units) / 10000, 2).cast("double")


def sum_charge(
    ext: str = "l_extendedprice", disc: str = "l_discount", tax: str = "l_tax"
) -> Column:
    """round(Σ price×(1-disc)×(1+tax), 2) as double — 1e-6-dollar
    integer grid, same scheme."""
    units = (
        _pct100(ext) * (F.lit(100) - _pct100(disc)) * (F.lit(100) + _pct100(tax))
    )
    return F.round(_split_sum(units) / 1000000, 2).cast("double")
