"""Exact-decimal money arithmetic (SURVEY.md §2 op 35).

Reference semantics: money is NUMERIC(18,2) ("Numeric é melhor para dinheiro
que Float", create_dw_tables.sql:62-64) and the fact metrics are
``valor_total = (UnitPrice*OrderQty)*(1-UnitPriceDiscount)`` and
``valor_desconto = (UnitPrice*OrderQty)*UnitPriceDiscount``
(dags/etl_fato_vendas.py:83,96).

Engine policy: compute money in DecimalType (exact, associative — a
distributed SUM over decimals is order-independent, unlike doubles whose
partial-aggregation order varies run to run), and cast to DOUBLE only at the
output boundary. This both matches the reference's NUMERIC intent and makes
results bit-identical to any other exact engine (the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: canonical money type, mirroring the reference DDL.
#:
#: Why not integer cents (≈5× faster locally)? A long-cents SUM overflows
#: int64 around 9.2e16 currency units — reachable at 100 TB row counts
#: (6e11 rows × 1e5 avg value × 1e4 sub-cent scale). Decimal sums widen to
#: 38 digits and stay exact AND order-independent at any scale; the 5×
#: constant on the aggregation input is dwarfed by scan+shuffle in real
#: deployments.
MONEY = "decimal(18,2)"


def money(c: Column | str) -> Column:
    """Cast a (double/string) column to the canonical money decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def net_amount(price: Column | str, discount: Column | str) -> Column:
    """``price * (1 - discount)`` in exact decimals (op 35 valor_total shape)."""
    return money(price) * (F.lit(1).cast(MONEY) - money(discount))


def discount_amount(price: Column | str, discount: Column | str) -> Column:
    """``price * discount`` in exact decimals (op 35 valor_desconto shape)."""
    return money(price) * money(discount)


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as DOUBLE (output-boundary convention)."""
    return F.sum(c).cast("double").alias(alias)


def davg(c: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal SUM / COUNT in double space.

    Both operands are bit-identical across engines, so the IEEE division is
    too; plain AVG over doubles would not be (accumulation order).
    """
    return (F.sum(c).cast("double") / F.count(F.lit(1))).alias(alias)
