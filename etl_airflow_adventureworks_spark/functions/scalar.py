"""Scalar/expression layer (SURVEY.md §2 ops 28-34, 36).

Every reference Python lambda lifts to a native Catalyst expression — zero
Python UDFs (SURVEY.md §2.8 policy). Citations are to the reference files
whose semantics each function re-expresses.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

#: pt-BR month names — data, not locale (dags/etl_dim_tempo.py:30-35; NOT
#: date_format('MMMM') which is locale-dependent, SURVEY.md op 33).
MONTH_NAMES_PT = {
    1: "Janeiro",
    2: "Fevereiro",
    3: "Março",
    4: "Abril",
    5: "Maio",
    6: "Junho",
    7: "Julho",
    8: "Agosto",
    9: "Setembro",
    10: "Outubro",
    11: "Novembro",
    12: "Dezembro",
}


def month_name_pt(month: Column) -> Column:
    """Dict-map month→pt-BR name (op 33, dags/etl_dim_tempo.py:30-35)."""
    mapping = F.create_map(*[F.lit(x) for kv in MONTH_NAMES_PT.items() for x in kv])
    return mapping[month]


def semester(month: Column) -> Column:
    """1 if month<=6 else 2 (op 32, dags/etl_dim_tempo.py:27) — native CASE."""
    return F.when(month <= 6, F.lit(1)).otherwise(F.lit(2))


def yyyymmdd_key(d: Column) -> Column:
    """Smart date key ano*10000+mes*100+dia as INT (op 34,
    dags/etl_dim_tempo.py:39-43, dags/etl_fato_vendas.py:35-39)."""
    return (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).cast("int")


def full_name(*parts: Column, sep: str = " ") -> Column:
    """Trimmed multi-part name concat (op 29, dags/etl_dim_cliente.py:28,
    dags/etl_dim_vendedor.py:42-46).

    ``concat_ws`` skips NULL parts, which reproduces the reference's
    fillna('') + collapse-double-space intent; a final regexp collapse
    guards against empty-string (not NULL) middle names.
    """
    return F.trim(F.regexp_replace(F.concat_ws(sep, *parts), " +", " "))


def classify_nullable(flag: Column, if_present: str, if_absent: str) -> Column:
    """Row-wise conditional lifted from a pandas .apply lambda (op 13,
    dags/etl_dim_cliente.py:35: 'Individual' if notnull else 'Store')."""
    return F.when(flag.isNotNull(), F.lit(if_present)).otherwise(F.lit(if_absent))


def default_if_empty(c: Column, default: str) -> Column:
    """Conditional update of empty-string values (op 12,
    dags/etl_dim_cliente.py:31)."""
    return F.when(c == "", F.lit(default)).otherwise(c)


def surrogate_key(*order_by: Column | str) -> Column:
    """Deterministic surrogate key: row_number over an explicit total order
    (op 36). Replaces Postgres SERIAL (create_dw_tables.sql:15,25,33,42,51),
    whose insert-order semantics are meaningless distributed; a business-key
    ordering makes keys reproducible and oracle-matchable.

    Note: a global row_number is a single-partition sort — fine for
    dimension tables (≤ millions of rows); for billion-row fact keys use
    ``zip_with_index``-style per-partition offsets or
    ``monotonically_increasing_id`` instead (uniqueness without ordering).
    """
    return F.row_number().over(Window.orderBy(*order_by)).cast("long")
