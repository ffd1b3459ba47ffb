"""CSV source (SURVEY.md §2 op 1) with pandas-compatible null semantics.

Reference: ``pd.read_csv(f'{DATA_PATH}/<Table>.csv', sep=',')`` with inferred
dtypes (dags/etl_dim_produto.py:14-16). pandas turns BOTH unquoted-empty and
quoted ``""`` fields into NaN; Spark's CSV reader by default keeps quoted
``""`` as empty string. ``read_csv_columns`` normalizes empties to NULL and
applies an explicit per-column cast — no schema inference nondeterminism
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_columns(
    spark: SparkSession,
    path: str,
    columns: dict[str, str],
) -> DataFrame:
    """Read a headered CSV selecting+casting ``columns`` ({name: spark_type}).

    Reads everything as string first (robust to wide files with irrelevant
    columns), normalizes '' → NULL (pandas NaN parity), then casts. Catalyst
    prunes the unselected columns before parsing where the CSV datasource
    supports it.
    """
    raw = spark.read.option("header", True).option("multiLine", True).csv(path)
    cols = []
    for name, dtype in columns.items():
        c = F.col(name)
        c = F.when(c == "", None).otherwise(c)
        cols.append(c.cast(dtype).alias(name))
    return raw.select(*cols)
