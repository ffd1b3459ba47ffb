"""Incremental upsert / SCD emulation without a lakehouse format.

The reference refreshes tables only by TRUNCATE+reload (SURVEY.md op 5).
A production warehouse also needs incremental merge; without Delta/Iceberg
jars (not in this image), MERGE INTO is emulated with the classic
anti-join + union (SCD type 1) and a validity-interval rewrite (SCD type 2)
— pure DataFrame ops, shuffle only on the business key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd1_upsert(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Type-1 merge: updates win; unmatched current rows survive.
    ``updates ∪ (current ⟕̸ updates)`` — one shuffle on the key."""
    survivors = current.join(updates.select(key), key, "left_anti")
    return updates.unionByName(survivors)


def scd2_upsert(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    ts_col: str = "change_ts",
) -> DataFrame:
    """Type-2 merge: close the open interval of changed keys
    (valid_to ← change_ts) and append the new open-interval versions.

    ``current`` carries (key, attrs..., valid_from, valid_to[null=open]);
    ``updates`` carries (key, attrs..., change_ts).

    ``updates`` is deduplicated to one row per key (latest ``change_ts``
    wins) before merging — duplicate update keys would otherwise fan out
    the close-interval join and corrupt the history with multiple valid_to
    versions per open row. Determinism: equal-``change_ts`` ties break on
    every remaining attribute (ascending), so the surviving version is the
    same across runs/re-planning — not an arbitrary partition-order pick.
    """
    from pyspark.sql import Window

    tie_break = [F.col(c) for c in updates.columns if c not in (key, ts_col)]
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), *tie_break)
    updates = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upd_keys = updates.select(key, F.col(ts_col))
    closed = (
        current.join(F.broadcast(upd_keys), key, "inner")
        .filter(F.col(end_col).isNull())
        .withColumn(end_col, F.col(ts_col))
        .drop(ts_col)
    )
    untouched = current.join(upd_keys.select(key), key, "left_anti")
    still_closed = (
        current.filter(F.col(end_col).isNotNull())
        .join(upd_keys.select(key), key, "left_semi")
    )
    new_versions = (
        updates.withColumnRenamed(ts_col, effective_col)
        .withColumn(end_col, F.lit(None).cast("timestamp"))
    )
    return untouched.unionByName(still_closed).unionByName(closed).unionByName(new_versions)


def as_of_snapshot(history: DataFrame, ts, effective_col: str = "valid_from",
                   end_col: str = "valid_to") -> DataFrame:
    """Point-in-time view of an SCD2 history table: the version of each key
    whose validity interval covers ``ts`` (valid_from ≤ ts < valid_to, open
    intervals count). Pure filter — partition pruning applies when the
    history is laid out by validity date, so a snapshot never scans versions
    retired long before ``ts``."""
    return history.filter(
        (F.col(effective_col) <= F.lit(ts))
        & (F.col(end_col).isNull() | (F.col(end_col) > F.lit(ts)))
    )
