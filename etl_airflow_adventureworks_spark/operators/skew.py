"""Skew-aware join utilities (100 TB posture; SURVEY.md §4).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime. ``salted_join`` is the
explicit fallback for pathological hot keys (one key ≫ a partition): the
left (large) side salts each row into ``n_salts`` sub-keys; the right side
replicates each row across all salts. The join key becomes (key, salt) —
the hot key's rows spread over ``n_salts`` reducers.

Cost model: replicates the RIGHT side ×n_salts, so use it when right is
small-but-above-broadcast-threshold and left is skewed. If right fits a
broadcast there is no shuffle to skew — prefer ``F.broadcast``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated.

    Returns the same rows as ``left.join(right, left[k]==right[k], how)``
    (verified in tests); supports inner and left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_right = right.select("*", salts)
    cond: Column = (salted_left[left_key] == replicated_right[right_key]) & (
        salted_left["__salt"] == replicated_right["__salt"]
    )
    return (
        salted_left.join(replicated_right, cond, how)
        .drop(salted_left["__salt"])
        .drop(replicated_right["__salt"])
    )
