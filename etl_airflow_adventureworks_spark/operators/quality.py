"""Declarative data-quality expectations over a DataFrame.

The validation gate an ingest pipeline runs before data is admitted:
null checks, domain/range checks, pattern checks, key uniqueness and
referential integrity — declared as a list of check specs and compiled
into the MINIMUM number of Spark jobs:

- every row-local check (not_null / in_range / in_set / matches) becomes
  one ``SUM(CASE WHEN violated)`` column of a SINGLE aggregate over ONE
  scan — adding a tenth check adds a codegen'd expression, not a pass;
- ``unique`` folds its ``count - countDistinct(keys)`` into that same
  aggregate (Catalyst's distinct-aggregate Expand rewrite — still one
  scan of the input);
- each ``foreign_key`` is one broadcast anti-join against the DISTINCT
  reference keys (dims are broadcast-sized; the fact side is never
  shuffled).

Row-level quarantine (`split_valid`) re-uses the same predicates to
split the frame into admitted rows and offenders tagged with the list
of checks they fail — duplicates and FK misses join back on
collision-sized key sets only.

The reference pipeline's implicit quality rules (`dag_etl_*.py`'s
dropna on FK columns before joins, the RI its star schema assumes) are
what these checks make explicit and auditable; no reference file
implements a validation engine. DuckDB-parity-tested per check kind in
``tests/test_quality.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ROW_LOCAL = ("not_null", "in_range", "in_set", "matches", "expression")


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col}


def in_range(col: str, lo=None, hi=None) -> dict:
    """Violated when the value falls outside [lo, hi] (either bound may
    be open). NULLs never violate a range check — declare `not_null`
    separately, so each report row isolates one failure mode."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    return {"kind": "in_range", "col": col, "lo": lo, "hi": hi}


def in_set(col: str, values) -> dict:
    return {"kind": "in_set", "col": col, "values": list(values)}


def matches(col: str, pattern: str) -> dict:
    """Violated when a NON-NULL value does not fully match ``pattern``
    (Spark ``rlike`` semantics — anchor with ^$ for full match)."""
    return {"kind": "matches", "col": col, "pattern": pattern}


def expression(name: str, predicate: str) -> dict:
    """Violated when the SQL ``predicate`` is false for a row (NULL
    predicate counts as violated — an undecidable expectation fails)."""
    return {"kind": "expression", "col": name, "predicate": predicate}


def unique(*cols: str) -> dict:
    if not cols:
        raise ValueError("unique needs at least one column")
    return {"kind": "unique", "cols": list(cols)}


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> dict:
    """Violated when a NON-NULL value has no match in ``ref[ref_col]``
    (SQL FK semantics: NULL FKs are legal; add `not_null` to forbid)."""
    return {"kind": "foreign_key", "col": col, "ref": ref, "ref_col": ref_col}


def _check_name(c: dict) -> str:
    if c["kind"] == "unique":
        return f"unique({','.join(c['cols'])})"
    if c["kind"] == "foreign_key":
        return f"foreign_key({c['col']}->{c['ref_col']})"
    return f"{c['kind']}({c['col']})"


def _violation_pred(c: dict) -> Column:
    """Row-local checks only: a boolean column, true when the row
    violates the check."""
    kind = c["kind"]
    if kind == "not_null":
        return F.col(c["col"]).isNull()
    if kind == "in_range":
        # .get(): raw dict specs (e.g. the CLI's JSON) may omit a bound
        if c.get("lo") is None and c.get("hi") is None:
            raise ValueError(f"in_range({c['col']}) needs at least one bound")
        col, out = F.col(c["col"]), F.lit(False)
        if c.get("lo") is not None:
            out = out | (col < F.lit(c["lo"]))
        if c.get("hi") is not None:
            out = out | (col > F.lit(c["hi"]))
        return F.coalesce(out, F.lit(False))
    if kind == "in_set":
        return F.coalesce(~F.col(c["col"]).isin(c["values"]), F.lit(False))
    if kind == "matches":
        return F.coalesce(~F.col(c["col"]).rlike(c["pattern"]), F.lit(False))
    if kind == "expression":
        return ~F.coalesce(F.expr(c["predicate"]), F.lit(False))
    raise ValueError(f"not a row-local check: {kind}")


def validate(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Run every check; return a report frame
    ``(check, violations, n_rows, passed)``, one row per declared check
    in declaration order.

    Job count: 1 aggregate for ALL row-local + unique checks together,
    plus one broadcast anti-join count per foreign_key. The only
    ``collect`` is the single aggregate row (constant-size)."""
    spark = df.sparkSession
    aggs, slots = [], []
    for i, c in enumerate(checks):
        if c["kind"] in _ROW_LOCAL:
            aggs.append(
                F.sum(_violation_pred(c).cast("long")).alias(f"v{i}")
            )
            slots.append((i, f"v{i}"))
        elif c["kind"] == "unique":
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(x) for x in c["cols"]]))
                .alias(f"v{i}")
            )
            slots.append((i, f"v{i}"))
        elif c["kind"] != "foreign_key":
            raise ValueError(f"unknown check kind: {c['kind']!r}")
    aggs.append(F.count(F.lit(1)).alias("_n"))
    row = df.agg(*aggs).first()
    n_rows = row["_n"]

    counts: dict[int, int] = {i: int(row[slot] or 0) for i, slot in slots}
    for i, c in enumerate(checks):
        if c["kind"] == "foreign_key":
            keys = c["ref"].select(F.col(c["ref_col"]).alias(c["col"])).distinct()
            counts[i] = (
                df.filter(F.col(c["col"]).isNotNull())
                .join(F.broadcast(keys), c["col"], "left_anti")
                .count()
            )
    return spark.createDataFrame(
        [
            (_check_name(c), counts[i], n_rows, counts[i] == 0)
            for i, c in enumerate(checks)
        ],
        "check string, violations long, n_rows long, passed boolean",
    )


def split_valid(df: DataFrame, checks: list[dict]) -> tuple[DataFrame, DataFrame]:
    """(good, bad): ``bad`` carries a ``_failed array<string>`` naming
    every check each offending row violates; ``good`` is schema-identical
    to the input. Duplicate-key groups are quarantined WHOLE (no member
    is more authoritative than another — pick-a-winner policies live in
    the dedup/upsert operators). The key sets joined back for unique/FK
    marks are violation-sized; row-local marks are pure projections."""
    base_cols = list(df.columns)
    for col in base_cols:
        if col.startswith("_q"):
            raise ValueError(f"column {col!r} collides with quality helper names")
    marks, helpers = [], []
    for i, c in enumerate(checks):
        name = F.lit(_check_name(c))
        if c["kind"] in _ROW_LOCAL:
            marks.append(F.when(_violation_pred(c), name))
        elif c["kind"] == "unique":
            dup_keys = (
                df.groupBy(*c["cols"])
                .count()
                .filter(F.col("count") > 1)
                .drop("count")
                .withColumn(f"_q{i}", F.lit(True))
            )
            df = df.join(F.broadcast(dup_keys), c["cols"], "left")
            marks.append(F.when(F.col(f"_q{i}").isNotNull(), name))
            helpers.append(f"_q{i}")
        elif c["kind"] == "foreign_key":
            keys = (
                c["ref"].select(F.col(c["ref_col"]).alias(c["col"]))
                .distinct()
                .withColumn(f"_q{i}", F.lit(True))
            )
            df = df.join(F.broadcast(keys), c["col"], "left")
            marks.append(
                F.when(
                    F.col(c["col"]).isNotNull() & F.col(f"_q{i}").isNull(), name
                )
            )
            helpers.append(f"_q{i}")
        else:
            raise ValueError(f"unknown check kind: {c['kind']!r}")
    tagged = df.withColumn(
        "_failed", F.array_compact(F.array(*marks))
    ).drop(*helpers)
    good = tagged.filter(F.size("_failed") == 0).select(*base_cols)
    bad = tagged.filter(F.size("_failed") > 0).select(*base_cols, "_failed")
    return good, bad
