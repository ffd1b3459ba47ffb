"""Two-table as-of join — an operator Spark lacks natively.

Preference order per the charter: (a) compose built-ins — possible when
both sides share one stream (see ext_asof_attribution's window form) —
else (b) applyInPandas with ``pd.merge_asof`` per group, which is this
module. Left rows match the most recent right row with right_on ≤ left_on
within the same ``by`` key (backward as-of).

Scale shape: one shuffle co-locates both sides on the ``by`` key (tagged
union, single groupBy — not two separate shuffles), then per-group sorted
merges run in Arrow batches. Skewy entities are the caveat; salt or split
heavy keys upstream if one entity dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """Backward as-of join. ``on``: orderable column in both sides; ``by``:
    entity key in both sides. Right's non-key columns surface with
    ``suffix``. Left rows with no earlier right row keep NULLs.

    Raises ValueError on column-name collisions: a shared non-key column
    would appear twice in the tagged union, and a left column already named
    ``<rightcol><suffix>`` would collide with the suffixed output — both
    silently corrupt results otherwise.

    Skew guard: each ``by`` group becomes ONE pandas frame on one task, so
    a pathological entity (a bot user with 100M events) would OOM that
    executor quietly. Groups larger than ``max_group_rows`` fail loud with
    the remedy instead: split the hot entity's timeline upstream (e.g.
    sub-key by time bucket with per-bucket boundary rows, or salt + re-merge)
    before re-running. Raise the limit deliberately if your executors are
    sized for more."""
    types = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    rtypes = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    lcols = list(left.columns)
    rvals = [c for c in right.columns if c not in (on, by)]
    shared = set(rvals) & set(lcols)
    if shared:
        raise ValueError(
            f"asof_join: non-key column(s) {sorted(shared)} exist on both "
            f"sides; rename one side before joining"
        )
    suffixed = {f"{c}{suffix}" for c in [on] + rvals}
    clash = suffixed & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join: left column(s) {sorted(clash)} collide with the "
            f"suffixed right output; pick a different suffix"
        )
    out_schema = ", ".join(
        [f"{c} {types[c]}" for c in lcols]
        + [f"{on}{suffix} {rtypes[on]}"]
        + [f"{c}{suffix} {rtypes[c]}" for c in rvals]
    )
    out_cols = lcols + [f"{on}{suffix}"] + [f"{c}{suffix}" for c in rvals]

    # tagged union so ONE grouped shuffle co-locates both sides per key
    all_cols = [by, on] + [c for c in lcols if c not in (by, on)] + rvals
    l_tagged = left.select(
        *[F.col(c) if c in left.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(0).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in all_cols],
        F.lit(1).alias("__side"),
    )

    def merge(pdf):
        import pandas as _pd

        if len(pdf) > max_group_rows:
            key_val = pdf[by].iloc[0]
            raise ValueError(
                f"asof_join: group {by}={key_val!r} has {len(pdf)} rows "
                f"(> max_group_rows={max_group_rows}); one pandas frame per "
                "group would exhaust task memory. Split or salt the hot "
                "entity upstream (e.g. sub-key by time bucket), or raise "
                "max_group_rows if executors are sized for it."
            )
        l = (
            pdf[pdf["__side"] == 0][lcols]
            .sort_values(on, kind="mergesort")
            .reset_index(drop=True)
        )
        r = (
            pdf[pdf["__side"] == 1][[on] + rvals]
            .rename(columns={c: f"{c}{suffix}" for c in [on] + rvals})
            .sort_values(f"{on}{suffix}", kind="mergesort")
            .reset_index(drop=True)
        )
        if len(r) == 0:
            out = l.copy()
            for c in [on] + rvals:
                out[f"{c}{suffix}"] = None
        else:
            out = _pd.merge_asof(
                l, r, left_on=on, right_on=f"{on}{suffix}", direction="backward"
            )
        return out[out_cols]

    return (
        l_tagged.unionByName(r_tagged)
        .groupBy(by)
        .applyInPandas(merge, schema=out_schema)
    )
