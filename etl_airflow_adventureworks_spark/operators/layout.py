"""Z-order (Morton-curve) clustered layout for multi-column data skipping.

At 100 TB the cheapest predicate is the one whose files are never
opened. A linear sort clusters only its LEADING column: files written
`ORDER BY user_id, ts` have tight user_id ranges but every file spans
the whole ts domain, so a time-range query still touches all of them.
Interleaving the bits of both columns' ranks (the Morton / Z curve)
gives every file a tight bounding box in BOTH dimensions, and any
engine that prunes on min/max footer stats — Spark's parquet row-group
pushdown, or manifest-level skipping like `file_stats` below — reads
only the files whose box intersects the query box.

Everything is codegen'd column algebra: rank mapping is either min-max
scaling or a quantile CDF evaluated as a binary-search CASE tree over
the literal boundary list (log2(2^bits) comparisons per row, no Python,
no per-row allocation); the bit-spread is the classic shift-and-mask
ladder. The write is one `repartitionByRange(z)` shuffle plus the rank
evaluation — measured ~3-4x a plain linear sort-write at 10M rows, a
write-time maintenance cost (cf. lakehouse OPTIMIZE ZORDER) bought back
by every subsequent stats-pruned scan.

No reference counterpart (the reference writes unsorted single CSVs);
this is the layout leg of the charter's 100 TB posture, sibling of the
bucketed-join and IVF/LSH partition-pruned layouts in
`tests/test_bucketing.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: shift-and-mask ladder spreading a 16-bit value so its bits occupy
#: every OTHER position of a 32-bit lane (64-bit long arithmetic)
_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_bits(col: Column) -> Column:
    out = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def _rank16(df: DataFrame, col: str, bits: int, mode: str) -> Column:
    """Map ``col`` to an integer rank in [0, 2^bits) (bits ≤ 16).
    Temporal columns (date/timestamp — r13, stats-eligible since then)
    rank through their epoch seconds: monotone, so the Z-curve locality
    they buy is identical to ranking the raw values."""
    from pyspark.sql import types as T

    n = 1 << bits
    dtype = df.schema[col].dataType
    ntz = getattr(T, "TimestampNTZType", ())
    temporal = (T.DateType, T.TimestampType) + ((ntz,) if ntz else ())
    if isinstance(dtype, temporal):
        # date -> timestamp -> double (a date cannot cast to double
        # directly); timestamp -> double = epoch seconds
        c = F.col(col).cast("timestamp").cast("double")
    else:
        c = F.col(col).cast("double")
    if mode == "minmax":
        lo, hi = df.agg(F.min(c), F.max(c)).first()
        if lo is None or hi is None or hi == lo:
            return F.lit(0)
        scaled = (c - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n - 1)
        return F.round(scaled).cast("long")
    if mode == "quantile":
        # boundary b_i = i/n quantile; rank = #boundaries ≤ x, i.e. the
        # empirical CDF in n steps — constant-size driver collect, then a
        # BINARY-SEARCH CASE tree (log2(n) codegen'd comparisons/row).
        # The obvious size(filter(lit_array, b -> b <= x)) is an
        # interpreted higher-order function allocating a filtered copy
        # per row: measured 5.5 s vs 1.7 s for the tree on 10M rows
        probs = [i / n for i in range(1, n)]
        bounds = df.select(c.alias("__zr")).stat.approxQuantile(
            "__zr", probs, 0.001
        )

        def upper_bound(lo: int, hi: int) -> Column:
            # count of boundaries ≤ x, by first-index-where-bound > x
            # (strict < goes left so duplicate boundaries count fully)
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(
                c < F.lit(float(bounds[mid])), upper_bound(lo, mid)
            ).otherwise(upper_bound(mid + 1, hi))

        return F.least(upper_bound(0, len(bounds)), F.lit(n - 1)).cast("long")
    raise ValueError(f"mode must be minmax|quantile, got {mode!r}")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, mode: str = "quantile"
) -> Column:
    """The interleaved Morton key over ``cols`` (2–4 columns, ``bits``
    rank bits each; total key width = len(cols)*bits ≤ 48). NULLs rank
    lowest (0). Column i contributes bit-position i (mod stride)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key wants 2-4 columns")
    if bits * len(cols) > 48:
        raise ValueError("len(cols)*bits must be <= 48")
    if bits > 16:
        # the 2-column spread ladder masks at 16 bits; more would
        # silently truncate ranks instead of failing
        raise ValueError("bits must be <= 16")
    z = F.lit(0)
    for i, col in enumerate(cols):
        rank = F.coalesce(_rank16(df, col, bits, mode), F.lit(0))
        if len(cols) == 2:
            spread = _spread_bits(rank)
        else:
            # generic stride: place rank bit j at position j*len(cols)
            spread = F.lit(0)
            for j in range(bits):
                bit = F.shiftright(rank, j).bitwiseAND(F.lit(1))
                spread = spread.bitwiseOR(F.shiftleft(bit, j * len(cols)))
        z = z.bitwiseOR(F.shiftleft(spread, i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits: int | None = None,
    mode: str = "quantile",
) -> None:
    """Write ``df`` to ``path`` clustered on the Z curve over ``cols``:
    one range shuffle on the Morton key into ``num_files`` tightly
    bounded files. The key is dropped before write — the layout lives
    in the file boundaries (and their parquet min/max stats), not in a
    stored column."""
    if bits is None:
        # rank granularity only needs to out-resolve the file grid:
        # ~num_files cells per dimension. Extra bits cost rank-tree depth
        # (and at 8 bits, 255 quantile boundaries) for boxes the file
        # boundaries can't distinguish anyway
        bits = max(4, min(8, (num_files - 1).bit_length() + 1))
    keyed = df.withColumn("_zorder", zorder_key(df, cols, bits=bits, mode=mode))
    # materialize the key once: repartitionByRange's sampling sketch and
    # the exchange would otherwise each re-evaluate the rank expression
    # over the full input (measured 2x the write cost at 10M rows)
    keyed = keyed.localCheckpoint(eager=True)
    (
        keyed.repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` — the manifest a format like the
    `VersionedTable` would persist for skip-scans. One pass, aggregated
    by ``input_file_name`` (#files rows out)."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def files_overlapping(stats: DataFrame, box: dict[str, tuple]) -> int:
    """How many files a box query must open, given `file_stats` output:
    a file is skipped iff its [min,max] misses the query interval on ANY
    dimension — exactly the footer-stats pruning rule."""
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"max_{c}") >= F.lit(lo)) & (
            F.col(f"min_{c}") <= F.lit(hi)
        )
    return stats.filter(cond).count()
