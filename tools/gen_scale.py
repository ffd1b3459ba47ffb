"""Deterministic scale-up of the driver testdata for scaling measurements.

Builds sf{M} from sf0.1 as M key-shifted replicas (default M=10 → sf1),
preserving every per-replica distribution exactly while keeping cross-
replica interactions controlled:

- fact/dim keys (custkey, orderkey, partkey, suppkey, event_id, user_id,
  doc_id, vec_id) shift by replica * STRIDE — FK joins stay within a
  replica, so join/agg result sizes scale linearly, exactly as a larger
  corpus would behave;
- nation/region (bounded lookup dims) stay fixed — realistic: lookup dims
  don't grow with fact volume;
- document TOKENS get a per-replica suffix (replica 0 untouched), so
  replicas share no shingles: near-dup pair structure replicates linearly
  (planted pairs ×M) instead of exploding quadratically through
  cross-replica exact duplicates, and vocab grows with the corpus like a
  real one;
- embedding labels shift per replica → M× cosine blocks of the original
  size (blocked-similarity work scales with corpus, block size stays);
  vec_ids 0..N stay in replica 0 so the constant ANN query set
  (vec_id < N_QUERIES) is unchanged.

Pure pyarrow/numpy — physical parquet schemas (events.ts in whatever
precision the driver shipped — ns or µs — float lists, int32 labels)
survive byte-for-byte, and the loaders' ts-type detection handles either. Output is written under
the repo (.scale/sfM/, gitignored); /root/testdata is never touched.

Usage: python tools/gen_scale.py [M] [src_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 100_000_000
LABEL_STRIDE = 1_000

#: int64 key columns shifted by replica * STRIDE, per table
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _shift(table: pa.Table, cols: list[str], delta: int) -> pa.Table:
    for c in cols:
        i = table.schema.get_field_index(c)
        shifted = pc.add(table.column(c), pa.scalar(delta, type=pa.int64()))
        table = table.set_column(i, table.schema.field(i), shifted.cast(pa.int64()))
    return table


def _suffix_tokens(table: pa.Table, k: int) -> pa.Table:
    """Replica k>0: every token gets a 'c{k}' suffix (no shared shingles
    across replicas) and n_chars is recomputed for the new text."""
    if k == 0:
        return table
    suf = f"c{k}"
    texts = table.column("text").to_pylist()
    new_texts = [" ".join(t + suf for t in s.split()) for s in texts]
    n_chars = pa.array([len(s) for s in new_texts], type=pa.int64())
    ti = table.schema.get_field_index("text")
    table = table.set_column(ti, table.schema.field(ti), pa.array(new_texts, type=pa.string()))
    ci = table.schema.get_field_index("n_chars")
    return table.set_column(ci, table.schema.field(ci), n_chars)


def _shift_labels(table: pa.Table, k: int) -> pa.Table:
    i = table.schema.get_field_index("label")
    lab = pc.add(table.column("label"), pa.scalar(k * LABEL_STRIDE, type=pa.int32()))
    return table.set_column(i, table.schema.field(i), lab.cast(pa.int32()))


def generate(multiplier: int, src_dir: str, out_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in COPY_AS_IS:
        src = pq.read_table(f"{src_dir}/{t}.parquet")
        pq.write_table(src, out / f"{t}.parquet")
        print(f"{t}: {src.num_rows} rows (copied)")
    for t, keys in SHIFT_KEYS.items():
        src = pq.read_table(f"{src_dir}/{t}.parquet")
        # refuse to re-scale already-scaled output: a second-level shift
        # by the SAME stride folds replica (i, j) onto (i', j') whenever
        # i+j == i'+j', so keys collide and FK joins multi-match — at sf10
        # that inflated etl_fact_sales 50x before this guard existed.
        # Always scale from the ORIGINAL driver corpus (M=100 for sf10).
        for c in keys:
            mx = pc.max(src.column(c)).as_py()
            if mx is not None and mx >= STRIDE:
                raise SystemExit(
                    f"gen_scale: {t}.{c} max={mx} >= STRIDE={STRIDE} — "
                    f"{src_dir} is already a scaled corpus; re-scaling it "
                    "would collide keys across replicas. Generate every "
                    "scale factor directly from the original testdata "
                    "(e.g. gen_scale.py 100 /root/testdata/sf0.1 for sf10)."
                )
        replicas = []
        for k in range(multiplier):
            rep = _shift(src, keys, k * STRIDE)
            if t == "documents":
                rep = _suffix_tokens(rep, k)
            if t == "embeddings":
                rep = _shift_labels(rep, k)
            replicas.append(rep)
        big = pa.concat_tables(replicas)
        # explicit row-group sizing: pyarrow's 1Mi-row default left the
        # scaled documents table as ONE 234 MB row group, and a parquet
        # scan parallelizes at row-group granularity — measured as a
        # single-task scan bottleneck (exact dedup 31x on a 10x step).
        # Real cluster files are rowgroup-sized; ~64 groups per table
        # keeps local[32] honest at every scale.
        rg = min(1_000_000, max(8_192, big.num_rows // 64))
        pq.write_table(big, out / f"{t}.parquet", row_group_size=rg)
        print(f"{t}: {src.num_rows} -> {big.num_rows} rows (rg={rg})")


if __name__ == "__main__":
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else str(Path(__file__).resolve().parent.parent / ".scale" / f"sf{mult/10:g}")
    )
    generate(mult, src, dst)
