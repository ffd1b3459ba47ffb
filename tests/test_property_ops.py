"""Property-based tests (hypothesis) for the round-7/8 operators: the
sharded range join, interval-overlap join and line-level boilerplate
removal each checked against an independent pure-python reference on
randomized corpora. Example counts are small (each example is a real
Spark job) — the breadth comes from hypothesis shrinking whatever it
finds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_airflow_adventureworks_spark.operators.linededup import (
    remove_boilerplate_lines,
)
from etl_airflow_adventureworks_spark.operators.rangejoin import (
    interval_join,
    range_join,
)

# -- range join ------------------------------------------------------------

_keys = st.one_of(st.none(), st.integers(0, 2))
_points = st.lists(
    st.tuples(_keys, st.one_of(st.none(), st.integers(-20, 40))),
    min_size=0,
    max_size=25,
)
_intervals = st.lists(
    st.tuples(_keys, st.integers(-20, 40), st.integers(-25, 45)),
    min_size=0,
    max_size=15,
)


def _brute_pairs(pts, ivs, bounds):
    out = []
    for pid, (pk, p) in enumerate(pts):
        for iid, (ik, s, e) in enumerate(ivs):
            if pk is None or ik is None or pk != ik or p is None:
                continue
            hit = s <= p < e if bounds == "[)" else s <= p <= e
            if hit:
                out.append((pid, iid))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(
    pts=_points,
    ivs=_intervals,
    width=st.integers(1, 30),
    bounds=st.sampled_from(["[)", "[]"]),
)
def test_range_join_matches_brute_force(spark, pts, ivs, width, bounds):
    pdf = spark.createDataFrame(
        [(i, k, p) for i, (k, p) in enumerate(pts)], "pid long, k long, p long"
    )
    idf = spark.createDataFrame(
        [(j, k, s, e) for j, (k, s, e) in enumerate(ivs)],
        "iid long, k long, s long, e long",
    )
    got = sorted(
        (r["pid"], r["iid_iv"])
        for r in range_join(
            pdf, idf, "p", "s", "e", by="k", bounds=bounds, shard_width=width
        )
        .select("pid", "iid_iv")
        .collect()
    )
    assert got == _brute_pairs(pts, ivs, bounds)


# -- interval overlap join --------------------------------------------------

_spans = st.lists(
    st.tuples(
        _keys,
        st.one_of(st.none(), st.integers(-20, 40)),
        st.one_of(st.none(), st.integers(-25, 45)),
    ),
    min_size=0,
    max_size=15,
)


def _brute_overlap(ls, rs, bounds):
    out = []
    for lid, (lk, s1, e1) in enumerate(ls):
        for rid, (rk, s2, e2) in enumerate(rs):
            if None in (lk, rk, s1, e1, s2, e2) or lk != rk:
                continue
            if bounds == "[)":
                hit = s1 < e1 and s2 < e2 and s1 < e2 and s2 < e1
            else:
                hit = s1 <= e1 and s2 <= e2 and s1 <= e2 and s2 <= e1
            if hit:
                out.append((lid, rid))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(
    ls=_spans,
    rs=_spans,
    width=st.integers(1, 30),
    bounds=st.sampled_from(["[)", "[]"]),
)
def test_interval_join_matches_brute_force(spark, ls, rs, width, bounds):
    ldf = spark.createDataFrame(
        [(i, k, s, e) for i, (k, s, e) in enumerate(ls)],
        "lid long, k long, ls long, le long",
    )
    rdf = spark.createDataFrame(
        [(j, k, s, e) for j, (k, s, e) in enumerate(rs)],
        "rid long, k long, rs long, re long",
    )
    got = sorted(
        (r["lid"], r["rid_iv"])
        for r in interval_join(
            ldf, rdf, "ls", "le", "rs", "re", by="k",
            bounds=bounds, shard_width=width,
        )
        .select("lid", "rid_iv")
        .collect()
    )
    # exactly-once emission (the meeting rule) AND set equality vs brute force
    assert len(got) == len(set(got))
    assert got == _brute_overlap(ls, rs, bounds)


# -- line-level boilerplate removal ---------------------------------------

_line = st.sampled_from(["aaa", "bbb", "CCC", " aaa ", "", "ddd eee", "x"])
_doc = st.one_of(
    st.none(), st.lists(_line, min_size=0, max_size=6).map(lambda ls: "\n".join(ls))
)


def _brute_boiler(docs, min_docs, keep_first):
    key = lambda ln: ln.strip().lower()
    per_line_docs: dict[str, set] = {}
    for did, text in docs:
        if text is None:
            continue
        for ln in text.split("\n"):
            k = key(ln)
            if k:
                per_line_docs.setdefault(k, set()).add(did)
    boiler = {
        k: min(ds) for k, ds in per_line_docs.items() if len(ds) >= min_docs
    }
    out = {}
    for did, text in docs:
        if text is None:
            out[did] = None
            continue
        kept = [
            ln
            for ln in text.split("\n")
            if key(ln) == ""
            or key(ln) not in boiler
            or (keep_first and boiler[key(ln)] == did)
        ]
        out[did] = "\n".join(kept)
    return out


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(_doc, min_size=1, max_size=8),
    min_docs=st.integers(2, 4),
    keep_first=st.booleans(),
)
def test_remove_boilerplate_matches_brute_force(spark, texts, min_docs, keep_first):
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(
            docs, min_docs=min_docs, keep_first=keep_first
        ).collect()
    }
    assert got == _brute_boiler(rows, min_docs, keep_first)


# -- gap fill ---------------------------------------------------------------

from etl_airflow_adventureworks_spark.operators.timeseries import gapfill  # noqa: E402

_series_rows = st.lists(
    st.tuples(st.integers(0, 2),            # key
              st.integers(-5, 15),          # bucket index (scaled by step)
              st.one_of(st.none(), st.integers(-50, 50))),  # value
    min_size=1, max_size=20,
    unique_by=lambda r: (r[0], r[1]),
)


def _brute_gapfill(rows, step, fill):
    """Pure-python oracle: dense per-key grid + the four fill rules."""
    by_key: dict = {}
    for k, bi, v in rows:
        by_key.setdefault(k, {})[bi * step] = v
    out = []
    for k, obs in by_key.items():
        lo, hi = min(obs), max(obs)
        buckets = list(range(lo, hi + 1, step))
        last = None
        for b in buckets:
            if fill == "null":
                out.append((k, b, obs.get(b)))
            elif fill == "zero":
                # an observed NULL is indistinguishable from a gap after
                # the grid join and fills by the same rule (see docstring)
                v = obs.get(b)
                out.append((k, b, 0 if v is None else v))
            elif fill == "locf":
                if b in obs and obs[b] is not None:
                    last = obs[b]
                out.append((k, b, obs[b] if b in obs and obs[b] is not None
                            else last))
            elif fill == "linear":
                if b in obs and obs[b] is not None:
                    out.append((k, b, float(obs[b])))
                else:
                    prev = next_ = None
                    for bb in range(b - step, lo - step, -step):
                        if bb in obs and obs[bb] is not None:
                            prev = (bb, obs[bb]); break
                    for bb in range(b + step, hi + step, step):
                        if bb in obs and obs[bb] is not None:
                            next_ = (bb, obs[bb]); break
                    if prev is None or next_ is None:
                        out.append((k, b, None))
                    else:
                        (pt, pv), (nt, nv) = prev, next_
                        out.append((k, b, pv + (nv - pv) * (b - pt) / (nt - pt)))
    return sorted(out, key=lambda r: (r[0], r[1]))


@settings(max_examples=10, deadline=None)
@given(rows=_series_rows, step=st.sampled_from([1, 7, 3600]),
       fill=st.sampled_from(["null", "zero", "locf", "linear"]))
def test_gapfill_matches_brute_force(spark, rows, step, fill):
    df = spark.createDataFrame(
        [(k, bi * step, v) for k, bi, v in rows], "k long, b long, v long"
    )
    got = sorted(
        ((r["k"], r["b"], r["v"]) for r in
         gapfill(df, ["k"], "b", step, ["v"], fill=fill).collect()),
        key=lambda r: (r[0], r[1]),
    )
    want = _brute_gapfill(rows, step, fill)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        if g[2] is None or w[2] is None:
            assert g[2] is None and w[2] is None, (g, w, fill)
        else:
            assert abs(float(g[2]) - float(w[2])) < 1e-9, (g, w, fill)


# -- mergeable histogram quantiles (r9) --------------------------------------

_hist_vals = st.lists(
    st.one_of(st.none(), st.floats(min_value=-50.0, max_value=150.0,
                                   allow_nan=False, allow_infinity=False)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=10, deadline=None)
@given(vals=_hist_vals, nbins=st.sampled_from([1, 4, 16]),
       q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
       split=st.integers(0, 59))
def test_histogram_quantile_bound_and_merge_identity(spark, vals, nbins, q, split):
    """Random values (NULLs included), random bin count / quantile /
    merge split: (a) the two-part merged histogram state is BIT-equal to
    the single-pass state (commutative integer sums); (b) the quantile
    estimate sits within one bin width of a rank-based reference for any
    quantile landing inside the declared range, and clamps to the range
    edges for mass in the under/overflow bins."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _aggregate,
        _merge,
        histogram_quantiles,
    )

    lo, hi = 0.0, 100.0
    width = (hi - lo) / nbins
    spec = ("v", lo, hi, nbins)
    meas = {"h": ("histogram", spec)}
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    one = _aggregate(df.selectExpr("1 AS k", "v"), ["k"], meas)
    parts = _aggregate(
        df.selectExpr("1 AS k", "v", f"id < {split} AS half"),
        ["k", "half"], meas,
    ).drop("half")
    merged = _merge(parts, ["k"], meas)
    h_one = list(one.first()["h"])
    h_merged = list(merged.first()["h"])
    assert h_one == h_merged  # bit-identical mergeable state

    est = histogram_quantiles(one, "h", spec, [q]).first()[
        f"h_p{q * 100:g}".replace(".", "_")
    ]
    present = sorted(v for v in vals if v is not None)
    if not present:
        assert est is None
        return
    # rank-based reference on the clamped values (the sketch clamps
    # out-of-range mass to the declared edges by construction)
    clamped = [min(max(v, lo), hi) for v in present]
    rank = q * len(clamped)
    idx = max(0, min(len(clamped) - 1, int(rank if rank == int(rank) else rank + 1) - 1))
    ref = clamped[idx]
    assert est is not None
    assert abs(est - ref) <= width + 1e-9, (est, ref, width, clamped, q)


@given(
    vals=st.lists(
        st.one_of(
            st.datetimes(
                min_value=__import__("datetime").datetime(1901, 1, 1),
                max_value=__import__("datetime").datetime(2199, 12, 31),
            ),
            st.dates(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=2,
        max_size=30,
    ),
)
@settings(max_examples=300, deadline=None)
def test_stats_encode_is_order_preserving(vals):
    """r13: `_stats_encode` must be a strict order-embedding WITHIN each
    value type (stats bounds and pruning keys always share the column's
    type) — any inversion or collapse could wrongly skip a file (a lost
    write). Datetimes additionally round-trip through `_stats_decode`."""
    import datetime as dt

    from pyspark.sql import types as T

    from etl_airflow_adventureworks_spark.table import (
        _stats_decode,
        _stats_encode,
    )

    by_type: dict[type, list] = {}
    for v in vals:
        by_type.setdefault(type(v), []).append(v)
    for t, vs in by_type.items():
        enc = [_stats_encode(v) for v in vs]
        for a, b in zip(sorted(vs), sorted(vs)[1:]):
            ea, eb = _stats_encode(a), _stats_encode(b)
            assert ea <= eb
            if a != b and not isinstance(a, float):
                # exact types: strictly injective (floats may collide
                # only through float()-identity, which is identity here)
                assert ea < eb
        for v, e in zip(vs, enc):
            if isinstance(v, dt.datetime):
                assert _stats_decode(e, T.TimestampType()) == v
            elif isinstance(v, dt.date):
                assert _stats_decode(e, T.DateType()) == v


# -- rollup change-row algebra (r14) ----------------------------------------

# old/new keyed states as {key -> (n, v)}; keys drawn small so inserts,
# deletes, updates and no-ops all occur; None keys exercise the
# null-safe group identity
_state_keys = st.one_of(st.none(), st.integers(0, 5))
_states = st.dictionaries(
    _state_keys,
    st.tuples(st.integers(1, 9), st.integers(-5, 5)),
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(old=_states, new=_states, extra=st.sets(_state_keys, max_size=2))
def test_rollup_change_rows_reconstruct_new_state(spark, old, new, extra):
    """r14: applying _rollup_change_rows' Delta-CDF output to the OLD
    state (CDC collapse semantics: post/insert upsert, delete drops)
    reproduces the NEW state exactly, for ANY touched set that covers
    the true diff — including over-reported untouched groups and NULL
    group keys."""
    from etl_airflow_adventureworks_spark.operators.rollup import (
        _rollup_change_rows,
    )
    from etl_airflow_adventureworks_spark.table import CHANGE_TYPE_COL

    # the contract: touched must cover every differing key; extras are
    # allowed (over-reporting is harmless)
    diff = {k for k in set(old) | set(new) if old.get(k) != new.get(k)}
    touched = diff | extra

    def frame(d):
        return spark.createDataFrame(
            [(k, n, v) for k, (n, v) in sorted(
                d.items(), key=lambda kv: (kv[0] is None, kv[0]))],
            "k int, n int, v int",
        )

    tdf = spark.createDataFrame(
        [(k,) for k in sorted(touched, key=lambda x: (x is None, x))],
        "k int",
    )
    changes = _rollup_change_rows(
        spark, frame(old), frame(new), ["k"], tdf
    ).collect()

    applied = dict(old)
    posts = {}
    for r in changes:
        ct = r[CHANGE_TYPE_COL]
        if ct in ("update_postimage", "insert"):
            posts[r["k"]] = (r["n"], r["v"])
        elif ct == "delete":
            applied.pop(r["k"], None)
    applied.update(posts)
    assert applied == new, (old, new, touched, changes)
    # every change row's key is in the touched set, and each key appears
    # at most once per side
    for side in (("update_preimage", "delete"),
                 ("update_postimage", "insert")):
        ks = [r["k"] for r in changes if r[CHANGE_TYPE_COL] in side]
        assert len(ks) == len(set(ks))
        assert set(ks) <= touched
