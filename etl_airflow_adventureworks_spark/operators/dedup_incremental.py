"""Incremental near-duplicate dedup: a NEW batch checked against a
PERSISTED MinHash index of the corpus — without re-running dedup over the
corpus.

At 100 TB the full-corpus MinHash pass (`dedup.minhash_neardup_pairs`)
is a build-time job; ingestion is incremental — a daily batch must be
deduped against everything already accepted. Re-running the full pass
per batch re-shuffles the whole corpus for every arrival. This module
persists the reusable per-document state once — hashed shingle sets
(`hh`, for the exact-Jaccard verify) and the 32-permutation MinHash
signature (`sig`, for LSH banding) — as a `VersionedTable`
(atomic manifests, time travel, idempotent appends), and checks each
new batch with plans that only ever SCAN the corpus:

- candidate generation: the batch's band rows (tiny) BROADCAST against a
  column-pruned (doc_id, sig) scan of the index — the corpus is never
  shuffled, and matches are ∝ LSH collisions;
- verify: one more column-pruned (doc_id, hh) scan of the index,
  semi-joined down to just the candidate ids, then exact Jaccard on the
  fetched (small) shingle sets.

Signatures here are computed per-row (`array_min(transform(...))`) —
identical values to `dedup.minhash_signatures`'s explode+groupBy form
(same permutation coefficients, same Mersenne modulus, min over the same
distinct shingle set) but with zero shuffle, which is the right trade for
a build-once index write and for small batches. The agreement is pinned
in tests, and the end-to-end contract is exact: **incremental pairs ==
the full-corpus batch operator's pairs restricted to pairs touching the
new batch** (same candidates, same verify, same threshold).

No reference counterpart (the reference has no dedup at all); charter E2
extension, sibling of `operators/similarity.build_ivf_index`'s persisted
serving artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table import VersionedTable
from .dedup import (
    JACCARD_THRESHOLD,
    _MERSENNE_P,
    _N_BANDS,
    _PERM_A,
    _PERM_B,
    hashed_shingle_sets_df,
)

#: band keys from the stored signature array — value-identical strings to
#: the batch op's ``concat(s{2b}, ',', s{2b+1})`` over its signature columns
_BANDS_EXPR = (
    f"transform(sequence(0, {_N_BANDS - 1}),"
    " b -> concat(element_at(sig, 2*b + 1), ',', element_at(sig, 2*b + 2)))"
)


def _require_doc_frame(docs: DataFrame, what: str) -> None:
    missing = {"doc_id", "text"} - set(docs.columns)
    if missing:
        raise ValueError(f"{what} needs columns doc_id, text (missing {sorted(missing)})")


def neardup_index_entries(docs: DataFrame) -> DataFrame:
    """(doc_id, hh, sig) — the persisted per-document dedup state.

    ``hh`` = distinct hashed 3-token shingles (`hashed_shingle_sets_df`);
    ``sig`` = 32-long MinHash signature computed row-locally:
    ``sig[i] = min over h in hh of (a_i*h + b_i) mod p`` — the same
    formula and coefficients as ``dedup.minhash_signatures``, so bands
    built from either source collide identically. Row-local (no explode /
    groupBy shuffle): right for the one-time index write and for small
    ingest batches; the explode+groupBy twin stays the right shape for
    full-corpus jobs where codegen'd partial mins win.
    """
    _require_doc_frame(docs, "neardup_index_entries")
    sig = F.array(
        *[
            F.expr(
                f"array_min(transform(hh, h -> pmod({a}L * h + {b}L, {_MERSENNE_P}L)))"
            )
            for a, b in zip(_PERM_A, _PERM_B)
        ]
    ).alias("sig")
    return hashed_shingle_sets_df(docs).select("doc_id", "hh", sig)


def _cluster_entries(entries: DataFrame, num_files: int | None):
    """Key-cluster index entries by ``doc_id`` (range partition + sort)
    and, when ``doc_id`` is numeric, return the ``stats_cols`` to record
    per-file min/max — what lets ``apply_cdc``'s touched-file probe
    prune a range-local sync window to the few files whose key range
    admits it (r11, VERDICT r10 #3) instead of scanning the index."""
    from ..table import numeric_stats_types

    parts = [num_files] if num_files else []
    clustered = entries.repartitionByRange(*parts, "doc_id").sortWithinPartitions(
        "doc_id"
    )
    dtype = entries.schema["doc_id"].dataType
    stats = ["doc_id"] if isinstance(dtype, numeric_stats_types()) else None
    return clustered, stats


def build_neardup_index(
    spark: SparkSession, docs: DataFrame, index_path: str,
    base_path: str | None = None,
    base_version: int | None = None,
    num_files: int | None = None,
) -> int:
    """Build (or rebuild) the persisted dedup index from the current
    corpus — one atomic `VersionedTable` commit; returns the version.

    Layout (r11, VERDICT r10 #3): entries are written KEY-CLUSTERED —
    range-partitioned and sorted by ``doc_id`` (``num_files`` output
    files; default ``spark.sql.shuffle.partitions``) with per-file
    min/max stats recorded when ``doc_id`` is numeric — so
    ``sync_neardup_index``'s copy-on-write CDC apply prunes its probe
    and rewrite to the files whose key range admits the changed docs,
    turning the r10 "sync rewrites the whole index" cost term into a
    touched-file term for range-local windows.

    ``base_path`` (r10, VERDICT r9 #8): when ``docs`` is the CURRENT
    snapshot of a corpus maintained as a ``VersionedTable`` (i.e.
    ``docs = VersionedTable(spark, base_path).read()``), pass its path —
    the build records (path, version) in the index commit so
    ``neardup_index_staleness`` can later classify corpus movement from
    manifests alone: an OPTIMIZE leaves the signatures valid, appends
    are the normal incremental-ingest flow, but an UPSERT/DELETE that
    changes a document's text makes its stored shingle set / signature
    silently wrong — that case is loudly rejected instead of decaying
    recall in the dark. Pass ``base_version`` (the version ``docs`` was
    read at) when concurrent corpus writers are possible — resolving
    the current version here would stamp over (and silently skip) a
    rewrite landing between your read and this build (see
    ``table.resolve_base_stamp``)."""
    from ..table import resolve_base_stamp

    base = (
        resolve_base_stamp(spark, base_path, base_version)
        if base_path is not None
        else None
    )
    entries, stats = _cluster_entries(neardup_index_entries(docs), num_files)
    v = VersionedTable(spark, index_path).commit(
        entries,
        mode="overwrite",
        stats_cols=stats,
        op_info={"op": "neardup_index_build", "base": base} if base else None,
    )
    if base:
        # self-register on the base (r13, VERDICT r12 #2) AFTER the
        # commit — a failed build must not leave a phantom registry
        # entry; best-effort because the registry is advisory and the
        # base may be read-only to this job
        VersionedTable(spark, base["path"]).register_consumer(
            index_path, best_effort=True
        )
    return v


#: target bytes per appended index file — the same sizing rule as
#: `optimize` / `_write_ivf_layout_vt`
_APPEND_TARGET_FILE_BYTES = 128 * 1024 * 1024

#: estimated stored-entry bytes per byte of document TEXT: `hh` holds
#: one 8-byte hash per distinct 3-token shingle (≈ one per ~5-char
#: token), so entry bytes track text bytes at roughly 8/5 = 1.6×
#: pre-compression (parquet wins some of that back; the sizing only
#: needs the right order of magnitude)
_ENTRY_BYTES_PER_TEXT_BYTE = 1.6

#: per-row fixed entry bytes: the 32×8-byte `sig` array + doc_id +
#: parquet framing overhead
_ENTRY_FIXED_BYTES = 384


def _batch_num_files(spark: SparkSession, docs: DataFrame) -> int:
    """Output file count for an append batch, derived from the batch's
    MEASURED text volume: one column-pruned ``(count, sum(length(text)))``
    agg estimates the stored entry bytes (shingle-hash arrays scale with
    document text), and the count is ``ceil(entry bytes / 128 MiB)`` —
    so a LARGE batch lands as several key-local files instead of one
    oversized file spanning the whole batch key range (which every later
    copy-on-write sync would rewrite wholesale, ADVICE r11).

    r13 (ADVICE r12): measuring the batch itself replaced the earlier
    input-file-bytes proxy + row cap — the proxy over-counted a FILTERED
    read of a big table (``inputFiles()`` lists every scanned file) and
    the row cap that papered over it suppressed the byte signal for
    low-count batches of very large documents (2k docs × 1 MB capped to
    ONE multi-GiB key-spanning file). The agg reads only the rows that
    are actually in the batch, so both failure modes are gone; cost is
    one batch-sized pass over a column the append is about to shingle
    anyway."""
    import math

    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("tb")
    ).first()
    rows, text_bytes = int(row["n"] or 0), int(row["tb"] or 0)
    entry_bytes = (
        rows * _ENTRY_FIXED_BYTES
        + int(text_bytes * _ENTRY_BYTES_PER_TEXT_BYTE)
    )
    return max(1, math.ceil(entry_bytes / _APPEND_TARGET_FILE_BYTES))


def append_to_neardup_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    idempotency_token: str | None = None,
    base_path: str | None = None,
    base_version: int | None = None,
    num_files: int | None = None,
) -> int:
    """Append an accepted batch's entries to the index as a new version.
    Pass the batch id as ``idempotency_token`` for exactly-once semantics
    under retries (a replayed commit is a no-op returning the existing
    version — same contract as the streaming upsert sink). ``base_path``
    re-records the corpus sync point so ``neardup_index_staleness``
    measures from it, not the original build. Pass ``base_version`` —
    the corpus version this batch brings the index level with — when
    concurrent writers are possible: resolving the current version at
    call time is a TOCTOU that would stamp over (and silently skip) a
    racing rewrite (``table.resolve_base_stamp``). ``num_files`` sizes
    the batch's key-clustered output (default: byte-derived — see
    ``_batch_num_files``)."""
    from ..table import resolve_base_stamp

    base = (
        resolve_base_stamp(spark, base_path, base_version)
        if base_path is not None
        else None
    )
    # batches cluster within themselves (byte-sized file count) and
    # record key stats, so appended files stay prunable by later syncs
    entries, stats = _cluster_entries(
        neardup_index_entries(docs),
        num_files if num_files is not None else _batch_num_files(spark, docs),
    )
    # op name recorded even without a base stamp: the maintain policy's
    # fragmentation baseline must classify appends as PATCHES (their
    # batch file may span the key range), never as the clustered shape
    op_info = {"op": "neardup_index_append"}
    if base:
        op_info["base"] = base
    v = VersionedTable(spark, index_path).commit(
        entries, mode="append",
        stats_cols=stats,
        idempotency_token=idempotency_token,
        op_info=op_info,
    )
    if base:
        VersionedTable(spark, base["path"]).register_consumer(
            index_path, best_effort=True
        )  # post-commit + best-effort: no phantoms, no write dependency
    return v


def neardup_index_staleness(
    spark: SparkSession, index_path: str, allow_rewritten: bool = False
) -> dict:
    """Manifest-only staleness of a versioned-base dedup index (r10,
    VERDICT r9 #8): find the most recent base sync point recorded in
    the index's manifests (build, or a base-stamped append) and
    classify the corpus's movement since
    (``VersionedTable.rowset_change_kind``):

    - ``'unchanged'`` — nothing moved (OPTIMIZE included: signatures
      are content-derived, a compaction changes no document);
    - ``'appended'`` — new documents the index has not ingested: run
      the incremental flow (`minhash_neardup_incremental` +
      `append_to_neardup_index`) over `changes()` to catch up;
    - ``'rewritten'`` — some already-indexed document's row was
      replaced or removed: its stored shingle set / signature is WRONG
      (false accepts / misses, silently) — RAISES unless
      ``allow_rewritten=True``; rebuild with ``build_neardup_index``
      or sync incrementally with ``sync_neardup_index``.

    Conservative by design: the streaming ingest gate
    (`streaming/ingest.py`) appends to index AND corpus per epoch but
    does not move the sync stamp (stamping the corpus version it
    EXPECTS would mis-point under a concurrent foreign writer — a
    skipped rewrite is worse than a false 'appended'), so gate-managed
    pairs read 'appended' even when level; `sync_neardup_index` across
    such a window is safe — its CDC apply upserts by doc_id, so
    already-ingested docs are idempotently re-written, never
    duplicated.

    No data read — one manifest walk on each table."""
    from ..table import latest_base_stamp

    idx = VersionedTable(spark, index_path)
    base = latest_base_stamp(idx)
    if not base:
        raise ValueError(
            f"dedup index at {index_path} was not built with base_path= — "
            "no versioned corpus to walk"
        )
    vt = VersionedTable(spark, base["path"])
    kind = vt.rowset_change_kind(base["version"])
    out = {
        "kind": kind,
        "base_path": base["path"],
        "synced_at_base_version": base["version"],
        "current_base_version": vt.manifest()["version"],
    }
    if kind == "rewritten" and not allow_rewritten:
        raise ValueError(
            f"dedup index at {index_path} is INVALID: corpus "
            f"{base['path']} was rewritten (v{base['version']} -> "
            f"v{out['current_base_version']}) — stored shingle sets / "
            "signatures no longer match the documents; rebuild with "
            "build_neardup_index before gating ingest on it"
        )
    return out


def sync_neardup_index(
    spark: SparkSession,
    index_path: str,
    idempotency_token: str | None = None,
) -> int:
    """Bring a versioned-base dedup index level with its corpus by
    consuming the corpus's ROW-LEVEL change feed (r10 — the composition
    that turns `neardup_index_staleness`'s 'rewritten' verdict from
    "rebuild the index" into one incremental CDC apply):

    1. read ``row_changes(synced, current)`` from the corpus (delta /
       change files only — the corpus is never rescanned);
    2. resolve each doc_id's FINAL state across the window (last commit
       wins; within a commit the postimage wins over its preimage —
       apply_cdc's one-op-per-key contract guarantees no other tie);
    3. recompute entries for live finals (the same row-local
       `neardup_index_entries` path the build uses, so a synced index is
       row-identical to a rebuilt one) and emit deletes for dropped
       doc_ids;
    4. apply as ONE atomic CDC batch on the index table (its own
       copy-on-write touched-file rewrite), stamping the new base sync
       point in the same commit.

    Requires the index built/stamped with ``base_path`` and one row per
    doc_id in the corpus (the documents-table contract). An UNRECORDED
    corpus rewrite (plain overwrite) still fails loud in `row_changes` —
    rebuild with `build_neardup_index`. A window with nothing relevant
    (e.g. only OPTIMIZE) is a no-op returning the current index version.
    Returns the index version after the sync.

    Cost shape (measured r10, re-measured r11 on the key-clustered
    layout — SCALING.md "Dedup-index sync"): the change-feed read and
    entry recompute are ∝ changed docs, and since r11 the index is
    built key-clustered with per-file stats, so the CDC apply probes
    and rewrites ONLY the files whose doc_id range admits the changed
    keys — a range-local 1% window at 500k docs touched 1 of 32 files
    and synced 3.5× FASTER than a rebuild (files_probed=1,
    files_carried=31), and at that corpus size even a hash-scattered
    window wins 3.9× while rewriting every file (rebuild re-shingles
    the whole corpus; sync's worst case is an index-sized IO rewrite).
    At small corpora (50k docs) rebuild still wins (0.6-0.8×:
    re-shingling is cheap there and the sync's fixed job-chain
    overheads dominate). Either way the result is row-identical to a
    rebuild (asserted in tests and by the measurement tool)."""
    from ..table import collapse_row_changes, latest_base_stamp

    idx = VersionedTable(spark, index_path)
    base = latest_base_stamp(idx)
    if not base:
        raise ValueError(
            f"dedup index at {index_path} was not built with base_path= — "
            "sync_neardup_index needs the recorded corpus sync point"
        )
    corpus = VersionedTable(spark, base["path"])
    # self-register (r13) — the index exists (it recorded the stamp), so
    # this is also how pre-r13 artifacts adopt the registry; best-effort
    corpus.register_consumer(index_path, best_effort=True)
    v_now = corpus.manifest()["version"]
    if v_now <= base["version"]:
        return idx.manifest()["version"]  # already level
    # final state per doc across the window — the shared last-commit-wins
    # collapse (`table.collapse_row_changes`, also the replication path)
    final = collapse_row_changes(
        corpus.row_changes(base["version"], v_now)
        .select("doc_id", "text", "_change_type", "_commit_version"),
        "doc_id",
    ).localCheckpoint(eager=True)  # batch-sized; reused twice below
    live = final.filter(F.col("op") == "upsert").select("doc_id", "text")
    dead = final.filter(F.col("op") == "delete").select("doc_id")
    cdc = neardup_index_entries(live).withColumn("op", F.lit("upsert"))
    cdc = cdc.unionByName(
        dead.select(
            "doc_id",
            F.lit(None).cast("array<bigint>").alias("hh"),
            F.lit(None).cast("array<bigint>").alias("sig"),
            F.lit("delete").alias("op"),
        )
    )
    if not final.take(1):
        return idx.manifest()["version"]
    return idx.apply_cdc(
        cdc,
        key="doc_id",
        idempotency_token=idempotency_token,
        op_extra={"base": {"path": base["path"], "version": v_now}},
    )


#: below this corpus size a REBUILD typically beats sync (the measured
#: SCALING.md "Dedup-index sync" table: 50k-doc corpora 0.6–0.8× —
#: re-shingling is cheap and sync's ~10 fixed Spark jobs dominate;
#: 500k-doc corpora 3.5–3.9× in sync's favor, where rebuild's
#: re-shingle-everything term has grown with the corpus)
MAINTAIN_REBUILD_BELOW_BYTES = 16 * 1024 * 1024

#: key-range overlap depth (`table.stats_overlap_depth`) above which
#: the maintain policy re-clusters the layout: a fresh build is ~1
#: (disjoint file ranges), each range-spanning sync patch adds ~1, and
#: every extra unit is one more file EVERY future probe must open
MAINTAIN_FRAG_DEPTH_MAX = 2


def maintain_neardup_index(
    spark: SparkSession,
    index_path: str,
    dry_run: bool = False,
    rebuild_below_bytes: int = MAINTAIN_REBUILD_BELOW_BYTES,
    frag_depth_max: int = MAINTAIN_FRAG_DEPTH_MAX,
    idempotency_token: str | None = None,
    vacuum_retain_last: int | None = None,
) -> dict:
    """ONE maintenance call for a versioned-base dedup index (r12,
    VERDICT r11 #5): read the staleness probes and pick — then run —
    the right verb, encoding SCALING.md's measured decision table
    ("Dedup-index sync vs rebuild") instead of leaving the choice to
    the operator:

    - base ``unchanged`` since the sync point → no content action;
    - base ``appended``/``rewritten`` and the corpus is SMALL
      (``rebuild_below_bytes``, default 16 MiB ≈ the measured ~50k-doc
      regime where rebuild wins 0.6–0.8×) → ``build_neardup_index``
      from the current snapshot;
    - otherwise → ``sync_neardup_index`` (change-feed cost; 3.5–3.9×
      faster than rebuild at 500k docs);
    - afterwards, if the layout's doc_id overlap depth exceeds
      ``max(frag_depth_max, baseline)`` — where baseline is the depth
      at the last retained clustering (``table.
      clustered_baseline_depth``): growth above it is reducible patch
      fragmentation, the degradation VERDICT r11 flagged — re-cluster
      with ``optimize(cluster_by=["doc_id"])``; skipped when no file
      has doc_id stats (non-numeric keys: nothing prunes either way)
      and after a rebuild (already freshly clustered).

    ``vacuum_retain_last`` (optional) completes the lifecycle: after
    the content/compact actions, sweep the index table's own internal
    versions to the newest N (sync patches and compactions accumulate
    them; the index is a derived artifact, so its history has no
    consumers of its own to strand — time travel of the index itself is
    the only thing the knob trades).

    ``dry_run=True`` returns the PLAN (actions + reasons) without
    touching anything; the executed report re-probes fragmentation
    AFTER the content action (a scattered sync adds the very patch
    file the probe measures), so a real run may compact where the plan
    did not. Returns ``{"actions", "reasons", "kind", "frag_depth",
    "dry_run"[, "index_version"]}``."""
    from ..table import clustered_baseline_depth, stats_overlap_depth

    if vacuum_retain_last is not None and vacuum_retain_last < 1:
        # validate the retention leg BEFORE any content action runs —
        # surfacing this from vacuum() after a sync/rebuild already
        # executed would lose the report of what ran (ADVICE r12)
        raise ValueError(
            "vacuum_retain_last must be >= 1 (or None to skip the "
            f"retention leg), got {vacuum_retain_last}"
        )
    idx = VersionedTable(spark, index_path)
    st = neardup_index_staleness(spark, index_path, allow_rewritten=True)
    corpus = VersionedTable(spark, st["base_path"])
    plan: list[str] = []
    reasons: list[str] = []
    if st["kind"] == "unchanged":
        reasons.append(
            f"base unchanged since v{st['synced_at_base_version']} — "
            "no content action"
        )
    elif corpus.visible_bytes(stop_at=rebuild_below_bytes) < rebuild_below_bytes:
        plan.append("rebuild")
        reasons.append(
            f"base {st['kind']} and corpus < "
            f"{rebuild_below_bytes >> 20} MiB — re-shingling a small "
            "corpus beats sync's fixed job chain (SCALING.md: 0.6-0.8x "
            "at 50k docs)"
        )
    else:
        plan.append("sync")
        reasons.append(
            f"base {st['kind']} and corpus >= "
            f"{rebuild_below_bytes >> 20} MiB — sync at change-feed cost "
            "(SCALING.md: 3.5-3.9x over rebuild at 500k docs)"
        )

    def frag_depth() -> int | None:
        man = idx.manifest()
        stats = man.get("stats") or {}
        if not any("doc_id" in (stats.get(f) or {}) for f in man["files"]):
            return None  # nothing prunes on doc_id; compaction can't help
        return stats_overlap_depth(man, "doc_id")

    def frag_floor() -> int:
        # depth at the last retained clustering = the layout's legitimate
        # shape; growth above max(it, frag_depth_max) is reducible
        return max(frag_depth_max, clustered_baseline_depth(idx, "doc_id"))

    depth = frag_depth()
    if dry_run:
        if "rebuild" not in plan and depth is not None and depth > frag_floor():
            plan.append("compact")
            reasons.append(
                f"layout doc_id overlap depth {depth} > {frag_floor()} "
                "(max of frag_depth_max and the last clustering's depth) "
                "— stats pruning degraded; re-cluster"
            )
        if vacuum_retain_last is not None:
            plan.append("vacuum")
            reasons.append(
                f"sweep index versions to the newest {vacuum_retain_last}"
            )
        return {"actions": plan, "reasons": reasons, "kind": st["kind"],
                "frag_depth": depth, "frag_floor": frag_floor(),
                "dry_run": True}
    actions: list[str] = []
    for a in plan:
        if a == "rebuild":
            v_now = corpus.manifest()["version"]
            build_neardup_index(
                spark, corpus.read(v_now), index_path,
                base_path=st["base_path"], base_version=v_now,
            )
        else:
            sync_neardup_index(
                spark, index_path, idempotency_token=idempotency_token
            )
        actions.append(a)
    if "rebuild" not in actions:
        depth = frag_depth()  # re-probe: the sync may have fragmented
        floor = frag_floor()
        if depth is not None and depth > floor:
            idx.optimize(cluster_by=["doc_id"])
            actions.append("compact")
            reasons.append(
                f"post-sync layout doc_id overlap depth {depth} > {floor} "
                "(max of frag_depth_max and the last clustering's depth) "
                "— re-clustered"
            )
            depth = frag_depth()
    else:
        depth = frag_depth()
    if vacuum_retain_last is not None:
        deleted = idx.vacuum(retain_last=vacuum_retain_last)
        actions.append("vacuum")
        reasons.append(
            f"swept {deleted} unreferenced file(s), retaining the newest "
            f"{vacuum_retain_last} index version(s)"
        )
    return {"actions": actions, "reasons": reasons, "kind": st["kind"],
            "frag_depth": depth, "frag_floor": frag_floor(),
            "dry_run": False,
            "index_version": idx.manifest()["version"]}


def _bands(entries: DataFrame) -> DataFrame:
    return entries.select(
        "doc_id", F.posexplode(F.expr(_BANDS_EXPR)).alias("band_idx", "band_key")
    )


def minhash_neardup_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    version: int | None = None,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs involving the NEW batch, against index ``version``
    (default latest) — batch-vs-corpus AND batch-internal pairs, exactly
    the full-corpus operator's output restricted to pairs that touch the
    batch: (doc_a, doc_b, jaccard) with doc_a < doc_b, Jaccard ≥
    ``threshold``, verified exactly on the stored shingle sets.

    Plan: the batch's band rows broadcast against a (doc_id, sig)-pruned
    index scan (corpus never shuffles; matches ∝ collisions); batch-
    internal candidates come from in-bucket expansion of the batch's own
    bands (tiny). The three BOUNDED frames (batch entries, candidate
    pairs, fetched shingle sets — all batch- or collision-sized, never
    corpus-sized) are eagerly localCheckpoint'd because multiple branches
    reuse each and re-deriving them would re-scan the index per branch.
    Verify fetches only the candidate ids' shingle sets via one more
    pruned index scan.

    A doc_id present in BOTH the batch and the index is treated as the
    same document (self-pairs excluded) — append batches with fresh ids.
    """
    _require_doc_frame(new_docs, "minhash_neardup_incremental")
    idx = VersionedTable(spark, index_path).read(version)
    new = neardup_index_entries(new_docs).localCheckpoint(eager=True)
    nb, ib = _bands(new), _bands(idx)

    cross = (
        ib.withColumnRenamed("doc_id", "old_id")
        .join(F.broadcast(nb.withColumnRenamed("doc_id", "new_id")),
              ["band_idx", "band_key"])
        .filter(F.col("new_id") != F.col("old_id"))
        .select(
            F.least("new_id", "old_id").alias("doc_a"),
            F.greatest("new_id", "old_id").alias("doc_b"),
        )
    )
    # batch-internal candidates: same in-bucket expansion as the batch op
    within = (
        nb.groupBy("band_idx", "band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .selectExpr(
            "explode(flatten(transform(sequence(1, size(ids) - 1),"
            " i -> transform(slice(ids, i + 1, size(ids) - i),"
            " y -> named_struct('doc_a', element_at(ids, i), 'doc_b', y))))) AS pair"
        )
        .select("pair.doc_a", "pair.doc_b")
    )
    cand = cross.unionByName(within).distinct().localCheckpoint(eager=True)

    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    have = idx.select("doc_id", "hh").unionByName(new.select("doc_id", "hh"))
    # docs in both batch and index contribute identical (doc_id, hh) rows
    # twice; collapse so the verify joins stay 1:1
    need = (
        have.join(F.broadcast(ids), "doc_id")
        .groupBy("doc_id").agg(F.first("hh").alias("hh"))
        .localCheckpoint(eager=True)
    )
    sa = need.select(F.col("doc_id").alias("doc_a"), F.col("hh").alias("sh_a"))
    sb = need.select(F.col("doc_id").alias("doc_b"), F.col("hh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
