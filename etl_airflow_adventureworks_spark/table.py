"""Manifest-committed versioned parquet table (minimal lakehouse commit).

The plain-parquet sinks in this repo document a real operational gap: an
overwrite rewrite is not atomic, so a crash mid-write can expose partial
data to readers (see ``streaming.events.stream_upsert_to_parquet`` and
``sinks.compact_table``). Lakehouse formats (Delta/Iceberg) close this with
a metadata commit; their jars aren't in this image, so this module
implements the smallest honest version of the same idea with nothing but
parquet files and one JSON manifest per commit:

    <root>/
      data/c<version>-<uuid>/part-*.parquet     immutable, never rewritten
      _manifests/v<00000042>.json               the committed file list
      _changes/c<version>-<uuid>/part-*.parquet row-level change rows a
                                                rewrite commit recorded
                                                (r10 — see row_changes)

Readers resolve ``max(version)`` and scan exactly the files that manifest
lists — a half-written data directory is invisible until its manifest
lands, and the manifest itself becomes visible only via an atomic rename
of a fully-written temp file. Old versions stay readable (time travel)
until ``vacuum`` drops files no retained manifest references.

Crash-atomicity contract (single writer): a failure at ANY point before
the final rename leaves the previous version intact — orphaned data files
and tmp manifests are garbage, not corruption, and ``vacuum`` sweeps them.
Concurrent writers additionally need a filesystem whose rename fails on an
existing destination (HDFS does; POSIX local overwrites, S3 isn't a
rename at all) — same caveat every manifest-based format carries without
a locking service. The intended writer here is one streaming query or one
batch job, which that contract covers.

Exactly-once streaming: ``commit`` takes an ``idempotency_token`` (the
foreachBatch epoch id). A replayed micro-batch re-commits with the token
of the already-committed version, which is detected and skipped, so
crash-replay cannot double-apply — this converts the repo's foreachBatch
upsert from at-least-once to exactly-once. See
``tests/test_versioned_table.py`` for the replay proof.

All filesystem access goes through Hadoop's FileSystem API resolved from
the path scheme (like ``sinks.compact_table``), so file://, hdfs:// and
s3a:// behave identically modulo the rename caveat above.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
#: consumer registry (r13, VERDICT r12 #2): one tiny hash-named JSON file
#: per registered consumer path — written by rollup refreshes, replicas,
#: and derived index builds/syncs at every reflect, read by
#: ``vacuum(respect_consumers="auto")`` to compute the retention floor
#: without a hand-maintained list
_CONSUMERS_DIR = "_consumers"
#: grace window (r14, VERDICT r13 #2) for a REGISTERED consumer that
#: currently records no reflected version — e.g. a rollup/replica mid
#: teardown-rebuild. Within it, ``safe_retain_floor("auto")`` pins the
#: floor to ALL retained versions (a concurrent auto-vacuum cannot
#: strand the rebuild window); past it the entry degrades to the loud
#: skip and ``prune_consumers`` may retire it. Measured against the
#: entry's last-reflect heartbeat (mtime, touched at every
#: ``register_consumer``), so a healthy consumer's clock restarts at
#: each refresh while a deleted-without-retire one ages out in a day.
CONSUMER_EMPTY_GRACE_SECONDS = 24 * 3600
_DATA_DIR = "data"
#: row-level change files (Delta-CDF-style) recorded by rewrite commits
#: (upsert / delete_where / apply_cdc) so `row_changes` can serve a
#: row-delta across them; never part of the visible rowset
_CHANGES_DIR = "_changes"
#: the change-row tag column: insert | update_preimage | update_postimage
#: | delete (Delta CDF's vocabulary)
CHANGE_TYPE_COL = "_change_type"
#: the commit version a change row belongs to (added at read time)
CHANGE_VERSION_COL = "_commit_version"

#: bounded OCC retries — a conflicting writer bumps the version under us;
#: each retry re-reads the latest manifest and recomputes (appends re-merge
#: the file list; upsert/delete/cdc recompute against the new snapshot)
_MAX_COMMIT_ATTEMPTS = 5

#: batches up to this many rows get EXACT stats-based file pruning in the
#: cow merge / CDC apply (sorted key collect + per-file bisect — ≤ ~1 MB
#: driver memory); larger batches fall back to [min, max] range overlap,
#: which is coarse when a batch mixes far-apart key ranges but never
#: wrong (the semi-join probe stays the source of truth either way)
_PRUNE_KEYS_COLLECT_MAX = 100_000


def numeric_stats_types() -> tuple:
    """The Spark column types eligible for per-file min/max stats — the
    ONE list `_validate_stats_cols`, `optimize(cluster_by=...)` and the
    index builders' key-clustering all consult (a type added here gains
    skip-scan support everywhere at once). r13 added DATE and TIMESTAMP
    (the name is historical): event tables cluster on time more often
    than on anything else, and without stats on the time column neither
    keyed-rewrite pruning nor the rollup's group-local refresh could
    skip a single file on it. Temporal bounds are stored ENCODED as
    epoch integers (``_stats_encode``) so manifests stay JSON and
    comparisons stay exact."""
    from pyspark.sql import types as T

    # TimestampNTZType is deliberately ABSENT: non-Arrow collect hands
    # NTZ values back as zone-less naive datetimes while TimestampType
    # arrives as OS-zone wall clock — `_stats_encode` cannot tell the
    # two naive shapes apart, so supporting both would skew one of them
    # by the process offset (a wrong-skip hazard). Cast NTZ to
    # TIMESTAMP for a stats-clustered layout.
    return (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType,
            T.DateType, T.TimestampType)


def _process_utc_offset():
    """The driver process's (fixed) UTC offset as a timedelta — the
    constant ``_stats_encode`` subtracts to turn OS-wall-clock naive
    datetimes (what non-Arrow ``collect`` hands back) into true epoch
    instants. Only meaningful when ``_session_tz_fixed_offset`` already
    passed (every temporal-stats site checks it first); sampled once per
    observed process zone."""
    import datetime as _dt
    import time as _time

    key = (getattr(_time, "tzname", None), getattr(_time, "timezone", None))
    hit = _TZ_OFFSET_CACHE.get(key)
    if hit is None:
        hit = _dt.datetime(2024, 1, 1, 12).astimezone().utcoffset()
        _TZ_OFFSET_CACHE[key] = hit
    return hit


_TZ_OFFSET_CACHE: dict = {}


def _stats_encode(v):
    """Order-preserving, JSON-safe encoding of a stats bound or pruning
    key: ints pass through exact (JSON ints are arbitrary precision —
    a float cast rounds longs above 2^53), floats/Decimals as before,
    ``datetime.date`` → epoch DAYS, naive ``datetime.datetime`` → true
    epoch MICROSECONDS (the OS wall clock non-Arrow ``collect`` hands
    back, minus the process's fixed UTC offset — so manifests written
    on a UTC machine and pruned on a fixed "+05:00" one compare the
    SAME instants; each process's own fixed-offset/zone-agreement
    requirement is enforced by ``_session_tz_fixed_offset`` at every
    temporal-stats site). Timedelta division is exact integer
    arithmetic (no float rounding at microsecond precision)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):  # before date: datetime IS a date
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        else:
            v = v - _process_utc_offset()
        return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(
            microseconds=1
        )
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if v is None or isinstance(v, int):
        return v
    return float(v)


#: session-timezone fixed-offset checks, cached per tz string
_TZ_FIXED_CACHE: dict[str, bool] = {}


def _tz_probe_samples():
    """Midday probes across both hemispheres' DST seasons over the whole
    epoch range a 32-bit-era dataset can hold — shared by the session and
    process fixed-offset checks so the two classify identically."""
    import datetime as _dt

    return [
        _dt.datetime(y, m, 1, 12, 0)
        for y in range(1970, 2038, 1)
        for m in (1, 7)
    ]


def _process_tz_fixed_offset() -> bool:
    """Whether the DRIVER PROCESS zone alone has ONE constant UTC offset
    (the weaker half of ``_session_tz_fixed_offset``). What it buys
    (r14, VERDICT r13 #1): non-Arrow ``collect`` converts TimestampType
    through ``datetime.fromtimestamp`` — under a fixed process offset
    that map is monotone and constant-invertible, so values computed and
    compared WITHIN one process (the rollup's monotone-dim endpoint
    images vs the touched keys, both collected here, both under the same
    SESSION semantics) stay order-exact even when the SESSION zone has
    DST. A DST process zone breaks the map's monotonicity at the fold
    hour, so callers must then decline timestamp-image comparisons."""
    import time as _time

    key = (
        getattr(_time, "tzname", None),
        getattr(_time, "timezone", None),
        getattr(_time, "daylight", None),
    )
    hit = _PROC_TZ_FIXED_CACHE.get(key)
    if hit is None:
        try:
            hit = len(
                {d.astimezone().utcoffset() for d in _tz_probe_samples()}
            ) == 1
        except Exception:
            hit = False
        _PROC_TZ_FIXED_CACHE[key] = hit
    return hit


_PROC_TZ_FIXED_CACHE: dict = {}


def _session_tz_fixed_offset(spark: SparkSession) -> bool:
    """Whether temporal wall-clock comparisons are SAFE in this process:
    the session timezone has ONE constant UTC offset (UTC, Etc/GMT+N,
    fixed "+05:30", ...), the DRIVER PROCESS zone does too, and the two
    offsets AGREE. Temporal stats compare naive wall-clock values, and
    wall-clock order equals Spark's instant order only under a fixed
    offset — a DST zone folds an hour twice a year, where a wall-clock
    comparison could wrongly SKIP a file that does contain a key (a
    lost write). The PROCESS zone matters because non-Arrow ``collect``
    converts TimestampType through ``datetime.fromtimestamp`` — the OS
    zone, not the session zone — so the recorded bounds live in OS
    wall-clock while a filter interprets the caller's values in SESSION
    wall-clock; both must be the same fixed offset. The engine's own
    sessions pin UTC (`session.get_spark`) and the test/bench/driver
    environments run UTC processes; anything else degrades every
    temporal stats site to no-pruning / no-stats (never wrongly
    skipped)."""
    import time as _time

    tz = spark.conf.get("spark.sql.session.timeZone")
    # key the cache by (session tz, process tz): tzset() in tests — or a
    # daemon reconfiguring TZ — must not read a stale verdict
    key = f"{tz}|{getattr(_time, 'tzname', ('?',))!r}|{_time.timezone if hasattr(_time, 'timezone') else '?'}|{_time.daylight if hasattr(_time, 'daylight') else '?'}"
    hit = _TZ_FIXED_CACHE.get(key)
    if hit is not None:
        return hit
    samples = _tz_probe_samples()
    # a zone with ANY transition in-span (DST or historical re-offset —
    # Volgograd 2020, Pyongyang 2015) classifies unsafe, because
    # fromtimestamp applies the offset in force AT each value's epoch
    # and no single constant linearizes a zone that moved. Cached per
    # (session, process) zone pair.
    try:
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        session_offs = {d.replace(tzinfo=z).utcoffset() for d in samples}
        # the process zone, as fromtimestamp/astimezone resolve it
        proc_offs = {d.astimezone().utcoffset() for d in samples}
        ok = (
            len(session_offs) == 1
            and len(proc_offs) == 1
            and session_offs == proc_offs
        )
    except Exception:
        ok = False  # unresolvable zone: assume unsafe
    _TZ_FIXED_CACHE[key] = ok
    return ok


def _tz_sensitive_cols(schema_or_fields) -> set:
    """Column names whose stats comparisons depend on the session /
    process timezone: TimestampType ONLY — DateType is wall-clock by
    definition, and TimestampNTZType carries no stats at all (see
    ``numeric_stats_types``)."""
    from pyspark.sql import types as T

    fields = getattr(schema_or_fields, "fields", schema_or_fields)
    return {
        f.name for f in fields if isinstance(f.dataType, T.TimestampType)
    }


def _stats_decode(v, dtype):
    """Inverse of ``_stats_encode`` for TEMPORAL columns (numeric stats
    decode to themselves): epoch days → ``date``, epoch micros → naive
    ``datetime`` — what the rollup's monotone-dim pruning needs to
    evaluate a dim expression at a file's recorded bounds."""
    import datetime as _dt

    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dtype, T.DateType):
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
    if isinstance(dtype, T.TimestampType):
        return (
            _dt.datetime(1970, 1, 1)
            + _dt.timedelta(microseconds=int(v))
            + _process_utc_offset()  # back to OS/session wall clock —
            # the exact inverse of _stats_encode's naive branch
        )
    return v


def _widen_float_bounds(lo, hi):
    """Stats recorded as floats (pre-r11 manifests; Decimal columns) may
    have rounded an integral bound by up to half an ulp — widen by a
    relative epsilon before any file-SKIPPING test so a wrong skip is
    impossible (exact int bounds and genuinely-float columns widen by
    ~nothing). Only skipping decisions use this; kept files re-verify
    via the probe/filter as always."""
    if isinstance(lo, float):
        lo = lo - abs(lo) * 2.0 ** -50
    if isinstance(hi, float):
        hi = hi + abs(hi) * 2.0 ** -50
    return lo, hi


class CommitConflict(IOError):
    """Another writer published our target version first. Public ops
    retry with a recompute (bounded); surfaced only when retries are
    exhausted or the writes are genuinely unreconcilable."""


class VersionedTable:
    """Handle on a manifest-committed table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        jvm = spark._jvm
        self._HPath = jvm.org.apache.hadoop.fs.Path
        self._root = self._HPath(self.path)
        self._fs = self._root.getFileSystem(spark._jsc.hadoopConfiguration())
        self._iou = jvm.org.apache.commons.io.IOUtils

    # ---------------------------------------------------------------- io

    def _write_bytes(self, hpath, data: bytes, overwrite: bool) -> None:
        out = self._fs.create(hpath, overwrite)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def _read_json(self, hpath) -> dict:
        stream = self._fs.open(hpath)
        try:
            return json.loads(self._iou.toString(stream, "UTF-8"))
        finally:
            stream.close()

    def _manifest_path(self, version: int):
        return self._HPath(f"{self.path}/{_MANIFEST_DIR}/v{version:08d}.json")

    # ------------------------------------------------------------ catalog

    def versions(self) -> list[int]:
        """Committed versions, ascending (empty for a fresh/absent table)."""
        mdir = self._HPath(f"{self.path}/{_MANIFEST_DIR}")
        if not self._fs.exists(mdir):
            return []
        out = []
        for st in self._fs.listStatus(mdir):
            name = st.getPath().getName()
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def manifest(self, version: int | None = None) -> dict | None:
        """The manifest dict of ``version`` (default: latest), or None."""
        vs = self.versions()
        if not vs:
            return None
        v = vs[-1] if version is None else version
        if v not in vs:
            raise ValueError(f"version {v} not in {self.path} (have {vs})")
        return self._read_json(self._manifest_path(v))

    # ------------------------------------------------------------- write

    def _write_files(self, df: DataFrame, version: int, top: str) -> list[str]:
        """Materialize ``df`` under an immutable per-commit directory of
        ``top`` (``data`` or ``_changes``) and return the table-relative
        parquet file paths."""
        sub = f"{top}/c{version:08d}-{uuid.uuid4().hex[:12]}"
        df.write.mode("error").parquet(f"{self.path}/{sub}")
        files = []
        for st in self._fs.listStatus(self._HPath(f"{self.path}/{sub}")):
            name = st.getPath().getName()
            if name.endswith(".parquet"):
                files.append(f"{sub}/{name}")
        return sorted(files)

    def _write_data_files(self, df: DataFrame, version: int) -> list[str]:
        return self._write_files(df, version, _DATA_DIR)

    def _write_change_files(self, changes_df: DataFrame, version: int) -> list[str]:
        """Materialize a rewrite commit's row-level change rows (table
        columns + ``_change_type``) under an immutable per-commit
        directory in ``_changes/``. Change files are metadata for
        ``row_changes`` — never part of the visible rowset — and a failed
        attempt's files are unreferenced orphans ``vacuum`` sweeps, same
        as data files."""
        return self._write_files(changes_df, version, _CHANGES_DIR)

    @staticmethod
    def _check_additive(latest: dict, schema) -> None:
        """Additive-only schema evolution: appends may ADD columns
        (readers see NULL for them in pre-evolution files — the
        manifest schema is applied to every listed file), but a
        dropped column would silently vanish from old rows and a
        type change would corrupt them, so both fail loud here."""
        from pyspark.sql import types as T

        old_schema = T.StructType.fromJson(json.loads(latest["schema"]))
        old = {f.name: f.dataType.simpleString() for f in old_schema}
        new = {f.name: f.dataType.simpleString() for f in schema}
        missing = sorted(n for n in old if n not in new)
        changed = sorted(
            f"{n}: {t} -> {new[n]}" for n, t in old.items()
            if n in new and new[n] != t
        )
        if missing or changed:
            raise ValueError(
                "append schema must be additive: "
                + (f"missing columns {missing}" if missing else "")
                + ("; " if missing and changed else "")
                + (f"type changes [{', '.join(changed)}]" if changed else "")
            )

    def commit(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        idempotency_token: str | None = None,
        stats_cols: list[str] | None = None,
        op_info: dict | None = None,
        retry: bool = True,
        changes_df: DataFrame | None = None,
    ) -> int:
        """Write ``df``'s files and atomically publish a new manifest.

        ``mode='overwrite'`` replaces the visible file set; ``'append'``
        adds to it. Returns the committed version. If ``idempotency_token``
        equals the latest manifest's token the commit is a no-op replay
        (returns the existing version, writes nothing).

        ``stats_cols`` (numeric columns only) records per-file min/max in
        the manifest — the skip-scan index `read_where` prunes with.
        Appends only compute stats for the NEW files; earlier files keep
        the stats their committing manifest recorded (a file with no
        recorded stats is never pruned, so mixing is sound).

        OCC (r9, VERDICT r8 #3): a rename conflict with a concurrent
        writer no longer kills the job — the data files are already on
        disk and immutable, so the commit re-reads the new latest
        manifest, re-merges the file list (appends; an overwrite just
        re-targets the next version — last writer wins, the standard
        overwrite contract), re-validates the additive-schema rule
        against the NEW schema, and re-publishes, bounded by
        ``_MAX_COMMIT_ATTEMPTS``. ``op_info`` is recorded as the
        manifest's ``op`` entry (``optimize`` uses it to mark pure
        rewrites as ``rowset_preserving`` for the change feed).
        ``retry=False`` is for SNAPSHOT-DEPENDENT callers (upsert's
        bootstrap/fallback, optimize): their payload was computed
        against a snapshot, so a blind re-publish would drop the
        conflicting writer's rows — they propagate the conflict and
        recompute the whole operation via ``_occ_retry`` instead.

        ``changes_df`` (r14) records the Delta-CDF-style row delta of
        an OVERWRITE the caller computed itself (schema: ``df``'s
        columns + ``_change_type``) — what ``refresh_rollup`` passes so
        a rollup's own refresh commits are walkable by ``row_changes``
        and downstream consumers (a replica OF the rollup, a
        rollup-of-a-rollup) sync at delta cost instead of failing loud
        / full-copying. An empty ``changes_df`` records a ZERO row
        delta (``"changes": []`` in the manifest), distinct from no
        recording at all."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")
        if changes_df is not None:
            if mode == "append":
                # ADVICE r14: row_changes classifies an append window by
                # the file-set prev<=cur test FIRST, so recorded change
                # rows on an append would be silently ignored — an append
                # IS its own row delta; recording a different one is a
                # caller bug, not something to drop on the floor
                raise ValueError(
                    "changes_df is only meaningful with mode='overwrite' "
                    "(an append IS its own row delta — row_changes reads "
                    "the appended files directly)"
                )
            want = set(df.columns) | {CHANGE_TYPE_COL}
            if set(changes_df.columns) != want:
                raise ValueError(
                    "changes_df must carry exactly the committed columns "
                    f"plus {CHANGE_TYPE_COL} — got {sorted(changes_df.columns)}, "
                    f"want {sorted(want)}"
                )
        latest = self.manifest()
        if (
            idempotency_token is not None
            and latest is not None
            and latest.get("token") == idempotency_token
        ):
            return latest["version"]
        if mode == "append" and latest is not None:
            self._check_additive(latest, df.schema)
        if stats_cols:
            self._validate_stats_cols(stats_cols, df.schema)
        version = (latest["version"] + 1) if latest else 1
        new_files = self._write_data_files(df, version)
        new_stats: dict[str, dict] = {}
        if stats_cols and new_files:
            new_stats = self._file_stats(new_files, stats_cols, df.schema)
        change_files: list[str] | None = None
        changes_written_at = version
        if changes_df is not None:
            # an empty delta records "changes": [] (zero rows, walkable)
            # rather than a 0-row part file
            change_files = (
                self._write_change_files(changes_df, version)
                if changes_df.take(1) else []
            )
        last_err: CommitConflict | None = None
        for _ in range(_MAX_COMMIT_ATTEMPTS if retry else 1):
            if change_files and changes_written_at != version:
                # ADVICE r14: an OCC retry bumped the target version —
                # re-land the change files under a directory named for
                # the version that will actually reference them (the
                # stale-named originals become vacuum-swept orphans);
                # forensics can then trust the c<version> prefix
                change_files = self._write_change_files(changes_df, version)
                changes_written_at = version
            stats: dict[str, dict] = {}
            files = new_files
            if mode == "append" and latest:
                stats.update(latest.get("stats") or {})
                files = latest["files"] + new_files
            stats.update(new_stats)
            man = {
                "version": version,
                "files": files,
                "schema": df.schema.json(),
                "token": idempotency_token,
            }
            if op_info:
                man["op"] = op_info
            if stats:
                man["stats"] = stats
            if change_files is not None:
                man["changes"] = change_files
            try:
                self._publish_manifest(man)
                return version
            except CommitConflict as e:
                last_err = e
                latest = self.manifest()
                if (
                    idempotency_token is not None
                    and latest is not None
                    and latest.get("token") == idempotency_token
                ):
                    return latest["version"]  # lost the race to our own replay
                if mode == "append" and latest is not None:
                    self._check_additive(latest, df.schema)
                version = (latest["version"] + 1) if latest else 1
        raise last_err

    def _publish_manifest(self, man: dict) -> None:
        """Atomically publish ``man`` as version ``man['version']``: write a
        fully-formed temp file, then rename — the commit point every writer
        (commit / delete_where) shares."""
        version = man["version"]
        data = json.dumps(man, indent=1).encode()
        tmp = self._HPath(
            f"{self.path}/{_MANIFEST_DIR}/.tmp-{uuid.uuid4().hex}.json"
        )
        final = self._manifest_path(version)
        self._write_bytes(tmp, data, overwrite=False)
        if self._fs.exists(final) or not self._fs.rename(tmp, final):
            self._fs.delete(tmp, False)
            raise CommitConflict(
                f"commit conflict: version {version} already exists at {self.path}"
            )

    def _validate_stats_cols(self, cols: list[str], schema) -> None:
        numeric = numeric_stats_types()
        by_name = {f.name: f.dataType for f in schema.fields}
        for c in cols:
            if c not in by_name:
                raise ValueError(f"stats_cols: no such column {c!r}")
            if not isinstance(by_name[c], numeric):
                raise ValueError(
                    f"stats_cols: {c!r} is {by_name[c].simpleString()}; "
                    "per-file stats support numeric/date/timestamp "
                    "columns only"
                )
        tz_cols = _tz_sensitive_cols(schema) & set(cols)
        if tz_cols and not _session_tz_fixed_offset(self.spark):
            # see _session_tz_fixed_offset: under a DST zone, wall-clock
            # bounds are not instant-ordered and a later pruner could
            # wrongly SKIP a file (a lost write) — refuse to record the
            # hazard at the source
            raise ValueError(
                f"stats_cols {sorted(tz_cols)}: timestamp stats need a "
                "fixed-offset session timezone (got "
                f"{self.spark.conf.get('spark.sql.session.timeZone')!r} "
                "— DST folds wall-clock order); set "
                "spark.sql.session.timeZone=UTC (session.get_spark does)"
            )

    def _file_stats(
        self, rel_files: list[str], cols: list[str], schema
    ) -> dict[str, dict]:
        """{relative file -> {col: [min, max]}} for the given stats-
        eligible columns (validated before any file was written) — one
        pass over exactly those files. Temporal bounds are stored
        ENCODED (``_stats_encode``: epoch days / micros) so the
        manifest stays JSON and pruning comparisons stay exact."""
        from pyspark.sql import functions as F

        tz_cols = _tz_sensitive_cols(schema)
        if tz_cols & set(cols) and not _session_tz_fixed_offset(self.spark):
            import warnings

            warnings.warn(
                f"{self.path}: dropping timestamp stats "
                f"{sorted(tz_cols & set(cols))} for this commit — the "
                "session timezone has DST, so wall-clock bounds would "
                "not be instant-ordered (files without stats are never "
                "wrongly skipped; re-optimize under a fixed-offset zone "
                "to restore pruning)",
                RuntimeWarning,
                stacklevel=2,
            )
            cols = [c for c in cols if c not in tz_cols]
            if not cols:
                return {}
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        rows = (
            self.spark.read.parquet(*[f"{self.path}/{f}" for f in rel_files])
            .groupBy(F.input_file_name().alias("f"))
            .agg(*aggs)
            .collect()
        )  # one row per file — constant-size collect
        def rel(uri: str) -> str:
            # rsplit: the table path itself may contain a /data/ segment
            tail = uri.rsplit("/" + _DATA_DIR + "/", 1)[1]
            return f"{_DATA_DIR}/{tail}"
        out = {}
        for r in rows:
            ent = {}
            for c in cols:
                mn, mx = r[f"mn_{c}"], r[f"mx_{c}"]
                if mn is not None:
                    # _stats_encode keeps integral bounds exact (JSON
                    # ints are arbitrary precision — a float cast rounds
                    # longs above 2^53, which could make the r11 pruning
                    # skip a file that DOES contain a batch key, a
                    # silent lost write) and encodes temporal bounds as
                    # epoch integers
                    ent[c] = [_stats_encode(mn), _stats_encode(mx)]
            out[rel(r["f"])] = ent
        return out

    def read_where(
        self, box: dict[str, tuple], version: int | None = None
    ) -> DataFrame:
        """Skip-scan: read only the files whose recorded min/max stats
        overlap ``box`` ({col: (lo, hi)}), then apply the box as a real
        filter (so results are exact, and files without recorded stats
        are scanned rather than wrongly skipped). With a Z-ordered
        clustering (`operators.layout`) the kept set is small on every
        boxed dimension."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        man = self.manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        stats = man.get("stats") or {}
        schema0 = T.StructType.fromJson(json.loads(man["schema"]))
        unsafe = (
            _tz_sensitive_cols(schema0) & set(box)
            if not _session_tz_fixed_offset(self.spark)
            else set()
        )  # DST session: scan those columns' files (the filter below is
        # exact either way), never wall-clock-skip them
        # the caller's bounds encode ONCE (temporal -> epoch ints, the
        # manifest's stored form); the real filter below uses raw values
        enc_box = {
            c: (_stats_encode(lo), _stats_encode(hi))
            for c, (lo, hi) in box.items()
        }
        keep = []
        for f in man["files"]:
            ent = stats.get(f)
            if ent is None:
                keep.append(f)
                continue
            ok = True
            for c, (lo, hi) in enc_box.items():
                if c not in ent or c in unsafe:
                    continue
                slo, shi = _widen_float_bounds(*ent[c])
                if shi < lo or slo > hi:
                    ok = False
                    break
            if ok:
                keep.append(f)
        schema = schema0
        if not keep:
            df = self.spark.createDataFrame([], schema)
        else:
            df = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in keep]
            )
        for c, (lo, hi) in box.items():
            df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
        return df

    def _candidate_files(
        self,
        files: list[str],
        old_stats: dict,
        key: str,
        batch: DataFrame,
        n_rows: int | None = None,
    ) -> list[str]:
        """The files a keyed rewrite (cow merge / CDC apply) must PROBE:
        every file whose recorded per-file [min, max] on ``key`` may
        contain a batch key (files without recorded stats are always
        candidates — never wrongly skipped). Batches up to
        ``_PRUNE_KEYS_COLLECT_MAX`` rows get EXACT candidacy (sorted key
        collect + per-file bisect), so a window mixing far-apart key
        ranges — e.g. low-range mutations plus high-range inserts —
        still prunes to exactly the overlapped files; larger batches
        fall back to whole-batch [min, max] overlap. On a key-clustered
        table this is what turns a range-local maintenance window into
        a touched-file probe instead of a table scan."""
        from pyspark.sql import functions as F

        if not any(key in (old_stats.get(f) or {}) for f in files):
            return files
        if key in _tz_sensitive_cols(batch.schema) and \
                not _session_tz_fixed_offset(self.spark):
            return files  # DST session: wall-clock pruning could wrongly
            # skip a file containing a batch key — probe everything
        n = batch.count() if n_rows is None else n_rows
        if n <= _PRUNE_KEYS_COLLECT_MAX:
            import bisect

            # no .distinct(): that's a shuffle stage, and the collect is
            # already row-capped — dedupe on the driver instead; encode
            # so temporal keys compare against the manifest's encoded
            # bounds (numbers pass through)
            keys = sorted({
                _stats_encode(r[0]) for r in batch.select(key).collect()
                if r[0] is not None
            })
            if not keys:
                return []  # no non-null keys: nothing can match any file
            out = []
            for f in files:
                ent = old_stats.get(f) or {}
                if key not in ent:
                    out.append(f)
                    continue
                lo, hi = _widen_float_bounds(*ent[key])
                i = bisect.bisect_left(keys, lo)
                if i < len(keys) and keys[i] <= hi:
                    out.append(f)
            return out
        kmin, kmax = batch.agg(F.min(key), F.max(key)).first()
        if kmin is None:
            return []
        kmin, kmax = _stats_encode(kmin), _stats_encode(kmax)
        out = []
        for f in files:
            ent = old_stats.get(f) or {}
            if key not in ent:
                out.append(f)
                continue
            lo, hi = _widen_float_bounds(*ent[key])
            if not (hi < kmin or lo > kmax):
                out.append(f)
        return out

    def _occ_retry(self, attempt_fn) -> int:
        """Run a snapshot-dependent write with bounded OCC retries: on a
        rename conflict the snapshot changed under us, so the WHOLE
        operation recomputes against the new latest manifest (a blind
        re-publish would resurrect rows the other writer rewrote). The
        failed attempt's data files are unreferenced orphans — exactly
        what ``vacuum`` sweeps."""
        last_err: CommitConflict | None = None
        for _ in range(_MAX_COMMIT_ATTEMPTS):
            try:
                return attempt_fn()
            except CommitConflict as e:
                last_err = e
        raise last_err

    def upsert(self, updates: DataFrame, key: str, idempotency_token: str | None = None) -> int:
        """SCD1 merge with bounded OCC retry (r9): a concurrent commit
        does not kill the merge — it recomputes against the new
        snapshot. See ``_upsert_once`` for semantics and cost shape."""
        return self._occ_retry(
            lambda: self._upsert_once(updates, key, idempotency_token)
        )

    def _upsert_once(self, updates: DataFrame, key: str, idempotency_token: str | None = None) -> int:
        """SCD1 merge into the table (updates win on ``key``; bootstrap on
        first commit) published as one atomic version.

        Scale shape (the copy-on-write MERGE): ``updates ∪ (current ⟕̸
        keys)`` decomposes file-by-file, so only the files that CONTAIN a
        matched key are rewritten — a broadcast-sized semi-join probe
        (pre-pruned by the manifest's min/max stats when the key has them)
        finds those files, their survivors are anti-joined and unioned
        with the batch, and every untouched file is carried verbatim with
        its stats. A micro-batch merge into a key-clustered 100 TB table
        therefore rewrites the few files whose stats admit the batch's
        keys — never the table (the old behavior, kept only as the
        fallback when the batch's schema differs from the table's, where
        the union must re-resolve every row anyway).

        Insert-only batches (no key matched) touch NOTHING: the new files
        are pure appends, so the append-only change feed (`changes`)
        remains valid across them; a batch that updates rows is a rewrite
        and trips the feed's guard as before. The manifest records
        ``op = {rows_in_batch, rows_matched, files_rewritten,
        files_carried}``."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        latest = self.manifest()
        if (
            idempotency_token is not None
            and latest is not None
            and latest.get("token") == idempotency_token
        ):
            # replayed micro-batch: skip BEFORE building/materializing the
            # merge (the replay payload may even be partial — never touch it)
            return latest["version"]
        if latest is None:
            return self.commit(
                updates, mode="overwrite", idempotency_token=idempotency_token,
                retry=False,  # a conflicting bootstrap must re-MERGE, not clobber
            )
        schema = T.StructType.fromJson(json.loads(latest["schema"]))
        same_schema = {f.name: f.dataType.simpleString() for f in schema} == {
            f.name: f.dataType.simpleString() for f in updates.schema
        }
        if not same_schema:
            # schema drift: the union re-types every row, so the honest
            # cost IS a full rewrite — the pre-r8 path
            from .operators.upsert import scd1_upsert

            merged = scd1_upsert(self.read(), updates, key).localCheckpoint(
                eager=True
            )
            return self.commit(
                merged, mode="overwrite", idempotency_token=idempotency_token,
                retry=False,  # merged is snapshot-dependent — recompute on conflict
            )
        # the batch is read several times (probe, anti-join, union, write):
        # pin it once — micro-batch-sized, same as the old merged checkpoint
        updates = updates.localCheckpoint(eager=True)
        files = latest["files"]
        old_stats = latest.get("stats") or {}
        n_batch = updates.count()  # once — shared by pruning + op metrics
        # see `_candidate_files`: exact per-file candidacy for bounded
        # batches, [min, max] range overlap beyond the collect cap
        cand = self._candidate_files(
            files, old_stats, key, updates, n_rows=n_batch
        )
        keys_df = updates.select(key).distinct()
        touched: dict[str, int] = {}
        if cand:

            def rel(uri: str) -> str:
                tail = uri.rsplit("/" + _DATA_DIR + "/", 1)[1]
                return f"{_DATA_DIR}/{tail}"

            hits = (
                self.spark.read.schema(schema)
                .parquet(*[f"{self.path}/{f}" for f in cand])
                .select(F.col(key), F.input_file_name().alias("f"))
                .join(keys_df, key, "left_semi")
                .groupBy("f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )  # one row per TOUCHED file
            touched = {rel(r["f"]): r["n"] for r in hits}
        carried = [f for f in files if f not in touched]
        new_data = updates
        version = latest["version"] + 1
        change_files: list[str] = []
        if touched:
            old_touched = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in touched]
            )
            survivors = old_touched.join(keys_df, key, "left_anti")
            new_data = updates.unionByName(survivors)
            # row-level change feed (r10, VERDICT r9 #1): the merge already
            # computes exactly the rows it rewrites, so record them as
            # Delta-CDF-style change rows — preimages are the matched keys'
            # old rows (touched-file-bounded), post/insert split the batch
            # by whether its key matched. All three frames are delta-sized;
            # `row_changes` serves them so continuous rollups survive the
            # upsert instead of full-rebuilding.
            cols = [f.name for f in schema]
            pre = old_touched.join(keys_df, key, "left_semi").select(*cols)
            matched_keys = pre.select(key).distinct()
            post = updates.join(matched_keys, key, "left_semi").select(*cols)
            ins = updates.join(matched_keys, key, "left_anti").select(*cols)
            changes_df = (
                pre.withColumn(CHANGE_TYPE_COL, F.lit("update_preimage"))
                .unionByName(
                    post.withColumn(CHANGE_TYPE_COL, F.lit("update_postimage"))
                )
                .unionByName(ins.withColumn(CHANGE_TYPE_COL, F.lit("insert")))
            )
            change_files = self._write_change_files(changes_df, version)
        if n_batch <= _PRUNE_KEYS_COLLECT_MAX:
            # bounded micro-batch (the streaming steady state): the
            # rewrite is touched-files-sized, so land ~one file per file
            # it replaces instead of one per partition of batch∪survivors
            # — a per-merge +N tiny files would fragment the layout the
            # stats pruning depends on (same discipline as merge_keyed);
            # over-cap batches keep natural write parallelism
            new_data = new_data.coalesce(max(len(touched), 1))
        new_files = self._write_data_files(new_data, version)
        stats = {f: old_stats[f] for f in carried if f in old_stats}
        stat_cols = sorted({c for ent in old_stats.values() for c in ent})
        if stat_cols and new_files:
            stats.update(self._file_stats(new_files, stat_cols, schema))
        man = {
            "version": version,
            "files": carried + new_files,
            "schema": latest["schema"],
            "token": idempotency_token,
            "op": {
                "op": "upsert",
                "rows_in_batch": n_batch,
                "rows_matched": sum(touched.values()),
                "files_probed": len(cand),
                "files_rewritten": len(touched),
                "files_carried": len(carried),
            },
        }
        if change_files:
            man["changes"] = change_files
        if stats:
            man["stats"] = stats
        self._publish_manifest(man)
        return version

    def apply_cdc(
        self,
        batch: DataFrame,
        key: str,
        op_col: str = "op",
        idempotency_token: str | None = None,
        op_extra: dict | None = None,
    ) -> int:
        """CDC apply with bounded OCC retry (r9) — recomputes against
        the new snapshot on a concurrent-writer conflict. See
        ``_apply_cdc_once`` for the batch contract and cost shape.
        ``op_extra`` merges extra keys into the manifest's ``op`` entry
        (e.g. a derived index recording its new base sync point)."""
        return self._occ_retry(
            lambda: self._apply_cdc_once(
                batch, key, op_col, idempotency_token, op_extra
            )
        )

    def _apply_cdc_once(
        self,
        batch: DataFrame,
        key: str,
        op_col: str = "op",
        idempotency_token: str | None = None,
        op_extra: dict | None = None,
    ) -> int:
        """Apply a CDC batch — rows carrying ``op_col`` ∈ {'upsert',
        'delete'} plus the table's columns — as ONE atomic version (the
        Debezium-apply primitive: a replication batch lands whole or not
        at all, never as a delete version racing an upsert version).

        Contract: ONE row per key (collapse multi-op streams to their
        final state first — fail-loud validated); unknown ops fail loud;
        delete rows only need ``key`` populated (other columns ignored).
        Cost shape is the copy-on-write merge's: only the files
        containing any batch key are rewritten (upsert keys replaced,
        delete keys dropped, everything else carried with its stats);
        the batch's upsert rows are appended. ``op`` metrics record both
        counts. Replay via ``idempotency_token`` is a no-op, so a
        foreachBatch CDC consumer passing the epoch id is exactly-once."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        latest = self.manifest()
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        if (
            idempotency_token is not None
            and latest.get("token") == idempotency_token
        ):
            return latest["version"]
        if op_col not in batch.columns:
            raise ValueError(f"apply_cdc: no op column {op_col!r} in batch")
        batch = batch.localCheckpoint(eager=True)
        probe = batch.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(key).alias("nd"),
            F.sum((~F.col(op_col).isin("upsert", "delete")).cast("int")).alias(
                "bad"
            ),
        ).first()
        if probe["bad"]:
            raise ValueError(
                f"apply_cdc: {probe['bad']} row(s) with op outside "
                "{'upsert', 'delete'}"
            )
        if probe["n"] != probe["nd"]:
            raise ValueError(
                "apply_cdc: multiple rows per key — collapse the CDC stream "
                "to one final op per key first"
            )
        schema = T.StructType.fromJson(json.loads(latest["schema"]))
        want = {f.name: f.dataType.simpleString() for f in schema}
        have = {
            f.name: f.dataType.simpleString()
            for f in batch.schema
            if f.name != op_col
        }
        if want != have:
            raise ValueError(
                "apply_cdc: batch payload must match the table schema "
                f"exactly (table {sorted(want.items())}, batch "
                f"{sorted(have.items())}) — a CDC stream that drifted is "
                "an upstream bug, not something to coerce silently"
            )
        files = latest["files"]
        old_stats = latest.get("stats") or {}
        # stats-pruned candidate set (r11): skip probing files whose
        # recorded key stats exclude every batch key — see
        # `_candidate_files` for the exact-vs-range pruning contract
        # (n_rows reuses the contract probe's count — no extra job)
        cand = self._candidate_files(
            files, old_stats, key, batch, n_rows=probe["n"]
        )
        keys_df = batch.select(key)
        touched: dict[str, int] = {}
        if cand:

            def rel(uri: str) -> str:
                tail = uri.rsplit("/" + _DATA_DIR + "/", 1)[1]
                return f"{_DATA_DIR}/{tail}"

            hits = (
                self.spark.read.schema(schema)
                .parquet(*[f"{self.path}/{f}" for f in cand])
                .select(F.col(key), F.input_file_name().alias("f"))
                .join(keys_df, key, "left_semi")
                .groupBy("f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            touched = {rel(r["f"]): r["n"] for r in hits}
        carried = [f for f in files if f not in touched]
        cols = [f.name for f in schema]
        upserts = batch.filter(F.col(op_col) == "upsert").select(*cols)
        new_data = upserts
        version = latest["version"] + 1
        change_files: list[str] = []
        if touched:
            old_touched = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in touched]
            )
            survivors = old_touched.join(keys_df, key, "left_anti")
            new_data = upserts.unionByName(survivors)
            # row-level change feed (r10): classify the touched rows by the
            # batch op that hit them — upsert-matched old rows are
            # preimages, delete-matched old rows are deletes; the batch's
            # upsert rows split into postimages (key existed) and inserts.
            # Deletes of absent keys contribute nothing (idempotent), same
            # as the rowset itself.
            up_keys = batch.filter(F.col(op_col) == "upsert").select(key)
            del_keys = batch.filter(F.col(op_col) == "delete").select(key)
            pre = old_touched.join(up_keys, key, "left_semi").select(*cols)
            dels = old_touched.join(del_keys, key, "left_semi").select(*cols)
            matched_up = pre.select(key).distinct()
            post = upserts.join(matched_up, key, "left_semi").select(*cols)
            ins = upserts.join(matched_up, key, "left_anti").select(*cols)
            changes_df = (
                pre.withColumn(CHANGE_TYPE_COL, F.lit("update_preimage"))
                .unionByName(
                    post.withColumn(CHANGE_TYPE_COL, F.lit("update_postimage"))
                )
                .unionByName(ins.withColumn(CHANGE_TYPE_COL, F.lit("insert")))
                .unionByName(dels.withColumn(CHANGE_TYPE_COL, F.lit("delete")))
            )
            change_files = self._write_change_files(changes_df, version)
        if probe["n"] <= _PRUNE_KEYS_COLLECT_MAX:
            # bounded CDC batch (the replication steady state): land ~one
            # file per file the merge replaces instead of one per
            # partition of upserts∪survivors — a per-sync +N tiny files
            # would fragment the layout the stats pruning depends on
            # (same discipline as merge_keyed / upsert); over-cap batches
            # keep natural write parallelism
            new_data = new_data.coalesce(max(len(touched), 1))
        new_files = self._write_data_files(new_data, version)
        stats = {f: old_stats[f] for f in carried if f in old_stats}
        stat_cols = sorted({c for ent in old_stats.values() for c in ent})
        if stat_cols and new_files:
            stats.update(self._file_stats(new_files, stat_cols, schema))
        man = {
            "version": version,
            "files": carried + new_files,
            "schema": latest["schema"],
            "token": idempotency_token,
            "op": {
                "op": "cdc",
                "rows_upserted": batch.filter(
                    F.col(op_col) == "upsert"
                ).count(),
                "rows_deleted": batch.filter(
                    F.col(op_col) == "delete"
                ).count(),
                "rows_matched": sum(touched.values()),
                "files_probed": len(cand),
                "files_rewritten": len(touched),
                "files_carried": len(carried),
                **(op_extra or {}),
            },
        }
        if change_files:
            man["changes"] = change_files
        if stats:
            man["stats"] = stats
        self._publish_manifest(man)
        return version

    def _candidate_files_multi(
        self,
        files: list[str],
        old_stats: dict,
        key_cols: list[str],
        key_rows: "list | None",
        schema,
        touch_keys: "DataFrame | None" = None,
    ) -> list[str]:
        """Composite-key stats pruning for ``merge_keyed``: keep every
        file whose recorded per-file [min, max] admits some touch-key
        value on EVERY stats-covered key column — per-column exact
        bisect, the ``_candidate_files`` discipline applied
        independently per column (conservative: a file passing each
        column separately may not hold any full tuple, but is never
        wrongly skipped; the semi-join probe stays the source of
        truth). ``key_rows=None`` (collect cap exceeded) switches to the
        DISTRIBUTED exact form (``_candidate_files_joined``): the file
        bounds — manifest-sized, a few thousand rows — broadcast-join
        against the touch keys on range containment, so candidacy stays
        per-key exact at ANY key count with no driver collect (r15
        measured: a 102k-key contiguous window at sf10 blew the collect
        cap, degraded to whole-batch [min, max] overlap, and the 2000
        appended high-range keys stretched the range over 20/32 files —
        the join form prunes it back to the true ~2). A column with any
        NULL touch value cannot prune (file stats ignore NULLs)."""
        import bisect

        tz_unsafe = (
            _tz_sensitive_cols(schema)
            if not _session_tz_fixed_offset(self.spark)
            else set()
        )
        usable = [k for k in key_cols if k not in tz_unsafe]
        if key_rows is None:
            if touch_keys is None or not usable:
                return files
            return self._candidate_files_joined(
                files, old_stats, usable, touch_keys, schema
            )
        cand = files
        for k in usable:
            if not cand:
                break
            vals = [r[k] for r in key_rows]
            if any(v is None for v in vals):
                continue
            try:
                vals = sorted({_stats_encode(v) for v in vals})
            except (TypeError, ValueError):
                continue  # e.g. string keys: no recorded stats anyway

            def may(f: str, k=k, vals=vals) -> bool:
                ent = old_stats.get(f) or {}
                if k not in ent:
                    return True
                lo, hi = _widen_float_bounds(*ent[k])
                i = bisect.bisect_left(vals, lo)
                return i < len(vals) and vals[i] <= hi

            cand = [f for f in cand if may(f)]
        return cand

    def _candidate_files_joined(
        self,
        files: list[str],
        old_stats: dict,
        key_cols: list[str],
        touch_keys: DataFrame,
        schema,
    ) -> list[str]:
        """Distributed EXACT per-key candidacy for touch-key sets above
        the driver collect cap (r15): the per-file [min, max] bounds —
        manifest-sized, thousands of rows, never data — broadcast-join
        against the touch keys on range containment, and the distinct
        hit files (≤ files rows) come back to the driver. Candidacy
        stays per-key exact at ANY key count: a window mixing a
        contiguous update range with far-away inserts prunes to exactly
        the overlapped files, where a whole-batch [min, max] fallback
        would keep everything in between. NULL key values pass every
        bound (file stats ignore NULLs — such a tuple may live
        anywhere), per column, which is exact: the tuple's OTHER
        columns still prune. Files whose bounds fail to round-trip
        into a DataFrame keep candidate status (never wrongly
        skipped)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        by_name = {f.name: f.dataType for f in schema.fields}
        cols = [
            k for k in key_cols
            if any(k in (old_stats.get(f) or {}) for f in files)
        ]
        if not cols:
            return files
        always: list[str] = []
        rows = []
        for f in files:
            ent = old_stats.get(f) or {}
            vals: list = [f]
            has_any = False
            for k in cols:
                if k in ent:
                    lo, hi = _widen_float_bounds(*ent[k])
                    try:
                        lo_d = _stats_decode(lo, by_name[k])
                        hi_d = _stats_decode(hi, by_name[k])
                        has_any = True
                    except Exception:
                        lo_d = hi_d = None
                    vals += [lo_d, hi_d]
                else:
                    vals += [None, None]
            if has_any:
                rows.append(tuple(vals))
            else:
                always.append(f)
        if not rows:
            return files
        bschema = T.StructType(
            [T.StructField("__cfj_f", T.StringType())]
            + [
                fld
                for k in cols
                for fld in (
                    T.StructField(f"__cfj_lo_{k}", by_name[k]),
                    T.StructField(f"__cfj_hi_{k}", by_name[k]),
                )
            ]
        )
        try:
            bdf = self.spark.createDataFrame(rows, bschema)
        except Exception:
            return files  # bounds refuse to round-trip: no pruning
        cond = None
        for k in cols:
            c = (
                F.col(k).isNull()
                | F.col(f"__cfj_lo_{k}").isNull()
                | (
                    (F.col(k) >= F.col(f"__cfj_lo_{k}"))
                    & (F.col(k) <= F.col(f"__cfj_hi_{k}"))
                )
            )
            cond = c if cond is None else (cond & c)
        hits = {
            r["__cfj_f"]
            for r in touch_keys.join(F.broadcast(bdf), cond, "inner")
            .select("__cfj_f")
            .distinct()
            .collect()
        }
        keep = set(always) | hits
        return [f for f in files if f in keep]

    def merge_keyed(
        self,
        updates: DataFrame,
        keys: list[str],
        touch_keys: DataFrame,
        idempotency_token: str | None = None,
        op_info: dict | None = None,
        changes_df: DataFrame | None = None,
        stats_cols: list[str] | None = None,
        expect_version: int | None = None,
    ) -> int:
        """Copy-on-write keyed rewrite with COMPOSITE, null-safe keys
        (r15, VERDICT r14 #1): publish a new version whose rowset is

            (current rows whose key tuple ∉ touch_keys)  ∪  updates

        rewriting ONLY the files that contain a touched key — the
        ``upsert`` discipline generalized from one key column to a key
        tuple, with removals (a touched key absent from ``updates`` is
        deleted). This is the commit primitive ``refresh_rollup`` needs
        to stop paying O(rollup state write) per refresh: the rollup is
        keyed by its dims, a refresh touches few groups, so the new
        version carries every untouched file verbatim (stats included)
        and writes only touched-group-sized data.

        ``updates`` must match the table schema exactly (names+types —
        the caller owns both sides); ``touch_keys`` must carry exactly
        the ``keys`` columns and be a SUPERSET of ``updates``' key
        tuples. Keys compare null-safe (``eqNullSafe`` — a NULL group
        key is a real group, SQL GROUP BY semantics), unlike ``upsert``
        whose single join key follows SQL join NULL semantics.

        SNAPSHOT-DEPENDENT, single attempt: the payload was computed
        against the version this call reads, so a concurrent-writer
        conflict propagates ``CommitConflict`` to the caller, which
        must recompute everything (the ``refresh_rollup`` retry loop) —
        the ``retry=False`` discipline of the rollup's classic
        overwrite. Pass ``expect_version`` = the version the payload
        was COMPUTED from: unlike a full overwrite (whose version
        collision detects any concurrent commit), a keyed rewrite
        CARRIES the latest files, so a commit that landed between the
        caller's read and this call would otherwise be silently merged
        over — the check turns that into the same loud
        ``CommitConflict``. Token replay is a no-op. ``changes_df`` records the
        caller's row delta exactly as in ``commit``; ``stats_cols``
        adds per-file stats on the NEW files for those columns (plus
        whatever columns the carried stats already track), which is
        what makes the NEXT refresh's file pruning possible.

        Cost shape: candidate files are stats-pruned per key column
        (exact bisect vs collected touch keys when ≤
        ``_PRUNE_KEYS_COLLECT_MAX``); one probe scan of candidates
        finds the files actually containing a touched key; only those
        are read again for survivors. On a dims-clustered rollup a
        k-group refresh probes ~k files and rewrites only them."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if not keys:
            raise ValueError(
                "merge_keyed needs at least one key column (a global "
                "single-row table is a plain overwrite)"
            )
        if sorted(touch_keys.columns) != sorted(keys):
            raise ValueError(
                f"touch_keys must carry exactly the key columns {keys}, "
                f"got {touch_keys.columns}"
            )
        latest = self.manifest()
        if latest is None:
            raise FileNotFoundError(
                f"no committed version at {self.path} — merge_keyed "
                "patches an existing table; bootstrap with commit()"
            )
        if (
            idempotency_token is not None
            and latest.get("token") == idempotency_token
        ):
            return latest["version"]
        if expect_version is not None and latest["version"] != expect_version:
            raise CommitConflict(
                f"merge_keyed at {self.path}: payload was computed "
                f"against v{expect_version} but the table is now at "
                f"v{latest['version']} — a concurrent commit landed; "
                "recompute against the new snapshot"
            )
        schema = T.StructType.fromJson(json.loads(latest["schema"]))
        want = {f.name: f.dataType.simpleString() for f in schema}
        have = {f.name: f.dataType.simpleString() for f in updates.schema}
        if want != have:
            raise ValueError(
                "merge_keyed: updates must match the table schema exactly "
                f"(table {sorted(want.items())}, updates "
                f"{sorted(have.items())})"
            )
        missing = [k for k in keys if k not in want]
        if missing:
            raise ValueError(f"merge_keyed: no such key column(s) {missing}")
        if changes_df is not None:
            want_ch = set(want) | {CHANGE_TYPE_COL}
            if set(changes_df.columns) != want_ch:
                raise ValueError(
                    "changes_df must carry exactly the table columns plus "
                    f"{CHANGE_TYPE_COL} — got {sorted(changes_df.columns)}"
                )
        if stats_cols:
            self._validate_stats_cols(stats_cols, schema)
        files = latest["files"]
        old_stats = latest.get("stats") or {}
        # one job, not count-then-collect: fetch cap+1 rows — under the
        # cap that IS the key set (and its count); over it, fall back to
        # range pruning and pay the exact count only for op metrics
        key_rows = touch_keys.limit(
            _PRUNE_KEYS_COLLECT_MAX + 1
        ).collect()
        if len(key_rows) > _PRUNE_KEYS_COLLECT_MAX:
            n_touch = touch_keys.count()
            key_rows = None
        else:
            n_touch = len(key_rows)
        cand = self._candidate_files_multi(
            files, old_stats, keys, key_rows, schema, touch_keys=touch_keys
        )
        # renamed probe frame: null-safe equality per key column, no
        # name collision with the scanned table columns
        tk = touch_keys.select(
            *[F.col(k).alias(f"__mk_{k}") for k in keys]
        )
        probe = F.broadcast(tk) if key_rows is not None else tk
        touched: dict[str, int] = {}
        if cand:

            def rel(uri: str) -> str:
                tail = uri.rsplit("/" + _DATA_DIR + "/", 1)[1]
                return f"{_DATA_DIR}/{tail}"

            scan = (
                self.spark.read.schema(schema)
                .parquet(*[f"{self.path}/{f}" for f in cand])
                .select(*keys, F.input_file_name().alias("__mk_f"))
            )
            cond = None
            for k in keys:
                c = scan[k].eqNullSafe(F.col(f"__mk_{k}"))
                cond = c if cond is None else (cond & c)
            hits = (
                scan.join(probe, cond, "left_semi")
                .groupBy("__mk_f")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )  # one row per TOUCHED file
            touched = {rel(r["__mk_f"]): r["n"] for r in hits}
        carried = [f for f in files if f not in touched]
        new_data = updates
        if touched:
            old_touched = self.spark.read.schema(schema).parquet(
                *[f"{self.path}/{f}" for f in touched]
            )
            cond = None
            for k in keys:
                c = old_touched[k].eqNullSafe(F.col(f"__mk_{k}"))
                cond = c if cond is None else (cond & c)
            survivors = old_touched.join(probe, cond, "left_anti")
            new_data = updates.unionByName(survivors)
        version = latest["version"] + 1
        change_files: list[str] | None = None
        if changes_df is not None:
            change_files = (
                self._write_change_files(changes_df, version)
                if changes_df.take(1) else []
            )
        # skip the data write entirely for a pure token-advance (no
        # touched files, empty updates): the manifest still publishes —
        # the new version/token must land even when the rowset didn't move
        if touched or updates.take(1):
            if key_rows is not None:
                # bounded window: the rewrite is touched-files-sized, so
                # land ~one file per file it replaces instead of one per
                # shuffle partition (+N tiny files per merge would
                # fragment the layout the stats pruning depends on);
                # over-cap windows keep natural write parallelism
                new_data = new_data.coalesce(max(len(touched), 1))
            new_files = self._write_data_files(new_data, version)
        else:
            new_files = []
        stats = {f: old_stats[f] for f in carried if f in old_stats}
        stat_cols = sorted(
            {c for ent in old_stats.values() for c in ent}
            | set(stats_cols or [])
        )
        if stat_cols and new_files:
            stats.update(self._file_stats(new_files, stat_cols, schema))
        man = {
            "version": version,
            "files": carried + new_files,
            "schema": latest["schema"],
            "token": idempotency_token,
            "op": {
                "op": "merge_keyed",
                "keys_touched": n_touch,
                "files_probed": len(cand),
                "files_rewritten": len(touched),
                "files_carried": len(carried),
                **(op_info or {}),
            },
        }
        if change_files is not None:
            man["changes"] = change_files
        if stats:
            man["stats"] = stats
        self._publish_manifest(man)
        return version

    def delete_where(
        self, predicate, idempotency_token: str | None = None
    ) -> int:
        """DELETE WHERE with bounded OCC retry (r9) — recomputes the
        touched-file set against the new snapshot on a concurrent-writer
        conflict. See ``_delete_where_once`` for semantics."""
        return self._occ_retry(
            lambda: self._delete_where_once(predicate, idempotency_token)
        )

    def _delete_where_once(
        self, predicate, idempotency_token: str | None = None
    ) -> int:
        """Targeted row delete (the lakehouse ``DELETE WHERE``): drop every
        row where ``predicate`` (a SQL expression string or a Column) is
        TRUE and publish the result as one atomic new version. Rows where
        the predicate is FALSE **or NULL** survive — SQL DELETE semantics,
        not filter complement.

        Scale shape: one predicate-pushed scan finds which files contain a
        match (grouped on ``input_file_name`` — the collect is one row per
        *touched* file, never per row); ONLY those files are rewritten with
        the survivors, and every untouched file is carried into the new
        manifest verbatim, keeping its recorded min/max stats. On a 100 TB
        table a keyed delete therefore rewrites the few files whose
        row-group stats admit the key, not the table — the same
        touched-file-rewrite contract Delta/Iceberg `DELETE` gives.

        The new manifest records ``op = {rows_deleted, files_rewritten,
        files_carried}``. A delete that matches nothing publishes NOTHING
        and returns the current version (re-running it is naturally
        idempotent). ``idempotency_token`` behaves as in ``commit``.

        Erasure caveat (GDPR / right-to-be-forgotten): older versions still
        reference the pre-delete files until ``vacuum`` — the erasure
        procedure is ``delete_where(...)`` **then** ``vacuum(retain_last=1)``,
        which physically removes every file the deleted rows lived in.
        A delete is a rewrite, so ``changes()`` across it fails loud (by
        design, like upsert/optimize); ``diff_versions`` classifies the
        dropped rows as ``removed``."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T
        from pyspark.sql.column import Column

        latest = self.manifest()
        if latest is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        if (
            idempotency_token is not None
            and latest.get("token") == idempotency_token
        ):
            return latest["version"]
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        if not isinstance(pred, Column):
            raise TypeError(
                f"predicate must be a SQL string or Column, got {type(predicate).__name__}"
            )
        files = latest["files"]
        if not files:
            return latest["version"]
        schema = T.StructType.fromJson(json.loads(latest["schema"]))
        full = self.spark.read.schema(schema).parquet(
            *[f"{self.path}/{f}" for f in files]
        )
        hits = (
            full.filter(pred)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )  # one row per TOUCHED file — bounded by file count, not rows
        if not hits:
            return latest["version"]

        def rel(uri: str) -> str:
            # rsplit: the table path itself may contain a /data/ segment
            tail = uri.rsplit("/" + _DATA_DIR + "/", 1)[1]
            return f"{_DATA_DIR}/{tail}"

        touched = {rel(r["f"]): r["n"] for r in hits}
        carried = [f for f in files if f not in touched]
        version = latest["version"] + 1
        old_touched = self.spark.read.schema(schema).parquet(
            *[f"{self.path}/{f}" for f in touched]
        )
        survivors = old_touched.filter(
            ~F.coalesce(pred, F.lit(False))
        )  # NULL-predicate rows survive
        # row-level change feed (r10): the deleted rows are exactly the
        # predicate's matches in the touched files — record them so
        # `row_changes` serves retractions across the delete
        change_files = self._write_change_files(
            old_touched.filter(F.coalesce(pred, F.lit(False))).withColumn(
                CHANGE_TYPE_COL, F.lit("delete")
            ),
            version,
        )
        new_files = self._write_data_files(survivors, version)
        old_stats = latest.get("stats") or {}
        stats = {f: old_stats[f] for f in carried if f in old_stats}
        stat_cols = sorted({c for ent in old_stats.values() for c in ent})
        if stat_cols and new_files:
            stats.update(self._file_stats(new_files, stat_cols, schema))
        man = {
            "version": version,
            "files": carried + new_files,
            "schema": latest["schema"],
            "token": idempotency_token,
            "op": {
                "op": "delete",
                "rows_deleted": sum(touched.values()),
                "files_rewritten": len(touched),
                "files_carried": len(carried),
            },
        }
        if change_files:
            man["changes"] = change_files
        if stats:
            man["stats"] = stats
        self._publish_manifest(man)
        return version

    # -------------------------------------------------------------- read

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot scan of ``version`` (default latest). Empty manifests
        yield an empty frame with the committed schema."""
        from pyspark.sql import types as T

        man = self.manifest(version)
        if man is None:
            raise FileNotFoundError(f"no committed version at {self.path}")
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        if not man["files"]:
            return self.spark.createDataFrame([], schema)
        paths = [f"{self.path}/{f}" for f in man["files"]]
        return self.spark.read.schema(schema).parquet(*paths)

    def changes(
        self, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change feed for APPEND-mode histories: the rows committed
        after ``since_version`` up to ``to_version`` (default latest) —
        read from ONLY the data files those commits added, so a
        downstream consumer tails the table at the cost of the delta,
        never a rescan (incremental ETL's primitive; the file-diff is
        what lakehouse CDF does for pure appends).

        Fails loud if any commit in the range rewrote the visible file
        set AND changed the logical rowset (overwrite, matched upsert,
        delete): a row-level diff across such a rewrite is not derivable
        from manifests alone — use ``read(v2)`` vs ``read(v1)``
        key-diffing for SCD tables. Since r8 an INSERT-ONLY upsert
        carries every file (nothing matched, so nothing rewrote), so the
        feed stays valid across it. Since r9 (VERDICT r8 #2) a
        ROWSET-PRESERVING rewrite — ``optimize``'s pure compaction,
        marked ``op.rowset_preserving`` in its manifest — is also
        skipped rather than fatal: it contributes no rows (every row it
        wrote was already visible), exactly how Delta/Iceberg CDF
        survives compaction, so incremental rollups no longer pay a
        full rebuild per OPTIMIZE. The delta is therefore accumulated
        PER STEP (each append's new files), not endpoint-diffed — a
        pre-compaction append's files are no longer in the final
        manifest but still hold exactly that commit's rows (vacuum may
        remove them, but vacuum also drops the manifests that would
        make this range addressable, so the failure mode is the
        existing loud since-version check, never silent wrong rows).
        ``since_version == to_version`` yields an empty (schema-correct)
        frame."""
        vs = self.versions()
        if since_version not in vs:
            raise ValueError(
                f"version {since_version} not in {self.path} (have {vs})"
            )
        man_to = self.manifest(to_version)
        man_since = self.manifest(since_version)
        if man_to["version"] < since_version:
            raise ValueError(
                f"changes({since_version}, {man_to['version']}): "
                "to_version must be >= since_version"
            )
        # append-only must hold at EVERY step in the range, not just the
        # endpoints: a partial rewrite (matched upsert / delete) of files
        # added mid-range would otherwise re-surface rewritten rows as
        # appends. vacuum retains a contiguous newest suffix, so a
        # readable since_version implies readable intermediates.
        delta_files: list[str] = []
        prev = set(man_since["files"])
        for v in vs:
            if not (since_version < v <= man_to["version"]):
                continue
            man_v = self.manifest(v)
            cur = set(man_v["files"])
            if prev <= cur:
                # append step: its new files ARE its rows
                delta_files.extend(f for f in man_v["files"] if f not in prev)
            elif (man_v.get("op") or {}).get("rowset_preserving"):
                pass  # pure rewrite: zero row delta; file identity resets
            else:
                raise ValueError(
                    f"changes({since_version}, {man_to['version']}): commit "
                    f"v{v} replaced files (overwrite/matched upsert/delete) "
                    "— the append-only change feed is undefined across it; "
                    "use row_changes() for the Delta-CDF-style row delta "
                    "(recorded by upsert/delete_where/apply_cdc since r10)"
                )
            prev = cur
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(man_to["schema"]))
        if not delta_files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[f"{self.path}/{f}" for f in delta_files]
        )

    def _walk_range(self, since_version: int, to_version: int | None):
        """Validate a (since, to] range and yield its manifests in
        version order — the shared walk `changes` / `row_changes` /
        `rowset_change_kind` classify steps over. vacuum retains a
        contiguous newest suffix of manifests, so a readable
        since_version implies readable intermediates."""
        vs = self.versions()
        if since_version not in vs:
            raise ValueError(
                f"version {since_version} not in {self.path} (have {vs})"
            )
        man_to = self.manifest(to_version)
        if man_to["version"] < since_version:
            raise ValueError(
                f"range ({since_version}, {man_to['version']}]: "
                "to_version must be >= since_version"
            )
        for v in vs:
            if since_version < v <= man_to["version"]:
                yield self.manifest(v)

    def row_changes(
        self, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed (Delta-CDF shape, r10 — VERDICT r9 #1):
        every row-level change committed after ``since_version`` up to
        ``to_version`` (default latest), tagged ``_change_type`` ∈
        {insert, update_preimage, update_postimage, delete} plus
        ``_commit_version``. Per step:

        - an APPEND contributes its new files as ``insert`` rows (read
          from only those files — the same delta-cost contract as
          ``changes``);
        - a ROWSET-PRESERVING rewrite (``optimize``) contributes nothing;
        - an UPSERT / DELETE WHERE / CDC apply contributes the change
          rows its writer recorded (delta-sized — exactly the rows the
          merge computed anyway): old images of updated keys as
          ``update_preimage``, their replacements as
          ``update_postimage``, unmatched batch rows as ``insert``,
          dropped rows as ``delete``. A downstream aggregate consumes
          retractions by SUBTRACTING pre/delete contributions — see
          ``operators.rollup.refresh_rollup``;
        - a rewrite with NO recorded change rows (plain overwrite, the
          schema-drift upsert fallback, pre-r10 history) fails loud, as
          ``changes`` does — the row delta is not derivable from
          manifests alone there.

        Cost shape: reads only delta/change files, never the table.
        The read applies ``to_version``'s schema (additive evolution:
        pre-evolution change files surface NULL for added columns)."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        man_to = self.manifest(to_version)
        man_since = self.manifest(since_version)
        schema = T.StructType.fromJson(json.loads(man_to["schema"]))
        ct_schema = T.StructType(
            list(schema.fields) + [T.StructField(CHANGE_TYPE_COL, T.StringType())]
        )
        prev = set(man_since["files"])
        parts: list[DataFrame] = []
        for man_v in self._walk_range(since_version, to_version):
            v = man_v["version"]
            cur = set(man_v["files"])
            if prev <= cur:
                new_files = [f for f in man_v["files"] if f not in prev]
                if new_files:
                    parts.append(
                        self.spark.read.schema(schema)
                        .parquet(*[f"{self.path}/{f}" for f in new_files])
                        .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
                        .withColumn(CHANGE_VERSION_COL, F.lit(v).cast("long"))
                    )
            elif man_v.get("changes") is not None:
                # "changes": [] is a RECORDED zero delta (e.g. a rollup
                # refresh over an empty window, r14) — walkable, nothing
                # to read; distinct from no recording at all (fails loud)
                if man_v["changes"]:
                    parts.append(
                        self.spark.read.schema(ct_schema)
                        .parquet(
                            *[f"{self.path}/{f}" for f in man_v["changes"]]
                        )
                        .withColumn(CHANGE_VERSION_COL, F.lit(v).cast("long"))
                    )
            elif (man_v.get("op") or {}).get("rowset_preserving"):
                pass  # pure rewrite: zero row delta
            else:
                raise ValueError(
                    f"row_changes({since_version}, {man_to['version']}): "
                    f"commit v{v} replaced files without recording change "
                    "rows (overwrite / schema-drift upsert / pre-r10 "
                    "history) — the row delta is undefined across it; "
                    "rebuild downstream state from read()"
                )
            prev = cur
        if not parts:
            empty = T.StructType(
                list(ct_schema.fields)
                + [T.StructField(CHANGE_VERSION_COL, T.LongType())]
            )
            return self.spark.createDataFrame([], empty)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def rowset_change_kind(
        self, since_version: int, to_version: int | None = None
    ) -> str:
        """Classify how the logical rowset moved over (since, to] from
        manifests ALONE (no data read — the cheap staleness probe a
        derived artifact checks before trusting itself):

        - ``'unchanged'``: no commits, or only rowset-preserving rewrites
          (optimize) — any index/rollup built at ``since_version`` is
          still exact;
        - ``'appended'``: only appends (+ preserving rewrites) — derived
          state is stale by exactly the appended rows (serve
          ``changes``/``row_changes`` to catch up);
        - ``'rewritten'``: at least one commit replaced or removed rows
          (upsert / delete / CDC / overwrite) — positional or
          content-derived artifacts (ANN layouts, dedup signatures)
          built before it are INVALID, whether or not change rows were
          recorded."""
        kind = "unchanged"
        prev = set(self.manifest(since_version)["files"])
        for man_v in self._walk_range(since_version, to_version):
            cur = set(man_v["files"])
            if prev <= cur:
                if cur - prev:
                    kind = "appended"
            elif (man_v.get("op") or {}).get("rowset_preserving"):
                pass
            else:
                return "rewritten"
            prev = cur
        return kind

    def diff_versions(
        self, v_from: int, v_to: int, key: str
    ) -> DataFrame:
        """Row-level diff between two snapshots of a KEYED table — the
        companion `changes` points rewrite histories (upsert/SCD) at:
        one full-outer join of the two snapshots on ``key``, classified
        as ``added`` / ``removed`` / ``changed`` (any non-key column
        differs, null-safe). Output: (key, change, then v_from's columns
        as `old_*` and v_to's as `new_*`). Unchanged rows are dropped.

        Unlike `changes` this reads BOTH snapshots in full — the honest
        cost of diffing across a rewrite; on an append-only history
        prefer `changes`, which reads only the delta files."""
        from pyspark.sql import functions as F

        a, b = self.read(v_from), self.read(v_to)
        if key not in a.columns or key not in b.columns:
            raise ValueError(f"diff_versions: no column {key!r} in both versions")
        cols = [c for c in b.columns if c != key and c in a.columns]
        # presence flags must not depend on data nullability: tag sides
        old = a.select(
            key, *[F.col(c).alias(f"old_{c}") for c in cols]
        ).withColumn("_in_old", F.lit(True))
        new = b.select(
            key, *[F.col(c).alias(f"new_{c}") for c in cols]
        ).withColumn("_in_new", F.lit(True))
        j = old.join(new, key, "full_outer")
        diff_pred = F.lit(False)
        for c in cols:
            diff_pred = diff_pred | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        change = (
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(diff_pred, F.lit("changed"))
        )
        out_cols = [key, F.col("_change").alias("change")]
        out_cols += [f"old_{c}" for c in cols] + [f"new_{c}" for c in cols]
        return (
            j.withColumn("_change", change)
            .filter(F.col("_change").isNotNull())
            .select(*out_cols)
        )

    # --------------------------------------------------------- maintenance

    def optimize(
        self,
        zorder: list[str] | None = None,
        num_files: int | None = None,
        stats_cols: list[str] | None = None,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
        min_files: int | None = None,
    ) -> int:
        """Rewrite the CURRENT snapshot compacted — optionally Z-order
        clustered — as one atomic new version (the lakehouse OPTIMIZE
        [ZORDER BY], safe where `sinks.compact_table`'s directory swap
        is not: readers of older versions are untouched, and a crash
        mid-rewrite leaves only vacuumable orphans). ``stats_cols``
        defaults to the zorder columns, so `read_where` prunes the
        optimized layout out of the box. Returns the new version.

        ``cluster_by`` (r11, mutually exclusive with ``zorder``):
        HIERARCHICAL clustering — range-partition + sort on the listed
        columns in order. Right when predicates always hit a PREFIX of
        the columns (e.g. an IVF layout probed by ``cell``): every file
        owns one contiguous range of the leading column, where a
        Z-order interleave would dilute it across bits of all columns.
        Z-order remains the right call for independent multi-dimension
        boxes. ``stats_cols`` defaults to the numeric ``cluster_by``
        columns. ``min_files`` floors the byte-derived file count — a
        clustered layout whose consumers prune on the leading column
        needs at least one file per leading-key range (e.g. one per IVF
        cell) even when the whole table fits in one target-sized file.

        Change-feed consumers (r9, VERDICT r8 #2): the manifest is
        marked ``op.rowset_preserving`` — an optimize preserves the
        logical rowset exactly, so ``changes`` SKIPS it instead of
        failing, and incremental rollups survive compaction without
        full_rebuild. OCC: on a concurrent-commit conflict the whole
        optimize recomputes from the new snapshot (its payload is
        snapshot-dependent — a blind retry would drop the other
        writer's rows)."""
        if zorder and cluster_by:
            raise ValueError("optimize: pass zorder OR cluster_by, not both")
        return self._occ_retry(
            lambda: self._optimize_once(
                zorder, num_files, stats_cols, target_file_bytes, cluster_by,
                min_files,
            )
        )

    def _optimize_once(
        self,
        zorder: list[str] | None,
        num_files: int | None,
        stats_cols: list[str] | None,
        target_file_bytes: int,
        cluster_by: list[str] | None = None,
        min_files: int | None = None,
    ) -> int:
        df = self.read()
        if num_files is None:
            total = 0
            it = self._fs.listFiles(self._HPath(f"{self.path}/{_DATA_DIR}"), True)
            current = set(self.manifest()["files"])
            while it.hasNext():
                st = it.next()
                pp = st.getPath()
                rel = f"{_DATA_DIR}/{pp.getParent().getName()}/{pp.getName()}"
                if rel in current:
                    total += st.getLen()
            import math

            num_files = max(1, math.ceil(total / target_file_bytes))
        if min_files:
            num_files = max(num_files, min_files)
        if zorder:
            from .operators.layout import zorder_key

            keyed = df.withColumn("_zorder", zorder_key(df, zorder))
            df = (
                keyed.localCheckpoint(eager=True)
                .repartitionByRange(num_files, "_zorder")
                .sortWithinPartitions("_zorder")
                .drop("_zorder")
            )
            if stats_cols is None:
                stats_cols = list(zorder)
        elif cluster_by:
            df = df.repartitionByRange(
                num_files, *cluster_by
            ).sortWithinPartitions(*cluster_by)
            if stats_cols is None:
                by_name = {f.name: f.dataType for f in df.schema.fields}
                # DEFAULT stats exclude timestamp cols under a DST
                # session (explicitly-passed stats_cols still fail loud
                # in validation) — pre-r13 those cols simply had no
                # stats support, and a default must not turn into a
                # refusal
                drop = (
                    set() if _session_tz_fixed_offset(self.spark)
                    else _tz_sensitive_cols(df.schema)
                )
                stats_cols = [
                    c for c in cluster_by
                    if isinstance(by_name.get(c), numeric_stats_types())
                    and c not in drop
                ] or None
        else:
            df = df.coalesce(num_files)
        # record the clustering spec (r15): maintain_table re-clusters a
        # fragmented layout with the SAME spec without the caller having
        # to know it — the layout is self-describing
        op_info: dict = {"op": "optimize", "rowset_preserving": True}
        # carry the maintainer sync point (r15): an optimize preserves
        # the logical rowset, so the replaced manifest's idempotency
        # token (a rollup's rollup-of:vN, a replica's replica-of:vN, a
        # stream's epoch) still describes this state exactly. Copying it
        # into the op — NOT into the manifest token, which would trip
        # commit()'s replay-skip — keeps the sync point resolvable even
        # after vacuum sweeps the token-bearing manifest itself
        # (pre-r15: compact + vacuum(retain_last=1) silently downgraded
        # the next rollup refresh to a full rebuild).
        prev = self.manifest()
        prev_op = (prev.get("op") or {}) if prev else {}
        carried_tok = (prev or {}).get("token") \
            or prev_op.get("carried_token")
        carried_src = prev_op.get("source") or prev_op.get("carried_source")
        if carried_tok:
            op_info["carried_token"] = carried_tok
        if carried_src:
            op_info["carried_source"] = carried_src
        if zorder:
            op_info["zorder"] = list(zorder)
        if cluster_by:
            op_info["cluster_by"] = list(cluster_by)
        if min_files:
            op_info["min_files"] = min_files
        if stats_cols:
            op_info["stats_cols"] = list(stats_cols)
        return self.commit(
            df,
            mode="overwrite",
            stats_cols=stats_cols,
            op_info=op_info,
            retry=False,  # snapshot-dependent: recompute via _occ_retry
        )

    def visible_bytes(self, stop_at: int | None = None) -> int:
        """Bytes of the CURRENT visible files, stopping early once
        ``stop_at`` is reached — manifest-only metadata (one filesystem
        stat per file, never a data read). Threshold checks (refresh
        advisories, maintain policies) only need to know which SIDE of
        a size cutoff the table is on, so a large table pays a handful
        of stats, not one per file."""
        man = self.manifest()
        if man is None:
            return 0
        total = 0
        for f in man["files"]:
            total += self._fs.getFileStatus(
                self._HPath(f"{self.path}/{f}")
            ).getLen()
            if stop_at is not None and total >= stop_at:
                break
        return total

    # ------------------------------------------------- consumer registry

    def _consumer_entry(self, consumer_path: str):
        import hashlib

        cp = consumer_path.rstrip("/")
        return cp, self._HPath(
            f"{self.path}/{_CONSUMERS_DIR}/"
            f"{hashlib.sha256(cp.encode()).hexdigest()[:24]}.json"
        )

    def register_consumer(
        self, consumer_path: str, best_effort: bool = False
    ) -> None:
        """Record ``consumer_path`` in this table's consumer registry
        (r13, VERDICT r12 #2). Rollup refreshes, replicas, and derived
        index builds/syncs call this on their SOURCE at every reflect,
        so ``vacuum(respect_consumers="auto")`` computes the retention
        floor from the registry instead of a hand-maintained list — a
        forgotten consumer is exactly the strand the floor exists to
        prevent. One tiny hash-named JSON file per consumer: idempotent
        (re-registration no-ops on the existing file) and conflict-free
        under concurrent registrations (distinct consumers write
        distinct files; the same consumer writes the same content).
        The registry records PATHS, not liveness — a consumer whose
        artifact was deleted is skipped with a loud warning by the
        floor computation until ``retire_consumer`` removes it.

        ``best_effort=True`` (what the AUTO-registration call sites in
        refresh_rollup / replicate_table / the index builds+syncs pass)
        downgrades a filesystem failure to a RuntimeWarning: the
        registry is advisory, and a consumer job holding only READ
        access to its source must keep working as it did pre-r13 —
        its floor protection is simply absent, exactly as if it had
        never registered."""
        cp, hp = self._consumer_entry(consumer_path)
        if cp == self.path:
            raise ValueError(f"{cp} cannot register as its own consumer")
        payload = json.dumps({"path": cp}).encode()
        if best_effort:
            try:
                return self.register_consumer(consumer_path)
            except ValueError:
                raise  # self-consumption is a caller bug, never soft
            except Exception as e:
                import warnings

                warnings.warn(
                    f"could not register {cp} as a consumer of "
                    f"{self.path} ({e}) — the source's "
                    'vacuum(respect_consumers="auto") will not see this '
                    "consumer; pass it explicitly or fix write access",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return
        if self._fs.exists(hp):
            try:
                existing = self._read_json(hp)
                existing["path"]
                # heartbeat (r14, VERDICT r13 #2): the entry's mtime is
                # "last seen reflecting" — safe_retain_floor's grace pin
                # reads it to tell a consumer mid-rebuild (recent beat,
                # protect everything) from one deleted long ago (stale
                # beat, loud skip + prune_consumers). One metadata op;
                # on a store without setTimes (ADVICE r14: some
                # object-store connectors) fall back to rewriting the
                # entry with the same content — a fresh object carries a
                # fresh mtime, so a healthy consumer mid teardown-rebuild
                # keeps its grace pin there too.
                try:
                    import time as _time

                    self._fs.setTimes(hp, int(_time.time() * 1000), -1)
                except Exception:
                    try:
                        # rewrite the EXISTING content (it may carry
                        # fields beyond path — e.g. a pin), not the bare
                        # registration payload
                        self._write_bytes(
                            hp, json.dumps(existing).encode(),
                            overwrite=True,
                        )
                    except Exception:
                        pass  # heartbeat stays best-effort: a failed
                        # touch only shortens the grace window
                return  # healthy entry: idempotent no-op
            except Exception:
                # a truncated/corrupt entry (pre-r13 direct write, or a
                # torn copy) must SELF-HEAL, not become permanent — the
                # consumers() warning promises re-registration fixes it
                self._fs.delete(hp, False)
        # tmp + rename, the manifest pattern: a crash mid-write must not
        # leave a truncated entry
        tmp = self._HPath(
            f"{self.path}/{_CONSUMERS_DIR}/.tmp-{uuid.uuid4().hex}.json"
        )
        self._write_bytes(tmp, payload, overwrite=True)
        if not self._fs.rename(tmp, hp):
            self._fs.delete(tmp, False)
            if not self._fs.exists(hp):
                # the tmp vanished under us (a concurrent vacuum's
                # debris sweep) rather than a same-consumer duplicate
                # winning the rename — land the entry directly (tiny
                # write; a torn copy self-heals via the branch above)
                self._write_bytes(hp, payload, overwrite=True)

    def retire_consumer(self, consumer_path: str) -> bool:
        """Remove ``consumer_path`` from the registry (the explicit
        retirement rule for decommissioned rollups/replicas/indexes).
        Returns whether an entry existed. A consumer that later reflects
        again simply re-registers."""
        _cp, hp = self._consumer_entry(consumer_path)
        if self._fs.exists(hp):
            self._fs.delete(hp, False)
            return True
        return False

    def pin_consumer(self, consumer_path: str) -> None:
        """Hold this consumer's retention pin for an UNBOUNDED
        teardown-rebuild (r15, VERDICT r14 #2): while pinned, a
        registered consumer that currently records no reflected version
        keeps ``safe_retain_floor("auto")`` pinned to ALL retained
        versions regardless of heartbeat age, and ``prune_consumers``
        never retires it — closing the >24 h rebuild window the
        heartbeat grace alone leaves open. Call BEFORE deleting the
        consumer's artifact; ``unpin_consumer`` (or the consumer's next
        reflect plus an explicit unpin) releases the hold. Registers the
        entry first if absent, so a pin can precede the first
        bootstrap. For rebuilds shorter than the grace window a
        periodic ``register_consumer`` heartbeat is enough — the pin is
        for the long tail."""
        cp, hp = self._consumer_entry(consumer_path)
        if cp == self.path:
            raise ValueError(f"{cp} cannot register as its own consumer")
        ent = {"path": cp}
        if self._fs.exists(hp):
            try:
                ent = self._read_json(hp)
            except Exception:
                pass  # corrupt entry: the rewrite below self-heals it
        ent["pinned"] = True
        # direct overwrite, not tmp+rename: the entry is tiny, a torn
        # copy self-heals via register_consumer's corrupt-entry branch,
        # and the pin is an operator action (no concurrent pinner race
        # worth a rename dance)
        self._write_bytes(hp, json.dumps(ent).encode(), overwrite=True)

    def unpin_consumer(self, consumer_path: str) -> bool:
        """Release a ``pin_consumer`` hold. Returns whether the entry
        existed and was pinned. The entry itself stays registered (the
        rebuilt consumer re-reflects into it); ``retire_consumer``
        removes it outright."""
        _cp, hp = self._consumer_entry(consumer_path)
        if not self._fs.exists(hp):
            return False
        try:
            ent = self._read_json(hp)
        except Exception:
            return False
        was = bool(ent.pop("pinned", False))
        if was:
            self._write_bytes(hp, json.dumps(ent).encode(), overwrite=True)
        return was

    def _consumer_entries_meta(
        self,
    ) -> "list[tuple[str, object, int, dict]]":
        """(consumer_path, entry HPath, mtime_ms, entry_dict) per healthy
        registry entry, sorted by path. The mtime is the consumer's
        last-reflect heartbeat (``register_consumer`` touches it on every
        idempotent re-registration) — what the grace window in
        ``safe_retain_floor`` and ``prune_consumers`` measures age
        against; the dict carries any extra fields (``pinned``, r15)."""
        d = self._HPath(f"{self.path}/{_CONSUMERS_DIR}")
        if not self._fs.exists(d):
            return []
        out = []
        for st in self._fs.listStatus(d):
            name = st.getPath().getName()
            if not name.endswith(".json") or name.startswith(".tmp-"):
                continue
            try:
                ent = self._read_json(st.getPath())
                out.append((
                    ent["path"],
                    st.getPath(),
                    int(st.getModificationTime()),
                    ent,
                ))
            except Exception:
                import warnings

                warnings.warn(
                    f"{self.path}: unreadable consumer registry entry "
                    f"{name} — skipping it (delete the file to silence; "
                    "the consumer re-registers at its next reflect)",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return sorted(out)

    def consumers(self) -> list[str]:
        """Registered consumer paths, sorted (empty for a table nothing
        has reflected). One directory listing + one tiny JSON read per
        entry — no manifests, no data."""
        return [p for p, _hp, _mt, _e in self._consumer_entries_meta()]

    def prune_consumers(
        self, grace_sec: "float" = None  # type: ignore[assignment]
    ) -> list[str]:
        """Retire registry entries that record no reflected version AND
        whose last-reflect heartbeat (entry mtime) is older than
        ``grace_sec`` (default ``CONSUMER_EMPTY_GRACE_SECONDS``) — the
        stale-entry hygiene for consumers deleted without
        ``retire_consumer`` (r14, VERDICT r13 #2). Entries inside the
        grace window are kept: they may be a consumer mid-rebuild, which
        ``safe_retain_floor("auto")`` is still pinning retention for.
        Returns the pruned consumer paths. Manifest reads only."""
        import time as _time

        if grace_sec is None:
            grace_sec = CONSUMER_EMPTY_GRACE_SECONDS
        now_ms = _time.time() * 1000
        pruned = []
        for c, hp, mt, ent in self._consumer_entries_meta():
            if ent.get("pinned"):
                continue  # an explicit hold (pin_consumer, r15) outranks
                # heartbeat age — unpin_consumer releases it
            if now_ms - mt <= grace_sec * 1000:
                continue
            try:
                consumer_reflected_version(self.spark, c, self.path)
            except ValueError as e:
                if "records no reflected version" in str(e):
                    self._fs.delete(hp, False)
                    pruned.append(c)
                # a wrong-source entry stays: that is registry corruption
                # safe_retain_floor fails loud on, not a dead consumer
        return pruned

    def safe_retain_floor(self, consumers: "list[str] | str") -> int:
        """The minimum ``retain_last`` that keeps every listed consumer's
        catch-up window readable (r12, VERDICT r11 #3): each consumer
        records the version of THIS table it reflects (a rollup's
        ``rollup-of:v<N>`` token, a replica's ``replica-of:v<N>`` token,
        a derived index's base stamp), and catching up needs
        ``row_changes(reflected, latest)`` — i.e. manifest ``reflected``
        must survive the vacuum. Floor = max over consumers of
        ``latest - reflected + 1`` (≥ 1). Turns "operator remembered to
        size retain_last" into a computed invariant — pass the result
        (or the consumer list via ``vacuum(respect_consumers=...)``)
        instead of a hand-sized constant.

        ``consumers="auto"`` (r13, VERDICT r12 #2) reads the SELF-
        REGISTERED registry (``register_consumer`` — every consumer
        records itself at first reflect), closing the only gap the
        explicit list left: the operator forgetting a consumer. A
        registered entry whose artifact records nothing anymore is
        handled by heartbeat age (r14, VERDICT r13 #2): within
        ``CONSUMER_EMPTY_GRACE_SECONDS`` of its last reflect it is
        treated as a consumer MID-REBUILD and the floor pins to ALL
        retained versions (a concurrent auto-vacuum cannot strand the
        recreate-in-place window); past the grace it is skipped with a
        loud RuntimeWarning naming ``retire_consumer`` /
        ``prune_consumers``. An entry derived from a DIFFERENT table
        still fails loud (that is a registry corruption, not a dead
        consumer)."""
        if isinstance(consumers, str) and consumers != "auto":
            raise TypeError(
                f"consumers must be a list of paths or the string "
                f"'auto', got the string {consumers!r} — a bare path "
                "would be iterated character by character"
            )
        man = self.manifest()
        if man is None:
            return 1
        auto = consumers == "auto"
        beats: dict = {}
        pins: dict = {}
        if auto:
            meta = self._consumer_entries_meta()
            consumer_list = [p for p, _hp, _mt, _e in meta]
            beats = {p: mt for p, _hp, mt, _e in meta}
            pins = {p: bool(e.get("pinned")) for p, _hp, _mt, e in meta}
        else:
            consumer_list = consumers
        latest = man["version"]
        floor = 1
        for c in consumer_list:
            try:
                r = consumer_reflected_version(self.spark, c, self.path)
            except ValueError as e:
                if auto and "records no reflected version" in str(e):
                    import time as _time
                    import warnings

                    if pins.get(c):
                        # explicit hold (pin_consumer, r15, VERDICT r14
                        # #2): a teardown-rebuild longer than the grace
                        # window holds its pin until released — no
                        # heartbeat needed
                        vs = self.versions()
                        floor = max(floor, latest - vs[0] + 1)
                        warnings.warn(
                            f"safe_retain_floor({self.path}): consumer "
                            f"{c} records nothing but is PINNED — "
                            "retention covers ALL versions until "
                            "unpin_consumer() releases the hold",
                            RuntimeWarning,
                            stacklevel=2,
                        )
                        continue
                    age_ms = _time.time() * 1000 - beats.get(c, 0)
                    if age_ms <= CONSUMER_EMPTY_GRACE_SECONDS * 1000:
                        vs = self.versions()
                        floor = max(floor, latest - vs[0] + 1)
                        warnings.warn(
                            f"safe_retain_floor({self.path}): registered "
                            f"consumer {c} records nothing but its last "
                            f"reflect was {age_ms / 1000:.0f}s ago — "
                            "treating it as mid-rebuild and pinning "
                            "retention to ALL versions until it reflects "
                            "again or the grace window "
                            f"({CONSUMER_EMPTY_GRACE_SECONDS}s) expires; "
                            "retire_consumer() releases it now",
                            RuntimeWarning,
                            stacklevel=2,
                        )
                        continue
                    warnings.warn(
                        f"safe_retain_floor({self.path}): registered "
                        f"consumer {c} records nothing (deleted "
                        "artifact?) and its heartbeat is past the grace "
                        "window — skipping it; retire_consumer() or "
                        "prune_consumers() removes the stale entry",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    continue
                raise
            floor = max(floor, latest - r + 1)
        return floor

    def vacuum(
        self,
        retain_last: int = 1,
        dry_run: bool = False,
        respect_consumers: "list[str] | str | None" = None,
    ) -> int:
        """Drop data files referenced by no retained manifest (and
        change-row files, tmp manifest debris, emptied commit dirs).
        Keeps the newest ``retain_last`` versions time-travelable; older
        manifests are removed. Returns the number of files deleted —
        with ``dry_run=True`` nothing is touched and the return value is
        the count the real vacuum WOULD delete (the pre-flight an
        operator runs before an irreversible retention change).

        Retention contract (the flip side of time travel): a reader
        holding an UNRESOLVED plan over an older version — or asking
        for it after the vacuum — fails LOUD, never reads partial data:
        the dropped version's manifest is deleted (``read(v)`` raises
        ``ValueError``) and its unshared data files are gone (an
        already-planned scan raises Spark's missing-file error rather
        than silently returning the surviving subset). Size
        ``retain_last`` to cover the longest-running reader/rollup lag —
        or pass the consumers themselves via ``respect_consumers``
        (r12): their recorded reflected versions compute the floor
        (``safe_retain_floor``) and a ``retain_last`` below it is
        CLAMPED up with a loud RuntimeWarning, so a lagging rollup /
        replica / index can always still catch up incrementally.
        ``respect_consumers="auto"`` (r13) uses the SELF-REGISTERED
        consumer registry instead of an enumerated list — consumers
        record themselves at first reflect (``register_consumer``), so
        the checked invariant no longer depends on the operator
        remembering every downstream artifact. See
        tests/test_versioned_table.py::
        test_vacuum_fails_readers_loud_never_partial."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        if respect_consumers:
            import warnings

            floor = self.safe_retain_floor(respect_consumers)
            if retain_last < floor:
                n_consumers = (
                    len(self.consumers()) if respect_consumers == "auto"
                    else len(respect_consumers)
                )  # re-listed only on the (rare) clamp — one extra read
                warnings.warn(
                    f"vacuum({self.path}): retain_last={retain_last} would "
                    f"strand a lagging consumer (computed floor {floor} "
                    f"from {n_consumers} consumer(s)) — "
                    f"clamping to {floor}",
                    RuntimeWarning,
                    stacklevel=2,
                )
                retain_last = floor
        vs = self.versions()
        if not vs:
            return 0
        keep_vs = vs[-retain_last:]
        referenced = set()
        for v in keep_vs:
            man = self.manifest(v)
            referenced.update(man["files"])
            referenced.update(man.get("changes") or [])
        deleted = 0
        for top in (_DATA_DIR, _CHANGES_DIR):
            ddir = self._HPath(f"{self.path}/{top}")
            if not self._fs.exists(ddir):
                continue
            it = self._fs.listFiles(ddir, True)
            doomed = []
            while it.hasNext():
                st = it.next()
                p = st.getPath()
                rel = f"{top}/{p.getParent().getName()}/{p.getName()}"
                if rel not in referenced:
                    doomed.append(p)
            for p in doomed:
                deleted += 1
                if dry_run:
                    continue
                self._fs.delete(p, False)
                parent = p.getParent()
                if self._fs.exists(parent) and not self._fs.listStatus(parent):
                    self._fs.delete(parent, False)
        if dry_run:
            return deleted
        for v in vs:
            if v not in keep_vs:
                self._fs.delete(self._manifest_path(v), False)
        import time as _time

        for tmpdir, min_age_s in ((_MANIFEST_DIR, 0),
                                  (_CONSUMERS_DIR, 3600)):
            # registry tmp files get an age window: a CONCURRENT
            # register_consumer may be between write and rename, and
            # sweeping its fresh tmp would drop the registration (it
            # recovers via the rename-false fallback, but don't race it
            # on purpose); crashed leftovers age past the hour and sweep
            d = self._HPath(f"{self.path}/{tmpdir}")
            if not self._fs.exists(d):
                continue
            cutoff_ms = (_time.time() - min_age_s) * 1000.0
            for st in self._fs.listStatus(d):
                if st.getPath().getName().startswith(".tmp-") and (
                    min_age_s == 0
                    or st.getModificationTime() < cutoff_ms
                ):
                    self._fs.delete(st.getPath(), False)
        return deleted


def collapse_row_changes(delta: DataFrame, key: str) -> DataFrame:
    """Collapse a ``row_changes`` window to each key's FINAL state: one
    row per key carrying the table columns plus ``op`` ∈ {'upsert',
    'delete'} — exactly the ``apply_cdc`` batch shape. The last commit
    touching a key wins; within a commit the postimage outranks its own
    preimage (``apply_cdc``'s one-op-per-key contract guarantees no
    other tie). Preimages alone never describe a final state. Assumes a
    KEYED table (one row per key — the same contract apply_cdc
    enforces). The rank/row_number is changed-keys-sized, never
    table-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rank = (
        F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"),
            F.lit(2),
        )
        .when(F.col(CHANGE_TYPE_COL) == "delete", F.lit(1))
        .otherwise(F.lit(0))
    )
    w = Window.partitionBy(key).orderBy(
        F.desc(CHANGE_VERSION_COL), F.desc("__rank")
    )
    cols = [c for c in delta.columns
            if c not in (CHANGE_TYPE_COL, CHANGE_VERSION_COL)]
    return (
        delta.withColumn("__rank", rank)
        .withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1 AND __rank > 0")
        .select(
            *cols,
            F.when(F.col("__rank") == 2, F.lit("upsert"))
            .otherwise(F.lit("delete"))
            .alias("op"),
        )
    )


def replicate_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    key: str,
    full_copy: bool = False,
) -> int:
    """Maintain a downstream MIRROR of a keyed VersionedTable at delta
    cost (r10 — the replication primitive the row-level change feed
    makes possible): read the source's ``row_changes`` since the version
    the replica reflects, collapse to each key's final state, and land
    it as ONE atomic ``apply_cdc`` batch on the replica. First call
    bootstraps from the full source snapshot; an already-current replica
    is a version-stable no-op. The reflected source version rides in the
    replica's commit token (``replica-of:v<N>``) — self-describing,
    idempotent, crash-safe, exactly like ``refresh_rollup``'s.

    An UNRECORDED source rewrite (plain overwrite / pre-r10 history)
    fails loud in ``row_changes`` — pass ``full_copy=True`` to re-seed
    from the current snapshot (same result, full-scan cost). An ADDITIVE
    source schema evolution in the window (r11, VERDICT r10 #4) stays
    incremental: the replica's schema is widened FIRST by a zero-row
    append (its untouched history then surfaces NULL for the added
    columns, exactly like the source's own pre-evolution files), and the
    collapsed batch — which ``row_changes`` already reads under the
    window-end schema — applies as usual. A NON-additive evolution
    (dropped column / type change) fails loud here; the only recorded
    path that can produce one is an unrecorded rewrite anyway. Refuses
    to clobber a table it did not create. Returns the replica version.

    Scale shape: the source is never rescanned (delta/change files
    only); the replica rewrite is its own copy-on-write touched-file
    merge; the collapse window is changed-keys-sized."""
    src = VersionedTable(spark, src_path)
    dst = VersionedTable(spark, dst_path)
    src_latest = src.manifest()
    if src_latest is None:
        raise FileNotFoundError(f"no committed source at {src_path}")
    v_src = src_latest["version"]
    token = f"replica-of:v{v_src}"
    dst_man = dst.manifest()
    reflected = None
    if dst_man is not None:
        # the sync point may sit UNDER rowset-preserving rewrites (r14):
        # an operator may OPTIMIZE the replica for read layout without
        # bricking replication — walk back to the newest replica token
        tok_man = latest_maintainer_manifest(dst, ("replica-of:v",))
        t = (tok_man or {}).get("token") or ""
        if not t.startswith("replica-of:v"):
            raise ValueError(
                f"{dst_path} is not a replica table (token {t!r}); "
                "replicate_table only maintains tables it created"
            )
        # the token may carry a "+schema-v<N>" suffix (the widening
        # append below) — the reflected version is the leading integer
        reflected = int(t[len("replica-of:v"):].split("+", 1)[0])
        # source-identity check (r14, the rollup A1 fix's replica twin):
        # a bare replica-of:vN token against the WRONG source would read
        # that table's change feed from this replica's version counter —
        # fail loud before registering or syncing
        rec = (tok_man.get("op") or {}).get("source")
        if rec is not None and \
                _norm_table_path(rec) != _norm_table_path(src_path):
            raise ValueError(
                f"replica at {dst_path} is derived from {rec}, not "
                f"{src_path} — refusing to sync or register it against "
                "the wrong source (delete the replica directory to "
                "repoint it deliberately)"
            )
        # self-register as a consumer of the source (r13, VERDICT r12
        # #2) — idempotent, best-effort (the registry is advisory; a
        # read-only source must not break replication), and only AFTER
        # the token validated this really is a replica of something
        # (registering a mistaken target would leave a phantom entry
        # that pins vacuum(auto) on a wrong-consumer error); the
        # bootstrap branch registers after its commit
        src.register_consumer(dst.path, best_effort=True)
        if reflected >= v_src:
            return dst_man["version"]
    if reflected is None or full_copy:
        # pin the snapshot to the stamped version: a concurrent source
        # commit between the manifest() above and this read would
        # otherwise yield a replica newer than its replica-of token
        # (r11, ADVICE r10). op.source records WHICH table the token's
        # version counts (r13, ADVICE r12): the bare token carries no
        # source identity, so a consumer list naming a replica of some
        # OTHER table would silently compute that table's vacuum floor
        v = dst.commit(src.read(v_src), mode="overwrite",
                       idempotency_token=token,
                       op_info={"op": "replica_sync", "source": src.path})
        src.register_consumer(dst.path, best_effort=True)
        return v
    from pyspark.sql import types as T

    want = {
        f.name: f.dataType.simpleString()
        for f in T.StructType.fromJson(json.loads(src_latest["schema"]))
    }
    have = {
        f.name: f.dataType.simpleString()
        for f in T.StructType.fromJson(json.loads(dst_man["schema"]))
    }
    if have != want:
        missing = sorted(n for n in have if n not in want)
        changed = sorted(n for n, ty in have.items()
                         if n in want and want[n] != ty)
        if missing or changed:
            raise ValueError(
                f"replicate_table: source schema evolved non-additively "
                f"since v{reflected} (dropped {missing}, retyped {changed})"
                " — the replica's history cannot be widened in place; "
                "full_copy=True re-seeds from the current snapshot"
            )
        # additive evolution (r11): widen the replica schema with a
        # metadata-only empty append BEFORE applying the batch; the
        # unique token suffix keeps the commit from being skipped as a
        # replay of the previous sync while still parsing to the same
        # reflected version (crash between the two commits replays
        # cleanly: same window, same evolve token, idempotent CDC apply)
        dst.commit(
            spark.createDataFrame([], T.StructType.fromJson(
                json.loads(src_latest["schema"]))),
            mode="append",
            idempotency_token=f"replica-of:v{reflected}+schema-v{v_src}",
            # a patch op — see _PATCH_OPS; source recorded as on every
            # replica commit (consumer identity, r13)
            op_info={"op": "schema_widen", "source": src.path},
        )
    batch = collapse_row_changes(src.row_changes(reflected, v_src), key)
    if not batch.take(1):
        # e.g. only rowset-preserving OPTIMIZEs in the window: advance
        # the reflected version with a metadata-only append (no files)
        return dst.commit(
            dst.read().limit(0), mode="append", idempotency_token=token,
            op_info={"op": "replica_sync", "source": src.path},
        )
    return dst.apply_cdc(batch, key=key, idempotency_token=token,
                         op_extra={"source": src.path})


def resolve_base_stamp(
    spark: SparkSession, base_path: str, base_version: int | None = None
) -> dict:
    """The ``{"path", "version"}`` stamp a derived artifact (ANN index,
    dedup index) records so staleness is classifiable from manifests
    alone. ``base_version`` pins the version the caller's snapshot
    actually reflects; leaving it None resolves the CURRENT version,
    which is only safe when no concurrent writer can land between the
    caller's read and this resolve (a concurrent rewrite in that gap
    would be stamped over and silently skipped by the staleness walk —
    capture ``VersionedTable.manifest()['version']`` BEFORE reading the
    snapshot and pass it when writers may race)."""
    vt = VersionedTable(spark, base_path)
    man = vt.manifest()
    if man is None:
        raise FileNotFoundError(f"no committed base table at {base_path}")
    if base_version is not None:
        if base_version not in vt.versions():
            raise ValueError(
                f"base_version {base_version} not in {base_path}"
            )
        return {"path": base_path, "version": base_version}
    return {"path": base_path, "version": man["version"]}


def latest_base_stamp(vt: VersionedTable) -> dict | None:
    """The most recent base stamp recorded in ``vt``'s manifests (a
    build, or a base-stamped append/CDC apply), or None — the shared
    lookup the staleness probes and sync walk use."""
    for v in reversed(vt.versions()):
        base = (vt.manifest(v).get("op") or {}).get("base")
        if base:
            return base
    return None


def sum_file_bytes(spark: SparkSession, uris: list[str]) -> int:
    """Total on-disk bytes of the given file URIs — one filesystem stat
    per file through Hadoop's FileSystem API (scheme-resolved once; all
    of one DataFrame's input files share a scheme). The shared
    byte-sizing primitive the layout writers and append-batch sizers
    use; returns 0 for an empty list (in-memory frames)."""
    if not uris:
        return 0
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    fs = None
    total = 0
    for uri in uris:
        p = HPath(uri)
        if fs is None:
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        total += fs.getFileStatus(p).getLen()
    return total


def stats_overlap_depth(man: dict, col: str) -> int:
    """FRAGMENTATION probe for a key-clustered layout (r12, VERDICT r11
    #6): the maximum number of files whose recorded per-file [min, max]
    stats on ``col`` overlap at any single key — 1 for a freshly
    clustered layout (disjoint ranges), growing by ~1 per maintenance
    patch whose file spans the key range, which is exactly how repeated
    sync windows degrade stats pruning back toward scanning every file.
    Files with no recorded stats on ``col`` count as full-range (they
    can never be pruned). Manifest-only — classic sweep over 2·files
    endpoints, no data read."""
    stats = man.get("stats") or {}
    unpruned = 0
    events = []
    for f in man["files"]:
        ent = stats.get(f) or {}
        if col not in ent:
            unpruned += 1
            continue
        lo, hi = ent[col]
        events.append((lo, 0))  # opens sort before closes at the same
        events.append((hi, 1))  # key, so touching ranges count as overlap
    depth = best = 0
    for _v, kind in sorted(events):
        if kind == 0:
            depth += 1
            best = max(best, depth)
        else:
            depth -= 1
    return best + unpruned


#: manifest op names that PATCH a clustered layout rather than establish
#: one — what `clustered_baseline_depth` walks past to find the layout's
#: reference shape. By contract every non-clustering commit on an index
#: layout carries one of these op names; the clustering commits are the
#: bootstrap build (op None / *_build) and `optimize`.
_PATCH_OPS = {"cdc", "upsert", "delete", "neardup_index_append",
              "schema_widen", "merge_keyed", "replica_sync"}


def _is_patch_op(op: dict) -> bool:
    """Whether a manifest op PATCHES the layout rather than establish
    one (r15): the named patch verbs, plus a rollup refresh that
    committed through the CoW path (op ``rollup_refresh`` with
    ``cow: True`` — touched files only; the classic refresh is a full
    overwrite and genuinely re-lands the layout, so it is NOT a
    patch)."""
    name = op.get("op")
    return name in _PATCH_OPS or (
        name == "rollup_refresh" and bool(op.get("cow"))
    )


def clustered_baseline_depth(vt: "VersionedTable", col: str) -> int:
    """``stats_overlap_depth`` at the most recent retained CLUSTERING of
    the table — the bootstrap build or an optimize rewrite, i.e. the
    newest manifest whose op is not a patch (CDC apply / upsert / delete
    / index append). This is the reference a maintain policy compares
    the CURRENT depth against: depth above it is reducible fragmentation
    (maintenance patches spanning the key range), depth AT it is the
    layout's legitimate shape (e.g. a hot IVF cell that genuinely spans
    several files — compaction cannot and should not reduce that).
    Falls back to the oldest retained manifest when vacuum dropped every
    clustering commit (conservative: under-triggers, never churns)."""
    vs = vt.versions()
    for v in reversed(vs):
        m = vt.manifest(v)
        if not _is_patch_op(m.get("op") or {}):
            return stats_overlap_depth(m, col)
    return stats_overlap_depth(vt.manifest(vs[0]), col)


def _norm_table_path(p: str) -> str:
    """Canonical string form for table-identity comparisons: strip a
    local-filesystem scheme prefix (``file:///x``, ``file:/x``) and
    trailing slashes, so the same location spelled as a URI by one
    writer and a bare path by another still compares equal. Remote
    schemes (s3a://, hdfs://) are kept — different stores ARE different
    tables."""
    q = p.strip()
    low = q.lower()
    if low.startswith("file://"):
        q = q[7:]
        if not q.startswith("/"):
            # RFC 8089 authority form (file://localhost/x, file://host/x):
            # the authority is not part of the local path — drop it
            q = q[q.find("/"):] if "/" in q else "/"
    elif low.startswith("file:"):
        q = q[5:]
    return q.rstrip("/")


def latest_maintainer_manifest(
    vt: VersionedTable, prefixes: "tuple[str, ...]"
) -> "dict | None":
    """The newest manifest whose commit token starts with one of
    ``prefixes`` (a rollup's ``rollup-of:v``, a replica's
    ``replica-of:v``), walking back ONLY across rowset-preserving
    rewrites (r14): an OPTIMIZE on a rollup/replica reclusters bytes
    but preserves the logical rowset, so the maintainer's recorded sync
    point is still valid underneath it — pre-r14 a compacted
    rollup/replica bricked its own refresh/sync ("token None"). Any
    OTHER foreign commit (content changed outside the maintainer) stops
    the walk and returns THAT manifest, so the caller's existing token
    validation fails loud exactly as before. Returns None for an empty
    table; one manifest read per walked version (bounded by retained
    history — a sync point vacuumed away is simply not found, the
    retention contract)."""
    vs = vt.versions()
    if not vs:
        return None
    for v in reversed(vs):
        man = vt.manifest(v)
        if man is None:
            # ADVICE r14: a concurrent vacuum between the versions()
            # listing and this read removed the manifest — skip it (the
            # walk continues to the next retained version, and callers'
            # loud token validation still fires on whatever survives)
            continue
        token = man.get("token") or ""
        if any(token.startswith(p) for p in prefixes):
            return man
        op = man.get("op") or {}
        if not op.get("rowset_preserving"):
            return man  # foreign content commit: caller fails loud
        carried = op.get("carried_token") or ""
        if any(carried.startswith(p) for p in prefixes):
            # the rewrite carries the sync point it replaced (r15):
            # resolve from the carry — equivalent to finding the token
            # manifest itself, and still works after vacuum swept it.
            # Present a view with the carried token/source in the spots
            # callers read them from.
            return {
                **man,
                "token": carried,
                "op": {**op,
                       "source": op.get("source")
                       or op.get("carried_source")},
            }
    return vt.manifest()  # all-preserving history with no token match


def consumer_reflected_version(
    spark: SparkSession, consumer_path: str, table_path: str
) -> int:
    """The version of ``table_path`` that the derived artifact at
    ``consumer_path`` currently reflects — read from the consumer's OWN
    records (r12, VERDICT r11 #3): a rollup's ``rollup-of:v<N>`` commit
    token, a replica's ``replica-of:v<N>`` token (``+schema-v<M>``
    suffixes ignored), or a derived index's base stamp (a dedup index
    root, or an IVF index root whose ``centroids`` table carries the
    stamp). One manifest read per candidate — no data scanned.

    Fails loud when the path records nothing, or when the consumer's
    record names a DIFFERENT source table: index stamps carry the base
    path, and since r13 (ADVICE r12) rollup/replica commits record
    ``op.source`` alongside their token, so a consumer list naming a
    rollup of some other table raises here instead of silently
    computing that table's vacuum floor. Pre-r13 rollups/replicas
    (no recorded source) are accepted unvalidated — refresh them once
    to stamp the source."""
    import re as _re

    table_path = _norm_table_path(table_path)
    for p in (consumer_path.rstrip("/"),
              f"{consumer_path.rstrip('/')}/centroids"):
        vt = VersionedTable(spark, p)
        # walk back across rowset-preserving rewrites (r14): an
        # OPTIMIZEd rollup/replica still self-describes its sync point
        man = latest_maintainer_manifest(
            vt, ("rollup-of:v", "replica-of:v"))
        if man is None:
            continue
        m = _re.match(r"(?:rollup|replica)-of:v(\d+)", man.get("token") or "")
        if m:
            src = (man.get("op") or {}).get("source")
            if src is not None and _norm_table_path(src) != table_path:
                raise ValueError(
                    f"consumer at {consumer_path} is derived from {src}, "
                    f"not {table_path} — wrong consumer for this table's "
                    "vacuum floor (if these are the SAME location spelled "
                    "differently, use one canonical spelling everywhere, "
                    "or refresh the consumer once with it)"
                )
            return int(m.group(1))
        stamp = latest_base_stamp(vt)
        if stamp:
            if _norm_table_path(stamp["path"]) != table_path:
                raise ValueError(
                    f"consumer at {consumer_path} is derived from "
                    f"{stamp['path']}, not {table_path} — wrong consumer "
                    "for this table's vacuum floor"
                )
            return stamp["version"]
    raise ValueError(
        f"{consumer_path} records no reflected version of {table_path} "
        "(not a rollup / replica / base-stamped index) — "
        "safe_retain_floor only covers consumers that self-describe "
        "their sync point"
    )


def stream_cdc_to_versioned(
    cdc: DataFrame, table_path: str, checkpoint: str, key: str,
    op_col: str = "op",
) -> "object":
    """Exactly-once CDC replication: each micro-batch of (op, key,
    payload...) rows lands through ``apply_cdc`` with the epoch id as
    the idempotency token, so a crash-replayed batch is a detected
    no-op and a mixed upsert+delete batch is one atomic version.

    Multiple ops for one key inside one micro-batch fail loud (the
    ``apply_cdc`` contract — deliberately NOT auto-collapsed here: a
    micro-batch is unordered, so "latest op wins" needs the source's
    sequence number to resolve; collapse upstream with that number,
    e.g. a row_number over (key ORDER BY seq DESC) before the sink).
    Empty micro-batches commit nothing. Returns the StreamingQuery."""

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        if not batch_df.take(1):
            return
        VersionedTable(batch_df.sparkSession, table_path).apply_cdc(
            batch_df, key=key, op_col=op_col,
            idempotency_token=f"epoch:{epoch_id}",
        )

    return (
        cdc.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge)
        .start()
    )


def stream_cdc_with_rollups(
    cdc: DataFrame,
    table_path: str,
    checkpoint: str,
    key: str,
    rollups: list[dict],
    op_col: str = "op",
) -> "object":
    """Continuous aggregates over a CDC-replicated table (r10): each
    micro-batch lands through ``apply_cdc`` (exactly-once via the epoch
    token) and then every rollup spec —
    ``{"path": ..., "dims": [...], "measures": {...}[, "monotone_dims":
    {...}, "policy": "auto"]}`` — is refreshed from the table's
    row-level change feed, retractions included. ``"policy": "auto"``
    (r13) routes the spec through ``operators.rollup.maintain_rollup``,
    which executes the measured rebuild-vs-refresh decision table per
    epoch instead of always refreshing; ``monotone_dims`` feeds the
    group-local path's expression-dim file pruning.

    Crash-safety composes from the two idempotent layers: a replayed
    epoch's ``apply_cdc`` is a detected no-op, and ``refresh_rollup``
    is self-describing via its ``rollup-of:v<N>`` token (already-current
    refreshes no-op; a refresh that died before its commit recomputes
    the same delta on replay). The rollup lags the table by at most one
    failed refresh, never diverges. Specs with non-retractable measures
    (min/max/HLL) refresh GROUP-LOCALLY under updates since r12 — only
    the epoch's touched groups are re-aggregated from the source
    (stats-pruned when a dim is clustered), so per-epoch cost stays
    delta-shaped; retractable measure sets (count/sum/histogram + a
    count) remain cheaper still (no source re-read at all). Returns
    the started StreamingQuery.

    Per-epoch cost shape (r11, VERDICT r10 #7): each epoch runs the CDC
    apply's job chain (probe + touched-file rewrite, ~4 jobs) plus ONE
    refresh job chain PER SPEC, serially — each refresh is delta-sized
    but carries ~5 fixed Spark jobs of scheduling overhead, so the
    micro-batch duration grows linearly with ``len(rollups)``
    (kill-restart test epochs: ~2-4 s for 1 spec at local[32]; budget
    roughly +1-2 s per additional spec). Size the trigger interval to
    ≥ specs × per-refresh cost, or split many specs across separate
    consumers of the same table's change feed — refreshes are
    independent and token-idempotent, so fan-out is safe."""
    import warnings

    from .operators.rollup import maintain_rollup, refresh_rollup

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        VersionedTable(spark, table_path).apply_cdc(
            batch_df, key=key, op_col=op_col,
            idempotency_token=f"epoch:{epoch_id}",
        )
        for spec in rollups:
            with warnings.catch_warnings():
                # silence ONLY the small-source advisory (a batch-caller
                # hint; a continuous pipeline owns its refresh policy);
                # any other warning (e.g. the one-time pre-r11 schema
                # migration rebuild) stays loud
                warnings.filterwarnings(
                    "ignore",
                    message=".*full rebuild is typically faster.*",
                    category=RuntimeWarning,
                )
                if spec.get("policy") == "auto":
                    # r13 (VERDICT r12 #3): per-epoch the MEASURED
                    # decision table picks rebuild-vs-refresh (and the
                    # group-local crossover) instead of always
                    # refreshing — same exactness, manifest-only probes
                    maintain_rollup(
                        spark, table_path, spec["path"],
                        spec["dims"], spec["measures"],
                        monotone_dims=spec.get("monotone_dims"),
                    )
                else:
                    refresh_rollup(
                        spark, table_path, spec["path"],
                        spec["dims"], spec["measures"],
                        monotone_dims=spec.get("monotone_dims"),
                    )

    return (
        cdc.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge)
        .start()
    )


def stream_upsert_to_versioned(
    events: DataFrame, table_path: str, checkpoint: str
) -> "object":
    """Exactly-once streaming ingestion: the foreachBatch upsert from
    ``streaming.events.stream_upsert_to_parquet`` re-based on
    ``VersionedTable`` — each micro-batch's cumulative per-user aggregates
    merge as ONE atomic commit carrying the epoch id as the idempotency
    token, so a crash-replayed batch is a detected no-op instead of a
    second merge. Returns the started StreamingQuery."""
    from pyspark.sql import functions as F

    per_batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.localCheckpoint(eager=True)
        VersionedTable(batch_df.sparkSession, table_path).upsert(
            batch_df, "user_id", idempotency_token=f"epoch:{epoch_id}"
        )

    return (
        per_batch.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(merge)
        .start()
    )


#: maintain_table's fragmentation tolerance (the same default as the
#: IVF maintainer): a clustered layout may legitimately sit 1 patch
#: file deep; compaction triggers only ABOVE max(this, the depth the
#: last clustering itself had), so a hot key range that genuinely
#: spans files never causes churn.
TABLE_FRAG_DEPTH_MAX = 2

#: maintain_table's small-file probe: a visible file under this size is
#: "small"; compaction triggers when MOST files are small AND there are
#: enough of them for the metadata overhead to matter. 16 MiB is an
#: eighth of the optimize target (128 MiB) — comfortably past parquet
#: row-group efficiency, far under anything a healthy large table
#: produces.
SMALL_FILE_BYTES = 16 * 1024 * 1024
SMALL_FILE_MIN_COUNT = 8
SMALL_FILE_MAX_FRACTION = 0.5


def maintain_table(
    spark: SparkSession,
    path: str,
    cluster_by: "list[str] | None" = None,
    zorder: "list[str] | None" = None,
    dry_run: bool = False,
    frag_depth_max: int = TABLE_FRAG_DEPTH_MAX,
    small_file_bytes: int = SMALL_FILE_BYTES,
    vacuum_retain_last: "int | None" = None,
) -> dict:
    """ONE maintenance call for a plain ``VersionedTable`` (r15) — the
    generic peer of ``maintain_rollup`` / ``maintain_neardup_index`` /
    ``maintain_ivf_index``, closing the lifecycle gap those leave: a
    SOURCE table (or replica) living under steady keyed merges needs
    the same classify-then-act loop its derived artifacts get. Probes
    are manifest/metadata-only (file stats endpoints + one size stat
    per file — never a data read); the verbs are the existing
    ``optimize`` / ``vacuum``.

    Two independent compaction triggers:

    - **fragmentation** (clustered layouts): ``stats_overlap_depth`` on
      the leading clustering column exceeds ``max(frag_depth_max, the
      depth the last clustering itself had)`` — repeated bounded merges
      each land ~one range-straddling patch file (see SCALING.md
      "Bounded merges no longer fragment"), so depth grows ~1 per sync
      and pruning degrades toward scan-everything; re-clustering
      restores it.
    - **small files** (any layout): more than ``SMALL_FILE_MIN_COUNT``
      visible files, most of them under ``small_file_bytes`` — the
      append/trickle-ingest shape; compacting to the 128 MiB optimize
      target restores scan efficiency.

    The clustering spec is SELF-DESCRIBING: ``optimize`` records its
    ``zorder``/``cluster_by``/``min_files``/``stats_cols`` in the
    manifest op (r15), and this call re-clusters with the recorded spec
    of the newest clustering commit unless the caller overrides it.
    With neither a recorded nor an explicit spec, compaction is a plain
    coalesce to target-sized files. ``vacuum_retain_last`` adds the
    retention sweep AFTER any compaction, honoring the consumer
    registry (``respect_consumers="auto"``). ``dry_run`` reports the
    plan without executing. Returns ``{"actions", "reasons",
    "frag_depth", "frag_floor", "files", "small_files", "dry_run"}``
    (depth fields None when no clustered column is probeable;
    ``small_files`` is the count at the early stop — the sweep halts as
    soon as the trigger's outcome is decided, so on large tables it is
    a decision-exact lower bound, not a census)."""
    if vacuum_retain_last is not None and vacuum_retain_last < 1:
        raise ValueError(
            f"maintain_table: vacuum_retain_last must be >= 1, got "
            f"{vacuum_retain_last} (retain_last=0 would drop the "
            "current version)"
        )
    if cluster_by and zorder:
        raise ValueError("maintain_table: pass cluster_by OR zorder, "
                         "not both")
    vt = VersionedTable(spark, path)
    man = vt.manifest()
    if man is None:
        raise FileNotFoundError(f"no committed version at {path}")

    # resolve the clustering spec: explicit args win; else the newest
    # clustering commit's recorded spec (optimize, r15). The walk is
    # the clustered_baseline_depth one — bounded by retained versions.
    spec: dict = {}
    if cluster_by:
        spec = {"cluster_by": list(cluster_by)}
    elif zorder:
        spec = {"zorder": list(zorder)}
    else:
        for v in reversed(vt.versions()):
            m = vt.manifest(v)
            if m is None:
                continue  # concurrent vacuum mid-walk
            op = m.get("op") or {}
            if _is_patch_op(op):
                continue
            if op.get("op") == "optimize":
                spec = {
                    k: op[k]
                    for k in ("cluster_by", "zorder", "min_files",
                              "stats_cols")
                    if k in op
                }
            break  # first non-patch commit ends the walk, spec or not

    lead = (spec.get("cluster_by") or spec.get("zorder") or [None])[0]
    depth = floor = None
    stats = man.get("stats") or {}
    if lead is not None and any(lead in (e or {}) for e in stats.values()):
        depth = stats_overlap_depth(man, lead)
        floor = max(frag_depth_max, clustered_baseline_depth(vt, lead))

    files = man["files"]
    n_small = 0
    if len(files) > SMALL_FILE_MIN_COUNT:
        # one size stat per file, early-stopped once the trigger can no
        # longer fire (a huge healthy table pays ~half its file count in
        # metadata calls at worst, zero data reads)
        need = int(len(files) * SMALL_FILE_MAX_FRACTION)
        for seen, f in enumerate(files):
            if (
                vt._fs.getFileStatus(
                    vt._HPath(f"{vt.path}/{f}")
                ).getLen() < small_file_bytes
            ):
                n_small += 1
            if n_small > need or \
                    n_small + (len(files) - seen - 1) <= need:
                break

    actions: list[str] = []
    reasons: list[str] = []
    compact = False
    if depth is not None and depth > floor:
        compact = True
        reasons.append(
            f"layout overlap depth {depth} > {floor} on {lead!r} (max of"
            f" frag_depth_max and the last clustering's own depth) — "
            "bounded merges have stacked range-straddling patch files"
        )
    if (
        len(files) > SMALL_FILE_MIN_COUNT
        and n_small / len(files) > SMALL_FILE_MAX_FRACTION
    ):
        compact = True
        reasons.append(
            f"{n_small}/{len(files)} visible files under "
            f"{small_file_bytes >> 20} MiB — trickle-ingest shape; "
            "compact to target-sized files"
        )
    if compact:
        actions.append("compact")
    if vacuum_retain_last is not None:
        actions.append("vacuum")
        reasons.append(
            f"sweep versions to the newest {vacuum_retain_last} "
            "(consumer registry honored)"
        )
    if not actions:
        reasons.append("layout at its clustered shape; nothing to do")

    out = {
        "actions": actions, "reasons": reasons, "frag_depth": depth,
        "frag_floor": floor, "files": len(files), "small_files": n_small,
        "dry_run": dry_run,
    }
    if dry_run:
        return out
    if compact:
        # never let a compaction DROP the stats the pruning depends on:
        # absent a recorded/derivable spec column set, keep whatever
        # columns the current manifest records stats for
        stats_cols = spec.get("stats_cols")
        if stats_cols is None and not spec:
            kept = sorted({c for e in stats.values() for c in (e or {})})
            stats_cols = kept or None
        vt.optimize(
            cluster_by=spec.get("cluster_by"),
            zorder=spec.get("zorder"),
            min_files=spec.get("min_files"),
            stats_cols=stats_cols,
        )
        m2 = vt.manifest()
        out["files"] = len(m2["files"])
        if lead is not None:
            out["frag_depth"] = stats_overlap_depth(m2, lead)
    if vacuum_retain_last is not None:
        out["swept"] = vt.vacuum(
            retain_last=vacuum_retain_last, respect_consumers="auto"
        )
    return out
