"""Snapshot-versioned, bucket-partitioned parquet table with MERGE.

This is the engine's sink. It implements the subset of Iceberg
semantics the CDC engine needs — atomic snapshot commits, bucketed
copy-on-write MERGE with partition pruning, additive schema evolution,
time-travelable history — over plain parquet, because no Iceberg jars
ship in this sandbox. On a real cluster the ``merge`` call is the
moral equivalent of::

    MERGE INTO target t USING updates u
    ON t.conv_id = u.conv_id AND t.turn_idx = u.turn_idx
    WHEN MATCHED AND u.op = 'delete' AND u.lsn > t._lsn THEN DELETE
    WHEN MATCHED AND u.lsn > t._lsn THEN UPDATE SET *
    WHEN NOT MATCHED AND u.op != 'delete' THEN INSERT *

and the class is shaped so an Iceberg-backed implementation drops in
behind the same API.

Reference parity (SURVEY.md section 2):
- K1/K2/K4 idempotent check-then-insert sinks
  (userCode/wrd/dag.py:256-314, userCode/groundwater/dag.py:62-148,
  userCode/xlsx/dag.py:79-96) -> the NOT-MATCHED insert arm;
- the per-row LSN guard reproduces the reference's "duplicate create
  is tolerated / 500-as-duplicate" semantics (userCode/test_frost.py
  duplicate-id tests) as a no-op update;
- A7 counter aggregates over sink results
  (userCode/groundwater/dag.py:63-148) -> MergeResult row counts.

Scale design (100 TB):
- data is hash-bucketed on the FULL key (conv_id AND turn_idx) with
  Spark's own HashPartitioning function; a merge reads ONLY the
  buckets the update batch touches (partition pruning at the
  file-manifest level);
- full-key bucketing IS the skew treatment (north_rule's "salted,
  key-partitioned shuffle"): a hot conversation spreads over buckets
  by turn_idx, so no task absorbs it whole — structural salting;
- copy-on-write at bucket granularity: untouched buckets carry their
  file references forward into the new snapshot — no data movement;
- commits are atomic: write snapshot JSON, then os.replace() of the
  CURRENT pointer (rename is atomic on POSIX; on object stores this
  is Iceberg's metadata swap).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

class CommitConflictError(RuntimeError):
    """Another writer committed the same snapshot version first."""


def _fsync_dir(path: str) -> None:
    """fsync a directory so renames/creates in it survive power loss
    (no-op on platforms without O_DIRECTORY semantics)."""
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass


def versioned_commit(
    meta_dir: str,
    manifest_name: str,
    version: int,
    manifest: dict,
    pointer_name: str | None = "CURRENT",
) -> None:
    """THE commit discipline, shared by LakeTable, WatermarkStore and
    AnnIndex (one implementation so a durability fix lands everywhere):

    1. write the manifest JSON to a PRIVATE tmp file and fsync it;
    2. publish it with os.link(tmp, manifest_name) — link has the same
       fail-if-exists semantics as O_EXCL, so two committers that both
       read the same parent race to create the same name and the loser
       gets CommitConflictError instead of silently clobbering the
       winner (Iceberg's metadata-swap semantics). Because the JSON is
       complete and fsynced BEFORE the name exists, manifest existence
       IMPLIES manifest completeness: no reader or rival can ever
       observe a half-written manifest (review finding — the previous
       O_EXCL-create-then-write left a window in which a rival's
       roll-forward could swing the pointer onto an empty file);
    3. atomically swing the pointer (write tmp, fsync, os.replace);
    4. fsync the metadata directory (rename/create durability).

    pointer_name=None selects RENAME-FREE mode for object stores
    without atomic rename: steps 3-4 are skipped entirely and the
    current version is DERIVED as the highest published manifest
    (``latest_manifest_version``) — valid precisely because of the
    existence-implies-completeness guarantee above. Conflicts still
    arbitrate on the manifest create; there is no pointer, hence no
    orphan-pointer recovery to need.

    CRASH RECOVERY (pointer mode): a committer that dies between steps
    2 and 3 leaves a fully-durable ORPHAN manifest with the pointer
    still on the parent. Without repair, every later committer computes
    the same next version, hits the orphan's file, and conflicts
    forever — retry loops would livelock. The manifest is written only
    after its data files are complete, so the orphan IS a valid commit
    missing only its pointer swing: on conflict, if the pointer still
    names an older version AND the existing manifest parses as JSON
    (a foreign half-written file from a pre-upgrade writer must NOT be
    pointed at), this function rolls the pointer FORWARD to the orphan
    (idempotent — a merely-slow rival swinging concurrently writes the
    same value) and then raises CommitConflictError so the caller
    re-reads the now-advanced state and retries on top of it.
    """

    def _swing(to_version: int) -> None:
        ptr = os.path.join(meta_dir, pointer_name)
        tmp = ptr + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(to_version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, ptr)
        _fsync_dir(meta_dir)

    # wall-clock commit stamp (additive, shared by every versioned
    # store): powers timestamp time travel (LakeTable.version_at) and
    # the history metadata frame. setdefault so a replayed/re-published
    # manifest keeps its original time when the caller carries one.
    manifest.setdefault("committed_at", time.time())
    mpath = os.path.join(meta_dir, manifest_name)
    tmp_manifest = mpath + f".tmp-{uuid.uuid4().hex}"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp_manifest, mpath)
    except FileExistsError as e:
        if pointer_name is None:
            raise CommitConflictError(
                f"version {version} ({manifest_name}) was committed "
                "concurrently; re-read and retry"
            ) from e
        ptr = os.path.join(meta_dir, pointer_name)
        try:
            with open(ptr) as f:
                current = int(f.read().strip())
        except (OSError, ValueError):
            current = None
        if current is None or current < version:
            # candidate orphan from a crashed committer — but only a
            # COMPLETE manifest may be pointed at. Our own publishes are
            # complete-by-construction (link after fsync); an
            # unparseable file is foreign debris, so conflict without
            # swinging rather than wedge readers on broken JSON.
            try:
                with open(mpath) as f:
                    json.load(f)
            except (OSError, ValueError):
                raise CommitConflictError(
                    f"version {version} ({manifest_name}) exists but is "
                    "not a complete manifest; refusing to roll the "
                    "pointer onto it — re-read and retry"
                ) from e
            _swing(version)
            raise CommitConflictError(
                f"version {version} ({manifest_name}) was committed by a "
                "crashed writer; its pointer swing has been completed — "
                "re-read and retry"
            ) from e
        raise CommitConflictError(
            f"version {version} ({manifest_name}) was committed "
            "concurrently; re-read and retry"
        ) from e
    finally:
        try:
            os.unlink(tmp_manifest)
        except OSError:
            pass
    if pointer_name is not None:
        _swing(version)
    else:
        _fsync_dir(meta_dir)


# (path) -> (mtime, size, max_lsn | None): snapshot files are immutable
# once published, so a follower polling read_changes pays each footer
# open once per process, not once per hop
_FOOTER_LSN_CACHE: dict[str, tuple[float, int, int | None]] = {}


def _files_max_lsn(files: list[str]) -> int | None:
    """Max ``_lsn`` across parquet footers — metadata only, no Spark
    job (read_changes' high-watermark + touched-bucket pruning input).
    None = a file lacks usable stats; callers fall back to a scan.
    Cached per (path, mtime, size) — same discipline as
    LsnRangedParquetSource's window pruning."""
    import pyarrow.parquet as pq

    out = None
    for f in files:
        try:
            st_f = os.stat(f)
            cached = _FOOTER_LSN_CACHE.get(f)
            if (
                cached is not None
                and cached[0] == st_f.st_mtime
                and cached[1] == st_f.st_size
            ):
                fmax = cached[2]
            else:
                fmax = None
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }.get(LSN_COL)
                if idx is not None:
                    for rg in range(md.num_row_groups):
                        s = md.row_group(rg).column(idx).statistics
                        if s is None or not s.has_min_max:
                            fmax = None
                            break
                        fmax = s.max if fmax is None else max(fmax, s.max)
                _FOOTER_LSN_CACHE[f] = (st_f.st_mtime, st_f.st_size, fmax)
            if fmax is None:
                return None
            out = fmax if out is None else max(out, fmax)
        except Exception:
            return None
    return out


def latest_manifest_version(
    meta_dir: str, prefix: str, suffix: str = ".json"
) -> int | None:
    """Highest published manifest version in a directory — the CURRENT
    derivation for rename-free commit mode. Safe because
    ``versioned_commit`` publishes manifests complete (link-after-fsync):
    any listed name is a finished commit. Tmp files carry a
    ``.tmp-<hex>`` suffix and never match."""
    try:
        names = os.listdir(meta_dir)
    except FileNotFoundError:
        return None
    best = None
    for name in names:
        if name.startswith(prefix) and name.endswith(suffix):
            mid = name[len(prefix): len(name) - len(suffix)]
            if mid.isdigit():
                v = int(mid)
                best = v if best is None or v > best else best
    return best


LSN_COL = "_lsn"  # per-row last-applied LSN, the MERGE guard column
_BUCKET_COL = "_b"
_ACTION_COL = "_action"  # per-row merge outcome, written for metrics
_DEL_COL = "_del"  # partition dir holding tombstones (winning deletes)
_OP_COL = "_op"  # op column persisted in merge-on-read delta files
# equal-LSN tie-break limbs persisted in MOR delta files: computed ONCE
# at delta-write time so the read-path resolve can order same-(key,lsn)
# events from different batches without touching payload columns
# (payload hashing at read time would defeat column pruning)
_TB1_COL = "_tb1"
_TB2_COL = "_tb2"

# ---- shuffle-byte discipline -------------------------------------
# Every byte that rides the resolve exchange costs DRAM bandwidth at
# every parallelism level (measured: encoding op/role/tool to bytes
# lifted 2->8-core scaling efficiency 0.675 -> 0.76 on 16M events).
# The op column is engine-owned, so it ALWAYS rides as a 1-byte code;
# user columns opt in via dict_cols at table creation.
_OP_BASE, _OP_INSERT, _OP_UPDATE, _OP_DELETE, _OP_TOMBSTONE = 0, 1, 2, 3, 4


def _op_code(col) -> "F.Column":
    """String op -> tinyint code. Unknown ops upsert (engine contract:
    anything that isn't a delete is an upsert), so they code as insert."""
    return (
        F.when(col == "delete", _OP_DELETE)
        .when(col == "update", _OP_UPDATE)
        .when(col == "tombstone", _OP_TOMBSTONE)
        .when(col == "base", _OP_BASE)
        .otherwise(_OP_INSERT)
        .cast("tinyint")
    )


def _op_decode(col) -> "F.Column":
    return (
        F.when(col == _OP_DELETE, "delete")
        .when(col == _OP_UPDATE, "update")
        .when(col == _OP_TOMBSTONE, "tombstone")
        .when(col == _OP_BASE, "base")
        .otherwise("insert")
    )


def _dict_encode(col, values: list[str]):
    """-> (code, fallback): code = index into values (smallint), or
    len(values) as the not-in-dict sentinel; fallback carries the
    original string ONLY for sentinel rows (null otherwise), so unknown
    values survive losslessly while known ones ride as 2 bytes."""
    code = F.lit(len(values)).cast("smallint")
    for i, v in reversed(list(enumerate(values))):
        code = F.when(col == v, F.lit(i).cast("smallint")).otherwise(code)
    fallback = F.when(code == len(values), col)
    return code, fallback


def _dict_decode(code, fallback, values: list[str]):
    out = fallback
    for i, v in enumerate(values):
        out = F.when(code == i, F.lit(v)).otherwise(out)
    return out


# ---- equal-LSN total order ---------------------------------------
# Two BATCH events with the same (key, lsn) had no defined winner
# through round 2 (base-vs-batch ties break by __src). "Replay
# equality" as a contract needs a TOTAL order, so the final tie-break
# is a deterministic two-limb hash of the payload — higher hash wins
# (desc), matching the "highest sorts first" convention of the LSN.
#
# Two families, the same split as the dedup operators:
# - "xxhash64" (the at-scale DEFAULT): hashes the typed columns
#   directly JVM-side — no canonical-string allocation. Interleaved
#   per-column null flags disambiguate null-shifted payloads (plain
#   xxhash64 skips nulls, so (x, null) and (null, x) would collide).
#   Measured cost at 32M events / 8 cores: 24.5s -> 25.0s (~2%);
#   the md5 family measured 38.0s (+55%) — string build + md5 per
#   update row — which is why it is NOT the default.
# - "md5": canonical string rendering (values cast to string, nulls ->
#   \x00, \x1f-joined), md5, two 60-bit limbs — bit-reproducible in
#   pure Python (tiebreak_py, the oracle fold) and ANSI SQL (the
#   lww_tiebreak DuckDB oracle). Opt in per table with
#   LakeTable.create(tiebreak_family="md5") when cross-engine tie
#   verification matters more than throughput.
# Both are deterministic functions of the payload, so either gives a
# stable winner across runs, input orders, and cluster layouts; the
# family is recorded in the table snapshot so every merge of a table
# orders ties identically.
_TIEBREAK_SEP = "\x1f"
_TIEBREAK_NULL = "\x00"
TIEBREAK_FAMILIES = ("xxhash64", "md5")


def tiebreak_cols(cols: list, family: str = "xxhash64") -> tuple["F.Column", "F.Column"]:
    """(limb1, limb2) tie-break limbs over ``cols``. Evaluated map-side
    on update rows only (16 B/row through the exchange)."""
    if family == "md5":
        canon = F.concat_ws(
            _TIEBREAK_SEP,
            *[F.coalesce(c.cast("string"), F.lit(_TIEBREAK_NULL)) for c in cols],
        )
        h = F.md5(canon)
        limb1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
        limb2 = F.conv(F.substring(h, 17, 15), 16, 10).cast("long")
        return limb1, limb2
    if family != "xxhash64":
        raise ValueError(f"unknown tiebreak family {family!r}")
    # one hash pass total: columns are SPLIT between the limbs (any
    # differing column differentiates its limb, so the pair is as
    # discriminating as a 128-bit hash at half the compute — measured
    # 27.5s -> ~26s on the 32M apply vs two full passes)
    even: list = []
    odd: list = []
    for i, c in enumerate(cols):
        side = even if i % 2 == 0 else odd
        side += [c, F.isnull(c)]
    limb1 = F.xxhash64(*even) if even else F.lit(0).cast("long")
    limb2 = F.xxhash64(*odd) if odd else F.lit(0).cast("long")
    return limb1, limb2


def tiebreak_py(values) -> tuple[int, int]:
    """Pure-Python twin of tiebreak_cols(family="md5") for the
    sequential oracle (xxhash64 is JVM-internal and deliberately has no
    Python twin — use md5-family tables wherever oracle tie equality is
    asserted).
    Canonical rendering parity with Spark's cast-to-string is exact for
    str/int/bool/None (the types that can tie in practice); float and
    timestamp rendering follows Spark's conventions closely enough for
    tests but is not contractual."""
    import hashlib

    def canon(v):
        if v is None:
            return _TIEBREAK_NULL
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    s = _TIEBREAK_SEP.join(canon(v) for v in values)
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(h[0:15], 16), int(h[16:31], 16)


def retry_on_conflict(fn, attempts: int = 4):
    """Run fn, retrying through CommitConflictError up to ``attempts``
    total tries — THE retry policy for writers sharing a versioned
    store (runner windows, maintenance jobs, index rebuilds). Every
    caller must be idempotent against the re-read CURRENT state, which
    all the engine's commit paths are by construction (LSN guard /
    max-merge / rebuild-from-snapshot)."""
    for i in range(attempts):
        try:
            return fn()
        except CommitConflictError:
            if i == attempts - 1:
                raise


def _and_all(exprs) -> "F.Column":
    """Conjunction fold — the one definition of 'rows match on every
    key column' shared by lookup() and merge()'s pass-through split."""
    out = None
    for e in exprs:
        out = e if out is None else (out & e)
    return out


def _parquet_rows(path: str) -> int:
    """Row count from the parquet footer — metadata only, no data scan
    (the Iceberg-manifest-statistics analog for snapshot lineage)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _rows_per_bucket(files_by_bucket: dict[str, list[str]]) -> dict[str, int]:
    """Footer row counts for many files, concurrently — commits should
    not serialize hundreds of (possibly remote) footer opens."""
    from concurrent.futures import ThreadPoolExecutor

    flat = [(b, f) for b, fl in files_by_bucket.items() for f in fl]
    if not flat:
        return {}
    out: dict[str, int] = {b: 0 for b in files_by_bucket}
    with ThreadPoolExecutor(max_workers=min(16, len(flat))) as ex:
        for (b, _f), n in zip(flat, ex.map(lambda t: _parquet_rows(t[1]), flat)):
            out[b] += n
    return out


@dataclass
class MergeResult:
    """Counts + lineage for one MERGE (north_rule: per-partition
    lineage and row-count metrics)."""

    version: int
    rows_inserted: int = 0
    rows_updated: int = 0
    rows_deleted: int = 0
    rows_noop: int = 0
    rows_dropped: int = 0  # delete won but no base row existed
    rows_delta: int = 0  # merge-on-read: deduped events appended
    touched_buckets: list[int] = field(default_factory=list)
    partition_counts: dict[int, int] = field(default_factory=dict)
    passthrough: bool = False  # uncontested base rows skipped the shuffle

    def as_dict(self) -> dict:
        return {
            "version": self.version,
            "rows_inserted": self.rows_inserted,
            "rows_updated": self.rows_updated,
            "rows_deleted": self.rows_deleted,
            "rows_noop": self.rows_noop,
            "rows_dropped": self.rows_dropped,
            "rows_delta": self.rows_delta,
            "touched_buckets": self.touched_buckets,
            "partition_counts": {str(k): v for k, v in self.partition_counts.items()},
            "passthrough": self.passthrough,
        }


class LakeTable:
    """A bucketed, snapshot-versioned parquet table supporting MERGE."""

    def __init__(self, path: str):
        self.path = path
        self.meta_dir = os.path.join(path, "_meta")
        self.data_dir = os.path.join(path, "data")

    # ---------------------------------------------------------- meta
    @property
    def _current_ptr(self) -> str:
        return os.path.join(self.meta_dir, "CURRENT")

    def exists(self) -> bool:
        return (
            os.path.exists(self._current_ptr)
            or latest_manifest_version(self.meta_dir, "snap-") is not None
        )

    def current_version(self) -> int:
        """Pointer read, or (rename-free tables / object stores without
        atomic rename) the highest published snapshot manifest — valid
        because versioned_commit publishes manifests complete."""
        try:
            with open(self._current_ptr) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            v = latest_manifest_version(self.meta_dir, "snap-")
            if v is None:
                raise
            return v

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.meta_dir, f"snap-{v:08d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snap-"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def version_at(self, timestamp: float) -> int:
        """Timestamp time travel (Iceberg TIMESTAMP AS OF): the highest
        settled version whose commit stamp is <= ``timestamp`` (epoch
        seconds). Snapshots beyond CURRENT (crashed-committer orphans)
        are excluded — they are not readable state yet. Raises
        ValueError when the table did not exist at that time or the
        relevant history has been vacuumed away."""
        current = self.current_version()
        best = None
        for snap in self.history():
            ts = snap.get("committed_at")
            if (
                snap["version"] <= current
                and ts is not None
                and ts <= timestamp
                and (best is None or snap["version"] > best)
            ):
                best = snap["version"]
        if best is None:
            raise ValueError(
                f"no snapshot committed at or before {timestamp} "
                f"(table created later, or that history was vacuumed)"
            )
        return best

    def metadata_df(self, spark: SparkSession, kind: str) -> DataFrame:
        """Queryable metadata frames (Iceberg's ``t.files`` /
        ``t.history`` / ``t.partitions`` analog): kind is "files",
        "history" or "partitions". Built from manifests + os.stat only
        — no data-file I/O, no Spark jobs beyond createDataFrame."""
        from .metadata import build_metadata_df

        return build_metadata_df(spark, self, kind)

    def _commit(self, snap: dict) -> None:
        """Atomic snapshot commit with optimistic concurrency — the
        shared ``versioned_commit`` discipline over snap-N.json. Tables
        created with commit_mode="rename-free" never write a pointer
        (object-store-safe: O_EXCL-style link publish only; CURRENT is
        derived as the max published manifest)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        pointer = (
            None if snap.get("commit_mode") == "rename-free" else "CURRENT"
        )
        versioned_commit(
            self.meta_dir,
            f"snap-{snap['version']:08d}.json",
            snap["version"],
            snap,
            pointer_name=pointer,
        )

    # --------------------------------------------------------- schema
    def schema(self) -> T.StructType:
        """User-visible schema (excludes the hidden LSN guard column)."""
        return T.StructType.fromJson(json.loads(self.snapshot()["schema"]))

    def _stored_schema(self) -> T.StructType:
        s = self.schema()
        return T.StructType(
            list(s.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                # tie-break limbs persist in BASE files too (not just MOR
                # deltas): a cross-batch same-(key,lsn) tie must resolve
                # identically whether the earlier event already reached
                # the base (COW) or still sits in a delta (MOR) — limbs
                # order the tie BEFORE the base/batch source bit, and
                # identical payloads still fall through to base-wins
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )

    # ----------------------------------------------------------- read
    def _resolved_view(
        self,
        spark: SparkSession,
        version: int,
        buckets: list[int] | None = None,
        key_pred=None,
        n_buckets: int | None = None,
        _internal_cols: bool = False,
        files_allow: set[str] | None = None,
    ) -> DataFrame:
        """Shared MOR read path for one PINNED snapshot version: base (+
        tombstones as base-side deletes) LWW-resolved against delta
        files. Pinning the version ONCE keeps base/delta/tombstone file
        lists mutually consistent under concurrent commits (mixing
        CURRENT re-reads could resurrect a deleted key or hit vacuumed
        paths).

        key_pred: optional pre-filter pushed below the resolve. SAFETY
        PRECONDITION: it must be a function of the KEY COLUMNS ONLY —
        the LWW window partitions by key, so a key-complete predicate
        selects whole key-groups and cannot change any winner. A payload
        predicate here would silently promote stale events (their
        higher-LSN competitors get filtered out pre-window); payload
        filters belong ABOVE read().

        _internal_cols=True (read_changes' substrate) keeps the
        per-key winner's `__lsn` and includes delete winners with a
        `__deleted` flag instead of filtering them out."""
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        dicts = snap.get("dict_cols") or {}
        base = self._read_internal(
            spark, version, buckets=buckets, _snap=snap, files_allow=files_allow
        )
        if key_pred is not None:
            base = base.filter(key_pred)
        deltas = self._read_deltas(spark, snap, buckets=buckets,
                                   files_allow=files_allow)
        if deltas is None:
            if _internal_cols:
                live = base.select(
                    *[F.col(f.name) for f in schema.fields],
                    F.col(LSN_COL).alias("__lsn"),
                    F.lit(False).alias("__deleted"),
                )
                tomb0 = self._read_tombstones(spark, snap, buckets=buckets,
                                              files_allow=files_allow)
                if tomb0 is not None:
                    if key_pred is not None:
                        tomb0 = tomb0.filter(key_pred)
                    live = live.unionByName(
                        tomb0.select(
                            *[F.col(f.name) for f in schema.fields],
                            F.col(LSN_COL).alias("__lsn"),
                            F.lit(True).alias("__deleted"),
                        )
                    )
                return live
            return base.drop(LSN_COL, _TB1_COL, _TB2_COL)

        def tag(df, op_expr, src, filtered=False):
            if key_pred is not None and not filtered:
                df = df.filter(key_pred)
            return df.select(
                *self._tag_select(df.columns, schema, dicts),
                F.col(LSN_COL).alias("__lsn"),
                op_expr.alias("__op"),
                F.lit(src).alias("__src"),
                # every side carries PERSISTED limbs (base, tombstones
                # and deltas all store them at write time) — no payload
                # hash at read time, so column pruning through the
                # resolve survives
                F.col(_TB1_COL).alias("__tb1"),
                F.col(_TB2_COL).alias("__tb2"),
            )

        base_tagged = tag(base, F.lit(_OP_BASE).cast("tinyint"), 0, filtered=True)
        # tombstones participate so a stale lower-LSN delta event for a
        # deleted key cannot resurrect it at read time
        tomb = self._read_tombstones(spark, snap, buckets=buckets,
                                     files_allow=files_allow)
        if tomb is not None:
            base_tagged = base_tagged.unionByName(
                tag(tomb, F.lit(_OP_DELETE).cast("tinyint"), 0)
            )
        upd_tagged = tag(deltas, _op_code(F.col(_OP_COL)), 1)
        winners = self._resolve(
            base_tagged, upd_tagged, snap["key_cols"],
            n_buckets if n_buckets is not None else snap["num_buckets"],
        )
        if _internal_cols:
            return winners.select(
                *self._payload_out(schema, dicts),
                F.col("__lsn"),
                F.col("__op").isin(_OP_DELETE, _OP_TOMBSTONE).alias("__deleted"),
            )
        return winners.filter(
            ~F.col("__op").isin(_OP_DELETE, _OP_TOMBSTONE)
        ).select(*self._payload_out(schema, dicts))

    def _resolved_view_bucketed(self, spark: SparkSession, version: int) -> DataFrame:
        """Zero-exchange MOR read: base+tombstones and delta files all
        live one-bucket-per-file already, so they register as catalog
        bucketed tables (hardlinked under bucket-suffix names) and the
        resolve — delta LWW dedup window + full-outer SHUFFLE_HASH join
        — runs with NO exchange, the serving-side twin of
        merge_prebucketed (DESIGN.md §11).

        Lifetime: the returned DataFrame is LAZY, so its registration
        dir and catalog entries must outlive it. Both are DETERMINISTIC
        per (table, snapshot version) and reused across reads —
        snapshots are immutable, so a version's registration is built
        once (atomic tmp+rename; concurrent readers race benignly) and
        its mtime refreshed on reuse; vacuum's grace sweep collects
        superseded ones. Catalog entries are session-scoped
        (CREATE IF NOT EXISTS; one per version read in this session)."""
        import hashlib
        import shutil

        from . import bucketed as B

        snap = self.snapshot(version)
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        if not snap.get("deltas"):
            # no deltas: tombstones cannot change the view (their keys
            # are absent from base by construction) — plain base scan
            return self._read_internal(spark, version, _snap=snap).drop(
                LSN_COL, _TB1_COL, _TB2_COL
            )
        key_cols = snap["key_cols"]
        n_buckets = snap["num_buckets"]
        nonkey = [f for f in schema.fields if f.name not in key_cols]
        stored_plus = T.StructType(
            list(schema.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(_OP_COL, T.StringType(), True),
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        reg_root = os.path.join(
            self.path, "_bucketed", f"read-v{snap['version']:08d}"
        )
        if not os.path.isdir(reg_root):
            tmp = reg_root + f".tmp-{uuid.uuid4().hex[:8]}"
            B.link_files_bucketed(snap["deltas"], os.path.join(tmp, "deltas"))
            if snap["files"]:
                B.link_files_bucketed(
                    snap["files"], os.path.join(tmp, "basetomb", "side=b")
                )
            if snap.get("tombstones"):
                B.link_files_bucketed(
                    snap["tombstones"], os.path.join(tmp, "basetomb", "side=t")
                )
            try:
                os.rename(tmp, reg_root)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # a rival built it
        else:
            try:
                os.utime(reg_root)  # keep the grace sweep off a live reg
            except OSError:
                pass
        pid = hashlib.md5(os.path.abspath(self.path).encode()).hexdigest()[:8]
        dname = B.register_bucketed_table(
            spark, stored_plus, os.path.join(reg_root, "deltas"), key_cols,
            n_buckets, name=f"zxr_{pid}_v{snap['version']}_d",
            if_not_exists=True,
        )
        base_side = None
        if os.path.isdir(os.path.join(reg_root, "basetomb")):
            part_schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField(LSN_COL, T.LongType(), True),
                    T.StructField(_TB1_COL, T.LongType(), True),
                    T.StructField(_TB2_COL, T.LongType(), True),
                    T.StructField("side", T.StringType()),
                ]
            )
            btname = B.register_bucketed_table(
                spark, part_schema, os.path.join(reg_root, "basetomb"),
                key_cols, n_buckets, name=f"zxr_{pid}_v{snap['version']}_bt",
                if_not_exists=True, partition_col="side",
            )
            spark.sql(f"ALTER TABLE `{btname}` RECOVER PARTITIONS")
            base_side = self._zx_cand(
                spark.table(btname), 0, F.col(LSN_COL),
                F.when(F.col("side") == "t", F.lit(_OP_TOMBSTONE)).otherwise(
                    F.lit(_OP_BASE)
                ),
                F.col(_TB1_COL), F.col(_TB2_COL), key_cols, nonkey,
            ).withColumnRenamed("__cand", "__cand_b")
        # delta LWW dedup over the bucketed scan: persisted limbs order
        # cross-batch equal-LSN events, same total order as _resolve
        ddf = spark.table(dname)
        kh = F.xxhash64(*[F.col(c) for c in key_cols])
        w = Window.partitionBy(kh, *[F.col(c) for c in key_cols]).orderBy(
            F.desc(LSN_COL),
            F.col(_TB1_COL).desc_nulls_last(),
            F.col(_TB2_COL).desc_nulls_last(),
        )
        d1 = (
            ddf.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        upd_side = self._zx_cand(
            d1, 1, F.col(LSN_COL), _op_code(F.col(_OP_COL)),
            F.col(_TB1_COL), F.col(_TB2_COL), key_cols, nonkey,
        ).withColumnRenamed("__cand", "__cand_u")
        winners = self._zx_winners(upd_side, base_side, key_cols, nonkey)
        return winners.filter(
            ~F.col("__op").isin(_OP_DELETE, _OP_TOMBSTONE)
        ).select(*[f.name for f in schema.fields])

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        columns: list[str] | None = None,
        resolve: str = "window",
        as_of: float | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot (time travel). Missing columns
        in old files are filled with nulls (additive schema evolution —
        mirrors the reference's extra='allow' carry-through,
        userCode/groundwater/wells.py:30).

        If the snapshot carries merge-on-read deltas, they are resolved
        here (base LWW-merged with delta events, delete tombstones
        applied) — the Hudi/Iceberg-v2 MOR read path.

        columns: validated projection sugar. NOTE: this does NOT beat a
        plain `.select()` above read() — verified on Spark 4.1.2 that
        Catalyst's ColumnPruning pushes the projection through the
        window/union/repartition identically (the rank depends only on
        keys/__lsn/__src), so both forms prune `text` from every scan
        and the resolve exchange. Pinned by
        tests/test_round2_fixes.py::test_read_column_pruning_through_mor_resolve,
        which exists to catch a Catalyst regression, not to justify
        manual plumbing.

        as_of: epoch-seconds timestamp time travel (mutually exclusive
        with version) — resolves via version_at()."""
        if as_of is not None:
            if version is not None:
                raise ValueError("pass either version or as_of, not both")
            version = self.version_at(as_of)
        v = self.current_version() if version is None else version
        if columns is not None:
            schema = T.StructType.fromJson(json.loads(self.snapshot(v)["schema"]))
            unknown = set(columns) - {f.name for f in schema.fields}
            if unknown:
                raise ValueError(f"unknown columns: {sorted(unknown)}")
        if resolve == "bucketed":
            # zero-exchange serving read (see _resolved_view_bucketed)
            out = self._resolved_view_bucketed(spark, v)
        elif resolve == "window":
            out = self._resolved_view(spark, v)
        else:
            raise ValueError(f"unknown resolve strategy {resolve!r}")
        return out.select(*columns) if columns is not None else out

    @property
    def bloom_dir(self) -> str:
        return os.path.join(self.path, "_blooms")

    def lookup(
        self, spark: SparkSession, use_blooms: bool = True, **key_values
    ) -> DataFrame:
        """Point read by FULL primary key with bucket pruning: the key's
        bucket is computed with the table's own hash, and only that
        bucket's base/delta/tombstone files are scanned — O(1/num_buckets)
        of the table per lookup (the serving-layer read; Iceberg analog:
        bucket-transform partition pruning on an equality predicate).

        On top of the bucket, per-file key blooms (lake/bloom.py, built
        by build_blooms) drop candidate files that provably cannot hold
        the key — at CDC steady state a bucket holds many delta files
        and the key lives in few, so the lookup goes from O(files in
        bucket) to O(files containing the key) + the bloom's ~1% false
        positives. Files without a sidecar are read conservatively;
        use_blooms=False restores the pure bucket path.

        All key columns are required — the bucket hash covers the full
        key, so a partial key cannot prune (use read().filter() there).
        Null key values are matched null-safely (the layout hashes
        nulls consistently, and merge treats null-keyed rows as ordinary
        keys)."""
        from .bloom import bloom_hash_cols, load_sidecar

        v = self.current_version()
        snap = self.snapshot(v)
        key_cols = snap["key_cols"]
        if set(key_values) != set(key_cols):
            raise ValueError(f"lookup requires exactly the key columns {key_cols}")
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        key_fields = [f for f in schema.fields if f.name in key_cols]
        row = tuple(key_values[f.name] for f in key_fields)
        probe = spark.createDataFrame([row], T.StructType(key_fields))
        # one 1-row job: the bucket function is Spark's hash — computing
        # it anywhere else would risk divergence from the layout; the
        # bloom limbs ride the same job (same reason: xxhash64 must be
        # Spark's, bit-for-bit, or probes would diverge from builds)
        h1c, h2c = bloom_hash_cols(key_cols)
        pr = probe.select(self._bucket_expr(snap).alias("b"), h1c, h2c).collect()[0]
        b = pr["b"]
        files_allow = None
        if use_blooms and os.path.isdir(self.bloom_dir):
            files_allow = set()
            for coll in (snap["files"], snap.get("tombstones", {}),
                         snap.get("deltas", {})):
                for fl in (coll.get(str(b)) or coll.get(b) or []):
                    side = load_sidecar(self.bloom_dir, fl)
                    if side is None or side.might_contain(pr["__bh1"], pr["__bh2"]):
                        files_allow.add(fl)
        pred = _and_all(
            F.col(c).eqNullSafe(F.lit(key_values[c])) for c in key_cols
        )
        return self._resolved_view(
            spark, v, buckets=[b], key_pred=pred, n_buckets=1,
            files_allow=files_allow,
        )

    def build_blooms(
        self,
        spark: SparkSession,
        version: int | None = None,
        bits_per_key: int = 10,
        k: int = 7,
    ) -> int:
        """Build missing per-file key bloom sidecars for a snapshot's
        base/tombstone/delta files (maintenance op, typically after
        merge/compact cadences). Returns the number of sidecars built.

        One column-pruned scan of ONLY the files lacking a sidecar
        (key columns + the two JVM-side xxhash64 limbs), one groupBy
        input_file_name whose pandas stage just sets bits (vectorized),
        and a driver collect bounded at one small row per file. Files
        are immutable, so sidecars are deterministic and idempotent —
        no commit protocol, concurrent builders are harmless."""
        from .bloom import (
            FileBloom, bloom_hash_cols, sidecar_name, write_sidecar,
        )

        v = self.current_version() if version is None else version
        snap = self.snapshot(v)
        key_cols = snap["key_cols"]
        all_files = [
            f
            for coll in (snap["files"], snap.get("tombstones", {}),
                         snap.get("deltas", {}))
            for fl in coll.values()
            for f in fl
        ]
        missing = [
            f for f in all_files
            if not os.path.exists(os.path.join(self.bloom_dir, sidecar_name(f)))
        ]
        if not missing:
            return 0
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        key_schema = T.StructType(
            [f for f in schema.fields if f.name in key_cols]
        )
        hashed = (
            spark.read.schema(key_schema).parquet(*missing)
            .select(
                F.input_file_name().alias("__file"), *bloom_hash_cols(key_cols)
            )
        )
        out_schema = T.StructType(
            [
                T.StructField("file", T.StringType(), False),
                T.StructField("n_keys", T.LongType(), False),
                T.StructField("bloom", T.BinaryType(), False),
            ]
        )

        def build(pdf):
            import pandas as pd

            blob = FileBloom.build(
                pdf["__bh1"].to_numpy(), pdf["__bh2"].to_numpy(),
                bits_per_key=bits_per_key, k=k,
            ).to_bytes()
            return pd.DataFrame(
                {"file": [pdf["__file"].iloc[0]], "n_keys": [len(pdf)],
                 "bloom": [blob]}
            )

        rows = hashed.groupBy("__file").applyInPandas(build, out_schema).collect()
        # input_file_name yields URIs (file:///...); sidecar naming uses
        # the path tail so both spellings land on the same sidecar
        built = 0
        for r in rows:
            write_sidecar(self.bloom_dir, r["file"], bytes(r["bloom"]))
            built += 1
        return built

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Incremental changelog between two snapshots — the downstream
        half of a CDC engine (Delta Change Data Feed / Iceberg
        changelog-scan analog): a consumer that processed the table at
        ``from_version`` calls this to get exactly the NET row-level
        changes it must apply to reach ``to_version``.

        Output: the to_version payload columns plus
        ``_change_type`` ('insert' | 'update' | 'delete') and
        ``_commit_lsn`` (the winning event's LSN; deletes carry the
        delete event's LSN). Updates and inserts carry the post-image;
        deletes carry the from_version pre-image.

        include_preimages=True additionally emits, for every 'update'
        row, a companion ``_change_type='update_preimage'`` row with
        the from_version payload and the SAME ``_commit_lsn`` as its
        post-image (the Delta CDF update_preimage/update_postimage
        convention) — what a self-maintaining downstream aggregate
        needs to SUBTRACT the old contribution before adding the new
        (lake/incremental.py). Emitted in the same single pass over
        the full-outer join (an in-row 1-or-2 element array explode),
        never a second join.

        Cost scales with the CHANGE, not the table: from_version's
        high-watermark comes from parquet footer stats (no job), and
        only buckets whose per-bucket FILE LISTS differ between the two
        snapshots participate (metadata-only diff; unchanged buckets'
        refs carry forward verbatim, so an equal list proves no change
        — and it still catches rows that vanished via tombstone
        expiry, which footer-LSN pruning cannot see). The from-side
        read prunes to the same buckets; the full-outer join runs over
        touched buckets only.

        Contract: LSNs applied between the versions must exceed
        from_version's high-watermark (the CdcRunner window discipline;
        arbitrary hand merges of past LSN ranges can change equal-LSN
        tie winners invisibly to footer stats). Rebucketing between the
        versions is supported — the from-side just reads unpruned
        (bucket ids are not comparable across layouts)."""
        v2 = self.current_version() if to_version is None else to_version
        v1 = from_version
        if v1 > v2:
            raise ValueError(f"from_version {v1} > to_version {v2}")
        snap2 = self.snapshot(v2)
        if v1 == 0:
            # the empty origin is SYNTHETIC, never read from disk: a
            # vacuumed table may have expired its v0 manifest, and a
            # from-zero changelog (a fresh follower's bootstrap full
            # sync) must still work
            snap1 = {
                "files": {}, "tombstones": {}, "deltas": {},
                "num_buckets": snap2["num_buckets"],
                "schema": snap2["schema"],
            }
        else:
            try:
                snap1 = self.snapshot(v1)
            except FileNotFoundError:
                raise ValueError(
                    f"from_version {v1} has been expired by vacuum(); an "
                    "incremental hop from it is no longer computable. "
                    "Re-sync the consumer from scratch: read_changes(0) "
                    "against an EMPTY downstream state (a diverged replica "
                    "must be recreated first — it may hold rows whose "
                    "deletes are gone). Keep vacuum's retention above the "
                    "follower's polling interval to avoid this."
                ) from None
        schema2 = T.StructType.fromJson(json.loads(snap2["schema"]))
        out_fields = T.StructType(
            list(schema2.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_lsn", T.LongType(), True),
            ]
        )
        empty = spark.createDataFrame([], out_fields)
        if v1 == v2:
            return empty

        v1_files = [
            f
            for coll in (
                snap1["files"], snap1.get("tombstones", {}), snap1.get("deltas", {}),
            )
            for fl in coll.values()
            for f in fl
        ]
        wm1 = _files_max_lsn(v1_files)
        if wm1 is None and v1_files:
            # stats-less files (foreign writer): one column-pruned job
            wm1 = (
                spark.read.parquet(*v1_files)
                .agg(F.max(LSN_COL).alias("m")).collect()[0]["m"]
            )
        if wm1 is None:
            wm1 = -1  # empty from-version: everything in v2 is new

        # touched buckets by FILE-LIST diff, not LSN footers: snapshots
        # carry unchanged buckets' file refs forward verbatim, so an
        # identical per-bucket file list proves the bucket cannot differ
        # between the versions — while a bucket whose rows VANISHED
        # (tombstone expiry) leaves no fresh-LSN trace for footer-based
        # pruning to see, but always has a different file list.
        # Maintenance churn (compact/fold rewrites) marks buckets
        # touched too; the join then correctly yields no rows for them.
        def bucket_sig(snap):
            sig: dict[int, list[str]] = {}
            for coll in (
                snap["files"], snap.get("tombstones", {}),
                snap.get("deltas", {}),
            ):
                for b, fl in coll.items():
                    sig.setdefault(int(b), []).extend(sorted(fl))
            return sig

        if snap1["num_buckets"] == snap2["num_buckets"]:
            s1, s2 = bucket_sig(snap1), bucket_sig(snap2)
            touched = {b for b in set(s1) | set(s2) if s1.get(b) != s2.get(b)}
        else:
            touched = set(bucket_sig(snap2))  # rebucketed: incomparable
        if not touched:
            return empty
        tb = sorted(touched)

        cur = self._resolved_view(spark, v2, buckets=tb, _internal_cols=True)
        prev_buckets = (
            tb if snap1["num_buckets"] == snap2["num_buckets"] else None
        )
        if v1 == 0:
            prev = spark.createDataFrame(
                [],
                T.StructType(
                    list(schema2.fields)
                    + [
                        T.StructField("__lsn", T.LongType(), True),
                        T.StructField("__deleted", T.BooleanType(), True),
                    ]
                ),
            )
        else:
            prev = (
                self._resolved_view(
                    spark, v1, buckets=prev_buckets, _internal_cols=True
                )
                .filter(~F.col("__deleted"))
            )
        key_cols: list[str] = snap2["key_cols"]
        schema1_names = {
            f.name for f in T.StructType.fromJson(json.loads(snap1["schema"])).fields
        }
        prev = prev.select(
            # renamed keys + null-safe join condition: merge() matches
            # null key values null-safely, so the changelog must too
            *[F.col(c).alias(f"__pk_{c}") for c in key_cols],
            *[
                (
                    F.col(f.name) if f.name in schema1_names
                    else F.lit(None).cast(f.dataType)
                ).alias(f"__prev_{f.name}")
                for f in schema2.fields
                if f.name not in key_cols
            ],
            F.col("__lsn").alias("__prev_lsn"),
        )
        j = cur.join(
            prev,
            on=_and_all(
                F.col(c).eqNullSafe(F.col(f"__pk_{c}")) for c in key_cols
            ),
            how="full_outer",
        )

        cur_missing = F.col("__lsn").isNull()
        prev_present = F.col("__prev_lsn").isNotNull()
        fresh = F.col("__lsn") > F.lit(wm1)
        live = ~F.coalesce(F.col("__deleted"), F.lit(True))
        change = (
            F.when(live & fresh & ~prev_present, F.lit("insert"))
            .when(live & fresh & prev_present, F.lit("update"))
            # tombstone expired between versions: the delete is real
            # even though its LSN is gone from v2's files
            .when((cur_missing | ~live) & prev_present
                  & (cur_missing | fresh), F.lit("delete"))
        )
        nonkey = [f for f in schema2.fields if f.name not in key_cols]
        classified = j.withColumn("_change_type", change).filter(
            F.col("_change_type").isNotNull()
        )
        # cur-missing (expired-tombstone delete) rows carry the
        # key only on the prev side
        keys_out = [
            F.coalesce(F.col(c), F.col(f"__pk_{c}")).alias(c)
            for c in key_cols
        ]
        post_payload = [
            F.when(
                F.col("_change_type") == "delete",
                F.col(f"__prev_{f.name}"),
            )
            .otherwise(F.col(f.name))
            .alias(f.name)
            for f in nonkey
        ]
        if not include_preimages:
            return classified.select(
                *keys_out,
                *post_payload,
                F.col("_change_type"),
                F.col("__lsn").alias("_commit_lsn"),
            )
        # pre-image companion rows: same keys + same commit LSN as the
        # post-image, payload from the from_version side. Built as a
        # 1-or-2 element struct array exploded in the SAME pass — the
        # full-outer join is never evaluated twice.
        post_struct = F.struct(
            *keys_out,
            *post_payload,
            F.col("_change_type").alias("_change_type"),
            F.col("__lsn").alias("_commit_lsn"),
        )
        pre_struct = F.struct(
            *keys_out,
            *[F.col(f"__prev_{f.name}").alias(f.name) for f in nonkey],
            F.lit("update_preimage").alias("_change_type"),
            F.col("__lsn").alias("_commit_lsn"),
        )
        rows = F.when(
            F.col("_change_type") == "update",
            F.array(post_struct, pre_struct),
        ).otherwise(F.array(post_struct))
        return classified.select(F.explode(rows).alias("__r")).select("__r.*")

    def _read_deltas(self, spark: SparkSession, snap: dict,
                     buckets: list[int] | None = None,
                     files_allow: set[str] | None = None) -> DataFrame | None:
        """Read merge-on-read delta files (payload + _lsn + _op)."""
        dfiles: list[str] = []
        for b, flist in snap.get("deltas", {}).items():
            if buckets is None or int(b) in buckets:
                dfiles.extend(
                    f for f in flist if files_allow is None or f in files_allow
                )
        if not dfiles:
            return None
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        stored = T.StructType(
            list(schema.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(_OP_COL, T.StringType(), True),
                # pre-upgrade delta files lack the persisted tie-break
                # limbs; parquet null-fills them (desc_nulls_last keeps
                # their legacy nondeterministic-tie behavior)
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        return spark.read.schema(stored).parquet(*dfiles)

    def _read_tombstones(self, spark: SparkSession, snap: dict,
                         buckets: list[int] | None = None,
                         files_allow: set[str] | None = None) -> DataFrame | None:
        """Read retained tombstone files (winning-delete rows with
        their _lsn). Schema = stored schema; payload columns are null."""
        tfiles: list[str] = []
        for b, flist in snap.get("tombstones", {}).items():
            if buckets is None or int(b) in buckets:
                tfiles.extend(
                    f for f in flist if files_allow is None or f in files_allow
                )
        if not tfiles:
            return None
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        stored = T.StructType(
            list(schema.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        return spark.read.schema(stored).parquet(*tfiles)

    @staticmethod
    def _update_tiebreak(
        df_cols: list[str], evolved: T.StructType, op_col: str,
        family: str = "xxhash64",
    ):
        """Equal-LSN total-order tie-break for an incoming update batch:
        two limbs over (evolved payload values in schema order,
        normalized op string) — the md5 family follows the exact
        convention of cdc.apply.oracle_fold/tiebreak_py. Computed ONCE
        map-side on the update rows only (16 B/row through the exchange
        beats re-hashing the much larger base side post-shuffle, and
        the MOR path persists the limbs so reads never hash payload at
        all)."""
        cols = [
            F.col(f.name).cast(f.dataType)
            if f.name in df_cols
            else F.lit(None).cast(f.dataType)
            for f in evolved.fields
        ]
        cols.append(_op_decode(_op_code(F.col(op_col))))
        return tiebreak_cols(cols, family=family)

    def _resolve(self, base_tagged: DataFrame, upd_tagged: DataFrame,
                 key_cols: list[str], n_buckets: int) -> DataFrame:
        """Shared LWW resolution: union base+updates, ONE repartition
        on the key columns (satisfies both the ranking window and the
        bucket layout — see _bucket_expr), rank by (lsn desc, base
        first, payload-hash limbs desc) — a TOTAL order, so equal-LSN
        batch events have one deterministic winner; keep winners. Both
        inputs must carry __tb1/__tb2 (null on the base side: base
        beats batch via __src before the limbs are consulted). Adds
        __rn/__all_chg."""
        unioned = base_tagged.unionByName(upd_tagged).repartition(
            n_buckets, *[F.col(c) for c in key_cols]
        )
        # the window groups by an xxhash64 PREFIX of the keys plus the
        # keys themselves: grouping is identical (hash is a function of
        # the keys; the keys after it break hash collisions), the
        # HashPartitioning([keys]) above still satisfies the clustering
        # (keys ⊆ partition expressions → no second exchange), but the
        # per-partition sort now leads with an 8-byte numeric radix
        # prefix instead of comparing conv_id STRINGS row-by-row —
        # measured 3-7% off the 32M apply at 2-8 cores
        kh = F.xxhash64(*[F.col(c) for c in key_cols])
        pb = [kh, *[F.col(c) for c in key_cols]]
        # limbs order BEFORE the source bit: a cross-batch same-(key,
        # lsn) tie must resolve to the same winner whether the earlier
        # event already reached the base (COW, limbs persisted there)
        # or still sits in a delta (MOR) — mode/batching/compaction
        # independence. IDENTICAL payloads have identical limbs, so the
        # src bit still makes redelivered events base-wins no-ops.
        # (Null limbs — pre-upgrade or overwrite()-loaded base rows —
        # sort last: a batch event beats them on an exact-LSN tie,
        # rewriting identical content; state is unchanged, only the
        # noop-vs-update metric differs for legacy rows.)
        order = [
            F.desc("__lsn"),
            F.col("__tb1").desc_nulls_last(),
            F.col("__tb2").desc_nulls_last(),
            F.asc("__src"),
        ]
        w = Window.partitionBy(*pb).orderBy(*order)
        # the metrics min shares the rank's partition AND order spec
        # (its value is order-independent) with an unbounded frame, so
        # Catalyst collapses both into ONE Window operator — one pass
        # over each sorted partition instead of two (measured ~12% off
        # the incremental resolve; plan: 2 Window ops -> 1)
        wfull = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = unioned.select(
            "*",
            F.row_number().over(w).alias("__rn"),
            F.min("__src").over(wfull).alias("__all_chg"),
        )
        return ranked.filter(F.col("__rn") == 1)

    def _resolve_batch(
        self, upd_tagged: DataFrame, key_cols: list[str], n_buckets: int
    ) -> DataFrame:
        """Batch-only LWW dedup (no base side): the same total order as
        _resolve but WITHOUT the min(__src) over-partition metrics
        column. That column exists to classify insert-vs-update against
        base rows — the MOR append path has no base side and never
        reads __all_chg — and it is precisely what blocks Spark's
        WindowGroupLimit rank pushdown. With a pure rank filter the
        optimizer inserts a PARTIAL top-1-per-key below the exchange,
        so intra-batch duplicates collapse map-side before riding the
        wire (the MOR apply's dominant shuffle volume at typical
        duplication rates)."""
        # the radix-prefix hash is materialized BELOW the repartition:
        # if the window partitioned by an expression computed above the
        # exchange, the optimizer could not push the Partial group
        # limit under it (the partition key would not exist there)
        ranked = (
            upd_tagged.withColumn(
                "__kh", F.xxhash64(*[F.col(c) for c in key_cols])
            )
            .repartition(n_buckets, *[F.col(c) for c in key_cols])
            .select(
                "*",
                F.row_number()
                .over(
                    Window.partitionBy(
                        "__kh", *[F.col(c) for c in key_cols]
                    ).orderBy(
                        F.desc("__lsn"),
                        F.col("__tb1").desc_nulls_last(),
                        F.col("__tb2").desc_nulls_last(),
                        F.asc("__src"),
                    )
                )
                .alias("__rn"),
            )
        )
        return ranked.filter(F.col("__rn") == 1).drop("__kh")

    def _resolve_agg(self, base_tagged: DataFrame, upd_tagged: DataFrame,
                     key_cols: list[str]) -> DataFrame:
        """A/B alternative to _resolve: LWW as ONE aggregate —
        max_by(payload struct, (lsn, -src, tb1, tb2)) + min(src) — so
        Spark applies map-side PARTIAL aggregation before the exchange
        (duplicate keys collapse before riding the wire; the window
        formulation cannot, because the min-over-partition metric
        column blocks the WindowGroupLimit rank pushdown). Semantics
        are identical to _resolve iff the order is total — which the
        tie-break limbs now guarantee. NOTE: the aggregate's own
        exchange is hashpartitioning(key_cols, spark.sql.shuffle
        .partitions); bucket-aligned single-exchange writes therefore
        need shuffle_partitions == num_buckets in this mode. Kept
        behind merge(resolve_strategy=...) for measured A/B — see
        DESIGN.md for the recorded verdict."""
        unioned = base_tagged.unionByName(upd_tagged)
        data_cols = [c for c in unioned.columns if c not in key_cols]
        # same total order as _resolve: lsn, limbs (struct comparison
        # treats null as smallest == desc_nulls_last), then base-first
        rank = F.struct(
            F.col("__lsn").alias("l"),
            F.col("__tb1").alias("t1"),
            F.col("__tb2").alias("t2"),
            (-F.col("__src")).alias("ns"),
        )
        agg = unioned.groupBy(*[F.col(c) for c in key_cols]).agg(
            F.max_by(F.struct(*[F.col(c) for c in data_cols]), rank).alias("__w"),
            F.min("__src").alias("__all_chg"),
        )
        return agg.select(
            *key_cols, *[F.col(f"__w.{c}").alias(c) for c in data_cols], "__all_chg"
        )

    def _read_internal(
        self,
        spark: SparkSession,
        version: int | None = None,
        buckets: list[int] | None = None,
        _snap: dict | None = None,
        files_allow: set[str] | None = None,
    ) -> DataFrame:
        # _snap: caller's already-parsed snapshot (the manifest JSON can
        # carry thousands of file paths — don't re-parse it per helper
        # on the point-lookup serving path)
        snap = _snap if _snap is not None else self.snapshot(version)
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        stored = T.StructType(
            list(schema.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                # limbs null-fill for pre-upgrade/overwrite files
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        files: list[str] = []
        for b, flist in snap["files"].items():
            if buckets is None or int(b) in buckets:
                files.extend(
                    f for f in flist if files_allow is None or f in files_allow
                )
        if not files:
            return spark.createDataFrame([], stored)
        # mergeSchema not needed: we pass the (superset) snapshot
        # schema explicitly; parquet fills absent columns with null.
        return spark.read.schema(stored).parquet(*files)

    # ---------------------------------------------------------- create
    @staticmethod
    def create(
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        num_buckets: int = 16,
        dict_cols: dict[str, list[str]] | None = None,
        tiebreak_family: str = "xxhash64",
        commit_mode: str = "pointer",
    ) -> "LakeTable":
        """dict_cols: {string_column: [expected values...]} — declared
        low-cardinality columns ride the merge/read shuffles as 2-byte
        dictionary codes instead of strings (values outside the declared
        set survive via a lossless fallback). A ~10-25% shuffle-byte cut
        on transcript-shaped payloads (see DESIGN.md section 7).

        commit_mode: "pointer" (default, POSIX: atomic-rename CURRENT
        pointer) or "rename-free" (object-store-safe: commits are
        manifest publishes only — fail-if-exists link, no rename
        anywhere; CURRENT is derived as the highest published
        manifest). Recorded in every snapshot and carried forward."""
        if commit_mode not in ("pointer", "rename-free"):
            raise ValueError(f"unknown commit_mode {commit_mode!r}")
        t = LakeTable(path)
        if t.exists():
            raise ValueError(f"table already exists at {path}")
        by_name = {f.name: f for f in schema.fields}
        for c, vals in (dict_cols or {}).items():
            if c in key_cols:
                raise ValueError(f"dict_cols cannot include key column {c}")
            if c not in by_name or not isinstance(by_name[c].dataType, T.StringType):
                raise ValueError(f"dict_cols column {c} must be a string column")
            if not vals or not all(isinstance(v, str) for v in vals):
                raise ValueError(f"dict_cols[{c}] must be a non-empty list of strings")
        os.makedirs(t.data_dir, exist_ok=True)
        t._commit(
            {
                "version": 0,
                "parent": None,
                "schema": json.dumps(schema.jsonValue()),
                "key_cols": key_cols,
                "num_buckets": num_buckets,
                "dict_cols": dict_cols or {},
                "tiebreak_family": tiebreak_family,
                "commit_mode": commit_mode,
                "files": {},
                "summary": {"operation": "create"},
            }
        )
        return t

    # ------------------------------------------------- shuffle encode
    def _tag_select(self, df_cols: list[str], evolved: T.StructType, dicts: dict):
        """Projection list for one side of the resolve union: evolved
        payload columns (missing -> typed null), with declared dict
        columns split into (code, fallback) pairs so strings don't ride
        the exchange."""
        out = []
        for f in evolved.fields:
            src = (
                F.col(f.name).cast(f.dataType)
                if f.name in df_cols
                else F.lit(None).cast(f.dataType)
            )
            if f.name in dicts:
                code, fb = _dict_encode(src, dicts[f.name])
                out += [code.alias(f"__c_{f.name}"), fb.alias(f"__f_{f.name}")]
            else:
                out.append(src.alias(f.name))
        return out

    @staticmethod
    def _payload_out(evolved: T.StructType, dicts: dict):
        """Inverse of _tag_select: decode dict columns back to their
        public string form after the winners are chosen."""
        return [
            _dict_decode(
                F.col(f"__c_{f.name}"), F.col(f"__f_{f.name}"), dicts[f.name]
            ).alias(f.name)
            if f.name in dicts
            else F.col(f.name)
            for f in evolved.fields
        ]

    # ---------------------------------------------------------- write
    def _bucket_expr(self, snap: dict | None = None):
        """Bucket id = pmod(hash(key_cols), n) with Spark's own Murmur3
        F.hash — DELIBERATELY identical to Spark's internal
        HashPartitioning. Consequence: after ``repartition(n, *keys)``
        every task holds exactly one bucket, so the merge's window
        shuffle and the bucketed file layout share ONE exchange (the
        moral equivalent of Iceberg storage-partitioned writes).
        Pass the caller's pinned snapshot to avoid a CURRENT re-read
        (the function's inputs are immutable post-create anyway)."""
        if snap is None:
            snap = self.snapshot()
        keys = [F.col(c) for c in snap["key_cols"]]
        return F.pmod(F.hash(*keys), F.lit(snap["num_buckets"])).cast("int")

    def _write_buckets(
        self,
        df: DataFrame,
        pre_partitioned: bool = False,
        sort_within: bool = False,
        _snap: dict | None = None,
        sort_expr=None,
        row_group_bytes: int | None = None,
    ) -> dict[str, list[str]]:
        """Write df (stored schema + _b) into per-bucket parquet files.

        pre_partitioned=True: df is already hash-partitioned on the key
        columns into num_buckets partitions (each task = one bucket) —
        write directly, no extra shuffle. Otherwise repartition first.
        Skew note: buckets hash the FULL key (conv_id AND turn_idx), so
        a hot conversation spreads across buckets by construction —
        this replaces explicit salting.

        sort_within=True clusters each bucket's rows by key before the
        write, so parquet row-group min/max statistics carry TIGHT,
        non-overlapping key ranges — a point lookup's pushed equality
        predicate then skips whole row groups inside the bucket file
        (Iceberg's sort-order-on-rewrite analog). Used by compact():
        maintenance pays the local sort once so the serving reads skip
        forever after."""
        snap = _snap if _snap is not None else self.snapshot()
        key_cols = snap["key_cols"]
        out_dir = os.path.join(self.data_dir, f"w-{uuid.uuid4().hex}")
        if not pre_partitioned:
            df = df.repartition(snap["num_buckets"], *[F.col(c) for c in key_cols])
        if sort_within:
            # _BUCKET_COL leads the sort: the dynamic-partition writer
            # requires ordering by the partition column and would insert
            # its OWN (unstable) sort otherwise, scrambling the key
            # clustering this exists to produce. sort_expr (e.g. a
            # z-order key) replaces the key clustering when given.
            order = (
                [sort_expr] if sort_expr is not None
                else [F.col(c) for c in key_cols]
            )
            df = df.sortWithinPartitions(F.col(_BUCKET_COL), *order)
        writer = df.write.partitionBy(_BUCKET_COL).mode("overwrite")
        if row_group_bytes is not None:
            # smaller parquet row groups = finer stats granularity for
            # skip-scans (and the knob the clustering tests pin)
            writer = writer.option("parquet.block.size", str(row_group_bytes))
        writer.parquet(out_dir)
        files: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if entry.startswith(f"{_BUCKET_COL}="):
                b = entry.split("=")[1]
                bdir = os.path.join(out_dir, entry)
                files[b] = [
                    os.path.join(bdir, f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                ]
        return files

    def max_lsn(self, spark: SparkSession) -> int:
        """Highest applied LSN across base, delta and tombstone files —
        parquet-footer statistics only (cached per immutable file), no
        Spark job. 0 for an empty table."""
        snap = self.snapshot()
        files: list[str] = []
        for m in (snap.get("files"), snap.get("deltas"), snap.get("tombstones")):
            for fl in (m or {}).values():
                files.extend(fl)
        if not files:
            return 0
        best = _files_max_lsn(files)
        return best if best is not None else 0

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        lsn: int | None = None,
    ) -> MergeResult:
        """Bulk predicate delete (retention sweeps / GDPR erasure):
        resolve the current state, project the KEYS of rows matching
        ``condition`` (a Column or SQL string), and merge delete
        events for them at an LSN above the table's maximum (footer
        stats, no extra job), so the deletes win LWW everywhere and
        leave tombstones that stop later stale events from
        resurrecting the keys. One resolve + one ordinary merge; only
        matching buckets rewrite. Idempotent: a second identical call
        matches nothing."""
        if isinstance(condition, str):
            condition = F.expr(condition)
        snap = self.snapshot()
        if lsn is None:
            lsn = self.max_lsn(spark) + 1
        keys = (
            self.read(spark)
            .filter(condition)
            .select(*[F.col(c) for c in snap["key_cols"]])
        )
        changes = keys.select(
            "*",
            F.lit("delete").alias("op"),
            F.lit(lsn).cast("long").alias("lsn"),
        )
        # the keys frame derives from THIS table's current snapshot;
        # localCheckpoint pins it so the merge's multiple evaluations
        # cannot observe the table mid-rewrite (self-referential merge)
        changes = changes.localCheckpoint(eager=True)
        return self.merge(changes, _operation_label="delete-where")

    def clone_to(self, dest: str, version: int | None = None) -> "LakeTable":
        """Deep-copy one snapshot into a NEW independent table
        (Iceberg snapshot-export analog — the dev-copy / share-a-
        -version workflow). Data files are COPIED, so nothing the
        source does afterwards (merges, compaction, vacuum) can touch
        the clone, and vice versa. Schema, key columns, bucket
        layout, dict encodings, tie-break family and commit mode
        carry over; history does not — the clone's chain is
        create(0) -> clone(1). MOR deltas and tombstones copy as-is,
        so a cloned merge-on-read snapshot resolves identically.

        Fails loudly if the requested version's files were already
        vacuumed (same contract as rollback)."""
        import shutil as _shutil

        snap = self.snapshot(version)
        missing = [f for f in self._snap_files(snap) if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot clone version {snap['version']}: {len(missing)} "
                f"data files already vacuumed (first: {missing[0]})"
            )
        clone = LakeTable.create(
            dest,
            T.StructType.fromJson(json.loads(snap["schema"])),
            key_cols=snap["key_cols"],
            num_buckets=snap["num_buckets"],
            dict_cols=snap.get("dict_cols") or None,
            tiebreak_family=snap.get("tiebreak_family", "xxhash64"),
            commit_mode=snap.get("commit_mode", "pointer"),
        )
        copy_dir = os.path.join(clone.data_dir, f"clone-{uuid.uuid4().hex}")

        def copy_map(m: dict) -> dict:
            out: dict[str, list[str]] = {}
            for b, fl in (m or {}).items():
                dd = os.path.join(copy_dir, f"b={b}")
                os.makedirs(dd, exist_ok=True)
                new = []
                for f in fl:
                    dst = os.path.join(dd, f"{uuid.uuid4().hex}.parquet")
                    _shutil.copy2(f, dst)
                    new.append(dst)
                out[b] = sorted(new)
            return out

        clone._commit(
            {
                "version": 1,
                "parent": 0,
                "schema": snap["schema"],
                "key_cols": snap["key_cols"],
                "num_buckets": snap["num_buckets"],
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": copy_map(snap.get("files")),
                "deltas": copy_map(snap.get("deltas")),
                "tombstones": copy_map(snap.get("tombstones")),
                "row_counts": dict(snap.get("row_counts", {})),
                "summary": {
                    "operation": "clone",
                    "cloned_from": self.path,
                    "cloned_version": snap["version"],
                },
            }
        )
        return clone

    def begin_wap(self, wap_id: str) -> "LakeTable":
        """Open (or re-attach to) a write-audit-publish stage: a
        LakeTable whose commits land on a private staged chain,
        invisible to readers until ``publish()`` (see lake/wap.py)."""
        from .wap import WapStage

        return WapStage(self.path, wap_id)

    def overwrite(self, df: DataFrame, lsn: int = 0) -> int:
        """Full-refresh load (reference entry point C: the xlsx batch
        load, userCode/xlsx/main.py:19-28 — no watermark, replace all)."""
        snap = self.snapshot()
        out = df
        if LSN_COL not in df.columns:
            out = out.withColumn(LSN_COL, F.lit(lsn).cast("long"))
        out = out.withColumn(_BUCKET_COL, self._bucket_expr(snap))
        files = self._write_buckets(out, _snap=snap)
        new_version = snap["version"] + 1
        self._commit(
            {
                "version": new_version,
                "parent": snap["version"],
                "schema": json.dumps(
                    T.StructType(
                        [f for f in df.schema.fields if f.name != LSN_COL]
                    ).jsonValue()
                ),
                "key_cols": snap["key_cols"],
                "num_buckets": snap["num_buckets"],
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": files,
                "row_counts": _rows_per_bucket(files),
                "summary": {"operation": "overwrite"},
            }
        )
        return new_version

    # ---------------------------------------------------------- merge
    # Iceberg-safe type promotions. Parquet files written with the
    # narrow type read back natively under the wide schema on Spark 4's
    # vectorized reader (verified: int32->long, float->double), so
    # widening is a pure metadata change — no rewrite.
    _INT_RANK = {T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4}
    _FLOAT_RANK = {T.FloatType(): 1, T.DoubleType(): 2}

    @classmethod
    def _widened(cls, a: T.DataType, b: T.DataType) -> T.DataType | None:
        """The wider of two types if they sit on one safe-promotion
        chain (integral or floating), else None."""
        for rank in (cls._INT_RANK, cls._FLOAT_RANK):
            if a in rank and b in rank:
                return a if rank[a] >= rank[b] else b
        return None

    def evolve_schema(self, incoming: T.StructType) -> T.StructType:
        """Schema evolution at merge time (Iceberg ALTER TABLE analog;
        reference: pydantic extra='allow', userCode/groundwater/
        wells.py:30,269 and the carried-through undeclared field test
        userCode/groundwater/wells_test.py:29-31):

        - ADD: new incoming columns are appended (old files null-fill);
        - WIDEN: Iceberg-safe promotions (int->long, float->double,
          and the byte/short prefixes) adopt the WIDER of the stored
          and incoming type — stored narrow files read back under the
          wide schema natively, and a narrower incoming batch casts up;
        - KEY columns never widen: Spark's Murmur3 hashes int and long
          to DIFFERENT values, so a key-type change would silently
          scatter existing keys across wrong buckets — error instead;
        - anything else (string->int, dropped columns, ...) is not
          evolution — error."""
        current = self.schema()
        key_cols = set(self.snapshot()["key_cols"])
        cur_names = {f.name: f for f in current.fields}
        out = list(current.fields)
        added = []
        changed = False
        for f in incoming.fields:
            if f.name in (LSN_COL, _BUCKET_COL, _ACTION_COL, _DEL_COL, _OP_COL):
                continue
            if f.name in cur_names:
                cur_t = cur_names[f.name].dataType
                if f.dataType == cur_t:
                    continue
                wide = self._widened(cur_t, f.dataType)
                if wide is None:
                    raise ValueError(
                        f"incompatible type change for column {f.name}: "
                        f"{cur_t} -> {f.dataType}"
                    )
                if f.name in key_cols and wide != cur_t:
                    raise ValueError(
                        f"cannot widen key column {f.name} ({cur_t} -> "
                        f"{wide}): the bucket layout hashes the stored "
                        f"type; recreate the table to change key types"
                    )
                if wide != cur_t:
                    out = [
                        T.StructField(f.name, wide, True) if g.name == f.name else g
                        for g in out
                    ]
                    changed = True
            else:
                added.append(T.StructField(f.name, f.dataType, True))
        if not added and not changed:
            return current
        return T.StructType(out + added)

    def merge(
        self,
        updates: DataFrame,
        op_col: str = "op",
        lsn_col: str = "lsn",
        mode: str = "cow",
        passthrough: bool = False,
        passthrough_max_rows: int = 5_000_000,
        resolve_strategy: str = "window",
        _touched_override: list[int] | None = None,
        _operation_label: str = "merge",
        _summary_extra: dict | None = None,
    ) -> MergeResult:
        """Apply a change batch with LWW-by-LSN semantics.

        ``updates`` columns: key cols + ``op`` (insert|update|delete) +
        ``lsn`` (monotonic long) + payload columns. The batch may
        contain multiple events per key (intra-batch duplicates,
        out-of-order); a single ranking window resolves them together
        with the base rows, which is the engine's one shuffle.

        Semantics (north_rule LWW): per key, highest LSN wins; base
        row participates with its stored ``_lsn`` so replayed or
        out-of-order events with lower LSN are no-ops; a winning
        delete removes the row.

        mode="cow" (default): copy-on-write — resolve against the base
        now, rewrite touched buckets. Read-optimized.
        mode="mor": merge-on-read — dedup the batch and append it as
        per-bucket delta files (delete tombstones included); reads and
        compact() resolve. Write-optimized: apply cost is independent
        of table size (the Hudi-MOR / Iceberg-v2-deletes pattern).

        passthrough (cow only, auto-gated, DEFAULT OFF): when the
        touched base dwarfs the batch (steady state), uncontested base
        rows — keys absent from the batch — skip the resolve exchange
        entirely via a broadcast anti-join and a map-side rewrite; only
        contested rows + the batch ride the shuffle. Shuffle bytes drop
        from O(touched base + batch) to O(batch + contested), at the
        cost of scanning the touched base TWICE (semi-join job +
        anti-join job). Measured locally (base 16M / batch 1M, 8
        cores): 7.7s off vs 10.1s on — on single-node NVMe the extra
        parquet decode costs more than the in-memory shuffle it avoids,
        hence the default. Enable on network-bound clusters where
        shuffle write+transfer+read dominates a column-pruned rescan;
        for truly base-size-independent applies use mode="mor".
        Requires a deterministic updates DataFrame (enforced at bucket
        granularity by the stray guard below); passthrough_max_rows
        bounds the broadcast key set.
        """
        spark = updates.sparkSession
        snap = self.snapshot()
        key_cols: list[str] = snap["key_cols"]

        # -- schema evolution (additive) ---------------------------
        payload_fields = T.StructType(
            [f for f in updates.schema.fields if f.name not in (op_col, lsn_col)]
        )
        evolved = self.evolve_schema(payload_fields)

        # -- partition pruning: which buckets does the batch touch? -
        # One cheap pass over the batch (bucket ids only). Skipped when
        # the table is completely empty (no base files AND no deltas) —
        # nothing to prune, save the scan. With deltas present the real
        # touched set matters: only touched buckets' deltas get folded
        # and cleared (selective compaction depends on this).
        # pass the already-parsed snapshot everywhere below: the manifest
        # JSON can carry thousands of file paths, and merge is the hot
        # apply path — don't re-parse it per helper (round-2 advice)
        n_buckets = snap["num_buckets"]
        bexpr = self._bucket_expr(snap)
        upd = updates
        # KEY columns must hash with the STORED key types before any
        # bucket arithmetic: Spark's Murmur3 hashes int and long to
        # different values, so a batch that sends a (safely) narrower
        # key type would otherwise compute a wrong touched-bucket set
        # and abort on the stray guard (review finding). _tag_select
        # casts payload columns later; keys must be cast HERE because
        # the touched scan below runs on the raw batch.
        stored_keys = {
            f.name: f.dataType
            for f in T.StructType.fromJson(json.loads(snap["schema"])).fields
            if f.name in key_cols
        }
        upd_types = {f.name: f.dataType for f in upd.schema.fields}
        for c in key_cols:
            if c in upd_types and upd_types[c] != stored_keys[c]:
                upd = upd.withColumn(c, F.col(c).cast(stored_keys[c]))
        batch_rows: int | None = None
        if _touched_override is not None:
            touched = sorted(_touched_override)
        elif snap["files"] or snap.get("deltas") or snap.get("tombstones"):
            bstats = upd.groupBy(bexpr.alias("b")).count().collect()
            touched = sorted(r["b"] for r in bstats)
            batch_rows = sum(r["count"] for r in bstats)
        else:
            touched = list(range(n_buckets))

        dicts = snap.get("dict_cols") or {}
        tb_family = snap.get("tiebreak_family", "xxhash64")

        def tag_updates(df):
            t1, t2 = self._update_tiebreak(df.columns, evolved, op_col, tb_family)
            return df.select(
                *self._tag_select(df.columns, evolved, dicts),
                F.col(lsn_col).cast("long").alias("__lsn"),
                _op_code(F.col(op_col)).alias("__op"),
                F.lit(1).alias("__src"),
                t1.alias("__tb1"),
                t2.alias("__tb2"),
            )

        upd_tagged = tag_updates(upd)

        # -- merge-on-read fast path --------------------------------
        # Apply cost independent of table size: dedup the batch alone
        # (one shuffle of the BATCH, no base read), append per-bucket
        # delta files with op tombstones; reads/compaction resolve.
        if mode == "mor":
            return self._merge_mor(
                spark, snap, upd_tagged, evolved, dicts, touched, bexpr,
                _summary_extra=_summary_extra,
            )

        # -- empty-table fast path ----------------------------------
        # First load into a fresh table: there is no base side at all,
        # so the resolve degenerates to the batch-only LWW dedup. That
        # formulation matters for performance, not just simplicity:
        # _resolve's min(__src)-over-partition metrics column blocks
        # Spark's WindowGroupLimit rank pushdown, while the pure rank
        # filter of _resolve_batch gets a PARTIAL top-1-per-key below
        # the exchange — intra-batch duplicates collapse map-side
        # before riding the wire (2M events -> ~751k keys on the bench
        # stream). With no base row anywhere, min(__src) == 1 for
        # every key, so __all_chg is the constant 1 and the resolved
        # winners are identical to the window path's.
        if not (snap["files"] or snap.get("deltas") or snap.get("tombstones")):
            winners = self._resolve_batch(
                upd_tagged, key_cols, n_buckets
            ).withColumn("__all_chg", F.lit(1))
            return self._finalize_cow(
                spark, snap, evolved, dicts, winners, touched, bexpr,
                _operation_label=_operation_label,
                _summary_extra=_summary_extra,
            )

        # existing MOR deltas for the touched buckets fold into this
        # copy-on-write merge (they are just more updates); untouched
        # buckets keep their deltas.
        existing_deltas = self._read_deltas(spark, snap, buckets=touched)
        if existing_deltas is not None:
            upd_tagged = upd_tagged.unionByName(
                existing_deltas.select(
                    *self._tag_select(existing_deltas.columns, evolved, dicts),
                    F.col(LSN_COL).alias("__lsn"),
                    _op_code(F.col(_OP_COL)).alias("__op"),
                    F.lit(1).alias("__src"),
                    # limbs persisted at delta-write time (null for
                    # pre-upgrade delta files)
                    F.col(_TB1_COL).alias("__tb1"),
                    F.col(_TB2_COL).alias("__tb2"),
                )
            )

        # -- steady-state pass-through split -------------------------
        # At base >> batch (the 10^10-row steady state) most base rows
        # in touched buckets are UNCONTESTED: no batch event shares
        # their key, so the LWW window cannot change them. Split them
        # out with a broadcast anti-join on the batch's (distinct) keys
        # and write them back map-side — they never ride the resolve
        # exchange. Shuffle bytes become O(batch + contested) instead of
        # O(touched base + batch). Null-safe equality keeps null-keyed
        # rows contested (preserving the window-path semantics).
        # Gated on per-bucket row-count lineage (snapshot "row_counts")
        # so small-base merges keep the cheaper single-path plan, and on
        # batch size so the broadcast stays bounded.
        base = self._read_internal(spark, buckets=touched, _snap=snap)
        row_counts = snap.get("row_counts") or {}
        base_rows_touched = sum(row_counts.get(str(b), 0) for b in touched)
        use_passthrough = bool(
            passthrough
            and existing_deltas is None
            and batch_rows is not None
            and 0 < batch_rows <= passthrough_max_rows
            and base_rows_touched > 2 * batch_rows
        )
        passthru = None
        if use_passthrough:
            # pin ONE evaluation of the batch: if the broadcast key set
            # and the window input came from different evaluations of a
            # non-deterministic source, a key present in the window but
            # absent from the keys would be written BOTH by the anti-join
            # pass-through and by the window — silent duplicate rows
            # (the bucket-granularity stray guard cannot see it). The
            # checkpoint makes key-granularity divergence impossible.
            upd = upd.localCheckpoint(eager=True)
            upd_tagged = tag_updates(upd)
            bkeys = upd.select(
                *[F.col(c).alias(f"__k_{c}") for c in key_cols]
            ).distinct()
            cond = _and_all(
                base[c].eqNullSafe(bkeys[f"__k_{c}"]) for c in key_cols
            )
            contested = base.join(F.broadcast(bkeys), cond, "left_semi")
            passthru = base.join(F.broadcast(bkeys), cond, "left_anti")
            base = contested

        base_tagged = base.select(
            *self._tag_select(base.columns, evolved, dicts),
            F.col(LSN_COL).alias("__lsn"),
            F.lit(_OP_BASE).cast("tinyint").alias("__op"),
            F.lit(0).alias("__src"),
            # base rows carry their winning event's persisted limbs
            F.col(_TB1_COL).alias("__tb1"),
            F.col(_TB2_COL).alias("__tb2"),
        )
        # tombstones of touched buckets re-enter as base-side deletes:
        # a stale lower-LSN event for a deleted key loses to the
        # tombstone instead of resurrecting the row (LWW across the
        # delete horizon). Winning tombstones get re-emitted below.
        # (They stay on the window path even under pass-through: the
        # delete set is small and must compete with batch events.)
        tomb = self._read_tombstones(spark, snap, buckets=touched)
        if tomb is not None:
            base_tagged = base_tagged.unionByName(
                tomb.select(
                    *self._tag_select(tomb.columns, evolved, dicts),
                    F.col(LSN_COL).alias("__lsn"),
                    F.lit(_OP_TOMBSTONE).cast("tinyint").alias("__op"),
                    F.lit(0).alias("__src"),
                    F.col(_TB1_COL).alias("__tb1"),
                    F.col(_TB2_COL).alias("__tb2"),
                )
            )

        # -- THE one shuffle ----------------------------------------
        # repartition(num_buckets, keys) inside _resolve uses Spark's
        # HashPartitioning, bit-identical to _bucket_expr(). The single
        # exchange (a) satisfies the ranking window's required
        # clustering — Catalyst inserts NO second exchange — and
        # (b) leaves every task holding exactly one storage bucket, so
        # the bucketed write below needs no shuffle either. This is
        # the storage-partitioned-write pattern; the window itself is
        # the W1 LWW operator (userCode/awqms/dag.py:155-187), ordered
        # by lsn desc with base-first tie-break (replayed same-LSN
        # events are no-ops).
        if resolve_strategy == "agg":
            winners = self._resolve_agg(base_tagged, upd_tagged, key_cols)
        else:
            winners = self._resolve(base_tagged, upd_tagged, key_cols, n_buckets)

        return self._finalize_cow(
            spark, snap, evolved, dicts, winners, touched, bexpr,
            passthru=passthru, use_passthrough=use_passthrough,
            _operation_label=_operation_label,
            _summary_extra=_summary_extra,
        )

    def _finalize_cow(
        self,
        spark: SparkSession,
        snap: dict,
        evolved: T.StructType,
        dicts: dict,
        winners: DataFrame,
        touched: list[int],
        bexpr,
        passthru: DataFrame | None = None,
        use_passthrough: bool = False,
        _operation_label: str = "merge",
        _summary_extra: dict | None = None,
    ) -> MergeResult:
        """Shared copy-on-write tail: winners (columns = payload [dict-
        encoded per ``dicts``] + __lsn/__tb1/__tb2/__op/__all_chg[/__src])
        -> action classification -> single-pass bucketed write ->
        metrics scan -> snapshot commit. Used by merge() (window/agg
        resolve) and merge_prebucketed() (join resolve)."""
        key_cols: list[str] = snap["key_cols"]
        n_buckets = snap["num_buckets"]
        # -- single-pass write + metrics ----------------------------
        # ONE Spark job writes everything: surviving rows land in
        # _del=false; winning deletes AND carried tombstones land in
        # _del=true files that the snapshot references as tombstones
        # (retained so later stale events cannot resurrect the key).
        # Each row carries its merge _action; metrics RIDE the write
        # job via observe() (CollectMetrics accumulators) instead of a
        # second column-pruned scan of the written files — the re-read
        # job cost a measured 0.56s per apply at the 751k-row bench
        # table, pure overhead on every COW merge. (Iceberg analog:
        # MERGE commit metrics + equality-delete files.)
        action = (
            F.when(F.col("__op") == _OP_TOMBSTONE, F.lit("noop"))  # carried
            .when(F.col("__src") == 0, F.lit("noop"))  # base won
            .when(
                (F.col("__op") == _OP_DELETE) & (F.col("__all_chg") == 0),
                F.lit("delete"),
            )
            .when(F.col("__op") == _OP_DELETE, F.lit("dropped"))
            .when(F.col("__all_chg") == 0, F.lit("update"))
            .otherwise(F.lit("insert"))
        )
        out = winners.select(
            *self._payload_out(evolved, dicts),
            F.col("__lsn").alias(LSN_COL),
            # the winner's limbs persist into base/tombstone files so the
            # NEXT merge can order an exact-LSN rematch deterministically
            F.col("__tb1").alias(_TB1_COL),
            F.col("__tb2").alias(_TB2_COL),
            action.alias(_ACTION_COL),
            bexpr.alias(_BUCKET_COL),
            F.col("__op").isin(_OP_DELETE, _OP_TOMBSTONE).alias(_DEL_COL),
        )
        from pyspark.sql import Observation

        _ACTS = ("insert", "update", "delete", "noop", "dropped")
        ob = Observation()
        out = out.observe(
            ob,
            *[
                F.count(F.when(F.col(_ACTION_COL) == a, 1)).alias(a)
                for a in _ACTS
            ],
        )
        out_dir = os.path.join(self.data_dir, f"w-{uuid.uuid4().hex}")
        # rows are already clustered one-bucket-per-task by the
        # repartition above — no shuffle in this write
        out.write.partitionBy(_BUCKET_COL, _DEL_COL).mode("overwrite").parquet(out_dir)

        new_files: dict[str, list[str]] = {}
        new_tombs: dict[str, list[str]] = {}
        all_files: list[str] = []

        def collect_written(d: str) -> None:
            for entry in os.listdir(d):
                if not entry.startswith(f"{_BUCKET_COL}="):
                    continue
                b = entry.split("=")[1]
                for sub in os.listdir(os.path.join(d, entry)):
                    subdir = os.path.join(d, entry, sub)
                    flist = [
                        os.path.join(subdir, f)
                        for f in os.listdir(subdir)
                        if f.endswith(".parquet")
                    ]
                    all_files.extend(flist)
                    if sub == f"{_DEL_COL}=false":
                        new_files[b] = sorted(new_files.get(b, []) + flist)
                    else:
                        new_tombs[b] = sorted(new_tombs.get(b, []) + flist)

        collect_written(out_dir)
        if passthru is not None:
            # map-side write: parquet scan -> broadcast anti-join ->
            # partitionBy — NO exchange (each base file is single-bucket,
            # so tasks write at most a few partition dirs). Uncontested
            # rows keep their stored (possibly narrower) schema; reads
            # null-fill evolved columns.
            pout = passthru.select(
                "*",
                F.lit("noop").alias(_ACTION_COL),
                bexpr.alias(_BUCKET_COL),
                F.lit(False).alias(_DEL_COL),
            )
            ob_pass = Observation()
            pout = pout.observe(ob_pass, F.count(F.lit(1)).alias("noop"))
            pass_dir = os.path.join(self.data_dir, f"p-{uuid.uuid4().hex}")
            pout.write.partitionBy(_BUCKET_COL, _DEL_COL).mode("overwrite").parquet(
                pass_dir
            )
            collect_written(pass_dir)
        # -- non-deterministic-source guard --------------------------
        # `updates` is evaluated multiple times (touched-bucket scan,
        # pass-through key set, resolve/write). A non-deterministic
        # source whose later evaluation buckets outside `touched` would
        # replace those buckets with ONLY the new rows, silently
        # dropping their unread base rows. Abort BEFORE commit instead:
        # no snapshot is written, the orphan write dir is vacuum-safe
        # (age-gated), and the caller is told to checkpoint the batch.
        stray = {
            int(b) for b in (set(new_files) | set(new_tombs))
        } - set(touched)
        if stray:
            raise RuntimeError(
                f"merge batch wrote buckets {sorted(stray)} outside the "
                f"touched set collected from its first evaluation — the "
                f"updates DataFrame is non-deterministic; persist() or "
                f"localCheckpoint() it before merge()"
            )
        part_counts = {int(b): len(fl) for b, fl in new_files.items()}
        counts = {}
        if all_files:
            # the write job already ran (files exist), so the observed
            # metrics are final; guard on all_files keeps the empty-
            # write case identical to the old read-back behavior
            counts = {k: v for k, v in ob.get.items() if v}
            if passthru is not None:
                pn = ob_pass.get.get("noop", 0)
                if pn:
                    counts["noop"] = counts.get("noop", 0) + pn

        # carry untouched buckets forward (copy-on-write pruning);
        # deltas and tombstones of touched buckets were folded in and
        # re-emitted, so replace them with the fresh files
        files = dict(snap["files"])
        deltas = dict(snap.get("deltas", {}))
        tombstones = dict(snap.get("tombstones", {}))
        row_counts = dict(snap.get("row_counts", {}))
        for b in touched:
            files.pop(str(b), None)
            deltas.pop(str(b), None)
            tombstones.pop(str(b), None)
            row_counts.pop(str(b), None)
        for b, flist in new_files.items():
            files[b] = flist
        # per-bucket row lineage from parquet footers (no data scan,
        # threaded opens); powers the pass-through gate + metrics
        row_counts.update(_rows_per_bucket(new_files))
        for b, flist in new_tombs.items():
            tombstones[b] = flist

        new_version = snap["version"] + 1
        result = MergeResult(
            version=new_version,
            rows_inserted=counts.get("insert", 0),
            rows_updated=counts.get("update", 0),
            rows_deleted=counts.get("delete", 0),
            rows_noop=counts.get("noop", 0),
            rows_dropped=counts.get("dropped", 0),
            touched_buckets=touched,
            partition_counts=part_counts,
            passthrough=use_passthrough,
        )
        self._commit(
            {
                "version": new_version,
                "parent": snap["version"],
                "schema": json.dumps(evolved.jsonValue()),
                "key_cols": key_cols,
                "num_buckets": n_buckets,
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": files,
                "deltas": deltas,
                "tombstones": tombstones,
                "row_counts": row_counts,
                "summary": {"operation": _operation_label, **result.as_dict(),
                            **(_summary_extra or {})},
            }
        )
        return result

    # ---------------------------------------- zero-exchange machinery
    @staticmethod
    def _zx_cand(df, src, lsn_expr, op_expr, t1, t2,
                 key_cols: list[str], nonkey: list,
                 extra: tuple = ()) -> DataFrame:
        """One side's per-key candidate struct: rank fields FIRST so a
        single greatest() applies the exact _resolve total order —
        (lsn, tb1, tb2, -src); struct comparison treats null fields as
        smallest, matching desc_nulls_last. ``src`` is an int for a
        homogeneous side or a Column of per-row src values (the
        delta-folding base side mixes src=0 b/t rows with src=1 delta
        rows); ``extra`` columns ride OUTSIDE the struct (they carry
        side metadata like __had_bt that must not perturb the
        greatest() comparison)."""
        ns = (F.lit(-src) if isinstance(src, int) else -src)
        return df.select(
            *[F.col(c) for c in key_cols],
            F.struct(
                lsn_expr.cast("long").alias("l"),
                t1.cast("long").alias("t1"),
                t2.cast("long").alias("t2"),
                ns.cast("int").alias("ns"),
                op_expr.cast("tinyint").alias("op"),
                *[
                    (
                        F.col(f.name).cast(f.dataType)
                        if f.name in df.columns
                        else F.lit(None).cast(f.dataType)
                    ).alias(f"p_{f.name}")
                    for f in nonkey
                ],
            ).alias("__cand"),
            *extra,
        )

    def _zx_base_tomb_side(
        self, spark, snap: dict, touched: list[int], reg_root: str,
        tables: list[str], key_cols: list[str], nonkey: list,
    ) -> DataFrame | None:
        """Base rows, tombstones AND pending MOR delta files registered
        as ONE bucketed table partitioned by a side= directory column —
        a second full-outer join would coalesce the first join's key
        columns, hiding their partitioning from Catalyst and forcing an
        exchange (measured, then fixed with this single-table design).
        Stored schema derives from the PINNED snap (no CURRENT re-read
        racing a concurrent commit); evolved columns the files lack
        null-fill through _zx_cand's missing-column arm. Returns the
        candidate-struct side, or None for an empty table.

        Delta folding (side=d): touched buckets' merge-on-read deltas
        are just more already-committed updates, so they fold into this
        copy-on-write merge exactly as merge() folds them — but with
        ZERO exchange: deltas were written one-bucket-per-file, so they
        register into the same bucketed table. Base/tomb keys are
        disjoint but deltas overlap both and repeat per key, so the
        combined side is pre-deduped to one row per key by a window
        whose clustering the bucketed scan already satisfies, ordered
        by the exact _resolve total order (lsn desc, limbs
        desc_nulls_last, src asc — base beats batch on a full tie).
        __had_bt preserves merge()'s __all_chg semantics (min(__src)
        over b/t rows only): a delta-only key still counts as
        all-changed, keeping insert-vs-update / delete-vs-dropped
        metrics identical to the window path."""
        from . import bucketed as B

        stored = T.StructType(
            list(T.StructType.fromJson(json.loads(snap["schema"])).fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        base_files = {
            b: fl for b, fl in snap["files"].items() if int(b) in touched
        }
        tomb_files = {
            b: fl
            for b, fl in snap.get("tombstones", {}).items()
            if int(b) in touched
        }
        delta_files = {
            b: fl
            for b, fl in snap.get("deltas", {}).items()
            if int(b) in touched
        }
        if not base_files and not tomb_files and not delta_files:
            return None
        bt_dir = os.path.join(reg_root, "basetomb")
        if base_files:
            B.link_files_bucketed(base_files, os.path.join(bt_dir, "side=b"))
        if tomb_files:
            B.link_files_bucketed(tomb_files, os.path.join(bt_dir, "side=t"))
        if delta_files:
            B.link_files_bucketed(delta_files, os.path.join(bt_dir, "side=d"))
        part_schema = T.StructType(
            list(stored.fields)
            + [
                # delta files carry an op column; base/tomb files lack
                # it and null-fill (parquet by-name resolution)
                T.StructField(_OP_COL, T.StringType(), True),
                T.StructField("side", T.StringType()),
            ]
        )
        bt_name = B.register_bucketed_table(
            spark, part_schema, bt_dir, key_cols, snap["num_buckets"],
            partition_col="side",
        )
        tables.append(bt_name)
        spark.sql(f"ALTER TABLE `{bt_name}` RECOVER PARTITIONS")
        bt = spark.table(bt_name)
        op_expr = (
            F.when(F.col("side") == "t", F.lit(_OP_TOMBSTONE))
            .when(F.col("side") == "d", _op_code(F.col(_OP_COL)))
            .otherwise(F.lit(_OP_BASE))
        )
        if not delta_files:
            return self._zx_cand(
                bt, 0, F.col(LSN_COL), op_expr,
                F.col(_TB1_COL), F.col(_TB2_COL), key_cols, nonkey,
                extra=(F.lit(True).alias("__had_bt"),),
            ).withColumnRenamed("__cand", "__cand_b")
        src = F.when(F.col("side") == "d", F.lit(1)).otherwise(F.lit(0))
        kh = F.xxhash64(*[F.col(c) for c in key_cols])
        pb = [kh, *[F.col(c) for c in key_cols]]
        w = Window.partitionBy(*pb).orderBy(
            F.desc(LSN_COL),
            F.col(_TB1_COL).desc_nulls_last(),
            F.col(_TB2_COL).desc_nulls_last(),
            src.asc(),
        )
        # share the rank's partition+order spec with an unbounded frame
        # so both functions collapse into ONE Window operator (the max
        # is order-independent; same trick as _resolve)
        wfull = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        bt1 = (
            bt.select(
                "*",
                F.row_number().over(w).alias("__rn"),
                F.max(F.col("side") != "d").over(wfull).alias("__had_bt"),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return self._zx_cand(
            bt1, src, F.col(LSN_COL), op_expr,
            F.col(_TB1_COL), F.col(_TB2_COL), key_cols, nonkey,
            extra=(F.col("__had_bt"),),
        ).withColumnRenamed("__cand", "__cand_b")

    @staticmethod
    def _zx_winners(upd_side: DataFrame | None, base_side: DataFrame | None,
                    key_cols: list[str], nonkey: list) -> DataFrame:
        """Full-outer SHUFFLE_HASH join + greatest-of-candidates. With
        both scans reporting the same HashPartitioning the planner uses
        a no-shuffle ShuffledHashJoin — unlike sort-merge it needs NO
        per-task sorts either (measured 10.2s SMJ -> 7.5s SHJ on the
        32M steady-state regime); build memory is one bucket's deduped
        update slice. Output columns match the window resolve's
        contract: payload + __lsn/__tb1/__tb2/__op/__src/__all_chg.

        upd_side=None is the delta-FOLD degenerate case (zero-exchange
        compaction): no update batch at all, the base/tomb/delta side's
        per-key winner — already resolved by _zx_base_tomb_side's
        no-exchange dedup window — passes straight through, no join."""
        if upd_side is None:
            assert base_side is not None
            winner = F.col("__cand_b")
            base_side_present = (
                F.col("__had_bt").eqNullSafe(F.lit(True))
                if "__had_bt" in base_side.columns
                else F.lit(True)
            )
            return base_side.select(
                *[F.col(c) for c in key_cols],
                *[winner[f"p_{f.name}"].alias(f.name) for f in nonkey],
                winner["l"].alias("__lsn"),
                winner["t1"].alias("__tb1"),
                winner["t2"].alias("__tb2"),
                winner["op"].alias("__op"),
                F.when(winner["ns"] == 0, 0).otherwise(1).alias("__src"),
                F.when(base_side_present, 0).otherwise(1).alias("__all_chg"),
            )
        if base_side is not None:
            joined = upd_side.hint("SHUFFLE_HASH").join(
                base_side, on=key_cols, how="full_outer"
            )
            winner = F.greatest("__cand_u", "__cand_b")
            # __had_bt (nullable through the outer join) distinguishes a
            # real base/tombstone row from a folded delta-only key, so
            # __all_chg matches merge()'s min(__src)-over-b/t semantics
            base_side_present = (
                F.col("__had_bt").eqNullSafe(F.lit(True))
                if "__had_bt" in base_side.columns
                else F.col("__cand_b").isNotNull()
            )
        else:
            joined = upd_side
            winner = F.col("__cand_u")
            base_side_present = F.lit(False)
        return joined.select(
            *[F.col(c) for c in key_cols],
            *[winner[f"p_{f.name}"].alias(f.name) for f in nonkey],
            winner["l"].alias("__lsn"),
            winner["t1"].alias("__tb1"),
            winner["t2"].alias("__tb2"),
            winner["op"].alias("__op"),
            F.when(winner["ns"] == 0, 0).otherwise(1).alias("__src"),
            F.when(base_side_present, 0).otherwise(1).alias("__all_chg"),
        )

    # ------------------------------------------- zero-exchange merge
    def merge_prebucketed(
        self,
        spark: SparkSession,
        source_path: str,
        op_col: str = "op",
        lsn_col: str = "lsn",
        lsn_range: tuple[int, int] | None = None,
        validate_layout: bool = False,
        _plan_out: list | None = None,
    ) -> MergeResult:
        """Copy-on-write merge of a PRE-BUCKETED change log with ZERO
        exchanges (DESIGN.md §9's top structural lever; reference
        analog: the shuffle-free per-station partition crawl,
        userCode/wrd/dag.py:68,386-394).

        ``source_path`` must hold a Spark-native bucketed layout
        (``lake.bucketed.write_bucketed_wal``): bucketed by this
        table's key columns into this table's num_buckets with Spark's
        own bucket function — which is bit-identical to the engine's
        ``_bucket_expr``. Both the WAL and the table's own per-bucket
        snapshot files (hardlinked under bucket-suffix names) are then
        registered as catalog bucketed tables, whose scans REPORT
        HashPartitioning(key_cols, n). The whole resolve — batch LWW
        dedup window, full-outer join against base and tombstones —
        therefore satisfies every required distribution from storage:
        no Exchange anywhere in the plan (pinned by tests/test_plans).
        Per-task sorts remain (sort-merge join); sorts are local.

        Semantics are IDENTICAL to merge(): the join compares the same
        (lsn, tb1 desc-nulls-last, tb2, base-first) total order via a
        single greatest() over per-side candidate structs, and the
        winner feeds the same _finalize_cow tail (action metrics,
        bucketed write, snapshot commit).

        Restriction: key column types in the WAL must EXACTLY match
        the stored key types (the bucket layout hashed them; a cast
        cannot fix file placement).

        Pending MOR deltas fold in with the same contract as merge():
        touched buckets' deltas are absorbed (they were written
        one-bucket-per-file, so they register into the same bucketed
        base/tomb table and pre-dedup with a no-exchange window — see
        _zx_base_tomb_side); untouched buckets keep their deltas. A
        mixed MOR-then-COW loop therefore needs no compact() before
        the zero-exchange merge.

        validate_layout=True runs one column-pruned pass checking every
        row's engine bucket equals its file-name bucket — use in tests
        or after ingesting a foreign WAL; off by default (O(batch)).

        lsn_range=(lo, hi) applies the runner's window predicate inside
        the bucketed scan (filters do not disturb the reported
        partitioning)."""
        import shutil

        from . import bucketed as B

        snap = self.snapshot()
        key_cols: list[str] = snap["key_cols"]
        n_buckets = snap["num_buckets"]
        tb_family = snap.get("tiebreak_family", "xxhash64")
        wal_files = B.collect_wal_files(source_path)
        touched = sorted(int(b) for b in wal_files)
        if not touched:
            return MergeResult(version=snap["version"])
        if touched[-1] >= n_buckets:
            raise ValueError(
                f"WAL bucket id {touched[-1]} >= table num_buckets "
                f"{n_buckets}: the log was bucketed with a different spec"
            )
        wal_schema = spark.read.parquet(
            *[f for fl in wal_files.values() for f in fl]
        ).schema
        stored_fields = {
            f.name: f.dataType
            for f in T.StructType.fromJson(json.loads(snap["schema"])).fields
        }
        wal_fields = {f.name: f.dataType for f in wal_schema.fields}
        for c in key_cols:
            if c not in wal_fields:
                raise ValueError(f"WAL is missing key column {c}")
            if wal_fields[c] != stored_fields[c]:
                raise ValueError(
                    f"WAL key column {c} is {wal_fields[c]}, table stores "
                    f"{stored_fields[c]}: bucket layouts hash the exact "
                    f"type — rewrite the WAL with the stored key types"
                )
        evolved = self.evolve_schema(
            T.StructType(
                [f for f in wal_schema.fields if f.name not in (op_col, lsn_col)]
            )
        )
        bexpr = self._bucket_expr(snap)
        reg_root = os.path.join(self.path, "_bucketed", f"reg-{uuid.uuid4().hex}")
        tables: list[str] = []
        try:
            # normalize ANY WAL layout (flat, batch-subdirs, pruned
            # link dirs) into one flat hardlink dir for registration —
            # catalog bucketed tables do not walk non-partition subdirs
            wal_dir = os.path.join(reg_root, "wal")
            B.link_files_bucketed(wal_files, wal_dir)
            wal_name = B.register_bucketed_table(
                spark, wal_schema, wal_dir, key_cols, n_buckets
            )
            tables.append(wal_name)
            upd = spark.table(wal_name)
            if lsn_range is not None:
                upd = upd.filter(
                    (F.col(lsn_col) >= lsn_range[0])
                    & (F.col(lsn_col) <= lsn_range[1])
                )
            if validate_layout:
                fb = F.regexp_extract(F.input_file_name(), r"_(\d+)\.", 1).cast("int")
                bad = (
                    spark.table(wal_name)
                    .select(*[F.col(c) for c in key_cols], fb.alias("__fb"))
                    .filter(bexpr != F.col("__fb"))
                    .limit(1)
                    .count()
                )
                if bad:
                    raise ValueError(
                        "WAL layout invalid: a row's engine bucket differs "
                        "from its file-name bucket (wrong keys or bucket "
                        "count at write time)"
                    )

            nonkey = [f for f in evolved.fields if f.name not in key_cols]

            # batch side: LWW dedup window over the bucketed scan (no
            # exchange — HashPartitioning(keys) satisfies the window's
            # clustering; the xxhash64 radix prefix rides a projection)
            t1, t2 = self._update_tiebreak(upd.columns, evolved, op_col, tb_family)
            kh = F.xxhash64(*[F.col(c) for c in key_cols])
            w = Window.partitionBy(kh, *[F.col(c) for c in key_cols]).orderBy(
                F.desc(lsn_col), t1.desc_nulls_last(), t2.desc_nulls_last()
            )
            upd1 = (
                upd.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            upd_side = self._zx_cand(
                upd1, 1, F.col(lsn_col), _op_code(F.col(op_col)), t1, t2,
                key_cols, nonkey,
            ).withColumnRenamed("__cand", "__cand_u")

            base_side = self._zx_base_tomb_side(
                spark, snap, touched, reg_root, tables, key_cols, nonkey
            )
            winners = self._zx_winners(upd_side, base_side, key_cols, nonkey)
            if _plan_out is not None:
                _plan_out.append(
                    winners._jdf.queryExecution().executedPlan().toString()
                )
            return self._finalize_cow(
                spark, snap, evolved, {}, winners, touched, bexpr,
                _operation_label="merge-prebucketed",
            )
        finally:
            for name in tables:
                try:
                    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
                except Exception:
                    pass
            shutil.rmtree(reg_root, ignore_errors=True)

    def _fold_deltas_zx(
        self, spark: SparkSession, touched: list[int],
        _plan_out: list | None = None,
    ) -> MergeResult:
        """Zero-exchange delta fold — compaction's MOR-fold step without
        the merge shuffle. The touched buckets' base, tombstone and
        delta files register as ONE catalog bucketed table
        (_zx_base_tomb_side); its no-exchange dedup window resolves the
        per-key winner; winners pass straight through (no update side,
        no join — _zx_winners(None, ...)) into the shared _finalize_cow
        tail. Measured motivation: at a 27.5M-row base / local[8], the
        window-resolve fold inside compact() shuffled ~3 GB per pass
        and dominated the MOR runner loop (BENCH.md §6b: 48-88s of each
        compaction cycle); this path does the same state transition
        with KB-level shuffle. Semantics identical to
        merge(empty, _touched_override=touched): same candidate
        encoding, same total order, same action metrics."""
        import shutil

        snap = self.snapshot()
        key_cols: list[str] = snap["key_cols"]
        evolved = T.StructType.fromJson(json.loads(snap["schema"]))
        bexpr = self._bucket_expr(snap)
        reg_root = os.path.join(self.path, "_bucketed", f"reg-{uuid.uuid4().hex}")
        tables: list[str] = []
        try:
            nonkey = [f for f in evolved.fields if f.name not in key_cols]
            base_side = self._zx_base_tomb_side(
                spark, snap, touched, reg_root, tables, key_cols, nonkey
            )
            if base_side is None:
                return MergeResult(version=snap["version"])
            winners = self._zx_winners(None, base_side, key_cols, nonkey)
            if _plan_out is not None:
                _plan_out.append(
                    winners._jdf.queryExecution().executedPlan().toString()
                )
            return self._finalize_cow(
                spark, snap, evolved, {}, winners, touched, bexpr,
                _operation_label="compact-fold",
            )
        finally:
            for name in tables:
                try:
                    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
                except Exception:
                    pass
            shutil.rmtree(reg_root, ignore_errors=True)

    def _merge_mor(self, spark, snap, upd_tagged, evolved, dicts, touched, bexpr,
                   _summary_extra: dict | None = None) -> MergeResult:
        """Append path: within-batch LWW dedup, then per-bucket delta
        files carrying (_lsn, _op). No base read, no base rewrite."""
        key_cols = snap["key_cols"]
        n_buckets = snap["num_buckets"]
        winners = self._resolve_batch(upd_tagged, key_cols, n_buckets)
        out = winners.select(
            *self._payload_out(evolved, dicts),
            F.col("__lsn").alias(LSN_COL),
            # delta files keep the public string op (normalized)
            _op_decode(F.col("__op")).alias(_OP_COL),
            # persist the tie-break limbs so the read-path resolve can
            # totally order cross-batch equal-LSN events WITHOUT hashing
            # payload (which would defeat read-side column pruning)
            F.col("__tb1").alias(_TB1_COL),
            F.col("__tb2").alias(_TB2_COL),
            bexpr.alias(_BUCKET_COL),
        )
        out_dir = os.path.join(self.data_dir, f"d-{uuid.uuid4().hex}")
        out.write.partitionBy(_BUCKET_COL).mode("overwrite").parquet(out_dir)

        new_delta: dict[str, list[str]] = {}
        total = 0
        for entry in os.listdir(out_dir):
            if not entry.startswith(f"{_BUCKET_COL}="):
                continue
            b = entry.split("=")[1]
            bdir = os.path.join(out_dir, entry)
            new_delta[b] = [
                os.path.join(bdir, f) for f in os.listdir(bdir) if f.endswith(".parquet")
            ]
        if new_delta:
            # footer row counts, not a Spark count() job: the old full
            # re-read of every just-written delta file was pure metrics
            # overhead on the hot MOR apply path (round-3 bench finding)
            total = sum(_rows_per_bucket(new_delta).values())

        deltas = dict(snap.get("deltas", {}))
        for b, fl in new_delta.items():
            deltas[b] = deltas.get(b, []) + fl
        new_version = snap["version"] + 1
        result = MergeResult(
            version=new_version,
            rows_delta=total,
            touched_buckets=sorted(int(b) for b in new_delta),
            partition_counts={int(b): len(fl) for b, fl in new_delta.items()},
        )
        self._commit(
            {
                "version": new_version,
                "parent": snap["version"],
                "schema": json.dumps(evolved.jsonValue()),
                "key_cols": key_cols,
                "num_buckets": n_buckets,
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": dict(snap["files"]),
                "deltas": deltas,
                "tombstones": dict(snap.get("tombstones", {})),
                # deltas are not base rows: base row lineage carries as-is
                "row_counts": dict(snap.get("row_counts", {})),
                "summary": {"operation": "merge-mor", **result.as_dict(),
                            **(_summary_extra or {})},
            }
        )
        return result

    def stats(self) -> dict:
        """Metadata-only table statistics (north_rule: per-partition
        lineage + row counts) — no Spark job: everything comes from the
        snapshot's manifest-style bookkeeping."""
        snap = self.snapshot()
        rc = {int(b): n for b, n in (snap.get("row_counts") or {}).items()}
        return {
            "version": snap["version"],
            "num_buckets": snap["num_buckets"],
            "rows_base": sum(rc.values()),
            "rows_per_bucket": rc,
            "base_files": sum(len(fl) for fl in snap["files"].values()),
            "delta_files": sum(len(fl) for fl in snap.get("deltas", {}).values()),
            "tombstone_files": sum(
                len(fl) for fl in snap.get("tombstones", {}).values()
            ),
            "dict_cols": snap.get("dict_cols", {}),
            "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
            "operation": snap.get("summary", {}).get("operation"),
        }

    # ---------------------------------------------------- maintenance
    def rollback(self, version: int) -> int:
        """Roll the table back to an earlier snapshot by COMMITTING a new
        snapshot that references the old version's files (Iceberg
        rollback_to_snapshot: history moves forward, data pointers move
        back). Fails loudly if any referenced file has already been
        vacuumed. Time travel to the rolled-back-over versions keeps
        working until they expire."""
        cur = self.snapshot()
        if not 0 <= version <= cur["version"]:
            raise ValueError(
                f"cannot roll back to version {version}: table history is "
                f"0..{cur['version']} (version never existed)"
            )
        try:
            target = self.snapshot(version)
        except FileNotFoundError as e:
            raise ValueError(
                f"cannot roll back to version {version}: its snapshot manifest "
                f"was vacuumed (expired by keep_last)"
            ) from e
        missing = [f for f in self._snap_files(target) if not os.path.exists(f)]
        if missing:
            raise ValueError(
                f"cannot roll back to version {version}: {len(missing)} data "
                f"files already vacuumed (first: {missing[0]})"
            )
        new_version = cur["version"] + 1
        self._commit(
            {
                "version": new_version,
                "parent": cur["version"],
                "schema": target["schema"],
                "key_cols": target["key_cols"],
                "num_buckets": target["num_buckets"],
                "dict_cols": target.get("dict_cols", {}),
                "tiebreak_family": target.get("tiebreak_family", "xxhash64"),
                "commit_mode": cur.get("commit_mode", "pointer"),
                "files": dict(target["files"]),
                "deltas": dict(target.get("deltas", {})),
                "tombstones": dict(target.get("tombstones", {})),
                "row_counts": dict(target.get("row_counts", {})),
                "summary": {"operation": "rollback", "to_version": version},
            }
        )
        # check-then-commit race: a vacuum that started BEFORE this commit
        # may delete the target's files (they looked expired to it). Once
        # committed they are head-referenced and safe from NEW vacuums;
        # re-verify and fail LOUDLY if the window was hit so the operator
        # restores/rolls forward instead of discovering broken reads later.
        # (Run vacuum and rollback from one maintenance process to avoid
        # the race entirely.)
        missing = [f for f in self._snap_files(target) if not os.path.exists(f)]
        if missing:
            raise RuntimeError(
                f"rollback committed version {new_version} but a concurrent "
                f"vacuum removed {len(missing)} of its data files (first: "
                f"{missing[0]}); roll forward to version {cur['version']} "
                f"(rollback({cur['version']})) or restore the files"
            )
        return new_version

    def compact(
        self,
        spark: SparkSession,
        target_files_per_bucket: int = 1,
        min_delta_files: int = 1,
        fold_strategy: str = "zx",
        cluster_by: list[str] | None = None,
        cluster_bits: int = 16,
        row_group_bytes: int | None = None,
    ) -> int:
        """Bin-pack small files: rewrite every bucket that has more
        than target_files_per_bucket files into fewer, larger files.
        Incremental merges accrete one file per (batch, bucket); at
        10^10-event scale compaction bounds read amplification the
        same way Iceberg's rewrite_data_files does. Metadata-only for
        already-compact buckets (their file refs carry forward).

        Merge-on-read deltas are folded into the base first (the MOR
        compaction step): replaying the delta rows through the cow
        merge resolves LWW + tombstones and clears the delta list.
        min_delta_files selects WHICH buckets fold: only those carrying
        at least that many delta files (at 10^10 scale you fold the
        read-amplified tail, not the whole table).

        fold_strategy='zx' (default) folds deltas through the
        zero-exchange resolve (_fold_deltas_zx — KB-level shuffle
        instead of re-shuffling the touched base; see DESIGN.md §13);
        'window' keeps the original one-exchange merge fold.

        cluster_by: Z-ORDER the rewrite (Delta OPTIMIZE ZORDER analog).
        Every bucket is rewritten (re-clustering is the point, so the
        already-compact skip does not apply) with rows ordered by the
        Morton interleave of the named numeric columns
        (functions.scalar.zorder_key; min/max come from one small agg
        over the rewritten rows). Row-group min/max stats then stay
        tight on EVERY clustered column, so range filters on any of
        them skip row groups — where the default key-sort only serves
        key lookups. The resolved row SET is unchanged either way.
        row_group_bytes caps parquet row-group size (finer stats
        granularity; also the knob the clustering tests pin)."""
        if fold_strategy not in ("zx", "window"):
            raise ValueError(f"unknown fold_strategy {fold_strategy!r}")
        snap = self.snapshot()
        fold_buckets = [
            int(b) for b, fl in snap.get("deltas", {}).items()
            if len(fl) >= min_delta_files
        ]
        if fold_buckets and fold_strategy == "zx":
            self._fold_deltas_zx(spark, fold_buckets)
            snap = self.snapshot()
        elif fold_buckets:
            # an empty updates batch + explicit touched set: merge's own
            # existing-deltas fold does the work, so delta files are read
            # once, not twice
            schema = T.StructType.fromJson(json.loads(snap["schema"]))
            empty = spark.createDataFrame(
                [],
                T.StructType(
                    list(schema.fields)
                    + [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("op", T.StringType()),
                    ]
                ),
            )
            # the fold rewrites storage but not the RESOLVED row set, so
            # it is labeled as file churn: logical-staleness consumers
            # (AnnIndex.stale) must not treat a delta-folding compact as
            # a data change (review finding — it previously read as
            # operation="merge" and forced spurious index rebuilds)
            self.merge(
                empty, mode="cow", _touched_override=fold_buckets,
                _operation_label="compact-fold",
            )
            snap = self.snapshot()
        to_rewrite = {
            b: fl for b, fl in snap["files"].items()
            if cluster_by is not None or len(fl) > target_files_per_bucket
        }
        if not to_rewrite:
            return snap["version"]
        stored = self._stored_schema()
        all_small = [f for fl in to_rewrite.values() for f in fl]
        df = spark.read.schema(stored).parquet(*all_small)
        out = df.withColumn(_BUCKET_COL, self._bucket_expr(snap))
        sort_expr = None
        if cluster_by is not None:
            from ..functions.scalar import zorder_key

            schema = T.StructType.fromJson(json.loads(snap["schema"]))
            known = {f.name for f in schema.fields}
            unknown = set(cluster_by) - known
            if unknown:
                raise ValueError(f"unknown cluster_by columns: {sorted(unknown)}")
            # one tiny agg job for the normalization ranges
            aggs = []
            for c in cluster_by:
                aggs.append(F.min(F.col(c).cast("long")).alias(f"mn_{c}"))
                aggs.append(F.max(F.col(c).cast("long")).alias(f"mx_{c}"))
            r = df.agg(*aggs).collect()[0]
            mins = [r[f"mn_{c}"] if r[f"mn_{c}"] is not None else 0
                    for c in cluster_by]
            maxs = [r[f"mx_{c}"] if r[f"mx_{c}"] is not None else 0
                    for c in cluster_by]
            sort_expr = zorder_key(cluster_by, mins, maxs, bits=cluster_bits)
        # one task per bucket: coalesce within the bucket, no global
        # shuffle; key-sorted (or z-ordered) rows give tight row-group
        # stats for skip-scans
        new_files = self._write_buckets(
            out, sort_within=True, _snap=snap,
            sort_expr=sort_expr, row_group_bytes=row_group_bytes,
        )
        files = dict(snap["files"])
        for b in to_rewrite:
            files.pop(b, None)
        for b, fl in new_files.items():
            files[b] = fl
        # bin-pack preserves rows per bucket, but buckets whose lineage
        # was never recorded (e.g. written before row_counts existed)
        # get it backfilled here from the fresh files' parquet footers
        row_counts = dict(snap.get("row_counts", {}))
        row_counts.update(_rows_per_bucket(new_files))
        new_version = snap["version"] + 1
        self._commit(
            {
                "version": new_version,
                "parent": snap["version"],
                "schema": snap["schema"],
                "key_cols": snap["key_cols"],
                "num_buckets": snap["num_buckets"],
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": files,
                # unfolded deltas MUST carry forward — omitting this key
                # silently dropped them from the snapshot (review find)
                "deltas": dict(snap.get("deltas", {})),
                "tombstones": dict(snap.get("tombstones", {})),
                "row_counts": row_counts,
                "summary": {
                    "operation": "compact",
                    "rewritten_buckets": sorted(int(b) for b in to_rewrite),
                    "files_before": len(all_small),
                    "files_after": sum(len(fl) for fl in new_files.values()),
                    **(
                        {"clustered_by": list(cluster_by)}
                        if cluster_by is not None
                        else {}
                    ),
                },
            }
        )
        return new_version

    @staticmethod
    def _snap_files(snap: dict) -> set[str]:
        out: set[str] = set()
        for fl in snap["files"].values():
            out.update(fl)
        for fl in snap.get("deltas", {}).values():
            out.update(fl)
        for fl in snap.get("tombstones", {}).values():
            out.update(fl)
        return out

    def rebucket(
        self,
        spark: SparkSession,
        new_num_buckets: int,
        sort_within: bool = True,
    ) -> int:
        """Bucket-count evolution (Iceberg partition-spec evolution
        analog for the hash layout): rewrite base, tombstone AND delta
        files into ``new_num_buckets`` and commit a snapshot whose
        layout every subsequent merge / bucketed WAL / zero-exchange
        path uses. The bucket count is otherwise fixed at create —
        at 10^10-row scale the table outgrows it (per-bucket files get
        huge, parallelism caps at num_buckets), so growth must be an
        OPERATION, not a new table.

        The resolved row set is bit-identical before and after: every
        stored artifact (payload, __lsn, tie-break limbs, delta __op)
        is carried verbatim — only file placement changes. Three
        rewrite passes, each ONE key-hash shuffle at the new count;
        sort_within keeps compact()'s tight row-group key clustering.
        Cost model is a full-table rewrite (compact-everything), which
        is why it is maintenance, not steady-state.

        Readers racing the commit keep working: they pinned their
        snapshot version (and its num_buckets) at read start, and old
        files stay on disk until vacuum(). Concurrent WRITERS conflict
        via the ordinary versioned-commit CAS; a pre-rebucket
        bucketed WAL then fails loudly against the new spec (bucket-id
        bound or validate_layout), never silently misplaces rows."""
        snap = self.snapshot()
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        if new_num_buckets == snap["num_buckets"]:
            return snap["version"]
        nsnap = {**snap, "num_buckets": new_num_buckets}
        bexpr = self._bucket_expr(nsnap)
        stored = self._stored_schema()
        delta_schema = T.StructType(
            list(stored.fields) + [T.StructField(_OP_COL, T.StringType(), True)]
        )

        def rewrite(files_map: dict, schema: T.StructType) -> dict[str, list[str]]:
            flist = [f for fl in (files_map or {}).values() for f in fl]
            if not flist:
                return {}
            df = spark.read.schema(schema).parquet(*flist).withColumn(
                _BUCKET_COL, bexpr
            )
            return self._write_buckets(df, sort_within=sort_within, _snap=nsnap)

        new_files = rewrite(snap["files"], stored)
        new_tombs = rewrite(snap.get("tombstones"), stored)
        new_deltas = rewrite(snap.get("deltas"), delta_schema)
        new_version = snap["version"] + 1
        self._commit(
            {
                "version": new_version,
                "parent": snap["version"],
                "schema": snap["schema"],
                "key_cols": snap["key_cols"],
                "num_buckets": new_num_buckets,
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": new_files,
                "deltas": new_deltas,
                "tombstones": new_tombs,
                "row_counts": _rows_per_bucket(new_files),
                "summary": {
                    "operation": "rebucket",
                    "from_buckets": snap["num_buckets"],
                    "to_buckets": new_num_buckets,
                },
            }
        )
        return new_version

    def vacuum(self, keep_last: int = 1, orphan_grace_seconds: float = 86400.0) -> int:
        """GC data files not referenced by the newest ``keep_last``
        snapshots (Iceberg expire_snapshots analog). Returns the number
        of files deleted. Time travel to expired versions stops
        working, exactly like Iceberg.

        Two classes of dead files, handled differently:
        - files referenced by an EXPIRED snapshot and by no kept one:
          provably dead (snapshot lineage says so) — removed immediately;
        - files referenced by NO snapshot at all: may belong to an
          in-flight (not-yet-committed) merge/compact writer, so they are
          only removed once older than ``orphan_grace_seconds`` (Iceberg's
          remove_orphan_files older-than threshold). Deleting them
          eagerly would corrupt the concurrent writer's commit.
        """
        import time

        history = self.history()
        # anchor the kept window at CURRENT, not at the newest manifest
        # file: a crashed committer's orphan snapshot (manifest written,
        # pointer never swung) may sit BEYOND the pointer, and counting
        # it against keep_last would expire the snapshot live readers
        # are actually on (review finding). Snapshots past CURRENT are
        # always kept — versioned_commit rolls them forward later.
        current = self.current_version()
        settled = [s for s in history if s["version"] <= current]
        ahead = [s for s in history if s["version"] > current]
        keep = settled[-keep_last:] + ahead
        expired = settled[:-keep_last]  # may be empty: orphan GC still runs
        live: set[str] = set()
        for snap in keep:
            live.update(self._snap_files(snap))
        # files referenced by an open write-audit-publish stage are live
        # until the stage is explicitly published or aborted — a crashed
        # stage must survive vacuum so the session can re-attach to it
        for name in os.listdir(self.meta_dir):
            if name.startswith("wap-") and name.endswith(".json"):
                try:
                    with open(os.path.join(self.meta_dir, name)) as f:
                        live.update(self._snap_files(json.load(f)))
                except (OSError, ValueError):
                    continue
        dead: set[str] = set()
        for snap in expired:
            dead.update(self._snap_files(snap))
        dead -= live
        removed = 0
        now = time.time()
        for root, _dirs, fnames in os.walk(self.data_dir):
            for fname in fnames:
                if not fname.endswith(".parquet"):
                    continue
                p = os.path.join(root, fname)
                if p in live:
                    continue
                if p not in dead:
                    # unreferenced orphan — possibly an in-flight write;
                    # only collect past the grace window
                    try:
                        if now - os.path.getmtime(p) < orphan_grace_seconds:
                            continue
                    except OSError:
                        continue
                try:
                    os.remove(p)
                    removed += 1
                except FileNotFoundError:
                    pass
        # sweep write-dir debris: Spark sidecars (_SUCCESS, .crc) and the
        # emptied w-/p-/d-/t- directories accumulate unboundedly across
        # merge/compact/expire cycles otherwise. A dir is debris only if
        # it holds NO live parquet anywhere below it and is past the same
        # grace window (an in-flight writer's dir contains fresh files).
        for root, dirs, fnames in os.walk(self.data_dir, topdown=False):
            if root == self.data_dir:
                continue
            live_below = any(
                f.endswith(".parquet")
                for _r, _d, fl in os.walk(root)
                for f in fl
            )
            if live_below:
                continue
            try:
                if now - os.path.getmtime(root) < orphan_grace_seconds:
                    continue
            except OSError:
                continue
            for fname in fnames:  # _SUCCESS, .*.crc, _committed_*
                try:
                    os.remove(os.path.join(root, fname))
                except OSError:
                    pass
            try:
                os.rmdir(root)  # fails (kept) if a concurrent writer added files
            except OSError:
                pass
        # sweep crashed merge_prebucketed registration dirs: hardlink
        # dirs under _bucketed/ are dropped by the merge itself on
        # success; one orphaned by a crash is dead weight (links only —
        # removing them never touches the snapshot's own file paths).
        # Same grace window as other in-flight debris.
        breg = os.path.join(self.path, "_bucketed")
        if os.path.isdir(breg):
            import shutil as _shutil

            for entry in os.listdir(breg):
                p = os.path.join(breg, entry)
                try:
                    if now - os.path.getmtime(p) >= orphan_grace_seconds:
                        _shutil.rmtree(p, ignore_errors=True)
                except OSError:
                    pass
        # sweep bloom sidecars whose data file is gone: sidecars are
        # only ever built for COMMITTED snapshot files (the data file
        # always exists first), so a sidecar with no on-disk parquet
        # behind it is provably dead — no grace needed.
        if os.path.isdir(self.bloom_dir):
            from .bloom import sidecar_name as _scn

            live_sidecars = {
                _scn(os.path.join(root, f))
                for root, _d, fl in os.walk(self.data_dir)
                for f in fl
                if f.endswith(".parquet")
            }
            for entry in os.listdir(self.bloom_dir):
                if entry.endswith(".bloom") and entry not in live_sidecars:
                    try:
                        os.remove(os.path.join(self.bloom_dir, entry))
                    except OSError:
                        pass
        # expire old snapshot manifests too (never the orphans past
        # CURRENT — they roll forward at the next commit)
        for snap in expired:
            p = os.path.join(self.meta_dir, f"snap-{snap['version']:08d}.json")
            if os.path.exists(p):
                os.remove(p)
        return removed

    def expire_tombstones(
        self,
        spark: SparkSession,
        below_lsn: int | None = None,
        offsets=None,
    ) -> int:
        """Drop tombstone rows with _lsn < below_lsn (rewriting the
        surviving ones per bucket). Returns tombstone rows removed.

        SAFETY CONTRACT (now ENFORCED, not just documented): below_lsn
        must not exceed committed-offset-watermark + 1. Events with lsn
        at or below the watermark can never be re-delivered through
        CdcRunner (their windows are manifest-committed no-ops), so
        their tombstones are dead weight; expiring above the watermark
        would re-open the resurrection window the tombstones exist to
        close. Pass the OffsetLog as ``offsets`` and the bound is taken
        (or clamped) from its last_lsn(); passing a bare below_lsn with
        no offsets is allowed for tables not driven by a CdcRunner.
        This is the analog of Iceberg's delete-file compaction against
        the sequence-number horizon.
        """
        if offsets is not None:
            safe = offsets.last_lsn() + 1
            below_lsn = safe if below_lsn is None else min(below_lsn, safe)
        if below_lsn is None:
            raise ValueError("expire_tombstones needs below_lsn or offsets")
        snap = self.snapshot()
        tombs = snap.get("tombstones", {})
        if not tombs:
            return 0
        schema = T.StructType.fromJson(json.loads(snap["schema"]))
        stored = T.StructType(
            list(schema.fields)
            + [
                T.StructField(LSN_COL, T.LongType(), True),
                T.StructField(_TB1_COL, T.LongType(), True),
                T.StructField(_TB2_COL, T.LongType(), True),
            ]
        )
        all_files = [f for fl in tombs.values() for f in fl]
        df = spark.read.schema(stored).parquet(*all_files)
        removed = df.filter(F.col(LSN_COL) < below_lsn).count()
        if removed == 0:
            return 0
        survivors = df.filter(F.col(LSN_COL) >= below_lsn).withColumn(
            _BUCKET_COL, self._bucket_expr(snap)
        )
        out_dir = os.path.join(self.data_dir, f"t-{uuid.uuid4().hex}")
        survivors.repartition(snap["num_buckets"], *[F.col(c) for c in snap["key_cols"]]) \
            .write.partitionBy(_BUCKET_COL).mode("overwrite").parquet(out_dir)
        new_tombs: dict[str, list[str]] = {}
        for entry in os.listdir(out_dir):
            if entry.startswith(f"{_BUCKET_COL}="):
                b = entry.split("=")[1]
                bdir = os.path.join(out_dir, entry)
                new_tombs[b] = [
                    os.path.join(bdir, f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                ]
        self._commit(
            {
                "version": snap["version"] + 1,
                "parent": snap["version"],
                "schema": snap["schema"],
                "key_cols": snap["key_cols"],
                "num_buckets": snap["num_buckets"],
                "dict_cols": snap.get("dict_cols", {}),
                "tiebreak_family": snap.get("tiebreak_family", "xxhash64"),
                "commit_mode": snap.get("commit_mode", "pointer"),
                "files": dict(snap["files"]),
                "deltas": dict(snap.get("deltas", {})),
                "tombstones": new_tombs,
                "row_counts": dict(snap.get("row_counts", {})),
                "summary": {
                    "operation": "expire-tombstones",
                    "below_lsn": below_lsn,
                    "removed": removed,
                },
            }
        )
        return removed
