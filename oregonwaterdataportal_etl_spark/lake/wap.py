"""Write-audit-publish (WAP) staging for LakeTable.

The Iceberg WAP pattern: a writer stages one or more commits that are
durable and fully readable by the staging session but INVISIBLE to
every normal reader, runs audits against the staged state, and then
publishes the whole batch atomically as one main-line snapshot (or
aborts, leaving main untouched). The reference gates every sink write
behind validation before the POST (pydantic models + batch helpers,
userCode/helper_classes.py:94-129, userCode/awqms/dag.py:155-187);
WAP is that discipline recast for snapshot commits — validate the
*table state the write produces*, not just the rows going in.

Mechanics on the LakeTable substrate:

* :class:`WapStage` is a LakeTable whose commits are rerouted to
  ``wap-<id>-NNNN.json`` manifests via the same ``versioned_commit``
  publish (fsync + fail-if-exists link, never a pointer). Staged
  manifests sit outside the ``snap-`` namespace, so both commit modes
  ignore them: pointer-mode readers follow CURRENT, rename-free
  readers derive CURRENT from ``snap-`` names only. Every LakeTable
  operation — merge (cow/mor), merge_prebucketed, compact, read,
  read_changes — works unchanged inside a stage because only
  manifest naming differs.
* Data files are written into the table's own data dir, so PUBLISH
  IS METADATA-ONLY: the staged tip manifest (self-contained file
  lists) is renumbered onto the main chain through the normal
  optimistic commit. No data moves, no second write.
* Publish is conflict-checked: it requires main still at the
  stage's recorded base version. A concurrent main commit means the
  staged file-map no longer describes "base + this work" — the stage
  must be aborted and replayed (we refuse to guess a rebase; change
  batches are replayable by construction, CdcRunner replays are
  idempotent).
* Audits run as ONE aggregation job over the staged resolved view
  regardless of how many audits are attached (each audit contributes
  expressions to a shared ``agg``), so auditing a 100 TB staged
  state costs one scan, not one scan per check.
* Abort deletes staged manifests and (optionally, eagerly) the data
  files only the stage references. ``LakeTable.vacuum`` treats files
  referenced by live wap manifests as live, so a crashed stage is
  never swept before it is explicitly aborted or published.

At 100 TB: staging adds zero overhead to the write path (same jobs,
different manifest name), audits are one scan, publish and abort are
O(metadata).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .partitioned import PartitionedLakeTable
from .table import (
    CommitConflictError,
    LakeTable,
    latest_manifest_version,
    versioned_commit,
)


class WapConflictError(RuntimeError):
    """Main advanced past the stage's base version — abort and restage."""


class WapAuditError(RuntimeError):
    """One or more audits failed; the stage is left intact for
    inspection. ``report`` maps audit name -> detail string."""

    def __init__(self, report: dict[str, str]):
        super().__init__(f"WAP audits failed: {report}")
        self.report = report


# ----------------------------------------------------------- audits
class Audit:
    """One declarative check over the staged resolved view.

    ``named_exprs()`` returns (alias, aggregation column) pairs —
    aliases are content-derived so identical measurements collapse and
    distinct ones never collide; ``verdict(row)`` inspects the single
    collected aggregate row and returns (ok, detail). All attached
    audits share ONE agg job."""

    name: str = "audit"

    def named_exprs(self) -> list:  # pragma: no cover - interface
        raise NotImplementedError

    def verdict(self, row) -> tuple[bool, str]:  # pragma: no cover
        raise NotImplementedError


class NotNull(Audit):
    """Named columns must contain no nulls in the staged state."""

    def __init__(self, *cols: str):
        self.cols = list(cols)
        self.name = f"not_null({','.join(cols)})"

    def named_exprs(self):
        return [
            (f"__wap_nn_{c}", F.count(F.when(F.col(c).isNull(), 1)))
            for c in self.cols
        ]

    def verdict(self, row):
        bad = {c: row[f"__wap_nn_{c}"] for c in self.cols if row[f"__wap_nn_{c}"]}
        return (not bad, f"null rows per column: {bad}" if bad else "ok")


class UniqueKeys(Audit):
    """The staged state must hold one row per key (the table invariant
    a buggy custom write path would break first)."""

    def __init__(self, key_cols: list[str]):
        self.key_cols = list(key_cols)
        self.name = f"unique_keys({','.join(key_cols)})"
        self._d = "__wap_uk_d_" + "_".join(self.key_cols)

    def named_exprs(self):
        return [
            ("__wap_count", F.count(F.lit(1))),
            (self._d, F.countDistinct(*[F.col(c) for c in self.key_cols])),
        ]

    def verdict(self, row):
        n, d = row["__wap_count"], row[self._d]
        return (n == d, "ok" if n == d else f"{n} rows but {d} distinct keys")


class RowBounds(Audit):
    """Staged row count within [min_rows, max_rows] — the coarse
    fat-finger guard (e.g. an empty upstream must not publish an
    empty table over a full one)."""

    def __init__(self, min_rows: int = 0, max_rows: int | None = None):
        self.min_rows, self.max_rows = min_rows, max_rows
        self.name = f"row_bounds({min_rows},{max_rows})"

    def named_exprs(self):
        return [("__wap_count", F.count(F.lit(1)))]

    def verdict(self, row):
        n = row["__wap_count"]
        if n < self.min_rows:
            return False, f"{n} rows < min {self.min_rows}"
        if self.max_rows is not None and n > self.max_rows:
            return False, f"{n} rows > max {self.max_rows}"
        return True, "ok"


class ExprHolds(Audit):
    """A boolean expression every staged row must satisfy
    (e.g. ``F.col('turn_idx') >= 0``)."""

    def __init__(self, name: str, cond):
        self.name = f"holds({name})"
        self._alias = f"__wap_eh_{abs(hash(name)) % 10**8}"
        self.cond = cond

    def named_exprs(self):
        return [(self._alias, F.count(F.when(~self.cond, 1)))]

    def verdict(self, row):
        bad = row[self._alias]
        return (bad == 0, "ok" if bad == 0 else f"{bad} violating rows")


class ChangeAudit(Audit):
    """Audit over the STAGED CHANGELOG (stage.read_changes from the
    base version) instead of the staged state — the guard for "how
    much did this publish change", which state audits cannot see.
    ``publish`` routes these to a second single-agg pass over the
    changelog frame (``_change_type`` ∈ insert/update/delete)."""

    wants_changes = True


class DeltaBounds(ChangeAudit):
    """Bound the net change a publish may apply: absolute caps per
    change type and/or a deleted-fraction cap against the base row
    count (metadata-only — no base scan). The classic WAP guard: an
    empty or truncated upstream must not silently delete the table."""

    def __init__(
        self,
        max_inserted: int | None = None,
        max_updated: int | None = None,
        max_deleted: int | None = None,
        max_deleted_frac: float | None = None,
    ):
        self.max_inserted = max_inserted
        self.max_updated = max_updated
        self.max_deleted = max_deleted
        self.max_deleted_frac = max_deleted_frac
        self.name = (
            f"delta_bounds(ins<={max_inserted},upd<={max_updated},"
            f"del<={max_deleted},del_frac<={max_deleted_frac})"
        )
        self._base_rows: int | None = None  # injected by publish

    def named_exprs(self):
        return [
            (
                f"__wap_ct_{t}",
                F.count(F.when(F.col("_change_type") == t, 1)),
            )
            for t in ("insert", "update", "delete")
        ]

    def verdict(self, row):
        ins = row["__wap_ct_insert"]
        upd = row["__wap_ct_update"]
        dele = row["__wap_ct_delete"]
        problems = []
        if self.max_inserted is not None and ins > self.max_inserted:
            problems.append(f"{ins} inserts > {self.max_inserted}")
        if self.max_updated is not None and upd > self.max_updated:
            problems.append(f"{upd} updates > {self.max_updated}")
        if self.max_deleted is not None and dele > self.max_deleted:
            problems.append(f"{dele} deletes > {self.max_deleted}")
        if self.max_deleted_frac is not None and self._base_rows:
            frac = dele / self._base_rows
            if frac > self.max_deleted_frac:
                problems.append(
                    f"deleted {frac:.3f} of {self._base_rows} base rows "
                    f"> {self.max_deleted_frac}"
                )
        return (not problems, "; ".join(problems) or "ok")


def run_audits(df: DataFrame, audits: list[Audit]) -> dict[str, str]:
    """Run all audits in ONE aggregation job; return {name: detail}
    for failures only (empty dict = all green)."""
    if not audits:
        return {}
    exprs: dict[str, object] = {}
    for a in audits:
        for alias, e in a.named_exprs():
            exprs.setdefault(alias, e.alias(alias))
    row = df.agg(*exprs.values()).collect()[0]
    report = {}
    for a in audits:
        ok, detail = a.verdict(row)
        if not ok:
            report[a.name] = detail
    return report


# ------------------------------------------------------------ stage
class _StagedChain:
    """Shared staged-manifest mechanics for WAP stages (flat table and
    partition tree): a ``wap-<id>-NNNN.json`` chain overlaying a main
    chain. Subclasses provide ``_main_current()``/``_main_snapshot(v)``
    (the un-staged fallbacks) and set ``self._prefix``/``self.meta_dir``
    before use."""

    @staticmethod
    def _check_wap_id(wap_id: str) -> None:
        if not wap_id or any(ch in wap_id for ch in "/\\ \t\n"):
            raise ValueError(f"invalid wap_id {wap_id!r}")

    def _staged_tip(self) -> int | None:
        return latest_manifest_version(self.meta_dir, self._prefix)

    def staged_versions(self) -> list[int]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith(self._prefix) and name.endswith(".json"):
                mid = name[len(self._prefix):-5]
                if mid.isdigit():
                    out.append(int(mid))
        return out

    def current_version(self) -> int:
        tip = self._staged_tip()
        return tip if tip is not None else self._main_current()

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        staged = os.path.join(self.meta_dir, f"{self._prefix}{v:08d}.json")
        if os.path.exists(staged):
            with open(staged) as f:
                return json.load(f)
        return self._main_snapshot(v)

    def _drop_staged_manifests(self) -> None:
        for v in self.staged_versions():
            try:
                os.remove(
                    os.path.join(self.meta_dir, f"{self._prefix}{v:08d}.json")
                )
            except FileNotFoundError:
                pass


class WapStage(_StagedChain, LakeTable):
    """A LakeTable view whose commits land on a private staged chain.

    Create with :func:`begin_wap` (or re-attach to an existing stage
    by constructing with the same ``wap_id`` after a crash — staged
    manifests are durable)."""

    def __init__(self, path: str, wap_id: str):
        self._check_wap_id(wap_id)
        super().__init__(path)
        self.wap_id = wap_id
        self._prefix = f"wap-{wap_id}-"
        tip = latest_manifest_version(self.meta_dir, self._prefix)
        if tip is not None:
            self._base_version = self.snapshot(tip)["wap"]["base_version"]
        else:
            self._base_version = LakeTable.current_version(self)

    def _main_current(self) -> int:
        return LakeTable.current_version(self)

    def _main_snapshot(self, v: int) -> dict:
        return LakeTable.snapshot(self, v)

    def _commit(self, snap: dict) -> None:
        """Publish onto the staged chain: same complete-before-named
        manifest discipline, never a pointer, never a snap- name. Two
        sessions staging under the same wap_id arbitrate on the link
        exactly like two main-line committers."""
        snap = dict(snap)
        snap["wap"] = {"id": self.wap_id, "base_version": self._base_version}
        versioned_commit(
            self.meta_dir,
            f"{self._prefix}{snap['version']:08d}.json",
            snap["version"],
            snap,
            pointer_name=None,
        )

    # -- lifecycle -------------------------------------------------
    def publish(
        self,
        spark: SparkSession | None = None,
        audits: list[Audit] | None = None,
    ) -> int:
        """Audit the staged state, then fast-forward main onto it.

        Returns the published main-line version. Raises
        :class:`WapAuditError` (stage kept) on audit failure,
        :class:`WapConflictError` (stage kept) if main moved past the
        base version, ``ValueError`` if nothing was staged."""
        tip = self._staged_tip()
        if tip is None:
            raise ValueError(f"wap stage {self.wap_id!r}: nothing staged")
        if audits:
            if spark is None:
                raise ValueError("publish(audits=...) needs a SparkSession")
            state_audits = [
                a for a in audits if not getattr(a, "wants_changes", False)
            ]
            change_audits = [
                a for a in audits if getattr(a, "wants_changes", False)
            ]
            report = run_audits(self.read(spark), state_audits)
            if change_audits:
                base_rows = sum(
                    (LakeTable.snapshot(self, self._base_version).get(
                        "row_counts"
                    ) or {}).values()
                )
                for a in change_audits:
                    a._base_rows = base_rows
                report.update(
                    run_audits(
                        self.read_changes(spark, self._base_version, tip),
                        change_audits,
                    )
                )
            if report:
                raise WapAuditError(report)
        main = LakeTable(self.path)
        current = main.current_version()
        if current != self._base_version:
            cs = LakeTable.snapshot(self, current)
            s = cs.get("summary") or {}
            if (
                s.get("operation") == "wap-publish"
                and s.get("wap_id") == self.wap_id
                and cs.get("parent") == self._base_version
            ):
                # OUR publish already committed (crash between the main
                # commit and the staged-chain cleanup): finish the
                # cleanup idempotently instead of reporting a conflict
                self._drop_staged_manifests()
                return current
            raise WapConflictError(
                f"main moved {self._base_version} -> {current} while wap "
                f"stage {self.wap_id!r} was open; abort and restage"
            )
        snap = dict(self.snapshot(tip))
        staged_commits = len(self.staged_versions())
        snap["version"] = current + 1
        snap["parent"] = current
        snap.pop("wap", None)
        summary = dict(snap.get("summary") or {})
        snap["summary"] = {
            **summary,
            "operation": "wap-publish",
            "wap_id": self.wap_id,
            "staged_commits": staged_commits,
            "staged_operation": summary.get("operation"),
        }
        try:
            main._commit(snap)
        except CommitConflictError as e:
            raise WapConflictError(
                f"main committed concurrently while publishing wap stage "
                f"{self.wap_id!r}; abort and restage"
            ) from e
        self._drop_staged_manifests()
        return snap["version"]

    def abort(self, drop_data: bool = True) -> int:
        """Discard the stage. With ``drop_data`` (default) the data
        files ONLY this stage references are deleted eagerly; files
        shared with any main snapshot or any other live stage are
        kept. Either way ``vacuum`` would eventually collect them.
        Returns the number of data files removed."""
        staged_files: set[str] = set()
        for v in self.staged_versions():
            staged_files.update(self._snap_files(self.snapshot(v)))
        removed = 0
        if drop_data and staged_files:
            keep: set[str] = set()
            for name in os.listdir(self.meta_dir):
                if name.startswith("snap-") and name.endswith(".json"):
                    with open(os.path.join(self.meta_dir, name)) as f:
                        keep.update(self._snap_files(json.load(f)))
                elif (
                    name.startswith("wap-")
                    and name.endswith(".json")
                    and not name.startswith(self._prefix)
                ):
                    with open(os.path.join(self.meta_dir, name)) as f:
                        keep.update(self._snap_files(json.load(f)))
            for p in staged_files - keep:
                try:
                    os.remove(p)
                    removed += 1
                except FileNotFoundError:
                    pass
        self._drop_staged_manifests()
        return removed


class PartitionedWapStage(_StagedChain, PartitionedLakeTable):
    """Write-audit-publish over the PARTITION TREE: the ROOT chain is
    staged (``wap-<id>-N`` root manifests — invisible to every normal
    reader, who only follows ``snap-`` roots), and each touched child
    is a per-child :class:`WapStage`, so child data commits are staged
    too. Staged state is fully readable/auditable through the ordinary
    tree API (read / read_changes / metadata), because every child
    lookup routes through the stage's ``partition_table``.

    Publish = child stages publish first (metadata-only renumbers),
    then ONE root commit pins the published vector atomically; if the
    root commit loses a race, the already-published children are
    ROLLED BACK (LakeTable.rollback — history moves forward, pointers
    move back) so no staged row can leak into a later main merge, and
    WapConflictError is raised with the stage kept.

    New partitions created inside a stage get a real (empty) child v0
    plus staged data commits; on abort the staged commits vanish with
    the child wap chain, and a stage-created child whose dir lingers
    is neutralized by the reincarnation truncate guard on the next
    main merge."""

    def __init__(self, path: str, wap_id: str):
        self._check_wap_id(wap_id)
        super().__init__(path)
        self.wap_id = wap_id
        self._prefix = f"wap-{wap_id}-"
        tip = latest_manifest_version(self.meta_dir, self._prefix)
        if tip is not None:
            self._base_version = self.snapshot(tip)["wap"]["base_version"]
        else:
            self._base_version = PartitionedLakeTable.current_version(self)

    def _main_current(self) -> int:
        return PartitionedLakeTable.current_version(self)

    def _main_snapshot(self, v: int) -> dict:
        return PartitionedLakeTable.snapshot(self, v)

    def partition_table(self, value: str):
        path = self.partition_dir(value)
        if os.path.isdir(os.path.join(path, "_meta")):
            return WapStage(path, self.wap_id)
        # not created yet: hand back a plain table so exists()/create
        # work; the NEXT lookup (post-create) returns the staged view
        return LakeTable(path)

    def _commit(self, snap: dict) -> None:
        snap = dict(snap)
        snap.pop("committed_at", None)
        snap["wap"] = {"id": self.wap_id, "base_version": self._base_version}
        versioned_commit(
            self.meta_dir,
            f"{self._prefix}{snap['version']:08d}.json",
            snap["version"],
            snap,
            pointer_name=None,
        )

    def _staged_children(self, vector: dict) -> list[str]:
        out = []
        for value in sorted(vector):
            pd = self.partition_dir(value)
            if os.path.isdir(os.path.join(pd, "_meta")):
                if latest_manifest_version(
                    os.path.join(pd, "_meta"), self._prefix
                ) is not None:
                    out.append(value)
        return out

    # -- publish-intent marker -------------------------------------
    # Durable record of each child's PUBLISHED main version, written
    # before the root commit: a crash between the child-publish loop
    # and the root commit leaves children published (their wap chains
    # already dropped) while the staged root vector still pins STAGED
    # chain numbers — which exist on the main chain only by
    # coincidence (single staged commit) or not at all. A re-attached
    # publish resolves those children from this marker instead.
    def _intent_path(self) -> str:
        return os.path.join(self.meta_dir, f"{self._prefix}publish-intent.json")

    def _read_intent(self) -> dict:
        try:
            with open(self._intent_path()) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {}

    def _write_intent(self, intent: dict) -> None:
        tmp = f"{self._intent_path()}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(intent, f)
        os.replace(tmp, self._intent_path())

    def _clear_intent(self) -> None:
        try:
            os.remove(self._intent_path())
        except FileNotFoundError:
            pass

    def snapshot(self, version: int | None = None) -> dict:
        snap = super().snapshot(version)
        if "wap" in snap:
            # a staged ROOT manifest: overlay publish-intent children
            # with their published main versions, so re-attached reads
            # (audits, read_changes, publish itself) resolve them on
            # the child MAIN chain — the staged numbers no longer
            # exist. Only children whose staged chain is GONE overlay:
            # the marker is written before the child publish, so an
            # entry with a still-live chain means that child's publish
            # never completed and the staged numbers remain the truth.
            intent = self._read_intent()
            if intent:
                parts = dict(snap.get("partitions") or {})
                changed = False
                for v, rec in intent.items():
                    if v not in parts:
                        continue
                    md = os.path.join(self.partition_dir(v), "_meta")
                    if latest_manifest_version(md, self._prefix) is None:
                        parts[v] = rec["pub"]
                        changed = True
                if changed:
                    snap = dict(snap)
                    snap["partitions"] = parts
        return snap

    def publish(
        self,
        spark: SparkSession | None = None,
        audits: list[Audit] | None = None,
    ) -> int:
        tip = self._staged_tip()
        if tip is None:
            raise ValueError(f"wap stage {self.wap_id!r}: nothing staged")
        if audits:
            if spark is None:
                raise ValueError("publish(audits=...) needs a SparkSession")
            state_audits = [
                a for a in audits if not getattr(a, "wants_changes", False)
            ]
            change_audits = [
                a for a in audits if getattr(a, "wants_changes", False)
            ]
            report = run_audits(self.read(spark), state_audits)
            if change_audits:
                base_vec = (
                    PartitionedLakeTable.snapshot(self, self._base_version)
                    .get("partitions") or {}
                )
                base_rows = 0
                for value, cv in base_vec.items():
                    cs = LakeTable(self.partition_dir(value)).snapshot(cv)
                    base_rows += sum((cs.get("row_counts") or {}).values())
                for a in change_audits:
                    a._base_rows = base_rows
                report.update(
                    run_audits(
                        self.read_changes(spark, self._base_version, tip),
                        change_audits,
                    )
                )
            if report:
                raise WapAuditError(report)
        main = PartitionedLakeTable(self.path)
        current = main.current_version()
        if current != self._base_version:
            cs = PartitionedLakeTable.snapshot(self, current)
            s = cs.get("summary") or {}
            if (
                s.get("operation") == "wap-publish"
                and s.get("wap_id") == self.wap_id
                and cs.get("parent") == self._base_version
            ):
                # OUR root commit already landed (crash between it and
                # the cleanup): finish the cleanup idempotently
                self._publish_cleanup(dict(cs.get("partitions") or {}))
                return current
            raise WapConflictError(
                f"main moved {self._base_version} -> {current} while wap "
                f"stage {self.wap_id!r} was open; abort and restage"
            )
        snap = dict(self.snapshot(tip))
        # snapshot() has already overlaid publish-intent children (a
        # re-attached publish after a crash mid-protocol), so `vector`
        # holds published MAIN versions for them and staged numbers
        # only for children still awaiting their publish
        vector = dict(snap.get("partitions") or {})
        intent = self._read_intent()
        undo: list[tuple[str, int, int]] = []
        try:
            for value in self._staged_children(vector):
                child_main = LakeTable(self.partition_dir(value))
                pre = child_main.current_version()
                # record the intent BEFORE the child publish (flat
                # publish always commits pre+1, so the published
                # version is known in advance): every crash point
                # after this line is recoverable from the marker —
                # this is what makes the loop-to-root-commit window
                # safe for a re-attached publish
                intent[value] = {"pre": pre, "pub": pre + 1}
                self._write_intent(intent)
                pub = WapStage(self.partition_dir(value), self.wap_id).publish()
                assert pub == pre + 1
                vector[value] = pub
                undo.append((value, pre, pub))
            snap["partitions"] = vector
            snap["version"] = current + 1
            snap["parent"] = current
            snap.pop("wap", None)
            summary = dict(snap.get("summary") or {})
            snap["summary"] = {
                **summary,
                "operation": "wap-publish",
                "wap_id": self.wap_id,
                "staged_commits": len(self.staged_versions()),
                "staged_operation": summary.get("operation"),
            }
            main._commit(snap)
        except (CommitConflictError, WapConflictError) as e:
            # un-publish the children so no staged row leaks into a
            # later main merge through an advanced child CURRENT —
            # including children published by a CRASHED earlier attempt
            # (their pre/pub ride the intent marker). A child whose
            # CURRENT moved past our published version carries a
            # FOREIGN writer's commit built on the unaudited staged
            # data: rolling it back would silently drop that writer's
            # rows, so fail loudly for operator repair instead.
            to_undo = {v: (rec["pre"], rec["pub"]) for v, rec in intent.items()}
            for value, pre, pub in undo:
                to_undo[value] = (pre, pub)
            foreign = []
            for value, (pre, pub) in sorted(to_undo.items()):
                child = LakeTable(self.partition_dir(value))
                cur = child.current_version()
                if cur == pre:
                    # intent recorded but the child publish never
                    # committed — nothing to undo
                    intent.pop(value, None)
                    continue
                if cur != pub:
                    foreign.append(value)
                    continue
                child.rollback(pre)
                intent.pop(value, None)
            if intent:
                self._write_intent(intent)
            else:
                self._clear_intent()
            if foreign:
                raise WapConflictError(
                    f"publish of wap stage {self.wap_id!r} lost a race AND "
                    f"concurrent main commits landed on published children "
                    f"{foreign} before the rollback; those children keep "
                    "the staged+foreign data and need operator repair "
                    "(the other children were rolled back)"
                ) from e
            raise WapConflictError(
                f"publish of wap stage {self.wap_id!r} lost a race; child "
                "publishes rolled back — abort and restage"
            ) from e
        self._publish_cleanup(vector)
        return snap["version"]

    def _publish_cleanup(self, vector: dict) -> None:
        """Post-root-commit cleanup: drop the staged root chain + the
        intent marker, then sweep child wap chains NOT covered by the
        published vector — a child merged and then drop_partitions'd
        inside the stage is absent from the staged vector, so the
        publish loop never touches it and its wap-<id>-* manifests
        would linger forever, pinning staged data files against child
        vacuum and silently re-attaching to a future stage that reuses
        this wap_id."""
        self._drop_staged_manifests()
        self._clear_intent()
        try:
            names = sorted(os.listdir(self.path))
        except FileNotFoundError:
            names = []
        for name in names:
            if not name.startswith("p=") or name[2:] in vector:
                continue
            pd = os.path.join(self.path, name)
            if os.path.isdir(os.path.join(pd, "_meta")) and (
                latest_manifest_version(os.path.join(pd, "_meta"), self._prefix)
                is not None
            ):
                WapStage(pd, self.wap_id).abort(drop_data=True)

    def abort(self, drop_data: bool = True) -> int:
        removed = 0
        # children published by a CRASHED publish attempt (recorded in
        # the intent marker) are un-published first, so abort leaves
        # main exactly at the stage's base; a child whose CURRENT moved
        # past our published version carries a foreign commit — leave
        # it and fail loudly after cleaning everything else up
        intent = self._read_intent()
        foreign = []
        for value, rec in sorted(intent.items()):
            child = LakeTable(self.partition_dir(value))
            cur = child.current_version()
            if cur == rec["pre"]:
                continue  # intent recorded, publish never committed
            if cur != rec["pub"]:
                foreign.append(value)
                continue
            child.rollback(rec["pre"])
        try:
            names = sorted(os.listdir(self.path))
        except FileNotFoundError:
            names = []
        for name in names:
            if not name.startswith("p="):
                continue
            pd = os.path.join(self.path, name)
            if os.path.isdir(os.path.join(pd, "_meta")) and (
                latest_manifest_version(os.path.join(pd, "_meta"), self._prefix)
                is not None
            ):
                removed += WapStage(pd, self.wap_id).abort(drop_data=drop_data)
        self._drop_staged_manifests()
        if foreign:
            # keep only the foreign entries so the condition stays
            # visible to a later re-attach instead of silently vanishing
            self._write_intent({v: intent[v] for v in foreign})
            raise WapConflictError(
                f"abort of wap stage {self.wap_id!r}: children {foreign} "
                "were published by a crashed publish AND carry later "
                "foreign commits — cannot roll back without dropping "
                "another writer's rows; operator repair required"
            )
        self._clear_intent()
        return removed


def begin_wap(table, wap_id: str):
    """Open (or re-attach to) a write-audit-publish stage on a table —
    flat LakeTable or PartitionedLakeTable, decided by the table kind."""
    if hasattr(table, "partition_table"):
        return PartitionedWapStage(table.path, wap_id)
    return WapStage(table.path, wap_id)
