"""TRUE multi-process concurrency: a CdcRunner applying windows while a
SEPARATE PROCESS runs the maintenance cycle (compact + tombstone
expiry) against the same table. Both sides lose snapshot-version races
for real — os-level O_EXCL conflicts, not monkeypatched ones — and both
retry; the final state must equal a clean one-shot apply (exactly-once
under concurrent maintenance, the scenario jobs/maintain.py exists
for)."""

import os
import subprocess
import sys
import textwrap

from pyspark.sql import functions as F

from oregonwaterdataportal_etl_spark.cdc import (
    CdcRunner,
    ManifestLog,
    OffsetLog,
)
from oregonwaterdataportal_etl_spark.cdc.changegen import (
    TRANSCRIPT_SCHEMA,
    generate_changes_pdf,
)
from oregonwaterdataportal_etl_spark.lake import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MAINT_LOOP = textwrap.dedent(
    """
    import sys, time
    sys.path.insert(0, {repo!r})
    from oregonwaterdataportal_etl_spark.session import get_spark
    from oregonwaterdataportal_etl_spark.lake import LakeTable
    from oregonwaterdataportal_etl_spark.lake.table import CommitConflictError
    from oregonwaterdataportal_etl_spark.cdc import OffsetLog

    spark = get_spark(app_name="maint-rival", master="local[2]",
                      shuffle_partitions=4)
    t = LakeTable({table!r})
    off = OffsetLog({off!r}, "s1")
    conflicts = 0
    for _ in range(6):
        try:
            t.compact(spark)
            t.expire_tombstones(spark, offsets=off)
        except CommitConflictError:
            conflicts += 1  # lost a race to the runner: expected, retry next lap
        time.sleep(0.3)
    print("MAINT-DONE conflicts=", conflicts)
    spark.stop()
    """
)


import pytest


@pytest.mark.parametrize("commit_mode", ["pointer", "rename-free"])
def test_runner_vs_maintenance_process_exactly_once(spark, tmp_path, commit_mode):
    stream_dir = str(tmp_path / "stream")
    n = 60_000
    spark.createDataFrame(
        generate_changes_pdf(n, 1500, seed=21, out_of_order=0.3, delete_rate=0.05)
    ).repartition(8).write.parquet(stream_dir)

    # both modes share the O_EXCL-link arbitration; rename-free must
    # survive the same real multi-process races with no pointer at all
    table = LakeTable.create(
        str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4, commit_mode=commit_mode,
    )
    runner = CdcRunner(
        table,
        OffsetLog(str(tmp_path / "off"), "s1"),
        ManifestLog(str(tmp_path / "man")),
        source=lambda: spark.read.parquet(stream_dir),
        mode="mor",
        commit_retries=8,
    )
    script = MAINT_LOOP.format(
        repo=REPO, table=str(tmp_path / "t"), off=str(tmp_path / "off")
    )
    log = open(tmp_path / "maint.log", "w")
    rival = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=log,
        stderr=subprocess.DEVNULL,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    try:
        results = runner.run_available(window_size=7_500)
    finally:
        rc = rival.wait(timeout=300)
        log.close()
    assert rc == 0, (tmp_path / "maint.log").read_text()
    assert "MAINT-DONE" in (tmp_path / "maint.log").read_text()
    assert len(results) == 8
    assert runner.offsets.last_lsn() == n - 1

    # exactly-once: final state == clean one-shot apply of the same stream
    clean = LakeTable.create(
        str(tmp_path / "clean"), TRANSCRIPT_SCHEMA, ["conv_id", "turn_idx"],
        num_buckets=4,
    )
    clean.merge(spark.read.parquet(stream_dir))
    key = ["conv_id", "turn_idx", "text", "role"]
    got = sorted(map(tuple, table.read(spark).select(*key).collect()))
    want = sorted(map(tuple, clean.read(spark).select(*key).collect()))
    assert got == want and len(got) > 0
    # replaying any window stays a no-op afterwards
    assert runner.run_window(0, 7_499) is None


# ---------------------------------------------------------------------------
# Crash-injection schedules over the commit discipline itself (no Spark:
# versioned_commit + latest_manifest_version are pure-filesystem, so
# hypothesis can afford hundreds of schedules).
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from oregonwaterdataportal_etl_spark.lake.table import (
    CommitConflictError,
    latest_manifest_version,
    versioned_commit,
)
import oregonwaterdataportal_etl_spark.lake.table as _table_mod


class _Crash(Exception):
    """Injected power-loss stand-in."""


_CRASH_POINTS = [
    "tmp-partial",   # dies mid-tmp-write: truncated .tmp-* debris only
    "pre-link",      # tmp complete+fsynced, dies before os.link publishes
    "post-link",     # manifest published, dies before pointer swing /
                     # final dir fsync — the exact window ADVICE.md r3 #1
                     # identified
    "ok",            # commit completes
]


import contextlib


@contextlib.contextmanager
def _patched(obj, attr, repl):
    real = getattr(obj, attr)
    setattr(obj, attr, repl)
    try:
        yield
    finally:
        setattr(obj, attr, real)


def _raise_crash(*a, **k):
    raise _Crash()


def _attempt(meta_dir, version, crash_at, pointer_name):
    """One commit attempt against real files, dying at crash_at.

    Returns 'published' (this attempt durably created the manifest —
    post-link and ok both do: existence-implies-completeness makes the
    link itself the commit; the pointer swing is recoverable),
    'crashed' (nothing new published), or 'conflict' (the target name
    already existed — roll-forward arbitration; a crash injected during
    the roll-forward's own pointer swing surfaces as 'crashed')."""
    name = f"snap-{version:08d}.json"
    mpath = os.path.join(meta_dir, name)
    pre_exists = os.path.exists(mpath)
    manifest = {"version": version, "payload": f"p{version}"}
    if crash_at == "tmp-partial":
        with open(mpath + ".tmp-crash", "w") as f:
            f.write('{"version":')  # torn write
        return "crashed"
    try:
        if crash_at == "pre-link":
            with _patched(os, "link", _raise_crash):
                versioned_commit(meta_dir, name, version, manifest, pointer_name)
        elif crash_at == "post-link":
            if pointer_name is None:
                # rename-free: nothing after the link but a dir fsync
                with _patched(_table_mod, "_fsync_dir", _raise_crash):
                    versioned_commit(meta_dir, name, version, manifest, None)
            else:
                with _patched(os, "replace", _raise_crash):
                    versioned_commit(meta_dir, name, version, manifest,
                                     pointer_name)
        else:
            versioned_commit(meta_dir, name, version, manifest, pointer_name)
    except _Crash:
        return "published" if not pre_exists and os.path.exists(mpath) else "crashed"
    except CommitConflictError:
        return "conflict"
    assert crash_at == "ok"
    return "published"


def _read_pointer(meta_dir, pointer_name):
    try:
        with open(os.path.join(meta_dir, pointer_name)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


@pytest.mark.parametrize("pointer_name", [None, "CURRENT"],
                         ids=["rename-free", "pointer"])
@settings(max_examples=60, deadline=None)
@given(schedule=st.lists(st.sampled_from(_CRASH_POINTS), min_size=1, max_size=12))
def test_commit_crash_schedule(tmp_path_factory, pointer_name, schedule):
    """Property: under ANY interleaving of crashes at the tmp-write /
    pre-link / post-link windows, (a) every listed manifest parses as
    complete JSON — existence implies completeness, the invariant the
    rename-free CURRENT derivation rests on; (b) the listing-derived
    current version tracks exactly the set of durably-published commits
    and never regresses; (c) in pointer mode the pointer only ever
    names a complete published manifest; (d) after the dust settles, a
    committer retrying through conflicts always makes progress within
    the runner's bounded retry budget.

    Each step derives its commit target the way a REAL committer does
    (pointer read with manifest-listing fallback in pointer mode —
    LakeTable.current_version; listing alone in rename-free mode), so
    orphan roll-forward arbitration is exercised by the schedule."""
    import json as _json

    meta_dir = str(tmp_path_factory.mktemp("commit-crash"))

    def derive_current():
        if pointer_name is not None:
            ptr = _read_pointer(meta_dir, pointer_name)
            if ptr is not None:
                return ptr
        return latest_manifest_version(meta_dir, "snap-")

    published = []  # versions durably published, in order
    for crash_at in schedule:
        target = (derive_current() or 0) + 1
        outcome = _attempt(meta_dir, target, crash_at, pointer_name)
        if outcome == "published":
            assert target not in published
            published.append(target)

        # (a) every published manifest is complete JSON
        for n in os.listdir(meta_dir):
            if n.startswith("snap-") and n.endswith(".json"):
                with open(os.path.join(meta_dir, n)) as f:
                    _json.load(f)
        # (b) listing derivation == durably published set, monotone,
        # gapless (a crashed attempt never burns a version number)
        assert latest_manifest_version(meta_dir, "snap-") == (
            published[-1] if published else None
        )
        assert published == list(range(1, len(published) + 1))
        # (c) pointer only ever names a complete published commit
        if pointer_name is not None:
            ptr = _read_pointer(meta_dir, pointer_name)
            if ptr is not None:
                assert ptr in published

    # (d) recovery: a clean committer retrying through roll-forward
    # conflicts lands within the runner's retry budget
    before = latest_manifest_version(meta_dir, "snap-") or 0
    landed = False
    for _ in range(3):
        target = (derive_current() or 0) + 1
        if _attempt(meta_dir, target, "ok", pointer_name) == "published":
            landed = True
            break
    assert landed, "clean committer livelocked after crash schedule"
    assert latest_manifest_version(meta_dir, "snap-") == before + 1
    if pointer_name is not None:
        assert _read_pointer(meta_dir, pointer_name) == before + 1


def test_rename_free_delayed_visibility(tmp_path, monkeypatch):
    """Object-store eventual LIST consistency simulation: a just-linked
    manifest may be invisible to listings for a while. Correctness
    must rest on the atomic CREATE (os.link fail-if-exists), never on
    listing: (1) a reader with a lagged listing sees a stale-but-valid
    version, never a torn one; (2) a rival that derives its target from
    the lagged listing still CANNOT double-commit — the link conflicts
    even though the name is unlisted."""
    meta_dir = str(tmp_path)
    for v in (1, 2):
        versioned_commit(
            meta_dir, f"snap-{v:08d}.json", v, {"version": v}, None
        )

    hidden = {"snap-00000002.json"}  # v2 linked but not yet listable
    real_listdir = os.listdir

    def lagged_listdir(path):
        return [n for n in real_listdir(path) if n not in hidden]

    monkeypatch.setattr(os, "listdir", lagged_listdir)
    # (1) stale-but-valid read
    assert latest_manifest_version(meta_dir, "snap-") == 1
    # (2) rival derives target 2 from the lagged view; the unlisted
    # name still arbitrates via link fail-if-exists
    with pytest.raises(CommitConflictError):
        versioned_commit(
            meta_dir, "snap-00000002.json", 2, {"version": 2, "rival": 1}, None
        )
    # the loser's retry on the (eventually) visible state lands cleanly
    monkeypatch.setattr(os, "listdir", real_listdir)
    assert latest_manifest_version(meta_dir, "snap-") == 2
    versioned_commit(meta_dir, "snap-00000003.json", 3, {"version": 3}, None)
    assert latest_manifest_version(meta_dir, "snap-") == 3
    # and the winner's v2 content was never clobbered by the rival
    import json as _json

    with open(os.path.join(meta_dir, "snap-00000002.json")) as f:
        assert "rival" not in _json.load(f)
