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
