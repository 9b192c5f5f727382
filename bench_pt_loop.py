"""Measured datapoint: the partitioned runner loop at its operating
point — sustained CDC throughput over a LARGE aged base with small
day-routed batches (the production steady state the partition
dimension exists for).

Setup: D days x R rows/day base loaded via the day-routed WAL, then K
update windows, each touching only the LAST 2 days, applied through
CdcRunner + PartitionedWalSource (time-routed AND exchange-free, per
tests/test_partitioned.py plan pins). Reported: sustained window
events/sec — which must stay FLAT as the base ages (BENCH §10's
O(active window) claim, here as the full loop rather than one merge).

Usage: python bench_pt_loop.py     # 24 days x 500k base, 4 x 250k windows
       PTL_DAYS=48 python bench_pt_loop.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

DAYS = int(os.environ.get("PTL_DAYS", "24"))
ROWS_PER_DAY = int(os.environ.get("PTL_ROWS_PER_DAY", "500000"))
WINDOWS = int(os.environ.get("PTL_WINDOWS", "4"))
WINDOW_ROWS = int(os.environ.get("PTL_WINDOW_ROWS", "250000"))
CPUS = int(os.environ.get("PTL_CPUS", "8"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from oregonwaterdataportal_etl_spark.session import get_spark
from oregonwaterdataportal_etl_spark.lake import PartitionedLakeTable, write_partitioned_wal
from oregonwaterdataportal_etl_spark.cdc import CdcRunner, OffsetLog, ManifestLog, PartitionedWalSource
from pyspark.sql import functions as F, types as T

days, rpd, windows, wrows, cpus, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]), sys.argv[6])
spark = get_spark(app_name="bench_pt_loop", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 4)
import tempfile
root = tempfile.mkdtemp(prefix="bench_ptl_")
SCHEMA = T.StructType([
    T.StructField("conv_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])
t = PartitionedLakeTable.create(os.path.join(root, "t"), SCHEMA,
                                key_cols=["conv_id"], partition_col="ts",
                                num_buckets=max(2, (cpus * 4) // days))

def day_ts(day_col):
    return F.to_timestamp(F.date_add(F.lit("2024-01-01"), day_col.cast("int")))

# base: conv c lives on day c % days
base = spark.range(days * rpd).select(
    F.col("id").alias("conv_id"),
    day_ts(F.col("id") % days).alias("ts"),
    F.sha2(F.col("id").cast("string"), 256).alias("text"),
    F.col("id").alias("lsn"),
    F.lit("upsert").alias("op"),
)
wal = os.path.join(root, "wal")
t0 = time.time()
write_partitioned_wal(base, wal, t)
src = PartitionedWalSource(spark, wal)
runner = CdcRunner(t, OffsetLog(os.path.join(root, "off"), "s"),
                   ManifestLog(os.path.join(root, "man")), src)
runner.run_window(0, days * rpd - 1)
load_sec = time.time() - t0

# steady state: windows of updates to keys living on the last 2 days
per = []
lsn0 = days * rpd
for w in range(windows):
    upd = spark.range(wrows).select(
        # keys on the last two days: conv ≡ days-1 or days-2 (mod days)
        ((F.col("id") * days) + (days - 1 - F.col("id") % 2)).alias("conv_id"),
        day_ts(F.lit(days) - 1 - F.col("id") % 2).alias("ts"),
        F.concat(F.lit(f"w{w}#"), F.col("id").cast("string")).alias("text"),
        (F.lit(lsn0) + F.col("id")).alias("lsn"),
        F.lit("upsert").alias("op"),
    )
    write_partitioned_wal(upd, wal, t)
    t1 = time.time()
    runner.run_window(lsn0, lsn0 + wrows - 1)
    per.append(time.time() - t1)
    lsn0 += wrows

rows = t.read(spark).count()
with open(out_path, "w") as f:
    json.dump({"load_sec": load_sec, "window_secs": per,
               "window_events_per_sec": [round(wrows / s) for s in per],
               "rows_final": rows}, f)
import shutil
shutil.rmtree(root, ignore_errors=True)
"""

if __name__ == "__main__":
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    with tempfile.NamedTemporaryFile(suffix=".py", delete=False, mode="w") as f:
        f.write(_CHILD)
        child = f.name
    try:
        subprocess.run(
            [sys.executable, child, str(DAYS), str(ROWS_PER_DAY),
             str(WINDOWS), str(WINDOW_ROWS), str(CPUS), out_path],
            check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        with open(out_path) as f:
            r = json.load(f)
    finally:
        os.unlink(child)
        os.unlink(out_path)
    print(json.dumps({
        "days": DAYS, "rows_per_day": ROWS_PER_DAY, "base_rows": DAYS * ROWS_PER_DAY,
        "windows": WINDOWS, "window_rows": WINDOW_ROWS, "cpus": CPUS, **r,
    }))
