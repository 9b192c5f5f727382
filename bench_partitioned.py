"""Measured datapoint: time-partitioned vs flat apply at steady state.

The claim under test (DESIGN.md §15, `lake/partitioned.py`): with a
leading days(ts) partition, steady-state CDC apply cost scales with
the ACTIVE time window, not table age — a batch touching the last 2
days of a D-day table opens 2 children's buckets, while the flat
bucketed layout hashes the same keys across EVERY bucket and the COW
resolve rescans the whole touched-bucket base (≈ the whole table).

Setup: D days × R rows/day of (day, conv_id)-keyed history (the
non-global-index identity, so both layouts compute identical state),
then ONE update batch over the last 2 days. Flat = LakeTable keyed
(day, conv_id); partitioned = PartitionedLakeTable partition_col=ts.
Same data, same result, different physical routing.

Discipline per BENCH.md: subprocess isolation per variant, file-backed
output, warmup write in-process, best-of-N, scan/shuffle evidence from
the UI REST API.

Usage: python bench_partitioned.py            # 16 days x 500k, local[8]
       PT_DAYS=32 PT_ROWS_PER_DAY=250000 PT_CPUS=8 python bench_partitioned.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

DAYS = int(os.environ.get("PT_DAYS", "16"))
ROWS_PER_DAY = int(os.environ.get("PT_ROWS_PER_DAY", "500000"))
BATCH_DAYS = int(os.environ.get("PT_BATCH_DAYS", "2"))
CPUS = int(os.environ.get("PT_CPUS", "8"))
REPEATS = int(os.environ.get("PT_REPEATS", "2"))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())  # child runs with cwd = repo root
from oregonwaterdataportal_etl_spark.session import get_spark
from pyspark.sql import functions as F, types as T

variant, days, rpd, batch_days, cpus, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    int(sys.argv[5]), sys.argv[6])

spark = get_spark(app_name=f"bench_pt_{variant}",
                  master=f"local[{cpus}]", shuffle_partitions=cpus * 4,
                  extra_conf={"spark.ui.enabled": "true"})  # byte evidence

import tempfile
root = tempfile.mkdtemp(prefix=f"bench_pt_{variant}_")

def stream(day_lo, day_hi, lsn_base):
    n = (day_hi - day_lo) * rpd
    return spark.range(n).select(
        (F.col("id") % rpd).alias("conv_id"),
        F.to_timestamp(F.date_add(F.lit("2024-01-01"),
            (day_lo + (F.col("id") / rpd).cast("int")).cast("int"))).alias("ts"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        (F.lit(lsn_base) + F.col("id")).alias("lsn"),
        F.lit("upsert").alias("op"),
    )

SCHEMA = T.StructType([
    T.StructField("day", T.StringType()),
    T.StructField("conv_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("text", T.StringType()),
])
NB = cpus * 4

base = stream(0, days, 0)
tail = stream(days - batch_days, days, days * rpd)  # updates, higher lsn

def shuffle_bytes():
    import urllib.request
    b = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{b}/api/v1/applications/{app}/stages?status=complete",
            timeout=10) as r:
            st = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in st)
    except Exception:
        return -1

def data_files(t):
    # every live base data file -> COW rewrite evidence via diff
    if hasattr(t, "partitions"):
        out = set()
        for v in t.partitions():
            for fs in t.partition_table(v).snapshot()["files"].values():
                out.update(fs)
        return out
    return {f for fs in t.snapshot()["files"].values() for f in fs}

if variant == "flat":
    from oregonwaterdataportal_etl_spark.lake import LakeTable
    t = LakeTable.create(os.path.join(root, "t"), SCHEMA,
                         key_cols=["day", "conv_id"], num_buckets=NB)
    t.merge(base.withColumn("day", F.date_format("ts", "yyyy-MM-dd")))
    before = data_files(t)
    sh0 = shuffle_bytes()
    t0 = time.time()
    t.merge(tail.withColumn("day", F.date_format("ts", "yyyy-MM-dd")))
    wall = time.time() - t0
else:
    from oregonwaterdataportal_etl_spark.lake import PartitionedLakeTable
    PSCHEMA = T.StructType([f for f in SCHEMA.fields if f.name != "day"])
    t = PartitionedLakeTable.create(os.path.join(root, "t"), PSCHEMA,
                                    key_cols=["conv_id"], partition_col="ts",
                                    num_buckets=max(2, NB // days))
    t.merge(base)
    before = data_files(t)
    sh0 = shuffle_bytes()
    t0 = time.time()
    t.merge(tail)
    wall = time.time() - t0

sh1 = shuffle_bytes()
after = data_files(t)
rewritten = after - before          # files the COW apply had to write
retained = len(after & before)      # files it left alone
rw_bytes = sum(os.path.getsize(p) for p in rewritten if os.path.exists(p))
rows = t.read(spark).count()
with open(out_path, "w") as f:
    json.dump({"variant": variant, "apply_sec": wall, "rows": rows,
               "files_rewritten": len(rewritten),
               "files_retained": retained,
               "rewritten_bytes": rw_bytes,
               "apply_shuffle_bytes": sh1 - sh0}, f)
import shutil
shutil.rmtree(root, ignore_errors=True)
"""


def run(variant: str) -> dict:
    best = None
    for _ in range(REPEATS):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            out_path = f.name
        with tempfile.NamedTemporaryFile(
            suffix=".py", delete=False, mode="w"
        ) as f:
            f.write(_CHILD)
            child = f.name
        try:
            subprocess.run(
                [sys.executable, child, variant, str(DAYS), str(ROWS_PER_DAY),
                 str(BATCH_DAYS), str(CPUS), out_path],
                check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            with open(out_path) as f:
                r = json.load(f)
            if best is None or r["apply_sec"] < best["apply_sec"]:
                best = r
        finally:
            os.unlink(child)
            os.unlink(out_path)
    return best


if __name__ == "__main__":
    flat = run("flat")
    part = run("partitioned")
    print(json.dumps({
        "days": DAYS, "rows_per_day": ROWS_PER_DAY,
        "batch_days": BATCH_DAYS, "cpus": CPUS, "repeats": REPEATS,
        "flat": flat, "partitioned": part,
        "apply_speedup": round(flat["apply_sec"] / part["apply_sec"], 2),
        "rewrite_bytes_ratio": round(
            flat["rewritten_bytes"] / max(1, part["rewritten_bytes"]), 2),
        "shuffle_bytes_ratio": (
            round(flat["apply_shuffle_bytes"]
                  / max(1, part["apply_shuffle_bytes"]), 2)
            if flat["apply_shuffle_bytes"] >= 0
            and part["apply_shuffle_bytes"] >= 0 else None),
    }))
