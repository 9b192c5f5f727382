"""Queryable table-metadata frames (Iceberg metadata-tables analog).

``SELECT * FROM t.files / t.history / t.partitions`` recast as
``table.metadata_df(spark, kind)``: small driver-built DataFrames a
user joins/filters with ordinary Spark SQL to answer operational
questions ("which buckets carry delta debt", "when did row counts
jump", "how big is the tombstone tail") without touching data files.

Everything comes from snapshot manifests plus os.stat — zero
data-file I/O. Scale note: these frames are bounded by METADATA
cardinality (files, snapshots, buckets), which the maintenance
policy itself keeps bounded; at 100 TB they are thousands of rows,
not billions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _stat(path: str) -> tuple[int | None, float | None]:
    try:
        st = os.stat(path)
        return st.st_size, st.st_mtime
    except OSError:
        return None, None


def build_metadata_df(spark: SparkSession, table, kind: str) -> DataFrame:
    if kind == "files":
        snap = table.snapshot()
        rows = []
        for field, fkind in (
            ("files", "base"),
            ("deltas", "delta"),
            ("tombstones", "tombstone"),
        ):
            for b, fl in (snap.get(field) or {}).items():
                for p in fl:
                    size, mtime = _stat(p)
                    rows.append((int(b), fkind, p, size, mtime))
        return spark.createDataFrame(
            rows,
            "bucket int, kind string, path string, size_bytes long, "
            "modified_at double",
        )
    if kind == "history":
        rows = []
        for snap in table.history():
            s = snap.get("summary") or {}
            rows.append(
                (
                    snap["version"],
                    snap.get("parent"),
                    snap.get("committed_at"),
                    s.get("operation"),
                    s.get("rows_inserted"),
                    s.get("rows_updated"),
                    s.get("rows_deleted"),
                    snap.get("num_buckets"),
                    sum(len(fl) for fl in (snap.get("files") or {}).values()),
                    sum(len(fl) for fl in (snap.get("deltas") or {}).values()),
                    sum(
                        len(fl)
                        for fl in (snap.get("tombstones") or {}).values()
                    ),
                )
            )
        return spark.createDataFrame(
            rows,
            "version int, parent int, committed_at double, operation string, "
            "rows_inserted long, rows_updated long, rows_deleted long, "
            "num_buckets int, base_files int, delta_files int, "
            "tombstone_files int",
        )
    if kind == "partitions":
        snap = table.snapshot()
        rc = snap.get("row_counts") or {}
        rows = []
        for b in range(snap["num_buckets"]):
            key = str(b)
            rows.append(
                (
                    b,
                    rc.get(key, 0),
                    len((snap.get("files") or {}).get(key, [])),
                    len((snap.get("deltas") or {}).get(key, [])),
                    len((snap.get("tombstones") or {}).get(key, [])),
                )
            )
        return spark.createDataFrame(
            rows,
            "bucket int, rows_base long, base_files int, delta_files int, "
            "tombstone_files int",
        )
    raise ValueError(
        f"unknown metadata kind {kind!r}: expected files/history/partitions"
    )
