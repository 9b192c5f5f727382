"""Per-stream high-watermark store, incrementally maintained.

Reference analog: FROST's indexed per-stream phenomenonTime range read
(userCode/helper_classes.py:131-162) — the harvest loop asks "what is
the newest observation I already hold for stream X?" before admitting
new rows. Round 1 answered that with an aggregation over the ENTIRE
base table per batch; at a 10^10-row base that is a full scan per
harvest. This store replaces it with a tiny side table updated from
each admitted batch: cost O(batch + n_streams) per harvest,
independent of base size.

Storage: versioned parquet directories with an atomically-swapped
CURRENT pointer (the same commit discipline as LakeTable/OffsetLog).
The table holds one row per stream key — at 10^8 streams that is a few
GB of parquet, still orders of magnitude under the base. If stream
cardinality ever rivals row cardinality, the store degenerates by
design into exactly the base-aggregation it replaced — at that point
fold the watermark read into the merge's touched-bucket scan instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import _fsync_dir


class WatermarkStore:
    def __init__(self, path: str, key_col: str = "conv_id", wm_col: str = "wm"):
        self.path = path
        self.key_col = key_col
        self.wm_col = wm_col
        os.makedirs(path, exist_ok=True)

    @property
    def _ptr(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_dir(self) -> str | None:
        if not os.path.exists(self._ptr):
            return None
        with open(self._ptr) as f:
            return os.path.join(self.path, f.read().strip())

    def exists(self) -> bool:
        return self._current_dir() is not None

    def read(self, spark: SparkSession) -> DataFrame | None:
        """(key, wm) — one row per stream, or None before first update."""
        d = self._current_dir()
        if d is None:
            return None
        return spark.read.parquet(d)

    def update(self, batch_watermarks: DataFrame) -> None:
        """Fold a batch's per-key max into the store: union with the
        current state, keep max(wm) per key, write a new version, swing
        the pointer. One tiny shuffle over (store + distinct batch keys)."""
        df = batch_watermarks.select(
            F.col(self.key_col), F.col(self.wm_col)
        )
        cur = self.read(df.sparkSession)
        if cur is not None:
            df = df.unionByName(cur)
        merged = df.groupBy(self.key_col).agg(F.max(self.wm_col).alias(self.wm_col))
        vdir = f"v-{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(os.path.join(self.path, vdir))
        old = self._current_dir()
        tmp = self._ptr + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(vdir)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ptr)
        _fsync_dir(self.path)
        if old is not None and os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)
