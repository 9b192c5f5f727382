"""Checkpointed offset log — the engine's high-watermark store.

Reference analog: per-stream phenomenonTime watermark persisted in the
sink and re-read at start (userCode/helper_classes.py:131-162,
T2 in SURVEY.md), with the exclusive restart bound of
userCode/wrd/dag.py:189-197 (+1 minute past the stored watermark ->
here: resume from last_lsn + 1). Absent stream -> epoch
(START_OF_DATA, userCode/wrd/types.py:290) -> here: LSN -1.

Implemented as an append-only JSONL log with an atomically-replaced
CURRENT pointer — same commit discipline as LakeTable. Tiny metadata,
driver-side by design (it is the analog of a streaming
checkpointLocation, not a data table).
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

from ..lake.table import _fsync_dir


class OffsetLog:
    def __init__(self, path: str, source_id: str = "default"):
        self.path = path
        self.source_id = source_id
        os.makedirs(path, exist_ok=True)

    @property
    def _ptr(self) -> str:
        return os.path.join(self.path, f"CURRENT-{self.source_id}")

    def last_lsn(self) -> int:
        """High-watermark; -1 when no batch has ever committed."""
        if not os.path.exists(self._ptr):
            return -1
        with open(self._ptr) as f:
            return json.load(f)["last_lsn"]

    def resume_lsn(self) -> int:
        """Exclusive restart bound: first LSN of the next window."""
        return self.last_lsn() + 1

    def commit(self, last_lsn: int, batch_id: str) -> None:
        entry = {
            "source_id": self.source_id,
            "last_lsn": int(last_lsn),
            "batch_id": batch_id,
            "committed_at": datetime.now(timezone.utc).isoformat(),
        }
        with open(os.path.join(self.path, f"log-{self.source_id}.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
            f.flush()
            os.fsync(f.fileno())
        tmp = self._ptr + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._ptr)
        _fsync_dir(self.path)

    def history(self) -> list[dict]:
        log = os.path.join(self.path, f"log-{self.source_id}.jsonl")
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return [json.loads(line) for line in f if line.strip()]
