"""Idempotent commit manifests — the exactly-once ledger.

Reference analog: deterministic ids + the sink's duplicate-id
rejection (userCode/util.py:30-37 deterministic_hash;
userCode/wrd/test_frost.py:28-53 duplicate insert -> 500 treated as
"already there", userCode/groundwater/dag.py:62-148). Here the
deterministic id is a content hash of the offset window, and
"replaying a committed batch_id is a no-op" (FIXTURES.md section 4).

Commit ordering for exactly-once across target + metadata without a
cross-table transaction (SURVEY.md section 7.3 hard part (a)):

    1. manifest row -> status=pending            (intent)
    2. LakeTable.merge                           (idempotent: LSN guard)
    3. manifest row -> status=committed + metrics
    4. offset log commit

Crash between 2 and 3/4: restart sees pending -> re-runs the merge,
which the per-row LSN guard makes a no-op. Crash after 4: restart
skips the window entirely (offset filter). Both failure windows are
replay-safe.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from datetime import datetime, timezone

from ..lake.table import _fsync_dir


def batch_id_for_window(source_id: str, lsn_lo: int, lsn_hi: int) -> str:
    """Deterministic id of an offset window (reference: md5-derived
    deterministic ids, userCode/util.py:30-37)."""
    return hashlib.md5(f"{source_id}:{lsn_lo}:{lsn_hi}".encode()).hexdigest()[:18]


class ManifestLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, batch_id: str) -> str:
        return os.path.join(self.path, f"manifest-{batch_id}.json")

    def status(self, batch_id: str) -> str | None:
        p = self._file(batch_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["status"]

    def is_committed(self, batch_id: str) -> bool:
        return self.status(batch_id) == "committed"

    def _write(self, batch_id: str, doc: dict) -> None:
        tmp = self._file(batch_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(doc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._file(batch_id))
        _fsync_dir(self.path)

    def begin(self, batch_id: str, lsn_lo: int, lsn_hi: int) -> None:
        self._write(
            batch_id,
            {
                "batch_id": batch_id,
                "status": "pending",
                "lineage": f"[{lsn_lo},{lsn_hi}]",
                "started_at": datetime.now(timezone.utc).isoformat(),
            },
        )

    def commit(self, batch_id: str, metrics: dict) -> None:
        with open(self._file(batch_id)) as f:
            doc = json.load(f)
        doc.update(
            status="committed",
            metrics=metrics,
            committed_at=datetime.now(timezone.utc).isoformat(),
        )
        self._write(batch_id, doc)

    def read(self, batch_id: str) -> dict | None:
        p = self._file(batch_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def all(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(self.path, name)) as f:
                    out.append(json.load(f))
        return out
