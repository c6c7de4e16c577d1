"""Checkpoint manifest: per-partition lineage + row-count metrics.

The reference has no resume story (a failed run reruns from scratch —
SURVEY.md §4); the north_rule requires idempotent resume, so every routed
output partition records: which input fragments produced it, how many rows it
holds, and its wall time. A rerun skips partitions whose manifest entry is
``done`` AND whose output directory still exists; everything else is
recomputed. Writes are atomic (temp file + ``os.replace``) so a crash
mid-update never corrupts the manifest — a partition is either committed or
it is not.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any


class Manifest:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.entries: dict[str, dict[str, Any]] = {}
        if self.path.exists():
            self.entries = json.loads(self.path.read_text())

    def is_done(self, partition: str, output_dir: str | Path | None = None) -> bool:
        e = self.entries.get(partition)
        if not e or e.get("status") != "done":
            return False
        if output_dir is not None and not Path(output_dir).exists():
            return False
        return True

    def commit(
        self,
        partition: str,
        *,
        rows: int,
        inputs: list[str],
        wall_s: float,
        extra: dict[str, Any] | None = None,
    ) -> None:
        self.entries[partition] = {
            "status": "done",
            "rows": int(rows),
            "inputs": list(inputs),
            "wall_s": round(wall_s, 3),
            "committed_at": time.time(),
            **(extra or {}),
        }
        self._save()

    def _save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self.entries, indent=1, sort_keys=True))
        os.replace(tmp, self.path)

    def total_rows(self) -> int:
        return sum(e.get("rows", 0) for e in self.entries.values()
                   if e.get("status") == "done")
