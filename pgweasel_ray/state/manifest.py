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


class RunLock:
    """Exclusive-writer lock for one output root: two drivers resuming the
    same out_dir must not interleave shard rebuilds + manifest commits
    (each would hold its own in-memory entries and the last _save wins,
    resurrecting or dropping the other's commits). O_CREAT|O_EXCL
    lockfile holding the owner pid; the loser BLOCKS, then resumes against
    the winner's committed manifest (so both callers return a complete
    view). A lock whose recorded pid is dead is stale (crashed driver) and
    is stolen — the read-check-unlink steal has a tiny race window, which
    only two drivers BOTH stealing a third crashed driver's lock can hit;
    the O_EXCL create after it still admits exactly one winner, the other
    re-loops."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._held = False

    def acquire(self, timeout_s: float = 600.0, poll_s: float = 0.1):
        deadline = time.monotonic() + timeout_s
        self.path.parent.mkdir(parents=True, exist_ok=True)
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                self._held = True
                return self
            except FileExistsError:
                try:
                    pid = int(self.path.read_text() or "0")
                except (ValueError, OSError):
                    pid = 0
                if pid and not _pid_alive(pid):
                    try:
                        self.path.unlink()
                    except FileNotFoundError:
                        pass
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"route lock {self.path} held by pid {pid}"
                    )
                time.sleep(poll_s)

    def release(self) -> None:
        if self._held:
            self._held = False
            try:
                self.path.unlink()
            except FileNotFoundError:
                pass

    def __enter__(self):
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


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
