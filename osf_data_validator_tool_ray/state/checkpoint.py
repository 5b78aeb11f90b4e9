"""Checkpoint store — per-partition lineage + metrics records.

The reference has no checkpointing (a crashed run restarts from scratch;
SURVEY.md §4).  The engine's resume contract (north_rule): every
partition emits a lineage+metrics record and its result artifacts to a
durable store; an interrupted run resumes by skipping partitions whose
records are complete and re-merging stored partials.

Idempotency: records and artifacts are keyed by partition id and written
atomically (temp + rename), so a retried/duplicate task OVERWRITES
rather than duplicates — the merge step reads exactly one record per
partition (SURVEY.md §7.4 resume correctness).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Optional


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "records"), exist_ok=True)
        os.makedirs(os.path.join(root, "artifacts"), exist_ok=True)

    # -- records -----------------------------------------------------------

    def _record_path(self, partition_id: str) -> str:
        return os.path.join(self.root, "records", f"{partition_id}.json")

    def completed(self) -> set[str]:
        out = set()
        rec_dir = os.path.join(self.root, "records")
        for f in os.listdir(rec_dir):
            if f.endswith(".json"):
                try:
                    with open(os.path.join(rec_dir, f)) as fh:
                        if json.load(fh).get("status") == "done":
                            out.add(f[:-5])
                except (json.JSONDecodeError, OSError):
                    continue   # half-written record = not complete
        return out

    def record(self, partition_id: str, payload: dict) -> None:
        payload = dict(payload, partition_id=partition_id, ts=time.time(),
                       status=payload.get("status", "done"))
        path = self._record_path(partition_id)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, path)   # atomic

    def read_record(self, partition_id: str) -> Optional[dict]:
        try:
            with open(self._record_path(partition_id)) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None

    def records(self) -> list[dict]:
        out = []
        for pid in sorted(self.completed()):
            r = self.read_record(pid)
            if r:
                out.append(r)
        return out

    # -- artifacts (per-partition parquet dirs) ---------------------------

    def artifact_dir(self, partition_id: str, kind: str) -> str:
        return os.path.join(self.root, "artifacts", partition_id, kind)

    def publish_artifact(self, partition_id: str, kind: str, tmp_dir: str) -> str:
        """Atomically promote a temp output dir to the artifact location
        (replacing any half-written previous attempt)."""
        final = self.artifact_dir(partition_id, kind)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        if os.path.exists(final):
            shutil.rmtree(final)
        # an all-empty Dataset writes nothing at all — publish an empty dir
        # so "partition done, zero violations" is still a recorded state
        os.makedirs(tmp_dir, exist_ok=True)
        os.replace(tmp_dir, final)
        return final

    def artifact_dirs(self, kind: str) -> list[str]:
        """All published artifact dirs of a kind, one per completed
        partition (for the final merge)."""
        out = []
        for pid in sorted(self.completed()):
            d = self.artifact_dir(pid, kind)
            if os.path.isdir(d) and os.listdir(d):
                out.append(d)
        return out
