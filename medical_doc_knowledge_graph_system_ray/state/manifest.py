"""Checkpoint manifest: per-partition lineage + metrics, atomic commits.

The reference has no checkpointing — its safety comes from idempotent
MERGE upserts (re-run = full recompute, SURVEY.md §4.1). At 10^12-doc
scale the north rule requires resume-from-last-committed-partition with
per-partition lineage + triple-count metrics. The manifest is a
directory of small JSON files, one per committed unit, each written
tmp-then-rename (atomic on POSIX); a unit is either an extraction input
shard or a finished output stage.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, unit: str) -> str:
        return os.path.join(self.dir, f"{unit}.json")

    def commit(self, unit: str, payload: dict) -> None:
        payload = {"unit": unit, "committed_at": time.time(), **payload}
        tmp = self._path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path(unit))

    def is_committed(self, unit: str) -> bool:
        return os.path.exists(self._path(unit))

    def read(self, unit: str) -> dict | None:
        try:
            with open(self._path(unit)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def invalidate(self, unit: str) -> None:
        """Drop a unit's commit (used when its recorded lineage no longer
        matches the current input assignment)."""
        try:
            os.remove(self._path(unit))
        except FileNotFoundError:
            pass

    def all_units(self) -> dict[str, dict]:
        out = {}
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.dir, f)) as fh:
                    out[f[:-5]] = json.load(fh)
        return out

    def clear(self) -> None:
        for f in os.listdir(self.dir):
            os.remove(os.path.join(self.dir, f))
