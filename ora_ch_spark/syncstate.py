"""Incremental sync state — the persistent watermark store.

The reference keeps incremental-load state in its metadata layer
(the CH-side max probe ``MaxValAndCnt`` re-read each run,
``jdbsChSession.scala:93-121``; the update-path max-column reuse
``:101-106``). Here the state is explicit: a small JSON file per
(schema, table) under the store root recording the last processed
watermark per column — written only after a successful apply, so a
failed run re-processes (at-least-once, idempotent because O5
updates are keyed overwrites).
"""

from __future__ import annotations

import json
import os
import uuid


class SyncState:
    def __init__(self, root: str):
        self.root = os.path.join(root, "_sync_state")
        os.makedirs(self.root, exist_ok=True)

    @staticmethod
    def _safe(name: str) -> str:
        # dots/slashes in identifiers must not alias state files or
        # escape the state root
        return "".join(c if c.isalnum() or c in "_-" else f"_{ord(c):02x}_" for c in name)

    def _path(self, schema: str, table: str) -> str:
        return os.path.join(self.root, f"{self._safe(schema)}__{self._safe(table)}.json")

    def get_watermark(self, schema: str, table: str, column: str):
        p = self._path(schema, table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f).get(column)

    def set_watermark(self, schema: str, table: str, column: str, value) -> None:
        p = self._path(schema, table)
        state = {}
        if os.path.exists(p):
            with open(p) as f:
                state = json.load(f)
        state[column] = value
        tmp = f"{p}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            # ints/floats round-trip natively; timestamps/decimals
            # become their str() form, which Spark coerces back in the
            # `col > lit(mark)` comparison (decimals with >15
            # significant digits lose sub-double precision at the
            # boundary — documented limit; prefer integer/timestamp
            # watermark columns)
            json.dump(state, f, default=str)
        os.replace(tmp, p)  # atomic
