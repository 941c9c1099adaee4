"""Incremental-run watermark store (S5, SURVEY.md §2.1).

The reference keeps a one-row ``metadata/last_run.json`` with an ISO
timestamp + status, read before ingestion (default: now - 7 days) and
rewritten on success (`wistia-Databricks notebool-02.py:190-213`).

Ours is the same contract with deterministic inputs: the "now" used for
the default lookback is injected, and writes are atomic (tmp + rename) so
a crashed run can't leave a torn watermark. Plain JSON on the local/DBFS
path — one row of metadata does not need a Spark job (the reference spins
up a full write per update; at scale the watermark store must not sit on
the job critical path).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile
from dataclasses import dataclass

DEFAULT_LOOKBACK_DAYS = 7  # `notebool-02.py:27, 202`


@dataclass
class WatermarkStore:
    path: str
    lookback_days: int = DEFAULT_LOOKBACK_DAYS

    def read(self, now: dt.datetime | None = None) -> dt.datetime:
        """Last successful run timestamp; falls back to now - lookback
        (`notebool-02.py:190-202`)."""
        try:
            with open(self.path) as f:
                doc = json.load(f)
            return dt.datetime.fromisoformat(doc["timestamp"])
        except (OSError, KeyError, ValueError):
            now = now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
            return now - dt.timedelta(days=self.lookback_days)

    def write(self, ts: dt.datetime, status: str = "success") -> None:
        """Atomically record a completed run (`notebool-02.py:204-213`)."""
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"timestamp": ts.isoformat(), "status": status}, f)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
