"""Structured tracing / run-log subsystem.

The reference traces in three ways (SURVEY §5): ``mctf.sh`` appends every
dispatched command line to a ``./trace`` file, the ``trace`` wrapper logs
every external codec invocation, and ``-D DEBUG`` prints per-stage
progress.  The one-process equivalent here is a stage timer + JSON-lines
run log:

* ``stage("name")`` context manager times a pipeline stage (wall clock;
  the caller is responsible for forcing device work if it wants device
  time included — see PROFILE.md on why ``block_until_ready`` is not
  enough over a tunneled chip);
* every stage append one JSON line ``{"ts", "stage", "seconds", ...}``
  to the active :class:`RunLog` (in memory, optionally mirrored to a
  file — the ``./trace`` analogue);
* ``QSVC_TRACE=<path>`` activates file mirroring globally; the CLI's
  ``--trace`` flag does the same per invocation.

Zero overhead when no log is active.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class RunLog:
    """Collects stage records; optionally mirrors to a JSONL file."""
    path: Optional[str] = None
    records: List[Dict[str, Any]] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    def emit(self, record: Dict[str, Any]) -> None:
        record = dict(record, ts=time.time())
        with self._lock:
            self.records.append(record)
            if self.path:
                with open(self.path, "a") as f:
                    f.write(json.dumps(record) + "\n")

    def total(self, stage_name: str) -> float:
        return sum(r.get("seconds", 0.0) for r in self.records
                   if r.get("stage") == stage_name)

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            if "seconds" in r:
                out[r["stage"]] = out.get(r["stage"], 0.0) + r["seconds"]
        return out


_active: Optional[RunLog] = None


def set_run_log(log: Optional[RunLog]) -> Optional[RunLog]:
    """Install (or clear) the process-wide run log; returns the previous
    one.  ``QSVC_TRACE=<path>`` in the environment auto-installs a
    file-mirrored log on first use."""
    global _active
    prev = _active
    _active = log
    return prev


def _get() -> Optional[RunLog]:
    global _active
    if _active is None and os.environ.get("QSVC_TRACE"):
        _active = RunLog(path=os.environ["QSVC_TRACE"])
    return _active


@contextlib.contextmanager
def stage(name: str, **meta):
    """Time a pipeline stage into the active run log (no-op without one)."""
    log = _get()
    if log is None:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        log.emit({"stage": name, "seconds": time.time() - t0, **meta})
