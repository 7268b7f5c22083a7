"""Structured jsonl results IO + restartable campaign bookkeeping.

SURVEY.md §5 (metrics/observability, checkpoint/resume): every sweep point
appends one json line {ebno_db, ber, fer, trials, ...}; completed blocks are
recorded so a restarted campaign skips them and reproduces identical final
counters (fault-injection test in tests/test_campaign.py).  Only process 0
writes (single-writer rule, §5 race-detection note).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, Optional


def append_jsonl(path: str, record: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")


def read_jsonl(path: str) -> Iterator[Dict[str, Any]]:
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


class CampaignState:
    """Restartable per-point counters keyed by (point_idx, block_idx).

    The journal is append-only jsonl; on restart, completed blocks are
    replayed into counters and skipped by the driver, so a crash mid-block
    costs only that block (SURVEY.md §5 failure-detection design).
    """

    def __init__(self, journal_path: Optional[str]):
        self.journal_path = journal_path
        self.done: Dict[tuple, Dict[str, Any]] = {}
        if journal_path:
            for rec in read_jsonl(journal_path):
                if rec.get("kind") == "block":
                    self.done[(rec["point"], rec["block"])] = rec

    def is_done(self, point: int, block: int) -> bool:
        return (point, block) in self.done

    def block_record(self, point: int, block: int) -> Dict[str, Any]:
        return self.done[(point, block)]

    def record_block(self, point: int, block: int, counters: Dict[str, Any],
                     is_proc0: bool = True) -> None:
        rec = dict(kind="block", point=point, block=block, **counters)
        self.done[(point, block)] = rec
        if self.journal_path and is_proc0:
            append_jsonl(self.journal_path, rec)
