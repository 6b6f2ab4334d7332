"""Checkpointed segment manifests: per-partition lineage + metrics, atomic
commits, resume by diff.

Modeled on the reference extractor's StateMarker
(/root/reference/extractor/src/state_marker.rs:139-232): per-file progress
records with `records_extracted / messages_published / batches_sent`, atomic
tmp+rename writes (:213-225), resume via `pending_files()` diff (:424-432),
and the send-then-commit ordering rule — data is durable BEFORE the
completion flag is written (/root/reference/extractor/src/extractor.rs:584-600).

Layout under <index_dir>/manifest/:
    docs.json        stage-1 commit: corpus lineage + stats (N, total_tokens)
    segment-K.json   per-segment commit: lineage + metrics
    _SUCCESS.json    completion marker, written last
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field
from typing import Any


def _atomic_write_json(path: str, payload: dict[str, Any]) -> None:
    """tmp + fsync + rename — the StateMarker::save discipline
    (/root/reference/extractor/src/state_marker.rs:213-225)."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


@dataclass
class SegmentRecord:
    segment: int
    terms: int
    postings: int
    doc_blob_bytes: int
    tf_blob_bytes: int
    dl_blob_bytes: int
    head_terms: int
    committed_at: float = field(default_factory=time.time)
    status: str = "committed"


class Manifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.dir = os.path.join(index_dir, "manifest")

    # -- stage 1: docs/corpus --------------------------------------------
    def docs_path(self) -> str:
        return os.path.join(self.dir, "docs.json")

    def commit_docs(self, stats: dict[str, Any]) -> None:
        stats = dict(stats)
        stats["status"] = "committed"
        stats["committed_at"] = time.time()
        _atomic_write_json(self.docs_path(), stats)

    def docs(self) -> dict[str, Any] | None:
        p = self.docs_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- stage 2: segments ------------------------------------------------
    def segment_path(self, seg: int) -> str:
        return os.path.join(self.dir, f"segment-{seg}.json")

    def commit_segment(self, rec: SegmentRecord) -> None:
        _atomic_write_json(self.segment_path(rec.segment), asdict(rec))

    def committed_segments(self) -> set[int]:
        if not os.path.isdir(self.dir):
            return set()
        out = set()
        for name in os.listdir(self.dir):
            if name.startswith("segment-") and name.endswith(".json"):
                out.add(int(name[len("segment-") : -len(".json")]))
        return out

    def pending_segments(self, num_segments: int) -> list[int]:
        """The pending_files() analog
        (/root/reference/extractor/src/state_marker.rs:424-432)."""
        done = self.committed_segments()
        return [s for s in range(num_segments) if s not in done]

    def segment(self, seg: int) -> dict[str, Any] | None:
        p = self.segment_path(seg)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- completion --------------------------------------------------------
    def success_path(self) -> str:
        return os.path.join(self.dir, "_SUCCESS.json")

    def commit_success(self, payload: dict[str, Any]) -> None:
        payload = dict(payload)
        payload["completed_at"] = time.time()
        _atomic_write_json(self.success_path(), payload)

    def is_complete(self) -> bool:
        return os.path.exists(self.success_path())
