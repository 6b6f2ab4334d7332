"""Input-file planning with resume diff — the reference extractor's S3
listing discipline (/root/reference/extractor/src/extractor.rs:633-705):
periodically list the bucket, fingerprint each dump, and process only files
that are new or whose content changed; a completed file is never re-parsed
until its checksum moves.

Spark-first restatement: listing is driver-side metadata work (object-store
LIST + HEAD — the same calls Hadoop's S3A FileSystem issues; here the local
filesystem stands in). The processed-state file is the same atomic JSON
manifest pattern as the index's segment manifests. Fingerprint =
(size, sha256 of the first 64 KiB) — content-sensitive like the reference's
checksum gate, without a full-file read per listing pass.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from discogsography_spark.index.manifest import _atomic_write_json

_HEAD_BYTES = 64 * 1024


@dataclass(frozen=True)
class InputFile:
    path: str
    size: int
    fingerprint: str


def fingerprint_file(path: str) -> InputFile:
    size = os.path.getsize(path)
    h = hashlib.sha256()
    h.update(str(size).encode())
    with open(path, "rb") as f:
        h.update(f.read(_HEAD_BYTES))
    return InputFile(path=path, size=size, fingerprint=h.hexdigest())


def list_input_files(root: str, suffixes: tuple[str, ...] = (".xml.gz", ".xml", ".jsonl.xz", ".jsonl", ".parquet")) -> list[InputFile]:
    out: list[InputFile] = []
    for dirpath, _dirs, files in os.walk(root):
        for name in sorted(files):
            if name.endswith(suffixes):
                out.append(fingerprint_file(os.path.join(dirpath, name)))
    out.sort(key=lambda x: x.path)
    return out


class FilePlanner:
    """pending() = listed files minus files whose fingerprint is already
    committed. Commit AFTER the file's data is durable (send-then-commit);
    a changed fingerprint re-queues the file, mirroring the reference's
    checksum-gated re-download."""

    def __init__(self, state_path: str):
        self.state_path = state_path
        self._state: dict[str, str] = {}
        if os.path.exists(state_path):
            with open(state_path) as f:
                self._state = json.load(f)

    def pending(self, files: list[InputFile]) -> list[InputFile]:
        return [
            f
            for f in files
            if self._state.get(os.path.basename(f.path)) != f.fingerprint
        ]

    def commit(self, f: InputFile) -> None:
        self._state[os.path.basename(f.path)] = f.fingerprint
        _atomic_write_json(self.state_path, self._state)
