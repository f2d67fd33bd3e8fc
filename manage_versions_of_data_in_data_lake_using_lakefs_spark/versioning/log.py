"""Transaction-log primitives for the versioned lakehouse.

Model (lakeFS-shaped, SURVEY.md §2.9): a *commit* is an immutable snapshot
of the whole repo — a mapping ``table name → list of immutable parquet
files`` — plus parent pointers, so history is a DAG exactly like Git's.
A *branch* is a mutable ref (head commit id + staged, uncommitted table
changes). Data files are written once and never mutated; branches share
them copy-on-write, which is what makes ``branch create`` O(1) at 100 TB.

On-disk layout under the repo root:

    repo.json                      repo metadata
    refs/<branch>.json             {"head": commit_id, "staged": {...}}
    commits/<commit_id>.json       commit metadata + table→files snapshot
    data/<table>/<uuid>/*.parquet  immutable data-file directories

All metadata writes go through ``atomic_write_json`` (tmp file + rename)
so readers never observe torn state; ref updates take a per-repo lock to
serialize concurrent committers (the moral equivalent of lakeFS's
metadata server / Delta's log mutex, scoped to one writer process).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field


def new_id() -> str:
    return uuid.uuid4().hex[:16]


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


@dataclass
class Commit:
    id: str
    parents: list[str]
    message: str
    branch: str
    timestamp: float
    version: int
    tables: dict[str, list[str]]  # table -> relative data dirs/files
    meta: dict = field(default_factory=dict)
    # logical object path -> relative stored blob (lakectl-fs parity:
    # arbitrary files versioned alongside tables, README.md:79-99)
    objects: dict[str, str] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "id": self.id,
            "parents": self.parents,
            "message": self.message,
            "branch": self.branch,
            "timestamp": self.timestamp,
            "version": self.version,
            "tables": self.tables,
            "meta": self.meta,
            "objects": self.objects,
        }

    @staticmethod
    def from_json(d: dict) -> "Commit":
        return Commit(
            id=d["id"],
            parents=list(d["parents"]),
            message=d["message"],
            branch=d.get("branch", ""),
            timestamp=d["timestamp"],
            version=d["version"],
            tables={k: list(v) for k, v in d["tables"].items()},
            meta=d.get("meta", {}),
            objects=dict(d.get("objects", {})),
        )


class RepoLock:
    """Advisory lock file serializing metadata mutations within/between
    processes on one node. Commits are rare, coarse-grained events (one per
    batch write), so a simple O_EXCL spin-lock is adequate; a cluster
    deployment would swap this for an object-store conditional-put, which
    is the same protocol Delta uses for its log."""

    def __init__(self, root: str, timeout: float = 30.0):
        self.path = os.path.join(root, ".lock")
        self.timeout = timeout
        self._fd: int | None = None

    def __enter__(self):
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(self._fd, str(os.getpid()).encode())
                return self
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"could not acquire repo lock {self.path}")
                time.sleep(0.02)

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
