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
metadata server / Delta's log mutex).

**Known limit — single writer node**: ``RepoLock`` serializes any number
of writer processes on ONE machine, which matches the deployment here (a
Spark driver coordinates all commits; executors only write data files,
never metadata). It is NOT a cross-machine mutex; concurrent drivers on
different hosts raise ``DistributedWriterError`` instead of corrupting
the refs — swapping in an object-store conditional-put or lock service
at that one seam is the cluster-deployment path.
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


class DistributedWriterError(RuntimeError):
    """A writer on ANOTHER host holds (or held) the repo lock.

    ``RepoLock`` is an O_EXCL lock file: correct for any number of writer
    processes on ONE node (or one coordinating driver), but NOT a
    cross-machine mutex — O_EXCL is not atomic on NFS-style shared
    filesystems and object stores have no lock file at all. Multi-driver
    deployments need a real arbiter: an object-store conditional-put
    (Delta's log protocol) or a lock service (what lakeFS's metadata
    server provides). Rather than risk silent metadata corruption, lock
    acquisition fails loudly when the holder's hostname differs.

    The hostname check is a best-effort tripwire, not an enforcement
    mechanism: two machines that happen to share a hostname (e.g.
    unconfigured container replicas) mounting the same network
    filesystem bypass it — the single-writer-node CONTRACT still holds
    and is the deployer's responsibility; conversely, a host rename
    between writer runs can trip it spuriously (delete the stale .lock
    after confirming no writer is alive)."""


class RepoLock:
    """Advisory lock file serializing metadata mutations within/between
    processes on ONE node. Commits are rare, coarse-grained events (one per
    batch write), so a simple O_EXCL spin-lock is adequate.

    **Single-writer-node contract**: all committing processes must share
    one local filesystem view of the repo root. The lock file records
    ``host:pid``; contention from a different hostname raises
    ``DistributedWriterError`` immediately (no spin-until-timeout) —
    see that exception for the cluster-deployment story."""

    def __init__(self, root: str, timeout: float = 30.0):
        self.path = os.path.join(root, ".lock")
        self.timeout = timeout
        self._fd: int | None = None

    def _holder(self) -> tuple[str, str] | None:
        """(host, pid) of the current holder, None if unreadable/empty
        (racing with the holder's write — treat as unknown, keep spinning)."""
        try:
            with open(self.path) as f:
                host, _, pid = f.read().partition(":")
        except OSError:
            return None
        return (host, pid) if host and pid else None

    def __enter__(self):
        import socket

        me = socket.gethostname()
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(self._fd, f"{me}:{os.getpid()}".encode())
                return self
            except FileExistsError:
                holder = self._holder()
                if holder is not None and holder[0] != me:
                    raise DistributedWriterError(
                        f"repo lock {self.path} is held by {holder[0]}:{holder[1]} "
                        f"(this host: {me}). RepoLock only serializes writers on "
                        "one node — concurrent multi-host writers need an "
                        "external arbiter (object-store conditional-put or a "
                        "lock service); see DistributedWriterError."
                    )
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
