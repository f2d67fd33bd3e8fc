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

**Consistency model (r5)**: correctness of ref updates no longer rests
on the lock alone — every ref publish goes through a *generation-fenced
compare-and-swap* (``cas_replace_ref``): a ref carries a monotonically
increasing ``gen``; a writer that read generation g may publish g+1 only
after exclusively claiming the (branch, g+1) fence file via ``link(2)``
— atomic on local filesystems AND on NFS (the classic NFS-safe
exclusive-create primitive, which ``O_EXCL`` alone historically is not).
Two writers that both read g race for one fence; the loser gets
``CommitConflictError`` (retryable: re-read, re-apply) instead of
silently clobbering the winner's publish. ``RepoLock`` remains the
fast-path serializer:

- same host: lock serializes writers; the CAS never conflicts.
- cross host, default: lock acquisition raises ``DistributedWriterError``
  (strict tripwire — no cross-host writers at all).
- cross host, ``LAKEGRAFT_MULTIHOST=optimistic``: the lock spins like
  same-host contention and the CAS fence arbitrates — lost races
  surface as ``CommitConflictError``, never as lost updates.

Recovery epsilon: a claimant that crashes between fence and publish
leaves an orphaned fence; a later writer (ref gen not advanced, fence
older than ``grace`` seconds) reclaims it. A LIVE writer stalled longer
than ``grace`` between those two adjacent metadata writes could then be
clobbered — the standard lease-without-storage-fencing caveat; raise
``grace`` if your metadata filesystem can stall that long. Object-store
deployments should map the fence claim onto conditional-put
(If-None-Match) and inherit exactly this protocol.
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


# ---------------------------------------------------------------------------
# manifest spill: bounded commit metadata at any table size
# ---------------------------------------------------------------------------
#
# A commit JSON stores the FULL table→entries snapshot (what makes head
# resolution O(1)); naively that means every commit re-serializes every
# table's whole entry list — at 100 TB (thousands of append dirs +
# pruned-DML part-file entries per table) commit metadata writes become
# O(total files) each, the exact failure mode Delta's checkpoint/delta-log
# split exists to avoid. The spill keeps the snapshot-per-commit model but
# bounds the inline cost: an entry list longer than
# ``MANIFEST_SPILL_THRESHOLD`` is stored once as a content-addressed
# manifest file (``manifests/<sha>.json``) and the commit holds a pointer
# entry ``{"manifest": rel, "n": k}`` plus an inline tail of recent
# appends. Consequences:
#
# - unchanged tables cost ONE pointer line per commit, shared by every
#   commit at that snapshot (content addressing dedups across branches,
#   reverts, and merges for free);
# - appends extend the inline tail (O(delta) metadata per commit); when
#   the tail itself exceeds the threshold the list folds into a fresh
#   manifest — amortized O(n/threshold) entries written per commit;
# - rewrites fold immediately (the list no longer extends the parent's).
#
# Expansion happens in exactly one place — ``LakeRepo.get_commit`` — so
# every consumer (diff, vacuum walk, streaming source, SQL surface) keeps
# seeing plain entry lists. Only the raw-JSON writers/readers here and
# the vacuum's manifest-pruning scan ever see pointer entries.

MANIFEST_DIR = "manifests"
MANIFEST_SPILL_THRESHOLD = 32


def is_manifest_ptr(entry) -> bool:
    return isinstance(entry, dict) and "manifest" in entry


def write_manifest(root: str, entries: list) -> dict:
    """Store ``entries`` as a content-addressed manifest, returning the
    pointer entry. Idempotent: an existing manifest with the same content
    hash is reused (same-snapshot commits share one file)."""
    import hashlib

    payload = json.dumps(entries, sort_keys=True, separators=(",", ":"))
    h = hashlib.sha256(payload.encode()).hexdigest()[:32]
    rel = f"{MANIFEST_DIR}/{h}.json"
    path = os.path.join(root, rel)
    if not os.path.exists(path):
        os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
        atomic_write_json(path, {"entries": entries})
    return {"manifest": rel, "n": len(entries)}


def expand_entries(root: str, entries: list, cache: dict | None = None) -> list[str]:
    """Resolve manifest pointers back to the plain entry list. A missing
    manifest file is metadata corruption (vacuum never prunes referenced
    manifests) and raises loudly."""
    if not any(is_manifest_ptr(e) for e in entries):
        return list(entries)
    out: list[str] = []
    for e in entries:
        if not is_manifest_ptr(e):
            out.append(e)
            continue
        rel = e["manifest"]
        sub = cache.get(rel) if cache is not None else None
        if sub is None:
            try:
                sub = read_json(os.path.join(root, rel))["entries"]
            except OSError as exc:
                raise FileNotFoundError(
                    f"commit references manifest {rel} which is missing on "
                    f"disk — metadata corruption (manifests are only pruned "
                    f"when no commit references them)"
                ) from exc
            if cache is not None:
                cache[rel] = sub
        out.extend(sub)
    return out


def spill_entries(
    root: str, entries: list[str], parent_raw: list | None, cache: dict | None = None
) -> list:
    """JSON form for one table's (expanded) entry list: inline below the
    threshold; otherwise extend the parent's manifest pointer with an
    inline tail, folding into a fresh manifest when the tail outgrows the
    threshold or the list no longer extends the parent's."""
    if len(entries) <= MANIFEST_SPILL_THRESHOLD:
        return list(entries)
    if parent_raw and is_manifest_ptr(parent_raw[0]):
        ptr = parent_raw[0]
        covered = expand_entries(root, [ptr], cache)
        k = len(covered)
        if entries[:k] == covered:
            tail = entries[k:]
            if len(tail) <= MANIFEST_SPILL_THRESHOLD:
                return [ptr, *tail]
    return [write_manifest(root, list(entries))]


class CommitConflictError(RuntimeError):
    """An optimistic (generation-fenced) ref update lost to a concurrent
    writer: someone else claimed this generation's fence or already
    published past it. RETRYABLE — re-read the branch and re-apply the
    mutation (staged pointers re-merge; a commit re-reads its parent).
    Raised instead of silently clobbering the winner's publish — the
    lost-update anomaly this protocol exists to prevent."""


def cas_replace_ref(
    path: str,
    fence_dir: str,
    branch: str,
    expect_gen: int,
    payload: dict,
    grace: float = 60.0,
) -> None:
    """Generation-fenced compare-and-swap publish of a ref file.

    Claims the (branch, expect_gen + 1) fence by ``link(2)`` — atomic
    exclusive-create even on NFS — then ``os.replace``s the ref with
    ``payload`` carrying ``gen = expect_gen + 1``. Claim success proves
    no other writer ever advanced the ref past ``expect_gen`` (gens are
    claimed monotonically and fences persist), so the replace cannot
    clobber a newer publish. Claim failure is disambiguated by
    re-reading the ref:

    - ref gen already past the claim → ``CommitConflictError`` (lost);
    - ref gen unchanged, fence younger than ``grace`` → a live writer is
      mid-publish → ``CommitConflictError`` (retry shortly);
    - ref gen unchanged, fence older than ``grace`` (or the ref file is
      gone — a deleted/recreated branch) → orphaned claim from a crashed
      writer: reclaim once.
    """
    import socket

    payload = dict(payload)
    payload["gen"] = expect_gen + 1
    os.makedirs(fence_dir, exist_ok=True)
    fence = os.path.join(fence_dir, f"{branch}.gen-{expect_gen + 1}")
    for attempt in (0, 1):
        tmp = os.path.join(fence_dir, f".claim.{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(f"{socket.gethostname()}:{os.getpid()}")
        try:
            os.link(tmp, fence)
            break
        except FileExistsError:
            try:
                cur_gen = int(read_json(path).get("gen", 0))
            except (OSError, ValueError):
                cur_gen = None  # ref unreadable/deleted → fence is garbage
            if cur_gen is not None and cur_gen > expect_gen:
                raise CommitConflictError(
                    f"ref {branch!r} advanced to gen {cur_gen} while this "
                    f"writer held gen {expect_gen}; re-read and retry"
                ) from None
            try:
                age = time.time() - os.stat(fence).st_mtime
            except OSError:
                age = grace + 1.0  # fence vanished between claim and stat
            if attempt == 0 and (cur_gen is None or age > grace):
                try:
                    os.unlink(fence)  # orphaned claim: crashed mid-publish
                except FileNotFoundError:
                    pass
                continue
            raise CommitConflictError(
                f"fence for {branch!r} gen {expect_gen + 1} is held by a "
                "mid-publish writer; retry shortly"
            ) from None
        finally:
            os.unlink(tmp)
    # verify-after-claim: with fences alone, claim success proves the ref
    # never advanced past expect_gen ONLY while every historical fence
    # still exists; vacuum prunes superseded fences, so a sufficiently
    # stale writer could claim a recycled generation. Re-reading the ref
    # here closes that hole — on mismatch the claim is abandoned (the
    # fence left behind is itself superseded garbage vacuum prunes).
    try:
        cur_gen = int(read_json(path).get("gen", 0))
    except (OSError, ValueError):
        cur_gen = expect_gen  # fresh branch: ref not born yet
    if cur_gen != expect_gen:
        raise CommitConflictError(
            f"ref {branch!r} advanced to gen {cur_gen} before this writer's "
            f"claim of gen {expect_gen + 1}; re-read and retry"
        )
    atomic_write_json(path, payload)


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

    **Single-writer-node contract (default)**: all committing processes
    must share one local filesystem view of the repo root. The lock file
    records ``host:pid``; contention from a different hostname raises
    ``DistributedWriterError`` immediately (no spin-until-timeout).

    **Optimistic multi-host mode** (``LAKEGRAFT_MULTIHOST=optimistic``):
    cross-host contention spins like same-host contention; correctness
    then rests on the generation-fenced CAS every ref publish goes
    through (``cas_replace_ref``) — a cross-host race the lock failed to
    exclude surfaces as a retryable ``CommitConflictError``, never as a
    lost update. See the module docstring for the full model."""

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
                if (
                    holder is not None
                    and holder[0] != me
                    and os.environ.get("LAKEGRAFT_MULTIHOST") != "optimistic"
                ):
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
