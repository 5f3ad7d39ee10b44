"""Commit-log storage backends for the snapshot sink (VERDICT r12 #2).

The snapshot sink's correctness rests on exactly three atomicity
primitives: a create-exclusive publish (the commit point — single winner
per version), a last-writer-wins pointer write (the tip hint), and an
existence probe (tip resolution). `sinks/manifest.py` used to implement
all three directly with POSIX calls (`os.link` create-exclusive,
`os.replace`, `os.path.exists`) — primitives that DO NOT EXIST on the
object stores real lakes live on (the reference's lake is S3:
infrastructure/infrastructure.md:386-390; every reference job writes
`s3a://` paths, processing/spark/jobs/streaming_to_curated_stream.py:91-98).

This module extracts the primitives behind `CommitStore`, so the sink's
commit protocol is storage-agnostic:

* `PosixCommitStore` — the default. Create-exclusive via hard link of a
  fsync'd temp file (atomic on every POSIX filesystem), pointer writes
  via `os.replace`.
* `ConditionalPutCommitStore` — the object-store shape: everything is
  whole-object GET/PUT/LIST/DELETE, and the commit point is a
  conditional PUT (S3 `If-None-Match: *`, GCS `x-goog-if-generation-
  match: 0`, Azure `If-None-Match: *`). Subclasses implement five small
  `_backend_*` hooks; the class supplies the CommitStore surface on top.
* `MemoryCommitStore` — a `ConditionalPutCommitStore` over an in-process
  dict guarded by a lock: the reference semantics of an S3-style backend
  (read-after-write consistent, conditional PUT atomic server-side, NO
  rename, NO link, NO partial writes) and the test double that proves
  the sink never smuggles a POSIX assumption past the interface
  (tests/test_commit_store.py runs the racing-committer suite on it).

Scope: ONLY the metadata log (`_manifests/`, `_checkpoints/`, the tip
hint) goes through a CommitStore — log objects are a few KB of JSON and
every read/write happens driver-side in Python. Data files stay on
whatever filesystem Spark writes them to: staged parquet is immutable
once written and becomes visible only via the log, so data-file PUTs
need no atomicity beyond "complete object or absent" — which plain S3
multipart PUT already provides.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from abc import ABC, abstractmethod


class CommitStore(ABC):
    """Atomicity primitives for a table's commit log.

    Paths are plain strings in the same namespace the sink uses for the
    table (the POSIX store treats them as filesystem paths; an object
    store treats them as keys). All objects are small JSON blobs written
    whole — there is no partial read/write in this interface, so every
    backend that offers whole-object PUT with a not-exists precondition
    can implement it."""

    @abstractmethod
    def put_if_absent(self, path: str, data: bytes) -> bool:
        """THE commit point: publish `data` at `path` iff nothing exists
        there. Exactly one of N racing callers returns True; the others
        return False having changed nothing. Must be atomic — a reader
        never observes a partial object."""

    @abstractmethod
    def put(self, path: str, data: bytes) -> None:
        """Last-writer-wins whole-object write (the tip-hint pointer).
        Atomic per object, no ordering guarantee between racers."""

    @abstractmethod
    def get(self, path: str) -> bytes | None:
        """The object's bytes, or None if absent."""

    @abstractmethod
    def exists(self, path: str) -> bool:
        """Existence probe (tip resolution). Must see every completed
        put_if_absent — read-after-write consistency, which S3 has
        guaranteed since 2020."""

    @abstractmethod
    def delete(self, path: str) -> None:
        """Remove the object; absent is not an error (vacuum replays)."""

    @abstractmethod
    def list(self, dirpath: str) -> list[str]:
        """Immediate child object names under `dirpath` (no recursion),
        sorted; [] when the prefix is empty. The sink's slow-path tip
        fallback and vacuum's sweep — never on the steady-state path."""

    @abstractmethod
    def fingerprint(self, path: str) -> object | None:
        """A token that differs whenever the object at `path` might hold
        different bytes (inode+mtime+size for POSIX, etag/generation for
        object stores), or None if absent. Only compared for equality —
        the materialized-manifest memo revalidates with it."""

    def mtime(self, path: str) -> float:
        """Last-modified epoch seconds (pre-`committed_at` manifests
        fall back to this). Default raises; backends override."""
        raise FileNotFoundError(path)


class PosixCommitStore(CommitStore):
    """The default backend: a real filesystem with POSIX link semantics.

    put_if_absent = write a temp file in the target directory, fsync,
    then `os.link` it to the final name — creation is atomic and fails
    EEXIST for losers, the exact pattern the sink used inline before the
    extraction (sinks/manifest.py r12 and earlier)."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        try:
            with open(tmp, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def put(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def get(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def list(self, dirpath: str) -> list[str]:
        try:
            return sorted(
                n
                for n in os.listdir(dirpath)
                if os.path.isfile(os.path.join(dirpath, n))
            )
        except (FileNotFoundError, NotADirectoryError):
            return []

    def fingerprint(self, path: str) -> object | None:
        try:
            st = os.stat(path)
        except OSError:
            return None
        # inode alone is NOT enough — ext4 reuses inodes after unlink
        # (ADVICE r12); mtime_ns + size break the reuse
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)


class ConditionalPutCommitStore(CommitStore):
    """The object-store shape: whole-object GET/PUT/LIST/DELETE plus ONE
    concurrency primitive — PUT with a not-exists precondition. No
    rename, no link, no append, no directory; `dirpath` is a key prefix.

    Subclasses implement the five `_backend_*` hooks against their
    service (boto3 `put_object(IfNoneMatch="*")` for S3 raises a 412 the
    hook maps to False). This class derives the full CommitStore surface,
    so the sink's entire commit protocol — racing committers, CAS via
    expected_parent, tip hints, checkpoints, vacuum — runs unchanged on
    any store with a conditional PUT."""

    # hooks ---------------------------------------------------------

    @abstractmethod
    def _backend_get(self, key: str) -> tuple[bytes, object] | None:
        """(bytes, version-token) or None. The token is the etag/
        generation the service returns — any value that changes when
        the object's bytes might have."""

    @abstractmethod
    def _backend_put(self, key: str, data: bytes, if_none_match: bool) -> bool:
        """Whole-object PUT. With `if_none_match`, succeed only if the
        key is absent (S3 `If-None-Match: *`) and return whether the
        precondition held; without it, last-writer-wins, return True."""

    @abstractmethod
    def _backend_head(self, key: str) -> tuple[object, float] | None:
        """(version-token, last-modified epoch) or None — a HEAD."""

    @abstractmethod
    def _backend_delete(self, key: str) -> None:
        """Idempotent DELETE."""

    @abstractmethod
    def _backend_list(self, prefix: str) -> list[str]:
        """Keys under `prefix` (the service's paginated LIST, drained)."""

    # derived CommitStore surface ------------------------------------

    def put_if_absent(self, path: str, data: bytes) -> bool:
        return self._backend_put(path, data, if_none_match=True)

    def put(self, path: str, data: bytes) -> None:
        self._backend_put(path, data, if_none_match=False)

    def get(self, path: str) -> bytes | None:
        hit = self._backend_get(path)
        return None if hit is None else hit[0]

    def exists(self, path: str) -> bool:
        return self._backend_head(path) is not None

    def delete(self, path: str) -> None:
        self._backend_delete(path)

    def list(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        names = []
        for key in self._backend_list(prefix):
            rest = key[len(prefix):]
            if rest and "/" not in rest:  # immediate children only
                names.append(rest)
        return sorted(names)

    def fingerprint(self, path: str) -> object | None:
        head = self._backend_head(path)
        return None if head is None else head[0]

    def mtime(self, path: str) -> float:
        head = self._backend_head(path)
        if head is None:
            raise FileNotFoundError(path)
        return head[1]


class MemoryCommitStore(ConditionalPutCommitStore):
    """In-process object store with S3 semantics — the reference backend
    implementation and the test double proving the sink's protocol needs
    NO POSIX primitive. Atomicity comes from one lock around the
    conditional PUT (standing in for the service's server-side check);
    everything else is a dict of whole immutable blobs. Deliberately has
    no rename, no link, no partial write, and LIST is a snapshot (keys
    observed mid-race may lag), matching what S3 actually promises."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._blobs: dict[str, tuple[bytes, int, float]] = {}
        self._seq = 0

    def _backend_get(self, key: str) -> tuple[bytes, object] | None:
        with self._lock:
            hit = self._blobs.get(key)
            return None if hit is None else (hit[0], hit[1])

    def _backend_put(self, key: str, data: bytes, if_none_match: bool) -> bool:
        with self._lock:
            if if_none_match and key in self._blobs:
                return False
            self._seq += 1
            self._blobs[key] = (bytes(data), self._seq, time.time())
            return True

    def _backend_head(self, key: str) -> tuple[object, float] | None:
        with self._lock:
            hit = self._blobs.get(key)
            return None if hit is None else (hit[1], hit[2])

    def _backend_delete(self, key: str) -> None:
        with self._lock:
            self._blobs.pop(key, None)

    def _backend_list(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._blobs if k.startswith(prefix))
