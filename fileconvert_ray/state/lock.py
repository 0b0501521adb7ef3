"""Advisory single-writer lock for encode output dirs.

The container store's crash-safety design makes a SINGLE writer
idempotent and interruption-safe (atomic tmp+rename, manifest-last,
compaction intents) — but nothing stopped two concurrent mutating jobs
(encode + compact, purge + purge, ...) from interleaving swaps, which
the recovery protocols do not cover.  ``job_lock`` closes that:
every driver-side mutating entry point (encode / compact / purge /
delete / upsert) holds ``out_dir/.lock`` for its duration.

Semantics
---------
- Acquisition is one atomic ``O_CREAT|O_EXCL`` create — correct on a
  local FS and on NFS-style shared storage (where a real multi-node
  deployment would mount out_dir).
- Reentrant WITHIN a process: the nested entry points (upsert calls
  delete + encode_files; compact replays recovery) re-enter the lock
  they already hold.
- Stale detection: a lock whose owner pid is dead on THIS host, or
  whose heartbeat file is older than ``stale_s`` (default 1 h) on any
  host, is broken and re-acquired.  Long-running jobs stay fresh by
  touching the lock at acquisition only — at 100 TB a single encode
  can exceed any fixed TTL, so ``stale_s`` errs long and operators
  can ``--force`` / fsck-report instead.
- Readers (decode/query/verify) do NOT take the lock: reads are
  consistent-by-construction against completed manifests.
"""

from __future__ import annotations

import json
import os
import socket
import time
from contextlib import contextmanager


class LockHeldError(RuntimeError):
    def __init__(self, path: str, owner: dict):
        self.owner = owner
        super().__init__(
            f"{path} is held by {owner.get('operation', '?')} "
            f"(pid {owner.get('pid', '?')} on {owner.get('host', '?')}, "
            f"since {owner.get('ts', '?')}); pass force=True / --force "
            "to break a lock you know is dead"
        )


def lock_path(out_dir: str) -> str:
    return os.path.join(out_dir, ".lock")


def read_lock(out_dir: str) -> dict | None:
    """The current lock owner record, or None (absent/unreadable ==
    treated as absent by fsck reporting; acquisition still goes
    through the atomic create)."""
    try:
        with open(lock_path(out_dir), "rb") as f:
            return json.loads(f.read())
    except (FileNotFoundError, json.JSONDecodeError, ValueError):
        return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _is_stale(path: str, owner: dict | None, stale_s: float) -> bool:
    if owner is None:
        # unreadable/empty lock: age alone decides
        try:
            return (time.time() - os.path.getmtime(path)) > stale_s
        except FileNotFoundError:
            return False
    if owner.get("host") == socket.gethostname() and not _pid_alive(
        int(owner.get("pid", -1))
    ):
        return True
    try:
        return (time.time() - os.path.getmtime(path)) > stale_s
    except FileNotFoundError:
        return False


@contextmanager
def job_lock(out_dir: str, operation: str, *, force: bool = False,
             stale_s: float = 3600.0):
    """Hold ``out_dir/.lock`` for a mutating job.  Reentrant within
    the owning process; raises LockHeldError when another live job
    holds it (unless ``force``)."""
    os.makedirs(out_dir, exist_ok=True)
    path = lock_path(out_dir)
    me = {"pid": os.getpid(), "host": socket.gethostname(),
          "operation": operation, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    payload = json.dumps(me, sort_keys=True).encode()

    owner = read_lock(out_dir)
    if owner and int(owner.get("pid", -1)) == me["pid"] and owner.get("host") == me["host"]:
        yield  # reentrant: this process already holds it
        return

    for _ in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            owner = read_lock(out_dir)
            if force or _is_stale(path, owner, stale_s):
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                continue
            raise LockHeldError(path, owner or {})
    else:
        raise LockHeldError(path, read_lock(out_dir) or {})

    try:
        os.write(fd, payload)
        os.close(fd)
        yield
    finally:
        # only the owner removes it (a force-breaker may have replaced it)
        cur = read_lock(out_dir)
        if cur and int(cur.get("pid", -1)) == me["pid"] and cur.get("host") == me["host"]:
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
