"""Single-filesystem coordination seam: the THREE primitives every
cross-writer safety property in this engine reduces to.

The reference serializes all writes through one Lwt server loop over a
transactional store (src/server.re:1075-1084) — coordination is free
because there is exactly one writer. This engine allows concurrent
writers (many Spark jobs, a server + maintenance thread), so the table
format needs exactly three coordination primitives, and EVERYTHING
else (manifest commits, rewrite serialization, vacuum, log compaction)
is built from them:

1. ``publish(tmp, final)`` — atomic CREATE-IF-ABSENT of a complete
   file: the manifest CAS. Two racing committers get a clean conflict,
   never a torn log. Local FS: ``os.link`` (atomic on POSIX).
2. ``mutex(path)`` — an exclusive advisory lock with crash recovery:
   serializes REWRITE paths (delete/upsert/compact; appends commute
   and take no lock). Local FS: ``O_EXCL`` lockfile + pid-verified
   stale reclaim under a pid-owned sidecar.
3. ``remove(path)`` — best-effort unlink (lock release, tmp cleanup).

Scale posture (SCALE.md "Coordination"): these semantics — CAS
publish, revocable exclusive lock, delete — are exactly what
Delta/Iceberg ask of a commit service (``LogStore``: "put-if-absent"),
and what DynamoDB/ZooKeeper/etcd lock recipes provide. Porting the
engine to a multi-driver cluster therefore touches ONLY this module:
implement the three methods against the lock service and call
``set_coordinator()``; storage.py and snapshots.py never look at the
filesystem primitives directly. The default stays local-FS because
this image has no Delta jars and no lock service — same single-node
scope as the reference.
"""

from __future__ import annotations

import contextlib
import os
import time


class LocalFSCoordinator:
    """The default, single-host implementation: POSIX atomic-create
    primitives. Correct exactly when every writer shares one local
    filesystem (os.link / O_EXCL are atomic on POSIX; neither is
    trustworthy on NFS — swap the coordinator there)."""

    # -- primitive 1: CAS publish --------------------------------------
    def publish(self, tmp: str, final: str) -> bool:
        """Atomically make ``final`` exist with ``tmp``'s (complete,
        fsynced) content iff it does not already exist. True = this
        caller won the CAS; False = somebody else published first.
        Never leaves a torn/partial ``final``. Caller owns ``tmp``
        cleanup (it may be linked, not moved)."""
        try:
            os.link(tmp, final)
            return True
        except FileExistsError:
            return False

    # -- primitive 2: exclusive mutex with crash recovery ---------------
    def try_acquire(self, path: str) -> bool:
        """One non-blocking attempt to take the mutex at ``path``,
        recording this pid as the holder. True = acquired."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return True

    def holder(self, path: str) -> int:
        """The pid recorded in the mutex file (0 = absent/unreadable)."""
        try:
            return int(open(path).read().strip() or "0")
        except (OSError, ValueError):
            return 0

    def is_held(self, path: str) -> bool:
        """Is the mutex at ``path`` currently taken? (Advisory — used
        by vacuum to SKIP orphan reclaim while a rewriter is staging,
        never for mutual exclusion itself.)"""
        return os.path.exists(path)

    def reclaim_if_dead(self, path: str) -> None:
        """Crash recovery: unlink the mutex at ``path`` iff its
        recorded holder pid no longer exists. A crashed rewriter must
        not wedge the table forever.

        Only ONE waiter may perform the unlink — a bare unlink races:
        waiter A can reclaim and re-acquire before waiter B's pending
        unlink fires, and B then deletes A's FRESH lock, letting a
        third writer in alongside A. So the unlink happens under a
        sidecar mutex (``<path>.reclaim``), with the holder pid
        re-verified inside.

        The sidecar itself is crash-recoverable the same way: it
        records ITS owner's pid, and a waiter finding an existing
        sidecar ages it out only when that recorded owner is DEAD
        (pid-probe, not mtime — an mtime age-out could unlink a LIVE
        waiter's sidecar during a GC pause, and that waiter's
        cleanup would then remove the next owner's fresh sidecar,
        re-opening the double-unlink race). Cleanup in ``finally``
        unlinks the sidecar only while it still records this pid."""
        rpath = f"{path}.reclaim"
        if not self.try_acquire(rpath):
            # another waiter is reclaiming; if IT crashed mid-reclaim
            # (the window it guards is a few syscalls), reclaim the
            # sidecar itself — pid-verified, one level of recursion,
            # the sidecar of a sidecar is never taken
            owner = self.holder(rpath)
            if owner and not _pid_alive(owner):
                with contextlib.suppress(OSError):
                    os.unlink(rpath)
            return
        try:
            # re-verify under the mutex: the stale lock we probed may
            # have been reclaimed and re-created by a LIVE holder since
            pid = self.holder(path)
            if pid and not _pid_alive(pid):
                with contextlib.suppress(OSError):
                    os.unlink(path)
        finally:
            # unlink only OUR sidecar: if an age-out stole it while we
            # stalled here, the file now belongs to the next waiter
            if self.holder(rpath) == os.getpid():
                with contextlib.suppress(OSError):
                    os.unlink(rpath)

    # -- primitive 3: remove --------------------------------------------
    def remove(self, path: str) -> None:
        """Best-effort unlink (lock release, staged-tmp cleanup)."""
        with contextlib.suppress(OSError):
            os.unlink(path)


class LeaseLost(RuntimeError):
    """A held mutex's lease could not be maintained (heartbeat failed
    past the lease window, or the service reported the lease gone):
    another writer may already hold the lock, so the protected
    read-modify-write MUST NOT commit. Raised by ``assert_lease`` at
    the commit boundary — aborting there is always safe (staged files
    are unreferenced until the manifest commit)."""


def assert_lease(path: str) -> None:
    """Commit-boundary guard: if the configured coordinator tracks the
    mutex at ``path`` as held by THIS process and knows its lease was
    lost, raise ``LeaseLost`` instead of letting the commit race the
    lease's new owner. Backends without lease tracking (local FS: the
    O_EXCL file cannot silently expire) no-op."""
    check = getattr(get_coordinator(), "assert_held", None)
    if check is not None:
        check(path)


def host_id() -> str:
    """A stable identity for THIS host: hostname plus the kernel boot
    id when readable (the boot id also distinguishes 'same hostname,
    rebooted since' — a recycled pid on a rebooted host must not read
    as the original writer). Pid probes are only meaningful on the
    host that RECORDED the pid: on any other host the probe answers a
    question about an unrelated process table, and 'absent' there says
    nothing about the real writer."""
    import socket

    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        boot = ""
    return f"{socket.gethostname()}:{boot}"


def _pid_alive(pid: int) -> bool:
    """Does ``pid`` exist on this host? (signal 0 = existence probe;
    EPERM means alive-but-foreign, which counts as alive)."""
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


_COORDINATOR: LocalFSCoordinator = LocalFSCoordinator()


def get_coordinator() -> LocalFSCoordinator:
    return _COORDINATOR


def set_coordinator(c) -> None:
    """Swap the coordination backend (e.g. a lock-service adapter with
    the same three-primitive surface). Tests and future multi-driver
    deployments only."""
    global _COORDINATOR
    _COORDINATOR = c


@contextlib.contextmanager
def mutex(path: str, wait_s: float = 30.0, busy_error=None):
    """Blocking exclusive mutex over the configured coordinator:
    acquire-or-wait with dead-holder reclaim, raising
    ``busy_error(holder_pid)`` (default TimeoutError) after ``wait_s``.
    The ONE composite the callers share; everything inside is the
    three primitives."""
    coord = get_coordinator()
    deadline = time.monotonic() + wait_s
    while not coord.try_acquire(path):
        pid = coord.holder(path)
        if pid and not _pid_alive(pid):
            coord.reclaim_if_dead(path)
            # fall through to the deadline check: if another waiter's
            # sidecar blocks reclamation indefinitely (stalled waiter),
            # this loop must still time out rather than spin forever;
            # the sleep below also keeps the retry from busy-spinning
        if time.monotonic() > deadline:
            if busy_error is not None:
                raise busy_error(pid)
            raise TimeoutError(
                f"mutex {path} held by pid {pid or '?'} past {wait_s}s"
            )
        time.sleep(0.01 if pid and not _pid_alive(pid) else 0.05)
    try:
        yield
    finally:
        coord.remove(path)
