"""A minimal leased lock service + the coordinator backend that runs
the engine's coordination seam over it — the multi-DRIVER face of
``coordination.py``.

`LocalFSCoordinator` is correct exactly when every writer shares one
POSIX filesystem (os.link / O_EXCL atomicity, pid liveness probes).
A fleet of Spark drivers on different hosts shares neither pids nor —
on NFS — trustworthy atomic creates. The standard public answer is a
lock service (Chubby/ZooKeeper/etcd recipes; Delta's S3 commit
services are the same idea specialized to put-if-absent): a single
arbiter grants LEASES, and crash recovery is lease expiry instead of
pid probing.

This module ships a deliberately tiny one — a threaded TCP server
with a newline protocol and in-memory state — plus
``ServiceCoordinator``, which implements the seam's three primitives
against it:

- ``mutex``: server-granted lease (``LOCK/UNLOCK``), auto-expired —
  a writer that dies (any host) frees its locks after ``lease_s``
  with no pid probing anywhere.
- ``publish`` (manifest CAS): serialized per name under a server
  lease, so the exists-then-link pair runs in a critical section and
  never RELIES on concurrent-link atomicity (the part NFS breaks);
  the final ``os.link`` stays as a belt-and-braces arbiter for the
  stalled-writer-past-lease corner (see ``publish``).
- ``remove``: lease release when this process holds one for the
  path, plain unlink otherwise.

Production posture (SCALE.md "Coordination"): run etcd/ZooKeeper and
write this same adapter against it — the engine's storage layer sees
only the three primitives either way. This in-repo service exists so
the swap is TESTED (cross-process contention, kill -9 lease
recovery, store-level zero-lost-adds run through it —
tests/test_lockservice.py), not hypothetical. Its state is
in-memory: restarting it drops advisory leases only — every durable
fact (manifests, data files) lives in the store, and `publish`
re-validates against the filesystem, so a service restart can stall
writers briefly but cannot corrupt a table. That claim is enforced,
not assumed, for IN-FLIGHT rewrites too: the renew heartbeat retries
transient RPC failures rather than abandoning the lease, and if no
renew lands within a full lease window (or the server reports the
lease gone) the loss is latched and surfaced at the holder's commit
boundary (``assert_held`` via ``coordination.assert_lease``) — the
rewrite aborts with ``LeaseLost`` while its staged files are still
unreferenced, instead of racing the lease's next owner.
"""

from __future__ import annotations

import contextlib
import os
import socket
import socketserver
import threading
import time
import uuid


# --------------------------------------------------------------- server


class _LockState:
    def __init__(self) -> None:
        self.locks: dict[str, tuple[str, int, float]] = {}  # name -> (token, pid, expiry)
        self.guard = threading.Lock()

    def _reap(self, now: float) -> None:
        dead = [n for n, (_, _, exp) in self.locks.items() if exp <= now]
        for n in dead:
            del self.locks[n]

    def lock(self, name: str, pid: int, lease_s: float) -> "str | None":
        now = time.monotonic()
        with self.guard:
            self._reap(now)
            if name in self.locks:
                return None
            token = uuid.uuid4().hex
            self.locks[name] = (token, pid, now + lease_s)
            return token

    def unlock(self, name: str, token: str) -> bool:
        with self.guard:
            cur = self.locks.get(name)
            if cur and cur[0] == token:
                del self.locks[name]
                return True
            return False

    def renew(self, name: str, token: str, lease_s: float) -> bool:
        """Extend a HELD lease (token-verified): the heartbeat that
        lets a long rewrite outlive its initial lease without ever
        weakening crash recovery — a dead holder stops renewing and
        expires; a live one cannot be stolen from."""
        now = time.monotonic()
        with self.guard:
            self._reap(now)
            cur = self.locks.get(name)
            if cur and cur[0] == token:
                self.locks[name] = (token, cur[1], now + lease_s)
                return True
            return False

    def holder(self, name: str) -> int:
        now = time.monotonic()
        with self.guard:
            self._reap(now)
            cur = self.locks.get(name)
            return cur[1] if cur else 0


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one request per connection
        line = self.rfile.readline().decode().strip()
        parts = line.split()
        st: _LockState = self.server.state  # type: ignore[attr-defined]
        out = "ERR"
        if not parts:
            pass
        elif parts[0] == "PING":
            out = "OK"
        elif parts[0] == "LOCK" and len(parts) == 4:
            token = st.lock(parts[1], int(parts[2]), float(parts[3]))
            out = f"OK {token}" if token else f"BUSY {st.holder(parts[1])}"
        elif parts[0] == "UNLOCK" and len(parts) == 3:
            out = "OK" if st.unlock(parts[1], parts[2]) else "STALE"
        elif parts[0] == "RENEW" and len(parts) == 4:
            out = "OK" if st.renew(parts[1], parts[2], float(parts[3])) else "STALE"
        elif parts[0] == "HOLDER" and len(parts) == 2:
            out = str(st.holder(parts[1]))
        self.wfile.write((out + "\n").encode())


class LockServer(socketserver.ThreadingTCPServer):
    """``LockServer(("127.0.0.1", 0))``; serve with ``.start()``
    (daemon thread) and stop with ``.shutdown()``. ``.addr`` is the
    bound (host, port)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr: tuple[str, int] = ("127.0.0.1", 0)) -> None:
        super().__init__(addr, _Handler)
        self.state = _LockState()
        self.addr = self.server_address

    def start(self) -> "LockServer":
        threading.Thread(target=self.serve_forever, daemon=True).start()
        return self


# --------------------------------------------------------------- client


class ServiceCoordinator:
    """The coordination seam's three primitives over a ``LockServer``.

    Lease-based crash recovery: ``reclaim_if_dead`` is a no-op (the
    server reaps expired leases on every request), and ``holder``
    reports the REMOTE holder's pid as information only — the
    ``mutex()`` composite's local pid probe may call the holder dead
    when it is merely remote, which safely degrades to waiting out
    the lease."""

    def __init__(self, addr: tuple[str, int], lease_s: float = 30.0) -> None:
        self.addr = (addr[0], int(addr[1]))
        self.lease_s = float(lease_s)
        #: path -> (token, stop heartbeating, lost-latch, acquiring
        #: thread ident, last_ok one-slot renewal-stamp box); remove()
        #: and assert_held() unpack this shape positionally — keep the
        #: annotation in lockstep with acquire()'s store
        self._tokens: dict[
            str,
            tuple[str, threading.Event, threading.Event, int, list],
        ] = {}

    @staticmethod
    def _name(path: str) -> str:
        """Lock names ride a space-delimited line protocol — URL-encode
        them (store roots may contain spaces/newlines). Equality is
        preserved, which is all the server compares."""
        from urllib.parse import quote

        return quote(path, safe="")

    def _rpc(self, line: str) -> str:
        with socket.create_connection(self.addr, timeout=10.0) as s:
            s.sendall((line + "\n").encode())
            buf = b""
            while not buf.endswith(b"\n"):
                chunk = s.recv(4096)
                if not chunk:
                    break
                buf += chunk
        return buf.decode().strip()

    # -- primitive 1: CAS publish ---------------------------------------
    def publish(self, tmp: str, final: str) -> bool:
        """CAS-create ``final`` under a per-name server lease: the
        exists-check and the link run in a critical section, so no
        two writers link concurrently in the normal path (the
        operation NFS makes untrustworthy). If a stalled writer
        outlives its lease and races the next claimant anyway, the
        ``os.link`` create-if-absent remains the final arbiter —
        exactly one of them returns True.

        A BUSY pub lease is TRANSIENT contention, not a CAS loss: the
        holder is mid-publish (it will create ``final`` — we lose for
        real) or crashed (its lease expires within ``lease_s`` and the
        name frees). Returning False immediately would make the
        caller's commit loop re-read an unchanged HEAD and burn its
        retries into a spurious conflict, so wait the lease out —
        losing early the moment ``final`` appears."""
        name = f"pub:{self._name(final)}"
        deadline = time.monotonic() + 2.0 * self.lease_s
        while True:
            resp = self._rpc(f"LOCK {name} {os.getpid()} {self.lease_s}")
            if resp.startswith("OK"):
                break
            if os.path.exists(final):
                return False  # the holder published — a genuine loss
            if time.monotonic() > deadline:
                return False  # wedged service/holder: report the loss
            time.sleep(0.02)
        token = resp.split()[1]
        try:
            if os.path.exists(final):
                return False
            try:
                os.link(tmp, final)
                return True
            except FileExistsError:
                return False
        finally:
            self._rpc(f"UNLOCK {name} {token}")

    # -- primitive 2: leased mutex ---------------------------------------
    def try_acquire(self, path: str) -> bool:
        resp = self._rpc(f"LOCK {self._name(path)} {os.getpid()} {self.lease_s}")
        if not resp.startswith("OK"):
            return False
        token = resp.split()[1]
        # heartbeat: renew at lease/3 so a LIVE holder's long rewrite
        # (compaction past lease_s) is never stolen, while a KILLED
        # holder's heartbeat dies with it and the lease expires — the
        # renewal thread is the live/dead distinction, replacing the
        # local backend's pid probe
        stop = threading.Event()
        lost = threading.Event()
        # last_ok is a shared one-slot box: the renew loop stamps each
        # successful renewal, and assert_held reads it to decide trust
        # at the commit boundary (see _trust_deadline)
        last_ok = [time.monotonic()]
        threading.Thread(
            target=self._renew_loop,
            args=(path, token, stop, lost, last_ok),
            daemon=True,
        ).start()
        # record the acquiring thread: assert_held scopes its abort to
        # commits issued by THIS context — a lock-free CAS append from
        # another thread of the same process never relied on the lease
        # and must not be collateral damage of its loss (ADVICE r10)
        self._tokens[path] = (token, stop, lost, threading.get_ident(), last_ok)
        return True

    def _renew_loop(
        self,
        path: str,
        token: str,
        stop: threading.Event,
        lost: threading.Event,
        last_ok: list,
    ) -> None:
        """Heartbeat until released. A transient RPC failure (dropped
        connection, service restart mid-request) must NOT abandon the
        heartbeat — the holder's rewrite keeps running unaware, the
        lease expires, and a second writer acquires: exactly the
        lost-update the lock exists to prevent (ADVICE r9). So: retry
        on a short interval until stop is set, a renew succeeds, or
        the lease is PROVABLY unprotected (no successful renew within
        a full lease window — the server has certainly expired it),
        and in that case latch ``lost`` permanently.

        Liveness vs commit safety split deliberately (ADVICE r10): the
        LOOP keeps the heartbeat alive through outages up to the full
        window (abandoning at a margin would turn a survivable blip
        into a lost lease), while ``assert_held`` stops TRUSTING the
        lease at a margin BEFORE expiry, reading the shared ``last_ok``
        stamp — so a commit can never slip through the RPC-latency
        window where the server has already expired and re-granted the
        lease but the client-side full-window latch hasn't fired."""
        interval = self.lease_s / 3.0
        retry = min(interval / 4.0, 0.25)
        delay = interval
        while not stop.wait(delay):
            if time.monotonic() - last_ok[0] >= self.lease_s:
                lost.set()  # a full window without a renew: expired
                return
            try:
                resp = self._rpc(
                    f"RENEW {self._name(path)} {token} {self.lease_s}"
                )
            except OSError:
                delay = retry
                continue
            if resp == "OK":
                last_ok[0] = time.monotonic()
                delay = interval
                continue
            # the server answered and says this token no longer holds
            # the lease (expired and possibly re-granted) — definitive
            lost.set()
            return

    def _trust_deadline(self) -> float:
        """Seconds after the last successful renew beyond which a held
        lease is no longer TRUSTED at a commit boundary: the lease
        window minus one renewal interval and one retry interval of
        RPC-latency headroom (floored at half the window, so tiny
        leases keep a usable trust span). Always strictly before
        server-side expiry at last_ok + lease_s."""
        interval = self.lease_s / 3.0
        retry = min(interval / 4.0, 0.25)
        return max(self.lease_s - interval - retry, self.lease_s / 2.0)

    def assert_held(self, path: str) -> None:
        """Commit-boundary guard (see ``coordination.assert_lease``):
        raise if THIS process holds the mutex at ``path`` but its
        lease was lost — committing now could interleave with the
        lease's next owner mid-rewrite."""
        from zestdb_spark import coordination

        held = self._tokens.get(path)
        if held is None:
            return
        _token, _stop, lost, owner_thread, last_ok = held
        # scoped to the acquiring thread: only the context that took
        # the mutex staked its commit on the lease; unrelated lock-free
        # appends in the same process serialize through the publish
        # CAS and proceed (ADVICE r10). That inference is only safe
        # for lock-FREE paths — a holder that acquires in one thread
        # and commits from another (thread pool, streaming callback)
        # would silently skip the lost-lease abort, so make the
        # degradation loud instead of silent (ADVICE r11): today's
        # only mutex commit path (_rewrite_lock) is same-thread, so
        # any cross-thread hit is an unreviewed new caller.
        if owner_thread != threading.get_ident():
            import warnings

            warnings.warn(
                f"assert_held({path!r}) called from a thread other "
                "than the acquiring thread; the lost-lease abort does "
                "not apply. If this commit relies on the mutex, pass "
                "the commit through the acquiring thread.",
                RuntimeWarning,
                stacklevel=2,
            )
            return
        stale = time.monotonic() - last_ok[0] >= self._trust_deadline()
        if lost.is_set() or stale:
            why = (
                "loss latched by the heartbeat"
                if lost.is_set()
                else "last successful renew is older than the trust margin"
            )
            raise coordination.LeaseLost(
                f"lease on {path} cannot be trusted at the commit "
                f"boundary ({why}; lease window {self.lease_s}s); "
                "aborting before commit — another writer may hold the lock"
            )

    def holder(self, path: str) -> int:
        with contextlib.suppress(ValueError):
            return int(self._rpc(f"HOLDER {self._name(path)}"))
        return 0

    def is_held(self, path: str) -> bool:
        return self.holder(path) != 0

    def reclaim_if_dead(self, path: str) -> None:
        """Lease expiry IS the crash recovery — nothing to do."""

    # -- primitive 3: remove ----------------------------------------------
    def remove(self, path: str) -> None:
        held = self._tokens.pop(path, None)
        if held is not None:
            token, stop = held[0], held[1]
            stop.set()
            with contextlib.suppress(OSError):
                self._rpc(f"UNLOCK {self._name(path)} {token}")
            return
        with contextlib.suppress(OSError):
            os.unlink(path)
