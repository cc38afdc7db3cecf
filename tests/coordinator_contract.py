"""Backend-agnostic conformance kit for the coordination seam.

The table format's cross-writer safety reduces to three primitives
(coordination.py: CAS publish, crash-recoverable mutex, remove). Any
backend claiming to implement the seam — the in-repo local-FS and TCP
lock-service backends, or a third-party etcd/ZooKeeper adapter — must
satisfy the SAME safety properties, so those properties live here
ONCE as a contract class and every backend runs them unmodified:

    class TestMyBackend(CoordinatorContract):
        def make_coordinator(self):        # a fresh, independent client
            return MyCoordinator(...)
        def child_setup_src(self) -> str:  # configure the SAME backend
            return "from my_pkg import ...; coordination.set_coordinator(...)"

Properties pinned (each through the PUBLIC composite surface —
``coordination.mutex`` / ``snapshots.commit`` — never backend
internals):

1. publish is a CAS: exactly one winner among racing attempts, and a
   pre-existing final always loses (fresh backend state included).
2. mutex is exclusive: a held lock rejects a second client, and
   release frees it.
3. mutual exclusion holds across REAL process boundaries: two
   processes incrementing one counter under the mutex lose nothing.
4. crash recovery: a holder killed with SIGKILL (no finally, no
   atexit) frees its lock within ``crash_recovery_wait_s``.
5. the store property it all exists for: two processes hammering
   manifest commits lose zero adds and produce strictly sequential
   versions.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from zestdb_spark import coordination

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write(path: str, content: str) -> None:
    with open(path, "w") as f:
        f.write(content)


class CoordinatorContract:
    #: ceiling on how long property 4 may take (lease expiry for
    #: lease-based backends; pid-probe reclaim is immediate)
    crash_recovery_wait_s: float = 10.0

    # ---------------------------------------------------------- hooks
    def make_coordinator(self):
        """A fresh, independent client of the backend under test."""
        raise NotImplementedError

    def child_setup_src(self) -> str:
        """Python source that configures the SAME backend inside a
        child process (after sys.path setup; must call
        ``coordination.set_coordinator`` or leave the default)."""
        raise NotImplementedError

    # -------------------------------------------------------- fixture
    @pytest.fixture()
    def coord(self):
        c = self.make_coordinator()
        orig = coordination.get_coordinator()
        coordination.set_coordinator(c)
        yield c
        coordination.set_coordinator(orig)

    def _child(self, body: str) -> subprocess.Popen:
        src = (
            f"import sys\nsys.path.insert(0, {_REPO!r})\n"
            "from zestdb_spark import coordination\n"
            + self.child_setup_src()
            + "\n"
            + textwrap.dedent(body)
        )
        return subprocess.Popen(
            [sys.executable, "-c", src], stdout=subprocess.PIPE
        )

    # ----------------------------------------------------- properties
    def test_publish_exactly_one_winner(self, coord, tmp_path):
        final = str(tmp_path / "v0.json")
        wins = 0
        for i in range(8):
            tmp = str(tmp_path / f".t{i}")
            _write(tmp, f"attempt {i}")
            if coord.publish(tmp, final):
                wins += 1
        assert wins == 1
        assert open(final).read() == "attempt 0"

    def test_publish_refuses_preexisting_final(self, coord, tmp_path):
        """A backend with fresh state (e.g. a restarted service) must
        still lose the CAS against a final that already exists on
        disk — durable facts outrank advisory state."""
        final = str(tmp_path / "v1.json")
        _write(final, "already-published")
        tmp = str(tmp_path / ".t")
        _write(tmp, "usurper")
        fresh = self.make_coordinator()
        assert fresh.publish(tmp, final) is False
        assert open(final).read() == "already-published"

    def test_mutex_exclusion_and_release(self, coord, tmp_path):
        path = str(tmp_path / "m.lock")
        second = self.make_coordinator()
        with coordination.mutex(path, wait_s=5.0):
            assert coord.is_held(path)
            assert not second.try_acquire(path)
        assert not coord.is_held(path)
        # released: a new taker succeeds at once
        assert second.try_acquire(path)
        second.remove(path)

    def test_cross_process_zero_lost_updates(self, coord, tmp_path):
        counter = str(tmp_path / "counter")
        lock = str(tmp_path / "c.lock")
        _write(counter, "0")
        n = 25
        child = self._child(
            f"""
            for _ in range({n}):
                with coordination.mutex({lock!r}, wait_s=60.0):
                    v = int(open({counter!r}).read())
                    open({counter!r}, "w").write(str(v + 1))
            """
        )
        try:
            for _ in range(n):
                with coordination.mutex(lock, wait_s=60.0):
                    v = int(open(counter).read())
                    _write(counter, str(v + 1))
        finally:
            rc = child.wait(timeout=120)
        assert rc == 0
        assert int(open(counter).read()) == 2 * n

    def test_kill9_crash_recovery(self, coord, tmp_path):
        lock = str(tmp_path / "dead.lock")
        child = self._child(
            f"""
            assert coordination.get_coordinator().try_acquire({lock!r})
            print("HELD", flush=True)
            import time; time.sleep(120)
            """
        )
        assert child.stdout.readline().strip() == b"HELD"
        assert not coord.try_acquire(lock)  # genuinely held
        os.kill(child.pid, signal.SIGKILL)
        child.wait(timeout=30)
        # the PUBLIC recovery surface: the mutex composite must get
        # through (pid-probe reclaim or lease expiry — its business)
        with coordination.mutex(lock, wait_s=self.crash_recovery_wait_s):
            pass

    def test_store_commits_lose_nothing(self, coord, tmp_path):
        from zestdb_spark import snapshots

        table = str(tmp_path / "t")
        os.makedirs(table)
        n = 20
        for prefix in ("p", "c"):
            for i in range(n):
                _write(os.path.join(table, f"{prefix}-{i}.parquet"), "x")
        child = self._child(
            f"""
            from zestdb_spark import snapshots
            for i in range({n}):
                snapshots.commit({table!r}, adds=[f"c-{{i}}.parquet"], op="append")
            """
        )
        try:
            for i in range(n):
                snapshots.commit(table, adds=[f"p-{i}.parquet"], op="append")
        finally:
            rc = child.wait(timeout=120)
        assert rc == 0
        snap = snapshots.latest(table)
        expected = {f"p-{i}.parquet" for i in range(n)} | {
            f"c-{i}.parquet" for i in range(n)
        }
        assert set(snap.files) == expected
        assert snap.version == 2 * n - 1
