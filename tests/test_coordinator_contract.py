"""Both in-repo coordination backends run the SAME conformance kit
(tests/coordinator_contract.py) unmodified — the evidence that the
contract is backend-agnostic and that a third-party etcd/ZooKeeper
adapter can self-certify by subclassing it the same way."""

from __future__ import annotations

import pytest

from tests.coordinator_contract import CoordinatorContract
from zestdb_spark import coordination
from zestdb_spark.lockserver import LockServer, ServiceCoordinator


class TestLocalFSConformance(CoordinatorContract):
    """POSIX local-FS backend: O_EXCL + os.link + pid probes."""

    crash_recovery_wait_s = 5.0  # pid-probe reclaim is immediate

    def make_coordinator(self):
        return coordination.LocalFSCoordinator()

    def child_setup_src(self) -> str:
        return ""  # LocalFSCoordinator is the default


class TestLockServiceConformance(CoordinatorContract):
    """TCP lease service backend: server-granted leases, heartbeat
    renewal, expiry-based crash recovery."""

    crash_recovery_wait_s = 15.0  # lease_s=2 plus scheduling slack

    @pytest.fixture(autouse=True)
    def _server(self):
        self.server = LockServer().start()
        yield
        self.server.shutdown()

    def make_coordinator(self):
        return ServiceCoordinator(self.server.addr, lease_s=2.0)

    def child_setup_src(self) -> str:
        host, port = self.server.addr
        return (
            "from zestdb_spark.lockserver import ServiceCoordinator\n"
            "coordination.set_coordinator("
            f"ServiceCoordinator(({host!r}, {port}), lease_s=2.0))"
        )
