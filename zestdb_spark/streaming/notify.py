"""Notification relay (ST3) — thin emulation of the reference's
request/response RPC bridge (src/notify.re, src/server.re:611-618,
778-794).

Reference protocol: a responder OBSERVEs ``/notification/request/<x>``;
a requester POSTs there (payload relayed to the responder) and OBSERVEs
``/notification/response/<x>/<uuid>``; the responder POSTs its answer
to that callback path. The correlation key IS the callback path.

SURVEY.md §2.10 scopes this as low-analytic-value — the emulation rides
entirely on the ObserverRegistry (no Spark involvement; notifications
are control-plane)."""

from __future__ import annotations

import uuid as _uuid
from typing import Any, Optional

from zestdb_spark.streaming.observe import ObserverRegistry

REQUEST_PREFIX = "/notification/request/"
RESPONSE_PREFIX = "/notification/response/"


class NotificationBroker:
    def __init__(self, registry: Optional[ObserverRegistry] = None):
        self.registry = registry or ObserverRegistry()

    def serve(self, topic: str, max_age_s: int = 0) -> str:
        """Responder side: observe the request path; returns observer id
        used to poll incoming requests."""
        return self.registry.register(
            REQUEST_PREFIX + topic, mode="data", max_age_s=max_age_s
        )

    def request(self, topic: str, payload: Any, max_age_s: int = 0) -> tuple[str, str]:
        """Requester side: publish the request and observe the response
        callback path. Returns (response_observer_id, callback_path) —
        the payload delivered to responders includes the callback path
        so they know where to POST the answer."""
        callback = f"{RESPONSE_PREFIX}{topic}/{_uuid.uuid4()}"
        oid = self.registry.register(callback, mode="data", max_age_s=max_age_s)
        self.registry.publish_data(
            REQUEST_PREFIX + topic, {"callback": callback, "payload": payload}
        )
        return oid, callback

    def respond(self, callback_path: str, payload: Any) -> int:
        """Responder posts the answer to the requester's callback path;
        returns number of observers notified."""
        return self.registry.publish_data(callback_path, payload)

    def poll(self, observer_id: str) -> list:
        return self.registry.messages(observer_id)
