"""Confluent Schema Registry client (driver-side REST, offline-cache aware).

The reference resolves schemas through libserdes against
``kafka.schema.registry.url``: GET the latest schema for subject
``<topic>-value`` (``src/SchemaRegistry.cpp:84-104``; the ``-value``
subject suffix at ``:87``; a raw-REST variant exists at
``src/config/ConfigParser.cpp:178-210``) and POST to register new
schemas (``src/SchemaRegistry.cpp:144-161``).

In Spark the registry interaction is a *driver-side* concern: schemas
are fetched once, then closed over by (broadcast with) the decode UDFs —
executors never talk to the registry.  A seedable in-memory cache makes
every offline/test path work without a live registry, and doubles as the
fallback when the URL is unreachable.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


class SchemaRegistryError(RuntimeError):
    pass


class SchemaRegistryClient:
    """Minimal REST client for the Confluent Schema Registry API."""

    def __init__(
        self,
        url: str | None = None,
        timeout: float = 5.0,
        seed: dict[str, tuple[int, str]] | None = None,
    ):
        """``seed`` maps subject → (schema_id, schema_json) for offline
        use; live fetches populate the same cache."""
        self.url = url.rstrip("/") if url else None
        self.timeout = timeout
        self._by_subject: dict[str, tuple[int, str]] = dict(seed or {})
        self._by_id: dict[int, str] = {i: s for i, s in self._by_subject.values()}

    @staticmethod
    def value_subject(topic: str) -> str:
        """Subject naming: ``<topic>-value`` (SchemaRegistry.cpp:87)."""
        return f"{topic}-value"

    def _request(self, method: str, path: str, body: dict | None = None) -> dict:
        if not self.url:
            raise SchemaRegistryError("no registry URL configured (offline mode)")
        req = urllib.request.Request(
            f"{self.url}{path}",
            method=method,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except (urllib.error.URLError, OSError) as e:
            raise SchemaRegistryError(f"registry {method} {path} failed: {e}") from e

    def fetch_value_schema(self, topic: str) -> tuple[int, str]:
        """Latest (id, schema_json) for ``<topic>-value``
        (SchemaRegistry.cpp:84-104).  Cache first, then live."""
        subject = self.value_subject(topic)
        if subject in self._by_subject:
            return self._by_subject[subject]
        doc = self._request("GET", f"/subjects/{subject}/versions/latest")
        pair = (int(doc["id"]), doc["schema"])
        self._by_subject[subject] = pair
        self._by_id[pair[0]] = pair[1]
        return pair

    def fetch_by_id(self, schema_id: int) -> str:
        """Schema JSON by wire-format id (per-message dispatch)."""
        if schema_id in self._by_id:
            return self._by_id[schema_id]
        doc = self._request("GET", f"/schemas/ids/{schema_id}")
        self._by_id[schema_id] = doc["schema"]
        return doc["schema"]

    def register_value_schema(self, topic: str, schema_json: str) -> int:
        """POST a schema under ``<topic>-value``
        (SchemaRegistry.cpp:144-161); offline mode assigns the next free
        id in the cache so tests can run the writer path."""
        subject = self.value_subject(topic)
        if self.url:
            doc = self._request(
                "POST", f"/subjects/{subject}/versions", {"schema": schema_json}
            )
            sid = int(doc["id"])
        else:
            # idempotent like the real Confluent API: re-registering an
            # IDENTICAL schema returns the existing id — a fresh id per
            # call would rebind the subject and orphan frames already
            # written under the old id (their decode would DLQ on
            # expected_schema_id mismatch after a mere producer restart)
            sid = next(
                (i for i, s in self._by_id.items() if s == schema_json),
                None,
            )
            if sid is None:
                sid = max(self._by_id, default=0) + 1
        self._by_subject[subject] = (sid, schema_json)
        self._by_id[sid] = schema_json
        return sid
