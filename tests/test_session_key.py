"""Per-session registries must key on an identity that is never
recycled: ``id(spark._jsparkSession)`` can be handed to a NEW session
after the old wrapper is GC'd, silently inheriting stale view-version
caches and table registrations. ``session_key`` uses the JVM session
UUID instead; a replacement session (same object identity, new UUID —
the worst case) sees fresh caches."""

from __future__ import annotations

from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import sqldml


class _FakeJ:
    def __init__(self, uuid: str) -> None:
        self._uuid = uuid

    def sessionUUID(self) -> str:
        return self._uuid


class _FakeSpark:
    def __init__(self, j: _FakeJ) -> None:
        self._jsparkSession = j


def test_session_key_is_uuid_not_object_id():
    j = _FakeJ("uuid-a")
    s = _FakeSpark(j)
    assert session_key(s) == "uuid-a"
    # same Python objects, new JVM session UUID (session replacement
    # with a recycled object id) -> a different key
    j._uuid = "uuid-b"
    assert session_key(s) == "uuid-b"


def test_replacement_session_sees_fresh_registry():
    j = _FakeJ("uuid-old")
    s = _FakeSpark(j)
    sqldml._REGISTRY[sqldml._skey(s, "ghost")] = object()
    assert sqldml._REGISTRY.get(sqldml._skey(s, "ghost")) is not None
    # the JVM session is replaced; the wrapper (and its id()) survives
    j._uuid = "uuid-new"
    assert sqldml._REGISTRY.get(sqldml._skey(s, "ghost")) is None
    sqldml._REGISTRY.pop(("uuid-old", "ghost"), None)


def test_real_session_key_stable(spark):
    assert session_key(spark) == session_key(spark)
    assert not session_key(spark).startswith("id:")
