from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from databricks_delta_lake_project_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[8], not local[$SPARK_GRAFT_CPUS]: the suite runs thousands
    # of tiny Spark actions whose cost is task-launch overhead, not
    # compute — measured 27% faster at 8 cores than 32 on the same
    # tests (4 cores is no better than 8). Nothing in the suite asserts
    # cluster width; the bench/driver contract keeps using
    # SPARK_GRAFT_CPUS. Override with SPARK_GRAFT_TEST_CPUS if a probe
    # needs a wider session.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(
        app_name="engine-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(autouse=True)
def _engine_registry_isolation():
    """Per-test isolation of the session-global DML name registry.

    The SparkSession is session-scoped (JVM startup is expensive), so
    tables a test registers — explicitly or via SQL CREATE/CONVERT —
    would otherwise leak into every later test: a leftover bare
    ``customers`` silently captures another test's suffix resolution
    and widens ACL SELECT checks (this bit for real — the registration
    pointed at a deleted tmp_path). Snapshot the registry and the
    engine-owned view set before each test; afterwards drop the temp
    views the engine created during the test and restore both maps.
    User-created temp views are untouched (the engine never owned
    them)."""
    import copy

    from databricks_delta_lake_project_spark.governance import (
        access_control as acl,
        catalog_registry,
        federation,
        share_sql,
        systables,
    )
    from databricks_delta_lake_project_spark.quality import event_log
    from databricks_delta_lake_project_spark.queries import sqlpack
    from databricks_delta_lake_project_spark.tables import metasql, sqldml

    snap_registry = dict(sqldml._REGISTRY)
    snap_views = dict(sqldml._OWNED_VIEWS)
    # governance session-state (all plain str/tuple containers, so
    # deepcopy is cheap and safe — never deepcopy _REGISTRY, it holds
    # LakeTable objects): masks, grants, mounts, namespaces, tags,
    # audit buffers and SQL-function bindings must not leak between
    # tests that skip per-fixture cleanup
    gov_regs = [
        sqldml._MASKED_SESSIONS,
        acl._GRANTS,
        acl._LOADED,
        acl._LOCAL_ADDS,
        acl._LOCAL_DELS,
        share_sql._MOUNTS,
        federation._CONNECTIONS,
        federation._FOREIGN_CATALOGS,
        federation._FED_VIEWS,
        sqlpack._FUNCS,
        metasql._NAMESPACES,
        systables._LAYER_TAGS,
        systables._AUDIT,
        systables._QUERY_HISTORY,
        systables._LINEAGE,
        systables._COL_LINEAGE,
        catalog_registry._LOADED,
        catalog_registry._ADDS,
        catalog_registry._DELS,
        catalog_registry._PDELS,
        event_log._EVENTS,
    ]
    gov_snaps = [copy.deepcopy(r) for r in gov_regs]
    yield
    added_views = set(sqldml._OWNED_VIEWS) - set(snap_views)
    if added_views:
        from pyspark.sql import SparkSession

        sess = SparkSession.getActiveSession()
        if sess is not None:
            for (_sid, name) in added_views:
                try:
                    sess.catalog.dropTempView(name)
                except Exception:
                    pass
    sqldml._REGISTRY.clear()
    sqldml._REGISTRY.update(snap_registry)
    sqldml._OWNED_VIEWS.clear()
    sqldml._OWNED_VIEWS.update(snap_views)
    for reg, snap in zip(gov_regs, gov_snaps):
        reg.clear()
        reg.update(snap)
