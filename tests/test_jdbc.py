"""End-to-end JDBC federation (S10; reference
``src/delta_sharing/lakehouse_federation.py:43-154,268-309``) against an
embedded Apache Derby database — the one JDBC engine whose driver ships
inside the Spark distribution, so the round-trip runs with zero extra
dependencies.

Covers: remote write -> ``read_federated`` scan, predicate/column
pushdown reaching the JDBC relation, partitioned parallel reads, and
``mirror_to_lake`` overwrite + keyed MERGE refresh.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from databricks_delta_lake_project_spark.sources.jdbc import (
    mirror_to_lake,
    read_federated,
)
from databricks_delta_lake_project_spark.tables import LakeTable

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby DB seeded with a customers table via
    Spark's own JDBC writer (proves the write path too)."""
    db = tmp_path_factory.mktemp("derby") / "feddb"
    url = f"jdbc:derby:{db};create=true"
    seed = spark.createDataFrame(
        [
            Row(c_custkey=i, c_name=f"Customer#{i:09d}", c_acctbal=float(i * 10))
            for i in range(1, 101)
        ]
    )
    (
        seed.coalesce(1)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "customers")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_round_trip_scan(spark, derby_url):
    df = read_federated(
        spark, derby_url, "customers", options={"driver": DRIVER}
    )
    assert df.count() == 100
    got = {r[0] for r in df.select("c_custkey").collect()}
    assert got == set(range(1, 101))


def test_predicate_and_column_pushdown(spark, derby_url):
    """Filters and projection must reach the remote engine — the whole
    point of federation is NOT shipping the table over the wire."""
    df = (
        read_federated(spark, derby_url, "customers", options={"driver": DRIVER})
        .filter(F.col("c_custkey") > 90)
        .select("c_custkey", "c_acctbal")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan, plan
    # Column pruning: the JDBC scan reads 2 columns, not 3.
    assert "c_name" not in plan.split("PushedFilters")[0].lower(), plan
    assert df.count() == 10


def test_partitioned_parallel_read(spark, derby_url):
    """partitionColumn + bounds splits the remote scan into N range
    queries — at warehouse scale this is the difference between one
    driver-side cursor and a parallel ingest."""
    df = read_federated(
        spark,
        derby_url,
        "customers",
        partition_column="c_custkey",
        num_partitions=4,
        lower_bound=1,
        upper_bound=101,
        options={"driver": DRIVER},
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100


def test_mirror_overwrite_and_merge_refresh(spark, derby_url, tmp_path):
    path = str(tmp_path / "mirror")
    src = read_federated(spark, derby_url, "customers", options={"driver": DRIVER})
    t = mirror_to_lake(spark, src, path)
    assert t.to_df().count() == 100

    # Remote rows change: one update + one insert, expressed as a frame.
    delta = spark.createDataFrame(
        [
            Row(c_custkey=1, c_name="Customer#updated", c_acctbal=999.0),
            Row(c_custkey=101, c_name="Customer#new", c_acctbal=0.0),
        ]
    )
    t2 = mirror_to_lake(spark, delta, path, key="c_custkey")
    out = t2.to_df()
    assert out.count() == 101
    assert (
        out.filter(F.col("c_custkey") == 1).select("c_name").first()[0]
        == "Customer#updated"
    )

    # Keyless refresh = full overwrite.
    t3 = mirror_to_lake(spark, delta, path)
    assert t3.to_df().count() == 2
    assert LakeTable.is_table(path)
