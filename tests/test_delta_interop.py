"""Read-only Delta Lake format interop (`_delta_log` replay) over
hand-built fixtures that follow the open Delta protocol: JSON commits
with protocol/metaData/add/remove/commitInfo actions, hive-style
partition paths, `_last_checkpoint` + classic checkpoint parquet, and
reader-feature refusal."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from databricks_delta_lake_project_spark.tables import (
    DeltaInteropTable,
    LakeTable,
    is_delta_table,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("part", IntegerType()),
    ]
)


def _schema_string() -> str:
    return SCHEMA.json()


def _write_data(spark, root: Path, rel: str, rows) -> None:
    """Write one parquet data file at root/rel holding `rows`."""
    target = root / rel
    tmp = root / f"_tmp_{rel.replace('/', '_')}"
    df = spark.createDataFrame(rows, SCHEMA)
    if "=" in rel:  # hive-style partition path: drop the partition col
        df = df.drop("part")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    part = next(tmp.glob("part-*.parquet"))
    target.parent.mkdir(parents=True, exist_ok=True)
    part.rename(target)
    for leftover in tmp.glob("*"):
        leftover.unlink()
    tmp.rmdir()


def _commit(root: Path, version: int, actions) -> None:
    log = root / "_delta_log"
    log.mkdir(parents=True, exist_ok=True)
    with open(log / f"{version:020d}.json", "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _meta(partition_cols=None):
    return {
        "metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(),
            "partitionColumns": partition_cols or [],
            "configuration": {"delta.appendOnly": "false"},
        }
    }


@pytest.fixture()
def delta_table(spark, tmp_path):
    """v0: create with 2 files; v1: overwrite one file (add+remove)."""
    root = tmp_path / "ext_delta"
    _write_data(spark, root, "f0.parquet", [(1, "a", 0), (2, "b", 0)])
    _write_data(spark, root, "f1.parquet", [(3, "c", 1)])
    _write_data(spark, root, "f2.parquet", [(3, "c2", 1), (4, "d", 1)])
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(),
            {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1000, "dataChange": True}},
            {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1000, "dataChange": True}},
            {"commitInfo": {"operation": "WRITE", "timestamp": 1000}},
        ],
    )
    _commit(
        root,
        1,
        [
            {"remove": {"path": "f1.parquet", "deletionTimestamp": 2000, "dataChange": True}},
            {"add": {"path": "f2.parquet", "partitionValues": {}, "size": 1, "modificationTime": 2000, "dataChange": True}},
            {"commitInfo": {"operation": "MERGE", "timestamp": 2000}},
        ],
    )
    return root


def test_detect_and_open(spark, delta_table):
    assert is_delta_table(str(delta_table))
    t = LakeTable.for_path(spark, str(delta_table))
    assert isinstance(t, DeltaInteropTable)
    assert t.read_only and t.version() == 1
    assert t.properties() == {"delta.appendOnly": "false"}


def test_active_file_set_and_time_travel(spark, delta_table):
    t = DeltaInteropTable(spark, str(delta_table))
    latest = {(r["id"], r["name"]) for r in t.to_df().collect()}
    assert latest == {(1, "a"), (2, "b"), (3, "c2"), (4, "d")}
    v0 = {(r["id"], r["name"]) for r in t.to_df(version=0).collect()}
    assert v0 == {(1, "a"), (2, "b"), (3, "c")}
    assert [f.name for f in t.schema.fields] == ["id", "name", "part"]


def test_history(spark, delta_table):
    t = DeltaInteropTable(spark, str(delta_table))
    rows = {(r["version"], r["operation"]) for r in t.history().collect()}
    assert rows == {(0, "WRITE"), (1, "MERGE")}


def test_partitioned_hive_layout(spark, tmp_path):
    root = tmp_path / "ext_delta_part"
    _write_data(spark, root, "part=0/p0.parquet", [(1, "a", 0), (2, "b", 0)])
    _write_data(spark, root, "part=1/p1.parquet", [(3, "c", 1)])
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta(["part"]),
            {"add": {"path": "part=0/p0.parquet", "partitionValues": {"part": "0"}, "size": 1, "modificationTime": 1, "dataChange": True}},
            {"add": {"path": "part=1/p1.parquet", "partitionValues": {"part": "1"}, "size": 1, "modificationTime": 1, "dataChange": True}},
            {"commitInfo": {"operation": "WRITE", "timestamp": 1}},
        ],
    )
    t = DeltaInteropTable(spark, str(root))
    df = t.to_df()
    assert dict(df.dtypes)["part"] == "int"
    got = {(r["id"], r["part"]) for r in df.collect()}
    assert got == {(1, 0), (2, 0), (3, 1)}
    # Partition pruning must reach the scan (one directory read).
    plan = df.filter(F.col("part") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan


def test_checkpoint_replay(spark, delta_table):
    """_last_checkpoint at v1 + a v2 JSON commit: replay starts from
    the checkpoint parquet, then applies only v2."""
    root = delta_table
    log = root / "_delta_log"
    t = DeltaInteropTable(spark, str(root))
    # Build a classic checkpoint for v1 from the replayed state.
    cp_rows = [
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1000, "dataChange": True}},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "size": 1, "modificationTime": 2000, "dataChange": True}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        json.loads(json.dumps(_meta())),
    ]
    cp_df = spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in cp_rows]))
    tmp = root / "_cp_tmp"
    cp_df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    part = next(tmp.glob("part-*.parquet"))
    part.rename(log / f"{1:020d}.checkpoint.parquet")
    (log / "_last_checkpoint").write_text(json.dumps({"version": 1, "size": len(cp_rows)}))
    # v2 removes f0 — only this JSON should be replayed on top.
    _commit(
        root,
        2,
        [
            {"remove": {"path": "f0.parquet", "deletionTimestamp": 3000, "dataChange": True}},
            {"commitInfo": {"operation": "DELETE", "timestamp": 3000}},
        ],
    )
    got = {(r["id"], r["name"]) for r in t.to_df().collect()}
    assert got == {(3, "c2"), (4, "d")}
    # Pre-checkpoint time travel still replays JSON from zero.
    v0 = {r["id"] for r in t.to_df(version=0).collect()}
    assert v0 == {1, 2, 3}


def test_unsupported_reader_features_refused(spark, tmp_path):
    root = tmp_path / "ext_delta_dv"
    _write_data(spark, root, "f0.parquet", [(1, "a", 0)])
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7, "readerFeatures": ["deletionVectors"]}},
            _meta(),
            {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1, "dataChange": True}},
        ],
    )
    t = DeltaInteropTable(spark, str(root))
    with pytest.raises(NotImplementedError, match="deletionVectors"):
        t.to_df()


def test_native_table_still_wins(spark, tmp_path):
    """for_path on the engine's own format returns a read-write
    LakeTable, untouched by the interop path."""
    path = str(tmp_path / "native")
    LakeTable.create(spark, path, df=spark.range(3))
    t = LakeTable.for_path(spark, path)
    assert isinstance(t, LakeTable)
    assert t.to_df().count() == 3
