"""Commit-log checkpoint compaction: folds are seeded from the newest
checkpoint, results identical to a from-zero replay, and time travel
to pre-checkpoint versions still works."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.tables import LakeTable
from databricks_delta_lake_project_spark.tables import log as tlog


def test_checkpoint_written_and_equivalent(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root, df=spark.createDataFrame([(0, "v0")], "id long, v string")
    )
    for i in range(1, 25):
        t.append(spark.createDataFrame([(i, f"v{i}")], "id long, v string"))

    assert t.version() == 24
    ckpts = tlog._checkpoint_versions(root)
    assert ckpts == [20]

    # fold through checkpoint == raw replay
    via_ckpt = {e["path"] for e in tlog.active_files(root)}
    raw: dict[str, dict] = {}
    for c in tlog.read_log(root, use_checkpoint=False):
        for r in c.get("remove", []):
            raw.pop(r, None)
        for a in c.get("add", []):
            raw[a["path"]] = a
    assert via_ckpt == set(raw)
    assert t.to_df().count() == 25

    # time travel to a pre-checkpoint version replays from zero
    assert t.to_df(version=5).count() == 6
    # time travel landing exactly on the checkpoint version
    assert t.to_df(version=20).count() == 21


def test_checkpoint_preserves_properties_and_schema(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root,
        df=spark.createDataFrame([(0,)], "id long"),
        properties={"enableChangeDataFeed": True},
    )
    for i in range(1, 22):
        t.append(spark.createDataFrame([(i,)], "id long"))
    assert tlog._checkpoint_versions(root) == [20]
    # properties and schema survive the checkpointed fold
    assert t.properties() == {"enableChangeDataFeed": True}
    assert [f.name for f in t.schema.fields] == ["id"]
    # CDF kept recording through checkpointed commits
    assert t.read_changes(starting_version=21).count() == 1


def test_append_txn_idempotent_and_checkpointed(spark, tmp_path):
    """Idempotent-writer tracking (Delta txnAppId/txnVersion): a replayed
    (app_id, version) append is skipped, and the watermark survives
    checkpoint folding so detection never replays the full log."""
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root, df=spark.createDataFrame([(0,)], "id long")
    )
    for b in range(21):  # crosses the checkpoint at commit 20
        v = t.append_txn(
            spark.createDataFrame([(100 + b,)], "id long"), "streamA", b
        )
        assert v > 0
    assert tlog._checkpoint_versions(root) == [20]
    assert t.to_df().count() == 22

    # replays of already-landed batches are skipped (no rows, no commit)
    before = t.version()
    assert t.append_txn(
        spark.createDataFrame([(999,)], "id long"), "streamA", 20
    ) == -1
    assert t.append_txn(
        spark.createDataFrame([(999,)], "id long"), "streamA", 5
    ) == -1
    assert t.version() == before
    assert t.to_df().count() == 22

    # watermark is per-app: a different writer at version 5 lands fine
    assert t.append_txn(
        spark.createDataFrame([(500,)], "id long"), "streamB", 5
    ) > 0
    assert t.txn_version("streamA") == 20
    assert t.txn_version("streamB") == 5
    assert t.txn_version("absent") == -1


def test_delete_after_checkpoint(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root, df=spark.createDataFrame([(0,)], "id long")
    )
    for i in range(1, 21):
        t.append(spark.createDataFrame([(i,)], "id long"))
    res = t.delete("id = 3")
    assert res["numDeletedRows"] == 1
    assert t.to_df().count() == 20
    assert t.to_df(version=20).count() == 21  # pre-delete snapshot intact
