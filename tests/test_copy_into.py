"""COPY INTO (beyond the reference repo's surface; semantics follow
Databricks' public COPY INTO docs): idempotent file-level batch
ingest. The commit that lands the rows records the loaded file
identities in its own operationParameters, so exactly-once holds
across re-runs and crashes WITHOUT a table scan — replay detection is
O(log commits), driver-side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml


@pytest.fixture()
def copy_world(spark, tmp_path):
    spark.range(50).withColumn("v", F.col("id") * 2).coalesce(2).write.parquet(
        str(tmp_path / "landing")
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "tgt"),
        schema=spark.range(1).withColumn("v", F.col("id") * 2).schema,
    )
    sqldml.register_table(spark, "ccat.bronze.tgt", t)
    yield t
    sqldml._REGISTRY.pop((session_key(spark), "ccat.bronze.tgt"), None)


def test_copy_into_idempotent_and_incremental(spark, copy_world, tmp_path):
    """A first run loads every file; a re-run loads NOTHING (the
    ledger rides the data commit); a newly landed file loads alone;
    'force'='true' reloads everything; a file rewritten in place (new
    mtime/size) counts as new."""
    t = copy_world
    stmt = (
        f"COPY INTO ccat.bronze.tgt FROM '{tmp_path / 'landing'}' "
        "FILEFORMAT = PARQUET"
    )
    r1 = run_statement(spark, stmt).collect()[0]
    assert (r1["numFilesLoaded"], r1["numOutputRows"]) == (2, 50)
    assert t.to_df().count() == 50
    r2 = run_statement(spark, stmt).collect()[0]
    assert (r2["numFilesLoaded"], r2["numSkippedFiles"]) == (0, 2)
    assert t.to_df().count() == 50
    # the ledger is crash-atomic with the data: it lives in the SAME
    # commit's operationParameters
    v = t.version()
    c = t._log.read_commit(t.root, v)
    assert c["operation"] == "COPY INTO"
    assert len(c["operationParameters"]["copiedFiles"]) == 2
    # incremental arrival
    spark.range(50, 70).withColumn("v", F.col("id") * 2).coalesce(
        1
    ).write.mode("append").parquet(str(tmp_path / "landing"))
    r3 = run_statement(spark, stmt).collect()[0]
    assert (r3["numFilesLoaded"], r3["numSkippedFiles"]) == (1, 2)
    assert t.to_df().count() == 70
    # force reload
    r4 = run_statement(
        spark, stmt + " COPY_OPTIONS ('force' = 'true')"
    ).collect()[0]
    assert r4["numFilesLoaded"] == 3
    assert t.to_df().count() == 140


def test_copy_into_csv_pattern_and_options(spark, tmp_path):
    """CSV reads under the TARGET schema (no inference) with
    FORMAT_OPTIONS passed through; PATTERN filters the landing dir;
    hidden files are skipped; a non-CSV stray never loads."""
    land = tmp_path / "csvland"
    land.mkdir()
    (land / "a.csv").write_text("id,v\n100,200\n101,202\n")
    (land / "b.csv").write_text("id,v\n102,204\n")
    (land / "skip.txt").write_text("zzz")
    (land / "_hidden.csv").write_text("id,v\n999,999\n")
    t = LakeTable.create(
        spark,
        str(tmp_path / "ctgt"),
        schema=spark.range(1).withColumn("v", F.col("id") * 2).schema,
    )
    sqldml.register_table(spark, "ccat.bronze.ctgt", t)
    try:
        r = run_statement(
            spark,
            f"COPY INTO ccat.bronze.ctgt FROM '{land}' FILEFORMAT = CSV "
            "PATTERN = '*.csv' FORMAT_OPTIONS ('header' = 'true')",
        ).collect()[0]
        assert r["numFilesLoaded"] == 2
        got = sorted(tuple(x) for x in t.to_df().collect())
        assert got == [(100, 200), (101, 202), (102, 204)]
        # the schema comes from the target: LONG columns, not strings
        assert [f.dataType.simpleString() for f in t.to_df().schema] == [
            "bigint", "bigint",
        ]
    finally:
        sqldml._REGISTRY.pop(
            (session_key(spark), "ccat.bronze.ctgt"), None
        )


def test_copy_into_refusals(spark, copy_world, tmp_path):
    with pytest.raises(ValueError, match="FILEFORMAT"):
        run_statement(
            spark,
            f"COPY INTO ccat.bronze.tgt FROM '{tmp_path / 'landing'}'",
        )
    with pytest.raises(ValueError, match="cannot parse COPY INTO"):
        run_statement(
            spark,
            "COPY INTO ccat.bronze.tgt FROM (SELECT 1) "
            "FILEFORMAT = PARQUET",
        )
    # a MISSING source fails loudly — a typo'd path must never green a
    # pipeline run with numFilesLoaded=0
    with pytest.raises(ValueError, match="does not exist"):
        run_statement(
            spark,
            f"COPY INTO ccat.bronze.tgt FROM '{tmp_path / 'landng'}' "
            "FILEFORMAT = PARQUET",
        )


def test_copy_into_hidden_dirs_and_file_source(spark, tmp_path):
    """Candidates with a hidden path COMPONENT (_delta_log/,
    _spark_metadata/, .staging/) are skipped — Spark's own file index
    does, and a leaf-only check would ingest commit JSON as data. A
    direct FILE source (no directory) loads that one file."""
    land = tmp_path / "land2"
    (land / "_delta_log").mkdir(parents=True)
    (land / "_delta_log" / "00000000000000000000.json").write_text("{}")
    (land / ".staging").mkdir()
    spark.range(7).withColumn("v", F.col("id")).coalesce(1).write.mode(
        "append"
    ).parquet(str(land / ".staging" / "tmp"))
    spark.range(5).withColumn("v", F.col("id")).coalesce(1).write.mode(
        "append"
    ).parquet(str(land / "good"))
    t = LakeTable.create(
        spark,
        str(tmp_path / "htgt"),
        schema=spark.range(1).withColumn("v", F.col("id")).schema,
    )
    sqldml.register_table(spark, "ccat.bronze.htgt", t)
    try:
        r = run_statement(
            spark,
            f"COPY INTO ccat.bronze.htgt FROM '{land}' "
            "FILEFORMAT = PARQUET",
        ).collect()[0]
        assert r["numOutputRows"] == 5  # only good/, never .staging/
        assert t.to_df().count() == 5
        # direct file source
        one = sorted((land / "good").glob("*.parquet"))[0]
        t2 = LakeTable.create(
            spark, str(tmp_path / "ftgt"), schema=t.schema
        )
        sqldml.register_table(spark, "ccat.bronze.ftgt", t2)
        r2 = run_statement(
            spark,
            f"COPY INTO ccat.bronze.ftgt FROM '{one}' "
            "FILEFORMAT = PARQUET",
        ).collect()[0]
        assert (r2["numFilesLoaded"], r2["numOutputRows"]) == (1, 5)
    finally:
        for nm in ("ccat.bronze.htgt", "ccat.bronze.ftgt"):
            sqldml._REGISTRY.pop((session_key(spark), nm), None)


def test_copy_into_from_volume(spark, tmp_path):
    """A UC-style /Volumes/<cat>/<schema>/<volume>/... source resolves
    through the declared volume's backing directory; an undeclared
    volume refuses loudly (the resolve_volume_path contract)."""
    land = tmp_path / "vol_backing"
    spark.range(9).withColumn("v", F.col("id")).coalesce(1).write.parquet(
        str(land / "day1")
    )
    run_statement(
        spark,
        f"CREATE EXTERNAL VOLUME vc.s.land LOCATION '{land}'",
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "vtgt"),
        schema=spark.range(1).withColumn("v", F.col("id")).schema,
    )
    sqldml.register_table(spark, "vc.bronze.vtgt", t)
    try:
        r = run_statement(
            spark,
            "COPY INTO vc.bronze.vtgt FROM '/Volumes/vc/s/land/day1' "
            "FILEFORMAT = PARQUET",
        ).collect()[0]
        assert (r["numFilesLoaded"], r["numOutputRows"]) == (1, 9)
        with pytest.raises(ValueError, match="no such volume|volume"):
            run_statement(
                spark,
                "COPY INTO vc.bronze.vtgt FROM '/Volumes/vc/s/nope/x' "
                "FILEFORMAT = PARQUET",
            )
    finally:
        sqldml._REGISTRY.pop((session_key(spark), "vc.bronze.vtgt"), None)
        run_statement(spark, "DROP VOLUME vc.s.land")


def test_copy_into_ledger_checkpoint_bounds_replay(
    spark, tmp_path, monkeypatch
):
    """Once a replay had to read _COPY_LEDGER_EVERY commits, a
    cumulative ledger snapshot is published; later runs seed from it
    and read only the commits past it — bounded JSON opens (counted
    by wrapping read_commit) with replay correctness unchanged, and a
    TORN snapshot is skipped for the commits (cache, never truth)."""
    from pathlib import Path

    monkeypatch.setattr(sqldml, "_COPY_LEDGER_EVERY", 4)
    landing = tmp_path / "lland"
    landing.mkdir()
    t = LakeTable.create(
        spark,
        str(tmp_path / "ltgt"),
        schema=spark.range(1).withColumn("v", F.col("id") * 2).schema,
    )
    sqldml.register_table(spark, "ccat.bronze.ltgt", t)
    stmt = (
        f"COPY INTO ccat.bronze.ltgt FROM '{landing}' "
        "FILEFORMAT = PARQUET"
    )
    try:
        for i in range(4):
            spark.range(i * 10, i * 10 + 10).withColumn(
                "v", F.col("id") * 2
            ).coalesce(1).write.parquet(str(landing / f"batch{i}"))
            r = run_statement(spark, stmt).collect()[0]
            assert r["numFilesLoaded"] == 1
        ldir = Path(t.root) / sqldml._COPY_LEDGER_DIR
        snaps = sorted(ldir.glob("ledger_*.json"))
        assert snaps, "4th replay read >= 4 commits: snapshot expected"
        # next run: seeded replay reads only commits PAST the snapshot
        seen: list[tuple[int, int]] = []
        real_replay = sqldml._copy_replay

        def spy_replay(tbl):
            res = real_replay(tbl)
            seen.append((res[1], res[2]))
            return res

        monkeypatch.setattr(sqldml, "_copy_replay", spy_replay)
        spark.range(100, 110).withColumn("v", F.col("id") * 2).coalesce(
            1
        ).write.parquet(str(landing / "batch4"))
        r = run_statement(spark, stmt).collect()[0]
        assert (r["numFilesLoaded"], r["numSkippedFiles"]) == (1, 4)
        snap_v = int(snaps[-1].stem.split("_")[-1])
        # seeded from the snapshot; zero commit-JSON reads below it
        assert seen == [(snap_v, t.version() - 1 - snap_v)]
        assert t.to_df().count() == 50
        # idempotent no-op re-run stays bounded and loads nothing
        seen.clear()
        r = run_statement(spark, stmt).collect()[0]
        assert (r["numFilesLoaded"], r["numSkippedFiles"]) == (0, 5)
        assert seen == [(snap_v, t.version() - snap_v)]
        # a torn snapshot is skipped: corrupt every snapshot and
        # replay falls back to the commits with identical answers
        for p in ldir.glob("ledger_*.json"):
            p.write_text("{ not json")
        r = run_statement(spark, stmt).collect()[0]
        assert (r["numFilesLoaded"], r["numSkippedFiles"]) == (0, 5)
        assert t.to_df().count() == 50
    finally:
        sqldml._REGISTRY.pop(
            (session_key(spark), "ccat.bronze.ltgt"), None
        )


def test_copy_into_snapshot_interval_property(spark, tmp_path):
    """``engine.copyInto.snapshotInterval`` governs when the ledger
    snapshots: 1 publishes after EVERY run (a pathological mix that
    never reaches the default-20 replay still gets bounded), the
    property is read at replay time (ALTER-able), garbage values fall
    back to the default, and the torn-snapshot fallback still holds
    at interval 1."""
    from pathlib import Path

    landing = tmp_path / "siland"
    landing.mkdir()
    t = LakeTable.create(
        spark,
        str(tmp_path / "sitgt"),
        schema=spark.range(1).withColumn("v", F.col("id") * 2).schema,
        properties={"engine.copyInto.snapshotInterval": "1"},
    )
    sqldml.register_table(spark, "ccat.bronze.sitgt", t)
    stmt = (
        f"COPY INTO ccat.bronze.sitgt FROM '{landing}' "
        "FILEFORMAT = PARQUET"
    )
    ldir = Path(t.root) / sqldml._COPY_LEDGER_DIR
    try:
        prev_snap = -1
        for i in range(3):
            spark.range(i * 10, i * 10 + 10).withColumn(
                "v", F.col("id") * 2
            ).coalesce(1).write.parquet(str(landing / f"b{i}"))
            run_statement(spark, stmt)
            snaps = sorted(ldir.glob("ledger_*.json"))
            assert snaps, f"run {i}: interval=1 must snapshot every run"
            # every run advances the newest snapshot to its own commit
            newest = int(snaps[-1].stem.split("_")[-1])
            assert newest > prev_snap
            prev_snap = newest
        # retention: never more than the two newest snapshots
        assert len(sorted(ldir.glob("ledger_*.json"))) <= 2
        # torn snapshots at interval 1 still fall back to the commits
        for p in ldir.glob("ledger_*.json"):
            p.write_text("{ torn")
        r = run_statement(spark, stmt).collect()[0]
        assert (r["numFilesLoaded"], r["numSkippedFiles"]) == (0, 3)
        assert t.to_df().count() == 30
        # a garbage value falls back to the default interval: short
        # replays stop snapshotting (no new VALID snapshot appears)
        run_statement(
            spark,
            "ALTER TABLE ccat.bronze.sitgt SET TBLPROPERTIES "
            "('engine.copyInto.snapshotInterval' = 'often')",
        )
        for p in ldir.glob("ledger_*.json"):
            p.unlink()
        spark.range(100, 110).withColumn("v", F.col("id") * 2).coalesce(
            1
        ).write.parquet(str(landing / "b3"))
        r = run_statement(spark, stmt).collect()[0]
        assert r["numFilesLoaded"] == 1
        assert not list(ldir.glob("ledger_*.json"))
    finally:
        sqldml._REGISTRY.pop(
            (session_key(spark), "ccat.bronze.sitgt"), None
        )
