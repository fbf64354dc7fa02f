"""Read-only interop with the open Delta Lake table format.

The engine's own ACID format is the original parquet+JSON log in
``log.py``, but every persistent table in the reference is stored as
Delta (``/root/reference/config/pipeline_config.py:32-60``,
``src/utils/delta_lake_features.py:37-41``). This module lets a user
with existing Delta tables open them without ``delta-spark``: it
replays the public ``_delta_log`` protocol (JSON commits + parquet
checkpoints, as specified in the open Delta protocol) into an active
file set and hands the files to a plain parquet scan.

Scale notes:
* Log replay is driver-side but O(|log since checkpoint|) — the same
  contract delta-spark itself has; `_last_checkpoint` is honored so a
  long-lived table replays O(checkpoint interval) JSON commits, and
  the checkpoint parquet is read through Spark, not the driver.
* Partitioned tables use Delta's hive-style data paths, so the scan
  recovers partition columns via ``basePath`` — one multi-file scan,
  no per-partition unions, and partition pruning still works.
* Unsupported reader features (deletion vectors, column mapping) are
  detected from the protocol action and refused loudly rather than
  returning wrong rows.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DELTA_LOG_DIR = "_delta_log"

# Reader features this scan implements. Anything else advertised by a
# protocol action with minReaderVersion >= 3 is refused.
_SUPPORTED_READER_FEATURES = {"timestampNtz", "v2Checkpoint"}


def is_delta_table(path: str) -> bool:
    log = Path(path) / DELTA_LOG_DIR
    return log.is_dir() and any(log.glob("*.json"))


def _commit_versions(root: str) -> list[int]:
    log = Path(root) / DELTA_LOG_DIR
    out = []
    for p in log.glob("*.json"):
        stem = p.stem
        if stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _last_checkpoint(root: str) -> dict[str, Any] | None:
    p = Path(root) / DELTA_LOG_DIR / "_last_checkpoint"
    if not p.is_file():
        return None
    return json.loads(p.read_text())


class _State:
    """Accumulated table state from replaying actions in order."""

    def __init__(self) -> None:
        self.adds: dict[str, dict[str, Any]] = {}
        self.schema_json: str | None = None
        self.partition_columns: list[str] = []
        self.properties: dict[str, str] = {}
        self.protocol: dict[str, Any] = {}

    def apply(self, action: dict[str, Any]) -> None:
        if "add" in action and action["add"] is not None:
            add = action["add"]
            self.adds[add["path"]] = add
        elif "remove" in action and action["remove"] is not None:
            self.adds.pop(action["remove"]["path"], None)
        elif "metaData" in action and action["metaData"] is not None:
            md = action["metaData"]
            self.schema_json = md["schemaString"]
            self.partition_columns = list(md.get("partitionColumns") or [])
            self.properties = dict(md.get("configuration") or {})
        elif "protocol" in action and action["protocol"] is not None:
            self.protocol = action["protocol"]

    def check_readable(self) -> None:
        feats = set(self.protocol.get("readerFeatures") or [])
        unsupported = feats - _SUPPORTED_READER_FEATURES
        if unsupported:
            raise NotImplementedError(
                f"Delta reader features not supported: {sorted(unsupported)}"
            )
        if any(a.get("deletionVector") for a in self.adds.values()):
            raise NotImplementedError(
                "Delta deletion vectors not supported (rows would be wrong)"
            )


def _replay_checkpoint(spark: SparkSession, root: str, version: int, state: _State) -> None:
    """Fold a classic checkpoint parquet (one row per action) into state.

    The checkpoint is read through Spark — it can be arbitrarily large
    on a big table; only the surviving add-file rows are collected."""
    log = Path(root) / DELTA_LOG_DIR
    parts = sorted(str(p) for p in log.glob(f"{version:020d}.checkpoint*.parquet"))
    if not parts:
        raise FileNotFoundError(f"_last_checkpoint names v{version} but no parquet found")
    cp = spark.read.parquet(*parts)
    cols = set(cp.columns)
    if "metaData" in cols:
        for r in cp.filter(F.col("metaData.schemaString").isNotNull()).select("metaData").collect():
            state.apply({"metaData": r["metaData"].asDict(recursive=True)})
    if "protocol" in cols:
        for r in cp.filter(F.col("protocol.minReaderVersion").isNotNull()).select("protocol").collect():
            state.apply({"protocol": r["protocol"].asDict(recursive=True)})
    if "add" in cols:
        for r in cp.filter(F.col("add.path").isNotNull()).select("add").collect():
            state.apply({"add": r["add"].asDict(recursive=True)})
    # A checkpoint's `remove` rows are tombstones for VACUUM, not part
    # of the active set — files already absent from `add` stay absent.


def _replay(spark: SparkSession, root: str, version: int | None) -> _State:
    versions = _commit_versions(root)
    if not versions:
        raise ValueError(f"not a Delta table (no _delta_log commits): {root}")
    latest = versions[-1]
    if version is None:
        version = latest
    if version not in versions and version > latest:
        raise ValueError(f"version {version} not in log (latest {latest})")

    state = _State()
    start = 0
    cp = _last_checkpoint(root)
    if cp is not None and cp["version"] <= version:
        _replay_checkpoint(spark, root, cp["version"], state)
        start = cp["version"] + 1
    else:
        # Time travel to a pre-checkpoint version replays from zero —
        # valid only while those JSON commits still exist.
        missing = [v for v in range(start, version + 1) if v not in versions]
        if missing:
            raise ValueError(
                f"cannot reconstruct v{version}: commits {missing} absent "
                "(vacuumed past the requested version)"
            )
    log = Path(root) / DELTA_LOG_DIR
    for v in range(start, version + 1):
        p = log / f"{v:020d}.json"
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    state.apply(json.loads(line))
    state.check_readable()
    if state.schema_json is None:
        raise ValueError(f"no metaData action found in {root}")
    return state


class DeltaInteropTable:
    """Read-only handle on an external Delta Lake table.

    Duck-typed to the read surface of ``LakeTable``: ``to_df`` (with
    version time travel), ``schema``, ``version()``, ``history()``.
    Writes must go through the owning Delta writer — mutating someone
    else's `_delta_log` without the full protocol would corrupt it.
    """

    read_only = True

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.root = str(Path(path))
        if not is_delta_table(self.root):
            raise ValueError(f"not a Delta table: {path}")

    def version(self) -> int:
        return _commit_versions(self.root)[-1]

    @property
    def schema(self) -> StructType:
        state = _replay(self.spark, self.root, None)
        assert state.schema_json is not None
        return StructType.fromJson(json.loads(state.schema_json))

    def properties(self) -> dict[str, Any]:
        return _replay(self.spark, self.root, None).properties

    def to_df(self, version: int | None = None) -> DataFrame:
        state = _replay(self.spark, self.root, version)
        assert state.schema_json is not None
        schema = StructType.fromJson(json.loads(state.schema_json))
        if not state.adds:
            return self.spark.createDataFrame([], schema)
        paths = [str(Path(self.root) / a["path"]) for a in state.adds.values()]
        if state.partition_columns:
            # Delta lays partitioned data out hive-style; basePath makes
            # one scan recover the partition columns for all files. If a
            # writer used non-hive paths, fall back to per-file literal
            # columns from partitionValues (rare; bounded by |files|).
            if all(f"{c}=" in p for p in paths for c in state.partition_columns):
                df = (
                    self.spark.read.option("basePath", self.root)
                    .parquet(*paths)
                )
                return df.select(
                    *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
                )
            parts = []
            for a in state.adds.values():
                pdf = self.spark.read.parquet(str(Path(self.root) / a["path"]))
                for c in state.partition_columns:
                    field = schema[c]
                    pdf = pdf.withColumn(
                        c, F.lit(a["partitionValues"].get(c)).cast(field.dataType)
                    )
                parts.append(pdf.select(*[f.name for f in schema.fields]))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        return self.spark.read.schema(schema).parquet(*paths)

    def history(self) -> DataFrame:
        rows = []
        log = Path(self.root) / DELTA_LOG_DIR
        for v in _commit_versions(self.root):
            op, ts = None, None
            with open(log / f"{v:020d}.json") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    a = json.loads(line)
                    ci = a.get("commitInfo")
                    if ci:
                        op = ci.get("operation")
                        ts = ci.get("timestamp")
            rows.append((v, op, ts))
        return self.spark.createDataFrame(
            rows, "version BIGINT, operation STRING, timestamp_ms BIGINT"
        )
