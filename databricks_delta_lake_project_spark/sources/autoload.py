"""Auto-Loader-equivalent incremental file sources (S1-S3 in SURVEY
§2.1; reference ``src/bronze/ingest_crm_customers.py:86-142``,
``ingest_transactions.py:52-81``, ``ingest_clickstream.py:66-76``).

The Databricks ``cloudFiles`` source infers schemas, applies DDL
"schema hints", evolves the schema, and captures non-conforming data
in a ``_rescued_data`` column. OSS file-source streaming wants a fixed
schema up front, so this module (per SURVEY §1.3):

* infers the schema ONCE from a batch sample of the existing files,
* overlays user DDL hints (hint wins over inference),
* persists the result to a JSON schema registry next to the checkpoint
  (the ``cloudFiles.schemaLocation`` role) so later restarts reuse it,
* supports ``addNewColumns`` evolution on restart: re-infer, and any
  net-new columns are appended (existing column types are kept),
* emulates the rescue column for JSON/CSV with PERMISSIVE mode +
  ``columnNameOfCorruptRecord = _rescued_data``.

Scale notes: inference samples only file listings the driver already
has; the streaming read itself is an ordinary distributed file source
with ``maxFilesPerTrigger`` backpressure (T9).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    _parse_datatype_string,
)

RESCUE_COL = "_rescued_data"


class SchemaRegistry:
    """Versioned JSON schema store (the ``cloudFiles.schemaLocation``
    role, reference ``ingest_crm_customers.py:112``)."""

    def __init__(self, location: str):
        self.dir = Path(location)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _versions(self) -> list[int]:
        return sorted(
            int(p.stem.split("_")[1]) for p in self.dir.glob("schema_*.json")
        )

    def latest(self) -> StructType | None:
        vs = self._versions()
        if not vs:
            return None
        data = json.loads((self.dir / f"schema_{vs[-1]}.json").read_text())
        return StructType.fromJson(data)

    def save(self, schema: StructType) -> int:
        vs = self._versions()
        latest = self.latest()
        if latest is not None and latest.json() == schema.json():
            return vs[-1]
        v = (vs[-1] + 1) if vs else 0
        (self.dir / f"schema_{v}.json").write_text(
            json.dumps(schema.jsonValue(), indent=2)
        )
        return v


def infer_schema(
    spark: SparkSession,
    path: str,
    fmt: str,
    hints: str | None = None,
    options: dict[str, str] | None = None,
) -> StructType:
    """Batch-sample inference + DDL hint overlay (reference "schema
    hints", ``ingest_crm_customers.py:50-69``)."""
    reader = spark.read.options(**(options or {}))
    if fmt == "json":
        inferred = reader.json(path).schema
    elif fmt == "csv":
        inferred = reader.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path).schema
    elif fmt == "parquet":
        inferred = reader.parquet(path).schema
    else:
        raise ValueError(f"unsupported format: {fmt}")
    if not hints:
        return inferred
    hinted = {f.name: f for f in _parse_datatype_string(hints).fields}
    fields = [
        hinted.get(f.name, f) for f in inferred.fields
    ] + [f for n, f in hinted.items() if n not in {f.name for f in inferred.fields}]
    return StructType(fields)


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema_location: str,
    hints: str | None = None,
    rescue: bool = True,
    evolve: bool = True,
    max_files_per_trigger: int | None = 100,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental file stream with registry-backed schema.

    ``evolve=True`` mirrors ``cloudFiles.schemaEvolutionMode =
    addNewColumns`` (``ingest_crm_customers.py:113``): each start
    re-infers and appends net-new columns to the registered schema
    (a restart picks them up — same operational contract as Auto
    Loader, which also restarts the stream on schema change).
    """
    registry = SchemaRegistry(schema_location)
    known = registry.latest()
    if known is None:
        schema = infer_schema(spark, path, fmt, hints, options)
    elif evolve:
        fresh = infer_schema(spark, path, fmt, hints, options)
        have = {f.name for f in known.fields}
        schema = StructType(
            list(known.fields)
            + [f for f in fresh.fields if f.name not in have]
        )
    else:
        schema = known
    if rescue and fmt in ("json", "csv") and RESCUE_COL not in schema.names:
        schema = schema.add(StructField(RESCUE_COL, StringType(), True))
    registry.save(schema)

    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .options(**(options or {}))
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if fmt == "csv":
        reader = reader.option("header", "true")
    if rescue and fmt in ("json", "csv"):
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", RESCUE_COL
        )
    return reader.load(path)
