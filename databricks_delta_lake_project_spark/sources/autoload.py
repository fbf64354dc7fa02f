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
from pyspark.sql import functions as F
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


EVOLUTION_MODES = ("addNewColumns", "rescue", "failOnNewColumns", "none")


class NewColumnsError(RuntimeError):
    """Raised by ``failOnNewColumns`` when the landing zone grows
    columns the registered schema doesn't know (the Auto Loader mode
    that treats schema drift as an operator-attention event)."""


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema_location: str,
    hints: str | None = None,
    rescue: bool = True,
    evolution_mode: str = "addNewColumns",
    max_files_per_trigger: int | None = 100,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental file stream with registry-backed schema, mirroring
    the four Auto Loader ``cloudFiles.schemaEvolutionMode`` values
    (reference ``ingest_crm_customers.py:94-104,113``):

    * ``addNewColumns`` — each start re-infers and appends net-new
      columns to the registered schema (a restart picks them up — the
      same operational contract as Auto Loader, which also restarts
      the stream on schema change).
    * ``rescue`` — the registered schema is frozen; for JSON, fields
      NOT in the schema are captured into ``_rescued_data`` as a JSON
      object (emulated with a text scan + ``from_json`` + JVM-side
      map_filter over the raw keys — no Python in the row path).
    * ``failOnNewColumns`` — raise :class:`NewColumnsError` at start
      if inference finds columns beyond the registered schema.
    * ``none`` — frozen schema; unknown fields are silently dropped.

    Malformed rows (all modes, JSON/CSV) land in ``_rescued_data``
    via PERMISSIVE parsing when ``rescue=True``.
    """
    if evolution_mode not in EVOLUTION_MODES:
        raise ValueError(f"evolution_mode must be one of {EVOLUTION_MODES}")
    if path.startswith("/Volumes/") or schema_location.startswith(
        "/Volumes/"
    ):
        # the reference's landing zones and checkpoint dirs live in UC
        # volumes (/Volumes/<cat>/<schema>/<vol>/..., e.g.
        # ingest_transactions.py:21-23) — translate to the declared
        # volume's backing directory
        from ..tables.metasql import resolve_volume_path

        path = resolve_volume_path(spark, path)
        # the schema registry WRITES evolved schemas into its volume
        schema_location = resolve_volume_path(
            spark, schema_location, intent="write"
        )
    registry = SchemaRegistry(schema_location)
    known = registry.latest()
    if known is None:
        schema = infer_schema(spark, path, fmt, hints, options)
    elif evolution_mode == "addNewColumns":
        fresh = infer_schema(spark, path, fmt, hints, options)
        have = {f.name for f in known.fields}
        schema = StructType(
            list(known.fields)
            + [f for f in fresh.fields if f.name not in have]
        )
    elif evolution_mode == "failOnNewColumns":
        fresh = infer_schema(spark, path, fmt, hints, options)
        have = {f.name for f in known.fields} | {RESCUE_COL}
        extra = [f.name for f in fresh.fields if f.name not in have]
        if extra:
            raise NewColumnsError(
                f"new columns in landing zone: {extra}; evolve the "
                "registered schema or switch evolution_mode"
            )
        schema = known
    else:  # rescue | none: frozen schema
        schema = known
    if rescue and fmt in ("json", "csv") and RESCUE_COL not in schema.names:
        schema = schema.add(StructField(RESCUE_COL, StringType(), True))
    registry.save(schema)

    if evolution_mode == "rescue" and fmt == "json":
        return _json_stream_with_rescued_fields(
            spark, path, schema, max_files_per_trigger, options
        )

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


def _json_stream_with_rescued_fields(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None,
    options: dict[str, str] | None,
) -> DataFrame:
    """``rescue`` emulation for line-delimited JSON: scan as text,
    parse the known columns with ``from_json``, and collect any raw
    top-level keys NOT in the schema into ``_rescued_data`` (a JSON
    object string, like Auto Loader's rescued-data column). All
    expressions are JVM built-ins — the extra cost over a native JSON
    scan is one ``from_json`` into a string map."""
    data_fields = [f for f in schema.fields if f.name != RESCUE_COL]
    known = F.array(*[F.lit(f.name) for f in data_fields])
    reader = spark.readStream.options(**(options or {}))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(path)
    parsed = F.from_json(F.col("value"), StructType(data_fields))
    raw_map = F.from_json(F.col("value"), "map<string,string>")
    extras = F.map_filter(raw_map, lambda k, _: ~F.array_contains(known, k))
    # from_json is PERMISSIVE (all-null struct on malformed input), so
    # malformed detection uses the raw string-map parse: null map <=>
    # the line isn't a JSON object at all -> rescue the whole line
    rescued = F.when(
        raw_map.isNull(), F.col("value")
    ).when(F.size(F.map_keys(extras)) > 0, F.to_json(extras))
    return raw.select(parsed.alias("r"), rescued.alias(RESCUE_COL)).select(
        "r.*", RESCUE_COL
    )
