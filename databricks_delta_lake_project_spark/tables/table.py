"""ACID table on Parquet + JSON commit log ("lakehouse-lite").

Engine-owned replacement for the Delta-table surface the reference
uses everywhere (delta-spark is not available in this environment):

* MERGE builder            -> reference ``src/silver/transform_customers.py:174-202``
* DELETE / UPDATE by pred  -> ``governance/compliance_policies.py:136-295``
* time travel + RESTORE    -> ``src/utils/delta_lake_features.py:65-176``
* change data feed         -> ``src/utils/delta_lake_features.py:346-368``
* OPTIMIZE / VACUUM        -> ``src/utils/performance_optimization.py:27-134``,
                              ``delta_lake_features.py:385-393``
* DESCRIBE HISTORY         -> ``delta_lake_features.py:46-60``

Scale design (what keeps this working at 100 TB):

* Copy-on-write at file granularity. DELETE/UPDATE/MERGE first compute
  the *touched file set* and rewrite only those files; untouched files
  are carried forward by reference in the log.
* File-level min/max stats are collected from parquet footers at write
  time and used to prune the touched-file search: an equality MERGE
  whose source keys span a narrow range never scans files outside that
  range (same idea as Delta data skipping).
* All row movement is DataFrame-planned (joins, filters); the driver
  only handles file *names*, never rows.
"""

from __future__ import annotations

import bisect
import json
import re
import shutil
import time
import uuid
from pathlib import Path
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from . import log as tlog

_STATS_TYPES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "double",
    "float",
    "string",
    "date",
    "timestamp",
    "boolean",
)

CDF_TYPE_COL = "_change_type"
CDF_VERSION_COL = "_commit_version"


def _json_safe(v: Any) -> Any:
    if v is None or isinstance(v, (int, float, bool, str)):
        return v
    return str(v)


def _physical_read_schema(schema: StructType) -> StructType | None:
    """Physical twin of a column-mapped logical schema, or None when
    the schema carries no mapping metadata (the common case)."""
    from .delta_interop import _PHYS_KEY, _physical_type

    def mapped(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType

        if isinstance(dt, StructType):
            return any(
                _PHYS_KEY in f.metadata or mapped(f.dataType)
                for f in dt.fields
            )
        if isinstance(dt, ArrayType):
            return mapped(dt.elementType)
        if isinstance(dt, MapType):
            return mapped(dt.keyType) or mapped(dt.valueType)
        return False

    if not mapped(schema):
        return None
    return _physical_type(schema)


def _alive_rows(e: dict[str, Any]) -> int:
    """Rows a reader sees in this file: physical rows minus any
    deletion-vector cardinality."""
    dv = e.get("deletionVector") or {}
    return int(e.get("rows", 0)) - int(dv.get("cardinality", 0))


def _file_stats(path: Path) -> dict[str, Any]:
    """File-level stats from the parquet footer (no data read)."""
    meta = pq.ParquetFile(path).metadata
    cols: dict[str, dict[str, Any]] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for i in range(g.num_columns):
            c = g.column(i)
            name = c.path_in_schema
            if "." in name:  # nested — skip
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                continue
            cur = cols.setdefault(name, {"min": None, "max": None, "nulls": 0})
            mn, mx = _json_safe(st.min), _json_safe(st.max)
            if cur["min"] is None or (mn is not None and mn < cur["min"]):
                cur["min"] = mn
            if cur["max"] is None or (mx is not None and mx > cur["max"]):
                cur["max"] = mx
            cur["nulls"] += st.null_count or 0
    return {
        "rows": meta.num_rows,
        "bytes": path.stat().st_size,
        "stats": cols,
    }


class LakeTable:
    """Handle on an ACID parquet table rooted at ``path``.

    The commit log speaks one of two formats behind the same duck-typed
    backend surface: the engine's own parquet+JSON log (``log.py``) or
    the open Delta Lake ``_delta_log`` protocol
    (``delta_log.DeltaLogBackend``) — every write operation (append,
    MERGE, DELETE, UPDATE, OPTIMIZE, RESTORE, ...) is format-agnostic
    copy-on-write over whichever log owns the table."""

    def __init__(self, spark: SparkSession, path: str, log_backend=None):
        self.spark = spark
        self.root = str(Path(path))
        if log_backend is not None:
            self._log = log_backend
        elif tlog.latest_version(self.root) is not None:
            self._log = tlog
        else:
            from .delta_interop import is_delta_table
            from .delta_log import DeltaLogBackend

            if not is_delta_table(self.root):
                raise ValueError(f"not a LakeTable (no commits): {path}")
            self._log = DeltaLogBackend(spark)
        if self._log.latest_version(self.root) is None:
            raise ValueError(f"not a LakeTable (no commits): {path}")

    # -- creation ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame | None = None,
        schema: StructType | None = None,
        properties: dict[str, Any] | None = None,
        format: str = "engine",
        partition_by: list[str] | None = None,
    ) -> "LakeTable":
        """Create a table. ``format="engine"`` uses the engine's own
        parquet+JSON log; ``format="delta"`` persists the commit log as
        a real Delta Lake ``_delta_log`` so external Delta tooling can
        read (and keep writing) the table. ``partition_by`` (Delta
        format only) lays data out hive-style with ``partitionValues``
        stamped on every add action — the engine-native format instead
        skips files by footer stats and stays unpartitioned."""
        root = str(Path(path))
        if format == "delta":
            from .delta_log import DeltaLogBackend

            log = DeltaLogBackend(spark)
        elif format == "engine":
            if partition_by:
                raise ValueError(
                    "partition_by requires format='delta' — engine-native "
                    "tables skip by footer stats instead of hive layout"
                )
            log = tlog
        else:
            raise ValueError(f"unknown table format: {format!r}")
        log.ensure_layout(root)
        if log.latest_version(root) is not None:
            raise ValueError(f"table already exists: {path}")
        extra = (
            {"partition_columns": list(partition_by)} if partition_by else {}
        )
        if format == "delta" and str(
            (properties or {}).get("delta.columnMapping.mode", "none")
        ).lower() in ("name", "id"):
            # creating a MAPPED table: every field needs columnMapping
            # id/physicalName metadata before the first commit (the
            # same assignment delta-spark performs on CREATE), and the
            # initial load must land under physical names — so commit
            # the mapped schema first and route the data through the
            # normal append path, which renames logical -> physical
            from .delta_log import assign_mapping_metadata

            base_schema = schema if df is None else df.schema
            mapped_schema, max_id = assign_mapping_metadata(base_schema)
            props = dict(properties or {})
            props["delta.columnMapping.maxColumnId"] = str(max_id)
            log.commit(
                root, "CREATE TABLE", [], [], mapped_schema.json(),
                properties=props,
                **extra,
            )
            t = cls(spark, root, log_backend=log)
            if df is not None:
                t.append(df)
            return t
        if df is None:
            if schema is None:
                raise ValueError("need df or schema")
            log.commit(
                root, "CREATE TABLE", [], [], schema.json(),
                properties=properties or {},
                **extra,
            )
        else:
            # the initial CTAS load is a write like any other: declared
            # constraints judge it and generated columns are computed
            # (schema/property metadata can arrive via create itself).
            # Capture the schema JSON FIRST — withColumn strips field
            # metadata from the frame, and the commit must record it
            schema_json = df.schema.json()
            decl_schema = df.schema
            for f in decl_schema.fields:
                gexpr = f.metadata.get("delta.generationExpression")
                if gexpr:
                    df = df.withColumn(
                        f.name, F.expr(gexpr).cast(f.dataType)
                    )
            _raise_on_constraint_violations(
                df, _collect_constraint_checks(properties or {}, decl_schema)
            )
            adds, n = _write_files(
                df, root, partition_columns=partition_by
            )
            log.commit(
                root, "CREATE TABLE AS SELECT", adds, [], schema_json,
                metrics={"numOutputRows": n, "numFiles": len(adds)},
                properties=properties or {},
                **extra,
            )
            t = cls(spark, root, log_backend=log)
            t._write_cdf(df, "insert", log.latest_version(root))
            return t
        return cls(spark, root, log_backend=log)

    @classmethod
    def is_table(cls, path: str) -> bool:
        return tlog.latest_version(str(Path(path))) is not None

    @classmethod
    def for_path(cls, spark: SparkSession, path: str):
        """Open a table at ``path``. A native LakeTable opens
        read-write. A directory carrying a real Delta Lake
        ``_delta_log`` opens READ-WRITE through the Delta log backend
        for every readable SHAPE — partitioned, column-mapped, live
        deletion vectors — with appends/MERGEs landing as real
        ``_delta_log`` commits; CHECK constraints and invariants are
        ENFORCED on new rows and generated columns recomputed. Only
        obligations the engine cannot honor (identity columns, nested
        generation expressions, unknown v7 writerFeatures) fall back to
        the read-only interop handle (``delta_interop.DeltaInteropTable``
        — same ``to_df``/``schema``/``version``/``history`` read
        surface), so existing Delta tables from the reference stack
        remain queryable."""
        root = str(Path(path))
        if tlog.latest_version(root) is None:
            from .delta_interop import DeltaInteropTable, is_delta_table
            from .delta_log import DeltaLogBackend

            if is_delta_table(root):
                backend = DeltaLogBackend(spark)
                try:
                    backend.check_writable(root)
                except NotImplementedError:
                    # not writable by this engine — keep it queryable
                    # (readable cases) or failing loudly (unreadable
                    # feature refusals surface again on to_df)
                    return DeltaInteropTable(spark, root)
                return cls(spark, root, log_backend=backend)
        return cls(spark, path)

    # -- reads -------------------------------------------------------------

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._log.schema_at(self.root)))

    def version(self) -> int:
        v = self._log.latest_version(self.root)
        assert v is not None
        return v

    def properties(self) -> dict[str, Any]:
        return self._log.table_properties(self.root)

    def _files(self, version: int | None = None) -> list[dict[str, Any]]:
        return self._log.active_files(self.root, version)

    def _read_files(
        self,
        entries: list[dict[str, Any]],
        version: int | None = None,
        with_row_index: bool = False,
    ) -> DataFrame:
        """Scan a file set under the table schema. Entries carrying a
        ``deletionVector`` descriptor (Delta-backed tables) have their
        marked row indices dropped via a broadcast anti-join — every
        caller (snapshot reads, touched-file probes, copy-on-write
        rewrites) therefore sees only ALIVE rows. ``with_row_index``
        additionally exposes ``__file``/``__pos`` metadata columns (the
        DV delete path needs physical positions)."""
        schema_json = self._log.schema_at(self.root, version)
        schema = StructType.fromJson(json.loads(schema_json))
        if not entries:
            df = self.spark.createDataFrame([], schema)
            if with_row_index:
                df = df.withColumn(
                    "__file", F.lit(None).cast("string")
                ).withColumn("__pos", F.lit(None).cast("long"))
            return df
        paths = [str(Path(self.root) / e["path"]) for e in entries]
        dvd = [e for e in entries if e.get("deletionVector")]
        need_meta = bool(dvd) or with_row_index
        meta_cols = [
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        ]
        pcols = self._partition_columns()
        phys = _physical_read_schema(schema)
        if pcols:
            df = self._scan_partitioned(entries, schema, pcols, need_meta)
            if not need_meta:
                return df
        elif phys is not None:
            # column mapping: parquet columns carry PHYSICAL names —
            # read under the physical schema, rename back to logical
            # (cast-by-position renames nested struct fields too);
            # mapped tables are never partitioned (check_readable)
            rename = [
                F.col(pf.name).cast(lf.dataType).alias(lf.name)
                for pf, lf in zip(phys.fields, schema.fields)
            ]
            base = self.spark.read.schema(phys).parquet(*paths)
            if not need_meta:
                return base.select(*rename)
            df = base.select(*rename, *meta_cols)
        elif not need_meta:
            return self.spark.read.schema(schema).parquet(*paths)
        else:
            df = self.spark.read.schema(schema).parquet(*paths).select(
                "*", *meta_cols
            )
        if dvd:
            import pandas as pd

            from .delta_interop import _dv_positions, spark_file_key

            frames = []
            for e in dvd:
                positions = _dv_positions(self.root, e["deletionVector"])
                fpath = spark_file_key(self.root, e["path"])
                frames.append(
                    pd.DataFrame(
                        {"__file": [fpath] * len(positions), "__pos": positions}
                    )
                )
            deleted = pd.concat(frames, ignore_index=True)
            if not deleted.empty:
                df = df.join(
                    F.broadcast(self.spark.createDataFrame(deleted)),
                    ["__file", "__pos"],
                    "left_anti",
                )
        if not with_row_index:
            df = df.drop("__file", "__pos")
        return df

    def _partition_columns(self) -> list[str]:
        return list(self._log.partition_columns(self.root))

    def _write_partition_columns(self) -> list[str] | None:
        """Partition columns under their ON-DISK names for the writer:
        ``_prep_write`` renames a mapped frame to physical names, so
        ``partitionBy`` (and the hive dirs + partitionValues it
        produces) must use the physical names too."""
        pcols = self._partition_columns()
        if not pcols:
            return None
        schema = self.schema
        if _physical_read_schema(schema) is None:
            return pcols
        from .delta_interop import physical_name_map

        m = physical_name_map(schema)
        return [m[c] for c in pcols]

    def _prep_write(
        self,
        df: DataFrame,
        schema: StructType | None = None,
        enforce: bool = True,
        regenerate: bool = True,
    ) -> DataFrame:
        """Prepare an outgoing frame: recompute GENERATED columns,
        enforce CHECK constraints/invariants, rename to PHYSICAL
        column names on mapped tables. ``schema`` overrides the table
        schema during mapped schema evolution (the evolved mapping
        exists before the commit that records it).

        ``enforce=False`` is for frames of PRE-EXISTING rows carried
        forward unchanged (DELETE's kept rows, OPTIMIZE compaction,
        the unchanged portion of a copy-on-write rewrite): real Delta
        validates constraints on NEW data only — re-checking old rows
        would make maintenance ops fail on tables whose historical
        data this engine evaluates differently than its original
        writer. Callers that pass ``enforce=False`` over a frame
        CONTAINING changed rows must enforce on the changed subset
        explicitly. ``regenerate=False`` additionally passes existing
        generated-column values through untouched (OPTIMIZE is
        dataChange=false and must not alter bytes)."""
        schema = schema if schema is not None else self.schema
        if regenerate:
            df = self._apply_generated(df, schema)
        if enforce:
            self._enforce_constraints(df, schema)
        phys = _physical_read_schema(schema)
        if phys is None:
            return df
        return df.select(
            *[
                F.col(lf.name).cast(pf.dataType).alias(pf.name)
                for lf, pf in zip(schema.fields, phys.fields)
            ]
        )

    def _apply_generated(
        self, df: DataFrame, schema: StructType | None = None
    ) -> DataFrame:
        """Recompute GENERATED columns — the expression DEFINES the
        column, so recomputation is always protocol-correct: appends
        may omit the column entirely, UPDATE/MERGE post-images can
        never go stale, and a caller providing an inconsistent value
        gets the defined one. Also applied to CDF post-image/insert
        frames so the change feed matches the table."""
        schema = schema if schema is not None else self.schema
        for f in schema.fields:
            gexpr = f.metadata.get("delta.generationExpression")
            if gexpr:
                df = df.withColumn(f.name, F.expr(gexpr).cast(f.dataType))
        return df

    def _enforce_constraints(self, df: DataFrame, schema: StructType) -> None:
        """Enforce CHECK constraints (``delta.constraints.<name>``
        table properties) and column invariants (``delta.invariants``
        field metadata, struct nesting) on an outgoing frame of NEW
        rows — the writer obligation the protocol attaches to those
        features. SQL semantics: a row violates only when the
        expression evaluates FALSE (NULL passes, like CHECK in every
        SQL engine). One aggregation covers all constraints; zero cost
        when none are defined (the overwhelmingly common case)."""
        # both backends implement table_properties; an error here must
        # surface, not silently disable enforcement
        props = self._log.table_properties(self.root)
        checks = _collect_constraint_checks(props, schema)
        _raise_on_constraint_violations(df, checks)



    def _scan_partitioned(
        self,
        entries: list[dict[str, Any]],
        schema: StructType,
        pcols: list[str],
        need_meta: bool,
    ) -> DataFrame:
        """Scan hive-partitioned file entries under the logical schema.

        Partition column values live in each add action's
        ``partitionValues``, not in the data files. The fast path is ONE
        directory-discovery scan with an explicit ``basePath`` (every
        real Delta writer lays files out hive-style) — a single
        FileScan, partition columns recovered by Spark, no unions. Only
        a non-hive layout (possible per protocol: ``partitionValues``
        is authoritative, paths are opaque) falls back to per-partition
        scans with literal columns, bounded by the number of DISTINCT
        partition tuples among the entries, not file count."""
        from .delta_interop import _physical_type, physical_name_map

        meta_cols = [
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__pos"),
        ]
        # under column mapping every on-disk name — data columns, hive
        # partition dirs, partitionValues keys — is the PHYSICAL name;
        # both maps are identity when unmapped
        phys = _physical_type(schema)
        phys_by_logical = physical_name_map(schema)
        pmap = {c: phys_by_logical[c] for c in pcols}
        paths = [str(Path(self.root) / e["path"]) for e in entries]
        prefix = f"{tlog.DATA_DIR}/"
        hive = all(
            f"{pmap[c]}=" in e["path"] for e in entries for c in pcols
        ) and all(
            "=" in seg
            for e in entries
            for seg in Path(
                e["path"][len(prefix):]
                if e["path"].startswith(prefix)
                else e["path"]
            ).parent.parts
        )
        under_data = [
            e["path"].startswith(prefix) for e in entries
        ]
        if hive and (all(under_data) or not any(under_data)):
            base = (
                str(tlog.data_dir(self.root))
                if all(under_data)
                else self.root
            )
            df = self.spark.read.option("basePath", base).parquet(*paths)
            return df.select(
                *[
                    F.col(phys_by_logical[f.name])
                    .cast(f.dataType)
                    .alias(f.name)
                    for f in schema.fields
                ],
                *(meta_cols if need_meta else []),
            )
        data_schema = StructType(
            [f for f in phys.fields if f.name not in set(pmap.values())]
        )
        groups: dict[tuple, list[dict[str, Any]]] = {}
        for e in entries:
            pv = e.get("partitionValues") or {}
            groups.setdefault(
                tuple(pv.get(pmap[c]) for c in pcols), []
            ).append(e)
        parts = []
        for key, es in groups.items():
            g = self.spark.read.schema(data_schema).parquet(
                *[str(Path(self.root) / e["path"]) for e in es]
            )
            if need_meta:
                g = g.select("*", *meta_cols)
            by_logical = dict(zip(pcols, key))
            cols = [
                (
                    F.lit(by_logical[f.name]).cast(f.dataType).alias(f.name)
                    if f.name in by_logical
                    else F.col(phys_by_logical[f.name])
                    .cast(f.dataType)
                    .alias(f.name)
                )
                for f in schema.fields
            ]
            parts.append(
                g.select(
                    *cols,
                    *(["__file", "__pos"] if need_meta else []),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def to_df(
        self, version: int | None = None, timestamp_ms: int | None = None
    ) -> DataFrame:
        """Snapshot read; ``version``/``timestamp_ms`` = time travel
        (reference ``delta_lake_features.py:83-108``)."""
        if timestamp_ms is not None:
            if version is not None:
                raise ValueError("version and timestamp are exclusive")
            version = self._log.version_at_timestamp(self.root, timestamp_ms)
        return self._read_files(self._files(version), version)

    def read_where(self, condition: str) -> DataFrame:
        """Data-skipping read: open only files whose footer [min, max]
        stats can contain rows matching ``condition``, then apply the
        full filter (the read-path twin of the DELETE/UPDATE/MERGE
        pruning; Delta's "skip 99%+ of files" claim, reference
        ``performance_optimization.py:175-184``).

        Pruning uses the conjunctive-comparison bounds contract of
        ``predicate_bounds`` — anything it can't prove keeps every
        file, so results always equal ``to_df().filter(condition)``.
        After ``optimize(zorder_by=[cols...])`` files are
        range-disjoint on the cluster columns and a point/range
        predicate touches O(1) of them.
        """
        kept = _prune_by_stats(self._files(), predicate_bounds(condition))
        return self._read_files(kept).filter(condition)

    def read_in(
        self, column: str, values: list[Any], prune_only: bool = False
    ) -> DataFrame:
        """IN-list data-skipping read: keep a file only if at least one
        probe value lands inside its [min, max] for ``column``; then
        apply the exact ``isin`` filter.

        This is the index-probe primitive ``read_where`` can't express
        (an IN list is a disjunction): with files range-clustered on
        ``column``, a small probe set stabs O(|values|) files out of
        the whole table. ``values`` lives on the driver — suitable for
        batch-sized probe sets (thousands to low millions), not for
        table-sized ones; beyond that, fall back to a join against
        ``to_df()``. ``prune_only=True`` skips the residual ``isin``
        filter for callers that apply their own equality (e.g. a
        subsequent join on ``column``) — with a large probe list the
        redundant InSet just burns CPU.
        """
        if not values:
            return self._read_files([]).filter(F.lit(False))
        probe = sorted(values)

        def _hits(e: dict[str, Any]) -> bool:
            st = (e.get("stats") or {}).get(column)
            if not st or st.get("min") is None or st.get("max") is None:
                return True  # no stats: never unsafe to keep
            try:
                i = bisect.bisect_left(probe, st["min"])
                return i < len(probe) and probe[i] <= st["max"]
            except TypeError:
                return True
        kept = [e for e in self._files() if _hits(e)]
        df = self._read_files(kept)
        return df if prune_only else df.filter(F.col(column).isin(values))

    def history(self) -> DataFrame:
        """DESCRIBE HISTORY equivalent (``delta_lake_features.py:46-60``)."""
        rows = [
            (
                c["version"],
                c["timestamp_ms"],
                c["operation"],
                json.dumps(c.get("operationParameters", {})),
                json.dumps(c.get("operationMetrics", {})),
            )
            for c in self._log.read_log(self.root)
        ]
        return self.spark.createDataFrame(
            rows,
            "version long, timestamp_ms long, operation string, "
            "operationParameters string, operationMetrics string",
        )

    # -- writes ------------------------------------------------------------

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Append with schema-on-write enforcement (§1.3): extra
        columns are rejected unless ``merge_schema`` (the Delta
        ``mergeSchema``/``autoMerge`` contract,
        ``delta_lake_features.py:182-262``); missing columns are
        null-filled. Old files read under an evolved schema null-fill
        the new columns, exactly like Delta."""
        df = self._conform(df, merge_schema)
        table_schema = self.schema
        schema_json, props = df.schema.json(), None
        write_schema: StructType | None = None
        if (
            _physical_read_schema(table_schema) is not None
            and [f.name for f in df.schema.fields]
            != [f.name for f in table_schema.fields]
        ):
            # mapped evolution: assign columnMapping ids/physicalNames
            # to the net-new columns BEFORE writing, so the files land
            # under the same physical names the commit records
            write_schema, props = self._log.evolve_mapped_schema(
                self.root, df.schema
            )
            schema_json = write_schema.json()
        adds, n = _write_files(
            self._prep_write(df, schema=write_schema),
            self.root,
            partition_columns=self._write_partition_columns(),
        )
        v = self._log.commit(
            self.root, "WRITE", adds, [], schema_json,
            parameters={"mode": "Append", "mergeSchema": merge_schema},
            metrics={"numOutputRows": n, "numFiles": len(adds)},
            properties=props,
        )
        self._write_cdf(self._read_files(adds), "insert", v)
        return v

    def txn_version(self, app_id: str) -> int:
        """Highest committed transaction version for ``app_id``, or -1.
        Mirrors Delta's idempotent-writer tracking (txnAppId/txnVersion).
        Seeds from the newest checkpoint so replay detection is
        O(checkpoint interval), not O(table history)."""
        ckpt = self._log.latest_checkpoint(self.root)
        latest = int(ckpt.get("txns", {}).get(app_id, -1)) if ckpt else -1
        for c in self._log.read_log(self.root, use_checkpoint=True):
            txn = c.get("operationParameters", {}).get("txn")
            if txn and txn.get("appId") == app_id:
                latest = max(latest, int(txn["version"]))
        return latest

    def append_txn(self, df: DataFrame, app_id: str, version: int) -> int:
        """Idempotent append: commit ``df`` tagged (app_id, version);
        if that version (or a later one) is already in the log, skip —
        the micro-batch was already landed and this is a replay.

        This is the scalable exactly-once primitive for streaming
        sinks: O(commit log) replay detection with NO table scan, where
        a MERGE-based dedup would join the batch against the whole
        table (reference exactly-once contract,
        ``transform_transactions.py:98-146``; Delta txnAppId/txnVersion
        semantics). Returns the commit version, or -1 on skip.
        """
        if self.txn_version(app_id) >= version:
            return -1
        out = self._conform(df, merge_schema=False)
        adds, n = _write_files(
            self._prep_write(out),
            self.root,
            partition_columns=self._write_partition_columns(),
        )
        v = self._log.commit(
            self.root, "WRITE", adds, [], out.schema.json(),
            parameters={
                "mode": "Append",
                "txn": {"appId": app_id, "version": version},
            },
            metrics={"numOutputRows": n, "numFiles": len(adds)},
        )
        self._write_cdf(self._read_files(adds), "insert", v)
        return v

    def _conform(self, df: DataFrame, merge_schema: bool) -> DataFrame:
        """Align an incoming frame with the table schema: cast known
        columns, null-fill missing ones, and either reject or (with
        ``merge_schema``) append net-new columns."""
        current = self.schema
        have = {f.name for f in current.fields}
        extra = [c for c in df.columns if c not in have]
        if extra and not merge_schema:
            raise ValueError(
                f"schema enforcement: unknown columns {extra}; "
                "pass merge_schema=True to evolve the table schema"
            )
        cols = [
            (
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in current.fields
        ]
        cols += [F.col(c) for c in extra]  # evolved columns keep their type
        return df.select(*cols)

    def overwrite(self, df: DataFrame) -> int:
        snap = self._log.latest_version(self.root)
        old = [e["path"] for e in self._files()]
        adds, n = _write_files(
            self._prep_write(df),
            self.root,
            partition_columns=self._write_partition_columns(),
        )
        return self._log.commit(
            self.root, "WRITE", adds, old, df.schema.json(),
            parameters={"mode": "Overwrite"},
            metrics={"numOutputRows": n, "numFiles": len(adds)},
            expected_version=snap,
        )

    def delete(
        self,
        condition: str | Column,
        strategy: str = "auto",
        dv_max_rows: int = 1_000_000,
    ) -> dict[str, Any]:
        """DELETE by predicate (``compliance_policies.py:136-212``).

        Strategies:

        * ``"rewrite"`` — copy-on-write: rewrite touched files without
          the matching rows. Always available.
        * ``"dv"`` — deletion vectors (Delta-backed tables only): mark
          the matching ROW INDICES in a roaring bitmap sidecar and
          re-add the untouched data file with the DV descriptor. Cost
          is O(deleted rows), not O(touched-file bytes) — the modern
          Delta small-delete path (a GDPR single-subject erasure
          touches no data file at all). Falls back to rewrite when the
          deleted set exceeds ``dv_max_rows`` (the positions pass
          through the driver, bounded by design — DV-sized deletes;
          bulk deletes want the rewrite anyway).
        * ``"auto"`` — ``dv`` when the table is Delta-backed AND
          ``delta.enableDeletionVectors`` is set (the property real
          Delta writers key on), else ``rewrite``.
        """
        if strategy not in ("auto", "dv", "rewrite"):
            raise ValueError(f"unknown DELETE strategy: {strategy!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        snap = self._log.latest_version(self.root)
        bounds, complete = (
            predicate_bounds_full(condition)
            if isinstance(condition, str)
            else ({}, False)
        )
        # metadata-only whole-file drop: files whose stats PROVE every
        # row matches a complete conjunctive predicate are removed by
        # log action alone — never read, never rewritten. This is the
        # path that makes "DELETE WHERE day = X" on a 100 TB
        # partitioned table an O(log) operation (Delta's partition
        # delete); partitionValues point-interval stats qualify whole
        # hive partitions.
        whole: list[dict[str, Any]] = []
        if complete and bounds:
            whole = [
                e
                for e in _prune_by_stats(self._files(), bounds)
                if _file_fully_matches(e, bounds)
            ]
        whole_paths = {e["path"] for e in whole}
        # a foreign add action without a stats JSON reports rows=0 —
        # the drop is still provably correct (partition synth stats),
        # but the metric needs the real count: one driver-side footer
        # read per such file (bounded by |whole|)
        for e in whole:
            if not e.get("rows"):
                e["rows"] = pq.ParquetFile(
                    Path(self.root) / e["path"]
                ).metadata.num_rows
        n_whole = sum(_alive_rows(e) for e in whole)
        dv_capable = self._log is not tlog
        if strategy == "dv" and not dv_capable:
            raise ValueError(
                "deletion vectors need the Delta log backend "
                "(create(format='delta') or a Delta table via for_path)"
            )
        if strategy == "auto":
            props = self.properties()
            dv_enabled = str(
                props.get(
                    "delta.enableDeletionVectors",
                    props.get("enableDeletionVectors", False),
                )
            ).lower() in ("true", "1")
            strategy = "dv" if (dv_capable and dv_enabled) else "rewrite"
        if strategy == "dv":
            result = self._delete_dv(
                cond, bounds, dv_max_rows, whole, n_whole, snap
            )
            if result is not None:
                return result
            # too many rows for a DV: fall through to rewrite
        touched = self._touched_files(cond, bounds, exclude_paths=whole_paths)
        if not touched and not whole:
            return {"numRemovedFiles": 0, "numDeletedRows": 0}
        if touched:
            tdf = self._read_files(touched).persist()
            kept = tdf.filter(~cond | cond.isNull())
            deleted = tdf.filter(cond)
            n_deleted = deleted.count()
            adds, _ = _write_files(
                # kept rows are PRE-EXISTING and unchanged: no
                # re-validation, no regeneration (see _prep_write)
                self._prep_write(kept, enforce=False, regenerate=False),
                self.root,
                partition_columns=self._write_partition_columns(),
            )
        else:
            tdf, deleted, n_deleted, adds = None, None, 0, []
        metrics = {
            "numRemovedFiles": len(touched) + len(whole),
            "numWholeFilesRemoved": len(whole),
            "numAddedFiles": len(adds),
            "numDeletedRows": n_deleted + n_whole,
        }
        v = self._log.commit(
            self.root, "DELETE", adds,
            [e["path"] for e in touched] + sorted(whole_paths),
            self._log.schema_at(self.root), metrics=metrics,
            expected_version=snap,
        )
        if self._cdf_enabled():
            changes = self._read_files(whole) if whole else None
            if deleted is not None:
                changes = (
                    deleted if changes is None
                    else deleted.unionByName(changes)
                )
            if changes is not None:
                self._write_cdf(changes, "delete", v)
        if tdf is not None:
            tdf.unpersist()
        return metrics

    def _delete_dv(
        self,
        cond: Column,
        bounds: dict,
        dv_max_rows: int,
        whole: list[dict[str, Any]] | None = None,
        n_whole: int = 0,
        snap: int | None = None,
    ) -> dict[str, Any] | None:
        """Deletion-vector DELETE: collect the matching (file, row
        index) pairs (bounded by ``dv_max_rows``), merge them into each
        touched file's existing bitmap, write one
        ``deletion_vector_*.bin`` per file, and commit remove+re-add
        actions carrying the DV descriptors. ``whole`` files (stats
        prove every row matches) skip the DV machinery entirely — pure
        remove actions in the same commit. Returns None when the
        deleted set is too large (caller falls back to rewrite)."""
        import numpy as np

        from .delta_interop import _dv_positions, spark_file_key, write_dv_file

        whole = whole or []
        whole_paths = {e["path"] for e in whole}
        touched = self._touched_files(
            cond, bounds, exclude_paths=whole_paths
        )
        if not touched and not whole:
            return {"numRemovedFiles": 0, "numDeletedRows": 0, "strategy": "dv"}
        if touched:
            tdf = self._read_files(touched, with_row_index=True).persist()
            hits = tdf.filter(cond)
            # size gate BEFORE the driver collect
            n_deleted = hits.count()
            if n_deleted > dv_max_rows:
                tdf.unpersist()
                return None
            pdf = hits.select("__file", "__pos").toPandas()
            new_adds, removes, n_fully_dead = self._dv_mark(touched, pdf)
        else:
            tdf, hits = None, None
            n_deleted, new_adds, removes, n_fully_dead = 0, [], [], 0
        metrics = {
            "numDeletedRows": n_deleted + n_whole,
            "numDeletionVectorsAdded": len(new_adds),
            "numRemovedFiles": n_fully_dead + len(whole),
            "numWholeFilesRemoved": len(whole),
            "strategy": "dv",
        }
        v = self._log.commit(
            self.root, "DELETE", new_adds,
            removes + sorted(whole_paths),
            self._log.schema_at(self.root),
            parameters={"strategy": "dv"},
            metrics=metrics,
            expected_version=snap,
        )
        if self._cdf_enabled():
            changes = self._read_files(whole) if whole else None
            if hits is not None:
                pre = hits.drop("__file", "__pos")
                changes = (
                    pre if changes is None else pre.unionByName(changes)
                )
            if changes is not None:
                self._write_cdf(changes, "delete", v)
        if tdf is not None:
            tdf.unpersist()
        return metrics

    def _dv_mark(
        self, touched: list[dict[str, Any]], pdf
    ) -> tuple[list[dict[str, Any]], list[str], int]:
        """Fold collected (``__file``, ``__pos``) hit pairs into
        deletion vectors: per touched file, union the new positions
        with any existing bitmap, write the sidecar, and build the
        remove + DV-re-add action lists. A file whose every physical
        row is marked is dropped outright (no all-rows DV)."""
        import numpy as np

        from .delta_interop import _dv_positions, spark_file_key, write_dv_file

        new_adds: list[dict[str, Any]] = []
        removes: list[str] = []
        n_fully_dead = 0
        for e in touched:
            fpath = spark_file_key(self.root, e["path"])
            pos = pdf.loc[pdf["__file"] == fpath, "__pos"].to_numpy(np.int64)
            if len(pos) == 0:
                continue
            removes.append(e["path"])
            if e.get("deletionVector"):
                pos = np.union1d(
                    pos, _dv_positions(self.root, e["deletionVector"])
                )
            if e.get("rows") and len(pos) >= e["rows"]:
                n_fully_dead += 1
                continue
            desc = write_dv_file(self.root, pos)
            entry = {k: v for k, v in e.items() if k != "deletionVector"}
            entry["deletionVector"] = desc
            new_adds.append(entry)
        return new_adds, removes, n_fully_dead

    def update(
        self,
        condition: str | Column,
        set: dict[str, str | Column],
        strategy: str = "auto",
        dv_max_rows: int = 1_000_000,
    ) -> dict[str, Any]:
        """UPDATE by predicate (``compliance_policies.py:277-295``).

        Strategies mirror :meth:`delete`: ``"rewrite"`` rewrites the
        touched files; ``"dv"`` (Delta-backed tables) marks the OLD
        versions of matched rows in deletion vectors and appends only
        the updated rows as new files — cost O(matched rows), the way
        modern Delta writers run UPDATE/MERGE with DVs enabled;
        ``"auto"`` picks dv when ``delta.enableDeletionVectors`` is
        set. Falls back to rewrite past ``dv_max_rows``."""
        if strategy not in ("auto", "dv", "rewrite"):
            raise ValueError(f"unknown UPDATE strategy: {strategy!r}")
        cond = F.expr(condition) if isinstance(condition, str) else condition
        snap = self._log.latest_version(self.root)
        bounds = predicate_bounds(condition) if isinstance(condition, str) else {}
        dv_capable = self._log is not tlog
        if strategy == "dv" and not dv_capable:
            raise ValueError(
                "deletion vectors need the Delta log backend "
                "(create(format='delta') or a Delta table via for_path)"
            )
        if strategy == "auto":
            props = self.properties()
            dv_enabled = str(
                props.get(
                    "delta.enableDeletionVectors",
                    props.get("enableDeletionVectors", False),
                )
            ).lower() in ("true", "1")
            strategy = "dv" if (dv_capable and dv_enabled) else "rewrite"
        if strategy == "dv":
            result = self._update_dv(cond, set, bounds, dv_max_rows, snap)
            if result is not None:
                return result
        return self._update_rewrite(cond, set, bounds, snap)

    def _update_dv(
        self,
        cond: Column,
        set: dict[str, str | Column],
        bounds: dict,
        dv_max_rows: int,
        snap: int | None = None,
    ) -> dict[str, Any] | None:
        touched = self._touched_files(cond, bounds)
        if not touched:
            return {"numUpdatedRows": 0, "strategy": "dv"}
        tdf = self._read_files(touched, with_row_index=True).persist()
        hits = tdf.filter(cond)
        n_updated = hits.count()
        if n_updated > dv_max_rows:
            tdf.unpersist()
            return None
        pdf = hits.select("__file", "__pos").toPandas()
        new_adds, removes, n_fully_dead = self._dv_mark(touched, pdf)
        schema = self.schema
        set_cols = {
            k: (F.expr(v) if isinstance(v, str) else v).cast(schema[k].dataType)
            for k, v in set.items()
        }
        pre = hits.drop("__file", "__pos")
        # regenerate BEFORE branching so the CDF post-image carries the
        # same generated-column values the table does
        post = self._apply_generated(
            pre.select(
                *[
                    set_cols[c].alias(c) if c in set_cols else F.col(c)
                    for c in pre.columns
                ]
            ),
            schema,
        )
        adds_new, _ = _write_files(
            self._prep_write(post, regenerate=False),
            self.root,
            partition_columns=self._write_partition_columns(),
        )
        metrics = {
            "numUpdatedRows": n_updated,
            "numDeletionVectorsAdded": len(new_adds),
            "numRemovedFiles": n_fully_dead,
            "numAddedFiles": len(adds_new),
            "strategy": "dv",
        }
        v = self._log.commit(
            self.root, "UPDATE", new_adds + adds_new, removes,
            self._log.schema_at(self.root),
            parameters={"strategy": "dv"},
            metrics=metrics,
            expected_version=snap,
        )
        if self._cdf_enabled():
            self._write_cdf(pre, "update_preimage", v)
            self._write_cdf(post, "update_postimage", v)
        tdf.unpersist()
        return metrics

    def _update_rewrite(
        self,
        cond: Column,
        set: dict[str, str | Column],
        bounds: dict,
        snap: int | None = None,
    ) -> dict[str, Any]:
        """Copy-on-write UPDATE (``compliance_policies.py:277-295``)."""
        touched = self._touched_files(cond, bounds)
        if not touched:
            return {"numUpdatedRows": 0}
        tdf = self._read_files(touched).persist()
        schema = self.schema
        set_cols = {
            k: (F.expr(v) if isinstance(v, str) else v).cast(schema[k].dataType)
            for k, v in set.items()
        }
        pre = tdf.filter(cond)
        n_updated = pre.count()
        # constraints re-judge only the CHANGED rows (post-image with
        # regenerated columns) — unchanged rows in touched files are
        # pre-existing data real Delta does not re-validate
        post = self._apply_generated(
            pre.select(
                *[
                    set_cols[c].alias(c) if c in set_cols else F.col(c)
                    for c in pre.columns
                ]
            ),
            schema,
        )
        self._enforce_constraints(post, schema)
        updated = tdf.select(
            *[
                F.when(cond, set_cols[c]).otherwise(F.col(c)).alias(c)
                if c in set_cols
                else F.col(c)
                for c in tdf.columns
            ]
        )
        adds, _ = _write_files(
            self._prep_write(updated, enforce=False),
            self.root,
            partition_columns=self._write_partition_columns(),
        )
        metrics = {
            "numRemovedFiles": len(touched),
            "numAddedFiles": len(adds),
            "numUpdatedRows": n_updated,
        }
        v = self._log.commit(
            self.root, "UPDATE", adds, [e["path"] for e in touched],
            self._log.schema_at(self.root), metrics=metrics,
            expected_version=snap,
        )
        if self._cdf_enabled():
            self._write_cdf(pre, "update_preimage", v)
            self._write_cdf(post, "update_postimage", v)
        tdf.unpersist()
        return metrics

    def merge(self, source: DataFrame, condition: str) -> "MergeBuilder":
        """MERGE builder; condition references aliases ``t`` (target)
        and ``s`` (source), e.g. ``"t.customer_id = s.customer_id"``."""
        return MergeBuilder(self, source, condition)

    # -- maintenance -------------------------------------------------------

    def optimize(
        self,
        zorder_by: list[str] | None = None,
        target_files: int | None = None,
        where: str | None = None,
        max_file_bytes: int = 128 * 1024 * 1024,
    ) -> dict[str, Any]:
        """Compaction + clustering (reference OPTIMIZE/ZORDER incl. the
        WHERE partition filter, ``performance_optimization.py:27-134``).

        Scale contract: OPTIMIZE must be incremental — at 100 TB you
        compact the hot partition, never rewrite the table. Two guards
        enforce that here:

        * ``where`` scopes the candidate set by file stats (same
          pruning as reads). Whole files are rewritten, never filtered,
          so an over-approximate candidate set is still correct.
        * plain compaction (no ``zorder_by``) only touches files under
          ``max_file_bytes`` — already-compacted files are left alone,
          so repeated OPTIMIZE runs are O(new small files), not
          O(table). ZORDER rewrites its whole scope (re-clustering by
          definition relocates rows across files).

        Single-column clustering is range-partition + in-partition
        sort. Multi-column clustering uses REAL interleaved-bit
        Z-values (``_with_zvalue``): per-column equal-depth buckets
        whose bits interleave, so per-file min/max ranges narrow on
        EVERY cluster column and footer-stats skipping prunes scans
        for predicates on any of them — not only the leading column.
        """
        snap = self._log.latest_version(self.root)
        files = self._files()
        if where:
            files = _prune_by_stats(files, predicate_bounds(where))
        if not zorder_by:
            files = [e for e in files if e.get("bytes", 0) < max_file_bytes]
            if len(files) < 2:
                return {"numFilesRemoved": 0, "numFilesAdded": 0}
        if not files:
            return {"numFilesRemoved": 0, "numFilesAdded": 0}
        df = self._read_files(files)
        total_bytes = sum(e.get("bytes", 0) for e in files)
        n_out = target_files or max(1, total_bytes // (128 * 1024 * 1024))
        if zorder_by and len(zorder_by) > 1:
            # true multi-dim clustering: interleaved-bit z-value, so a
            # predicate on ANY cluster column prunes files — range+sort
            # would order by the leading column only and leave later
            # columns' per-file min/max spanning the whole domain
            df, zcol = _with_zvalue(df, list(zorder_by))
            df = (
                df.repartitionByRange(int(n_out), F.col(zcol))
                .sortWithinPartitions(zcol)
                .drop(zcol)
            )
        elif zorder_by:
            df = df.repartitionByRange(int(n_out), *zorder_by).sortWithinPartitions(
                *zorder_by
            )
        else:
            df = df.coalesce(int(n_out))
        adds, n = _write_files(
            # dataChange=false compaction must not alter or re-judge
            # existing bytes
            self._prep_write(df, enforce=False, regenerate=False),
            self.root,
            already_partitioned=True,
            partition_columns=self._write_partition_columns(),
        )
        metrics = {
            "numFilesRemoved": len(files),
            "numFilesAdded": len(adds),
            "numOutputRows": n,
        }
        self._log.commit(
            self.root, "OPTIMIZE", adds, [e["path"] for e in files],
            self._log.schema_at(self.root),
            parameters={"zOrderBy": zorder_by or [], "predicate": where or ""},
            metrics=metrics,
            expected_version=snap,
        )
        return metrics

    def restore(self, version: int) -> int:
        """RESTORE TABLE TO VERSION AS OF (``delta_lake_features.py:157-176``).

        Diffs on (path, deletion-vector identity), not path alone: a DV
        DELETE re-adds the SAME data file with a descriptor, so a
        path-only diff would see "no change" and silently leave rows
        deleted after restoring to the pre-delete version (and keep a
        stale DV after restoring across a DV UPDATE). Re-adding a file
        with its old DV state (including none) is how Delta itself
        restores across DV commits."""

        def key(e: dict[str, Any]) -> tuple[str, str | None]:
            dv = e.get("deletionVector") or {}
            return (e["path"], dv.get("pathOrInlineDv"))

        snap = self._log.latest_version(self.root)
        target = self._log.active_files(self.root, version)
        current = self._files()
        current_keys = {key(e) for e in current}
        target_keys = {key(e) for e in target}
        adds = [e for e in target if key(e) not in current_keys]
        # a path whose DV state changed appears in both lists: the
        # remove must precede the re-add within the commit replay
        # (state.apply folds removes by path), so list it once
        add_paths = {e["path"] for e in adds}
        removes = [
            e["path"]
            for e in current
            if key(e) not in target_keys or e["path"] in add_paths
        ]
        return self._log.commit(
            self.root, "RESTORE", adds, sorted(set(removes)),
            self._log.schema_at(self.root, version),
            parameters={"version": version},
            expected_version=snap,
        )

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (reference evolution surface
        ``delta_lake_features.py:182-262``). Requires a column-mapped
        Delta-backed table: the logical name changes in the schema, the
        columnMapping physicalName stays, no data file is rewritten,
        and pre-rename versions keep time-traveling under their old
        names."""
        if self._log is tlog:
            raise NotImplementedError(
                "RENAME COLUMN needs the Delta log backend with column "
                "mapping (create(format='delta', properties="
                "{'delta.columnMapping.mode': 'name'}))"
            )
        self._log.check_writable(self.root)
        return self._log.rename_column(self.root, old, new)

    def drop_column(self, col: str) -> int:
        """Metadata-only column drop (column-mapped Delta tables): the
        logical field leaves the schema; existing parquet keeps the
        physical column for pre-drop time travel."""
        if self._log is tlog:
            raise NotImplementedError(
                "DROP COLUMN needs the Delta log backend with column "
                "mapping (create(format='delta', properties="
                "{'delta.columnMapping.mode': 'name'}))"
            )
        self._log.check_writable(self.root)
        return self._log.drop_column(self.root, col)

    def vacuum(self, retain_hours: float = 168.0, dry_run: bool = False) -> list[str]:
        """Delete unreferenced data files older than the retention window
        (``delta_lake_features.py:385-393``)."""
        active = {e["path"] for e in self._files()}
        cutoff = time.time() - retain_hours * 3600
        ddir = self._log.data_dir(self.root)
        victims = []
        # rglob: partitioned tables nest files under hive dirs
        for p in ddir.rglob("*"):
            if not p.is_file():
                continue
            rel = f"{tlog.DATA_DIR}/{p.relative_to(ddir).as_posix()}"
            if rel not in active and p.stat().st_mtime < cutoff:
                victims.append(rel)
        # orphaned deletion-vector sidecars: a rewrite/compaction drops
        # the DV reference and leaves the .bin behind — collect any bin
        # that NO version references (time travel included)
        if hasattr(self._log, "referenced_dv_files"):
            kept_dvs = self._log.referenced_dv_files(self.root)
            for p in Path(self.root).glob("deletion_vector_*.bin"):
                if p.resolve() not in kept_dvs and p.stat().st_mtime < cutoff:
                    victims.append(p.name)
        if not dry_run:
            for rel in victims:
                (Path(self.root) / rel).unlink()
            self._log.commit(
                self.root, "VACUUM", [], [], self._log.schema_at(self.root),
                metrics={"numDeletedFiles": len(victims)},
            )
        return victims

    # -- change data feed --------------------------------------------------

    def _cdf_enabled(self) -> bool:
        # both spellings accepted: the engine's own short key and the
        # Delta TBLPROPERTIES name users carry over from the reference
        # stack (delta_lake_features.py:335-341)
        props = self.properties()
        v = props.get(
            "enableChangeDataFeed", props.get("delta.enableChangeDataFeed", False)
        )
        return str(v).lower() in ("true", "1")

    def _write_cdf(self, df: DataFrame, change_type: str, version: int) -> None:
        if not self._cdf_enabled():
            return
        out = (
            Path(self.root)
            / tlog.CHANGES_DIR
            / f"{CDF_VERSION_COL}={version}"
        )
        df.withColumn(CDF_TYPE_COL, F.lit(change_type)).write.mode(
            "append"
        ).parquet(str(out))

    def read_changes(
        self, starting_version: int = 0, ending_version: int | None = None
    ) -> DataFrame:
        """Batch CDF scan (``delta_lake_features.py:357-368``). Columns:
        table schema + _change_type + _commit_version.

        Engine-written commits read their materialized change files
        (``_changes/``). On a DELTA-backed table, versions with no
        change files — commits landed by OTHER Delta writers — serve
        the commit's ``cdc`` actions when present (the
        ``_change_data`` files a CDF-enabled Delta writer materializes
        for UPDATE/DELETE/MERGE, holding rows + ``_change_type``), else
        are synthesized from the ``_delta_log`` replay when they are
        append-only (the add files ARE the inserted rows); a foreign
        commit that removed files WITHOUT cdc actions has no
        reconstructible row-level delta, so it is refused loudly
        instead of returning wrong changes (reference surface:
        ``delta_sharing_recipient.py:180-205``)."""
        base = Path(self.root) / tlog.CHANGES_DIR
        have: dict[int, str] = {}
        if base.is_dir():
            for d in base.iterdir():
                if d.name.startswith(f"{CDF_VERSION_COL}="):
                    have[int(d.name.split("=")[1])] = str(d)

        def _in_range(v: int) -> bool:
            return v >= starting_version and (
                ending_version is None or v <= ending_version
            )

        frames = []
        picked = [p for v, p in sorted(have.items()) if _in_range(v)]
        if picked:
            frames.append(
                self.spark.read.option("basePath", str(base)).parquet(*picked)
            )
        if self._log is not tlog:
            for v in self._log.list_versions(self.root):
                if not _in_range(v) or v in have:
                    continue
                c = self._log.read_commit(self.root, v)
                if c.get("operation") == "OPTIMIZE":
                    continue  # dataChange=false: no logical change
                if c.get("cdc"):
                    # protocol CDF: this version's changes come
                    # EXCLUSIVELY from its _change_data files
                    from pyspark.sql.types import StringType, StructField

                    from .delta_interop import DeltaInteropTable, _replay

                    state = _replay(self.spark, self.root, v)
                    schema_v = StructType.fromJson(
                        json.loads(state.schema_json)
                    )
                    cdc_schema = StructType(
                        list(schema_v.fields)
                        + [StructField(CDF_TYPE_COL, StringType())]
                    )
                    it = DeltaInteropTable(self.spark, self.root)
                    frames.append(
                        it._scan(state, cdc_schema, c["cdc"]).withColumn(
                            CDF_VERSION_COL, F.lit(v).cast("long")
                        )
                    )
                    continue
                if c.get("remove"):
                    raise NotImplementedError(
                        f"CDF for version {v}: commit "
                        f"({c.get('operation')}) rewrote files outside "
                        "this engine without cdc actions; row-level "
                        "changes are not reconstructible from the "
                        "_delta_log alone"
                    )
                if not c.get("add"):
                    continue
                frames.append(
                    self._read_files(c["add"], version=v)
                    .withColumn(CDF_TYPE_COL, F.lit("insert"))
                    .withColumn(CDF_VERSION_COL, F.lit(v).cast("long"))
                )
        if not frames:
            schema = self.schema.add(CDF_TYPE_COL, "string").add(
                CDF_VERSION_COL, "long"
            )
            return self.spark.createDataFrame([], schema)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def changes_dir(self) -> str:
        """Append-only CDF directory — usable directly as a Structured
        Streaming file source for downstream incremental pipelines."""
        return str(Path(self.root) / tlog.CHANGES_DIR)

    def read_changes_stream(self) -> DataFrame:
        """Streaming CDF scan (S4-equivalent: the OSS
        ``readStream.option("readChangeFeed", ...)`` role): tail this
        table's change feed as a Structured Streaming source. Each
        downstream checkpoint tracks its own offset into the feed."""
        if not self._cdf_enabled():
            raise ValueError(
                "change data feed not enabled; create the table with "
                "properties={'enableChangeDataFeed': True}"
            )
        schema = self.schema.add(CDF_TYPE_COL, "string").add(
            CDF_VERSION_COL, "long"
        )
        base = self.changes_dir()
        return (
            self.spark.readStream.schema(schema)
            .option("basePath", base)
            .parquet(base + "/*")
        )

    # -- internals ---------------------------------------------------------

    def _touched_files(
        self,
        cond: Column,
        bounds: dict[str, tuple[Any, Any]] | None = None,
        exclude_paths: set[str] | None = None,
    ) -> list[dict[str, Any]]:
        """Files containing at least one row matching ``cond``.

        Two stages: (1) driver-side stats pruning against the commit
        log's per-file min/max (``bounds`` — extracted from the
        predicate or from MERGE source keys; file metadata only, no
        data read); (2) an exact membership probe via a file-path
        distinct over the surviving candidates. ``exclude_paths``
        drops files the caller already decided about (whole-match
        DELETE) before the probe ever reads them.
        """
        files = self._files()
        if exclude_paths:
            files = [e for e in files if e["path"] not in exclude_paths]
        if bounds is None and isinstance(cond, Column):
            bounds = {}
        if bounds is None:
            bounds = {}
        files = _prune_by_stats(files, bounds)
        if not files:
            return []
        from .delta_interop import spark_rel_key

        df = self._read_files(files, with_row_index=True)
        hit_paths = {
            r[0]
            for r in df.filter(cond).select("__file").distinct().collect()
        }
        return [
            e
            for e in files
            if any(hp.endswith(spark_rel_key(e["path"])) for hp in hit_paths)
        ]


_CMP_RE = re.compile(
    r"^\s*`?(\w+)`?\s*(==|=|<=|>=|<|>)\s*"
    r"(-?\d+(?:\.\d+)?|'[^']*'|\"[^\"]*\")\s*$"
)


def _collect_constraint_checks(
    props: dict[str, Any], schema: StructType
) -> dict[str, str]:
    """Constraint name -> SQL predicate from table properties + field
    metadata (see ``LakeTable._enforce_constraints``)."""
    checks: dict[str, str] = {}
    for k, v in props.items():
        if k.startswith("delta.constraints."):
            checks[k[len("delta.constraints."):]] = str(v)

    from pyspark.sql.types import ArrayType, MapType

    def walk(dt, path, in_collection):
        # dotted paths resolve only through STRUCT nesting; an
        # invariant on a field inside an array/map cannot be
        # expressed as one top-level predicate — refuse it loudly
        # rather than mis-evaluating (or crashing) per write
        if isinstance(dt, StructType):
            for f in dt.fields:
                p = f"{path}.{f.name}" if path else f.name
                inv = f.metadata.get("delta.invariants")
                if inv:
                    if in_collection:
                        raise NotImplementedError(
                            f"invariant on {p} inside an array/map "
                            "cannot be enforced per element"
                        )
                    try:
                        expr = json.loads(inv)["expression"]["expression"]
                    except (ValueError, KeyError, TypeError):
                        raise NotImplementedError(
                            f"unparseable invariant on {p}: {inv!r}"
                        )
                    checks[f"invariant_{p.replace('.', '_')}"] = expr
                walk(f.dataType, p, in_collection)
        elif isinstance(dt, ArrayType):
            walk(dt.elementType, path, True)
        elif isinstance(dt, MapType):
            walk(dt.valueType, path, True)

    walk(schema, "", False)
    return checks


def _raise_on_constraint_violations(
    df: DataFrame, checks: dict[str, str]
) -> None:
    if not checks:
        return
    row = df.agg(
        *[
            F.sum(F.expr(e).eqNullSafe(F.lit(False)).cast("int")).alias(n)
            for n, e in checks.items()
        ]
    ).collect()[0]
    bad = {n: int(row[n]) for n in checks if (row[n] or 0) > 0}
    if bad:
        detail = "; ".join(
            f"{n} ({checks[n]!r}): {c} rows" for n, c in bad.items()
        )
        raise ValueError(f"CHECK constraint violation — {detail}")


def predicate_bounds(condition: str) -> dict[str, tuple[Any, Any]]:
    """Extract per-column (lo, hi) bounds from a *conjunctive* SQL
    predicate of simple comparisons — the file-skipping contract Delta
    derives from its stats. Returns {} (no pruning) for anything with
    OR/NOT/parentheses: pruning must only ever skip files that
    provably cannot match."""
    bounds, _ = predicate_bounds_full(condition)
    return bounds


def predicate_bounds_full(
    condition: str,
) -> tuple[dict[str, tuple[Any, Any]], bool]:
    """Like :func:`predicate_bounds`, plus a ``complete`` flag: True
    iff EVERY conjunct was captured in the bounds. A complete
    conjunctive predicate supports the reverse inference too — a file
    whose stats interval lies wholly INSIDE the bounds provably
    matches on every row (the metadata-only whole-file DELETE);
    an incomplete parse only ever supports skipping."""
    if re.search(r"\bor\b|\bnot\b|\(", condition, flags=re.IGNORECASE):
        return {}, False
    complete = True
    bounds: dict[str, tuple[Any, Any]] = {}
    for part in condition.split(" AND "):
        m = _CMP_RE.match(part.strip())
        if not m:
            complete = False
            continue
        col, op, lit = m.groups()
        value: Any
        if lit[0] in "'\"":
            value = lit[1:-1]
        else:
            value = float(lit) if "." in lit else int(lit)
        if op in ("<", ">"):
            # strict edges are folded inclusively — safe for skipping
            # (over-approximate) but NOT for the whole-file full-match
            # inference (a file with max == v does not match `col < v`)
            complete = False
        lo, hi = bounds.get(col, (None, None))
        if op in ("=", "=="):
            # equality INTERSECTS with prior conjuncts on the column —
            # overwriting (lo, hi) would let "a >= 5 AND a = 3" claim
            # complete bounds (3, 3), and the whole-file full-match
            # inference would then delete a=3 rows an unsatisfiable
            # predicate matches none of
            new_lo, new_hi = value, value
        elif op in (">", ">="):
            new_lo, new_hi = value, None
        else:  # "<", "<="
            new_lo, new_hi = None, value
        try:
            if new_lo is not None:
                lo = new_lo if lo is None else max(lo, new_lo)
            if new_hi is not None:
                hi = new_hi if hi is None else min(hi, new_hi)
            if lo is not None and hi is not None and lo > hi:
                # unsatisfiable conjunction: bounds stay (the empty
                # interval prunes correctly) but the full-match
                # inference must never fire
                complete = False
        except TypeError:
            # mixed-type conjuncts ("a >= 1 AND a = 'x'"): drop every
            # claim for the column — no pruning, no full-match
            bounds.pop(col, None)
            complete = False
            continue
        bounds[col] = (lo, hi)
    return bounds, complete


def _file_fully_matches(
    e: dict[str, Any], bounds: dict[str, tuple[Any, Any]]
) -> bool:
    """True iff stats PROVE every row of the file satisfies a COMPLETE
    conjunctive ``bounds`` (each bound column: no nulls and the file's
    [min, max] wholly inside [lo, hi]). Must only be called with
    ``complete=True`` bounds from :func:`predicate_bounds_full`."""
    for col, (lo, hi) in bounds.items():
        st = (e.get("stats") or {}).get(col)
        if (
            not st
            or st.get("min") is None
            or st.get("max") is None
            or st.get("nulls", 0)
        ):
            return False
        try:
            if lo is not None and st["min"] < lo:
                return False
            if hi is not None and st["max"] > hi:
                return False
        except TypeError:
            return False  # mixed types prove nothing
    return True


def _prune_by_stats(
    files: list[dict[str, Any]], bounds: dict[str, tuple[Any, Any]]
) -> list[dict[str, Any]]:
    """Keep files whose [min, max] intervals can intersect ``bounds``.
    Missing stats or incomparable types keep the file (never unsafe)."""
    if not bounds:
        return files
    kept = []
    for e in files:
        ok = True
        for col, (lo, hi) in bounds.items():
            st = (e.get("stats") or {}).get(col)
            if not st or st.get("min") is None or st.get("max") is None:
                continue
            try:
                if lo is not None and st["max"] < lo:
                    ok = False
                    break
                if hi is not None and st["min"] > hi:
                    ok = False
                    break
            except TypeError:
                continue  # mixed types: do not prune
        if ok:
            kept.append(e)
    return kept


_Z_BITS = 4  # quantile buckets per dimension = 2^4
_Z_SAMPLE = 4096  # driver-side sample size for string boundaries


def _zorder_boundaries(df: DataFrame, col: str) -> list[Any]:
    """Equal-depth bucket boundaries (at most 2^_Z_BITS - 1) for one
    cluster column. Numerics/dates/timestamps use approxQuantile (one
    bounded pass). Strings are bucketed by SAMPLED raw-string
    boundaries compared lexicographically — the RangePartitioner
    approach — because any numeric proxy of a string collapses under
    double precision once values share a long common prefix (footer
    min/max stats compare full strings, so boundaries must too)."""
    dt = df.schema[col].dataType.simpleString()
    qs = [i / (1 << _Z_BITS) for i in range(1, 1 << _Z_BITS)]
    if dt == "string":
        sample = [
            r[0]
            for r in df.select(col)
            .filter(F.col(col).isNotNull())
            .rdd.takeSample(False, _Z_SAMPLE, seed=42)
        ]
        sample.sort()
        if not sample:
            return []
        return sorted(
            {sample[min(int(q * len(sample)), len(sample) - 1)] for q in qs}
        )
    proxy = (
        F.col(col).cast("timestamp").cast("double")
        if dt in ("timestamp", "timestamp_ntz", "date")
        else F.col(col).cast("double")
    )
    vals = df.select(proxy.alias("__q")).stat.approxQuantile("__q", qs, 0.01)
    return sorted(set(vals))


def _zorder_bucket(df: DataFrame, col: str, bounds: list[Any]) -> Column:
    dt = df.schema[col].dataType.simpleString()
    if dt == "string":
        probe: Column = F.col(col)
    elif dt in ("timestamp", "timestamp_ntz", "date"):
        probe = F.col(col).cast("timestamp").cast("double")
    else:
        probe = F.col(col).cast("double")
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(probe >= F.lit(b), 1).otherwise(0)
    return bucket.cast("long")


def _with_zvalue(df: DataFrame, cols: list[str]) -> tuple[DataFrame, str]:
    """Append an interleaved-bit Z-value over ``cols`` (the real
    Z-ORDER, reference ``performance_optimization.py:82-134``): each
    column is bucketed to 2^_Z_BITS equal-depth levels (quantile /
    sampled boundaries — the same range-id computation delta-spark's
    OPTIMIZE ZORDER runs), then the per-column bucket bits interleave
    so consecutive z-values stay close in EVERY dimension. Clustering
    by z therefore narrows each file's min/max on every cluster column
    — footer-stats skipping works for predicates on ANY of them, not
    just the leading one. NULLs sort to bucket 0."""
    zexpr = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        bucket = _zorder_bucket(df, c, _zorder_boundaries(df, c))
        for bit in range(_Z_BITS):
            # bit `bit` of this column's bucket lands at interleaved
            # position bit*ncols + ci
            zexpr = zexpr + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + ci,
            )
    return df.withColumn("__zval", zexpr), "__zval"


def _write_files(
    df: DataFrame,
    root: str,
    already_partitioned: bool = False,
    partition_columns: list[str] | None = None,
) -> tuple[list[dict[str, Any]], int]:
    """Write df as immutable parquet files under <root>/data and return
    (add-entries with footer stats, row count).

    With ``partition_columns`` the layout is hive-style
    (``data/day=d1/part-*.parquet``, matching how every Delta writer
    lays out partitioned tables) and each add entry carries the
    ``partitionValues`` map plus synthesized point-interval stats so
    driver-side pruning (``_prune_by_stats``) skips whole partitions
    without touching footers."""
    from urllib.parse import unquote

    from .delta_interop import synth_partition_stats

    staging = Path(root) / f"_staging_{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_columns:
        writer = writer.partitionBy(*partition_columns)
    writer.parquet(str(staging))
    ddir = tlog.data_dir(root)
    ddir.mkdir(parents=True, exist_ok=True)
    adds = []
    total_rows = 0
    for p in sorted(staging.rglob("*.parquet")):
        if p.stat().st_size == 0:
            continue
        rel_dir = p.relative_to(staging).parent
        name = f"part-{uuid.uuid4().hex}.parquet"
        dest = ddir / rel_dir / name
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.move(str(p), dest)
        st = _file_stats(dest)
        if st["rows"] == 0:
            dest.unlink()
            continue
        total_rows += st["rows"]
        rel = (
            f"{tlog.DATA_DIR}/{rel_dir.as_posix()}/{name}"
            if rel_dir.parts
            else f"{tlog.DATA_DIR}/{name}"
        )
        entry: dict[str, Any] = {"path": rel, **st}
        if partition_columns:
            pv: dict[str, Any] = {}
            for seg in rel_dir.parts:
                k, _, v = seg.partition("=")
                pv[k] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
            entry["partitionValues"] = pv
            synth_partition_stats(entry)
        adds.append(entry)
    shutil.rmtree(staging, ignore_errors=True)
    return adds, total_rows


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------


class MergeBuilder:
    """Fluent MERGE matching the DeltaTable builder the reference uses
    (``transform_customers.py:174-202``, ``transform_transactions.py:133-144``,
    ``transform_support_tickets.py:120-147``).

    Supported clauses: whenMatchedUpdate(condition?, set),
    whenMatchedUpdateAll(condition?), whenMatchedDelete(condition?),
    whenNotMatchedInsert(values), whenNotMatchedInsertAll().

    Execution = copy-on-write join:
      1. touched target files = semi-join(source, condition) over the
         snapshot (file-pruned via footer stats by Spark's reader);
      2. full-outer join of touched rows with source;
      3. clause application as a single select of CASE expressions;
      4. atomic commit: remove touched, add rewritten + inserted.
    """

    def __init__(self, table: LakeTable, source: DataFrame, condition: str):
        self.table = table
        self.source = source
        self.condition = condition
        self._matched: list[tuple[str, str | None, dict[str, str] | None]] = []
        self._not_matched: list[tuple[str | None, dict[str, str] | None]] = []

    def whenMatchedUpdate(
        self, set: dict[str, str], condition: str | None = None
    ) -> "MergeBuilder":
        self._matched.append(("update", condition, set))
        return self

    def whenMatchedUpdateAll(self, condition: str | None = None) -> "MergeBuilder":
        self._matched.append(("update_all", condition, None))
        return self

    def whenMatchedDelete(self, condition: str | None = None) -> "MergeBuilder":
        self._matched.append(("delete", condition, None))
        return self

    def whenNotMatchedInsert(
        self, values: dict[str, str], condition: str | None = None
    ) -> "MergeBuilder":
        self._not_matched.append((condition, values))
        return self

    def whenNotMatchedInsertAll(self, condition: str | None = None) -> "MergeBuilder":
        self._not_matched.append((condition, None))
        return self

    def _source_key_bounds(self) -> dict[str, tuple[Any, Any]]:
        """For each ``t.col = s.col`` equality in the merge condition,
        the source's [min, max] of s.col becomes a pruning interval on
        the target column — one tiny aggregate over the source."""
        pairs = re.findall(
            r"\bt\.`?(\w+)`?\s*=\s*s\.`?(\w+)`?", self.condition
        ) + [
            (tc, sc)
            for sc, tc in re.findall(
                r"\bs\.`?(\w+)`?\s*=\s*t\.`?(\w+)`?", self.condition
            )
        ]
        if not pairs:
            return {}
        aggs = []
        for tcol, scol in pairs:
            aggs.append(F.min(scol).alias(f"__lo_{tcol}"))
            aggs.append(F.max(scol).alias(f"__hi_{tcol}"))
        row = self.source.agg(*aggs).collect()[0]
        return {
            tcol: (
                _json_safe(row[f"__lo_{tcol}"]),
                _json_safe(row[f"__hi_{tcol}"]),
            )
            for tcol, _ in pairs
        }

    def execute(
        self,
        strategy: str = "auto",
        dv_max_rows: int = 1_000_000,
        retries: int = 0,
    ) -> dict[str, Any]:
        """Run the MERGE. ``strategy``:

        * ``"rewrite"`` — copy-on-write: rewrite every touched file.
        * ``"dv"`` (Delta-backed tables) — the modern Delta MERGE
          shape: matched rows hit by an update/delete clause are
          DV-marked in place and only the post-image + inserted rows
          land as new files — cost O(changed rows), never
          O(touched-file bytes); rows in touched files that the MERGE
          did not modify are never rewritten. Falls back to rewrite
          past ``dv_max_rows``.
        * ``"auto"`` — ``dv`` when Delta-backed AND
          ``delta.enableDeletionVectors`` is set, else rewrite.

        ``retries``: an OCC loser (another writer committed a
        conflicting version between this MERGE's snapshot and its
        commit) raises ``ConcurrentModificationError``; with retries >
        0 the whole MERGE recomputes from a FRESH snapshot — touched
        files, join, clause application — and tries again, which is the
        correct recovery (the stale plan must never be re-committed).
        """
        from .log import ConcurrentModificationError

        last: Exception | None = None
        for _ in range(retries + 1):
            try:
                return self._execute_once(strategy, dv_max_rows)
            except ConcurrentModificationError as e:
                last = e
                stale = getattr(self, "_persisted", None)
                if stale is not None:
                    stale.unpersist()
                    self._persisted = None
        assert last is not None
        raise last

    def _execute_once(
        self, strategy: str, dv_max_rows: int
    ) -> dict[str, Any]:
        t = self.table
        if strategy not in ("auto", "dv", "rewrite"):
            raise ValueError(f"unknown MERGE strategy: {strategy!r}")
        snap = t._log.latest_version(t.root)
        if strategy == "auto":
            props = t.properties()
            dv_enabled = str(
                props.get(
                    "delta.enableDeletionVectors",
                    props.get("enableDeletionVectors", False),
                )
            ).lower() in ("true", "1")
            strategy = (
                "dv" if (t._log is not tlog and dv_enabled) else "rewrite"
            )
        elif strategy == "dv" and t._log is tlog:
            raise ValueError(
                "deletion vectors need the Delta log backend "
                "(create(format='delta') or a Delta table via for_path)"
            )
        dv_mode = strategy == "dv"
        tgt_cols = [f.name for f in t.schema.fields]
        files = t._files()
        cond = F.expr(self.condition)

        src = self.source.withColumn("__se", F.lit(1)).alias("s")

        # 1. touched files: stats-prune by source key range first (an
        # equality MERGE whose source keys span a narrow range never
        # probes files outside that range), then the exact semi-join
        files = _prune_by_stats(files, self._source_key_bounds())
        touched: list[dict[str, Any]] = []
        if files:
            from .delta_interop import spark_rel_key

            with_file = (
                t._read_files(files, with_row_index=True)
                .drop("__pos")
                .alias("t")
            )
            hit = {
                r[0]
                for r in with_file.join(src, cond, "left_semi")
                .select("__file")
                .distinct()
                .collect()
            }
            touched = [
                e for e in files if any(h.endswith(spark_rel_key(e["path"])) for h in hit)
            ]

        tgt = (
            t._read_files(touched, with_row_index=dv_mode)
            .withColumn("__te", F.lit(1))
            .alias("t")
        )
        joined = tgt.join(src, cond, "full_outer")
        is_match = F.col("__te").isNotNull() & F.col("__se").isNotNull()
        t_only = F.col("__te").isNotNull() & F.col("__se").isNull()
        s_only = F.col("__te").isNull() & F.col("__se").isNotNull()

        # 2. matched-side output (and delete handling)
        def clause_cond(c: str | None) -> Column:
            return F.expr(c) if c is not None else F.lit(True)

        delete_pred = F.lit(False)
        update_hit = F.lit(False)
        remaining = F.lit(True)
        matched_exprs: dict[str, Column] = {
            c: F.col(f"t.{c}") for c in tgt_cols
        }
        for kind, ccond, cset in self._matched:
            this = remaining & clause_cond(ccond)
            if kind == "delete":
                delete_pred = delete_pred | (is_match & this)
            else:
                update_hit = update_hit | (is_match & this)
                for c in tgt_cols:
                    expr = (
                        F.col(f"s.{c}")
                        if kind == "update_all"
                        else (F.expr(cset[c]) if c in cset else F.col(f"t.{c}"))
                    )
                    matched_exprs[c] = F.when(
                        is_match & this, expr
                    ).otherwise(matched_exprs[c])
            remaining = remaining & ~clause_cond(ccond)

        # 3. insert-side output
        insert_pred = F.lit(False)
        insert_exprs: dict[str, Column] = {c: F.lit(None) for c in tgt_cols}
        src_cols = set(self.source.columns)
        for ccond, values in self._not_matched:
            this = s_only & clause_cond(ccond)
            insert_pred = insert_pred | this
            for c in tgt_cols:
                if values is not None:
                    expr = F.expr(values[c]) if c in values else F.lit(None)
                else:
                    expr = F.col(f"s.{c}") if c in src_cols else F.lit(None)
                insert_exprs[c] = F.when(this, expr).otherwise(insert_exprs[c])

        out_select = [
            F.when(s_only, insert_exprs[c])
            .otherwise(matched_exprs[c])
            .cast(t.schema[c].dataType)
            .alias(c)
            for c in tgt_cols
        ]

        # metrics + CDF need the categorized rows; one pass, kept warm
        cdf_on = t._cdf_enabled()
        joined = joined.persist()
        # remembered so a lost OCC race (exception before the tail
        # unpersist) can release the cache before the retry recomputes
        self._persisted = joined
        modified_pred = is_match & (update_hit | delete_pred)
        counts = joined.agg(
            F.sum(
                F.when(is_match & update_hit & ~delete_pred, 1).otherwise(0)
            ).alias("u"),
            F.sum(F.when(delete_pred, 1).otherwise(0)).alias("d"),
            F.sum(F.when(s_only & insert_pred, 1).otherwise(0)).alias("i"),
        ).collect()[0]
        n_updated = counts["u"] or 0
        n_deleted = counts["d"] or 0
        n_inserted = counts["i"] or 0

        if dv_mode and n_updated + n_deleted <= dv_max_rows:
            # DV shape: mark the modified positions in place, append
            # only post-image + inserted rows — unmodified rows in
            # touched files are never read back or rewritten
            pdf = (
                joined.filter(modified_pred)
                .select(
                    F.col("t.__file").alias("__file"),
                    F.col("t.__pos").alias("__pos"),
                )
                .toPandas()
            )
            new_adds, removes, n_fully_dead = t._dv_mark(touched, pdf)
            out_new = joined.filter(
                (is_match & update_hit & ~delete_pred)
                | (s_only & insert_pred)
            ).select(*out_select)
            adds_new, n_rows = _write_files(
                t._prep_write(out_new),
                t.root,
                partition_columns=t._write_partition_columns(),
            )
            adds_all = new_adds + adds_new
            removes_all = removes
            metrics = {
                "numTargetRowsUpdated": n_updated,
                "numTargetRowsDeleted": n_deleted,
                "numTargetRowsInserted": n_inserted,
                "numOutputRows": n_rows,
                "numDeletionVectorsAdded": len(new_adds),
                "numRemovedFiles": n_fully_dead,
                "numAddedFiles": len(adds_new),
                "strategy": "dv",
            }
        else:
            keep = (
                t_only | (is_match & ~delete_pred)
            ) | (s_only & insert_pred)
            out = joined.filter(keep).select(*out_select)
            # constraints re-judge only the CHANGED subset; `out` also
            # carries untouched pre-existing rows
            t._enforce_constraints(
                t._apply_generated(
                    joined.filter(
                        (is_match & update_hit & ~delete_pred)
                        | (s_only & insert_pred)
                    ).select(*out_select)
                ),
                t.schema,
            )
            adds_all, n_rows = _write_files(
                t._prep_write(out, enforce=False),
                t.root,
                partition_columns=t._write_partition_columns(),
            )
            removes_all = [e["path"] for e in touched]
            metrics = {
                "numTargetRowsUpdated": n_updated,
                "numTargetRowsDeleted": n_deleted,
                "numTargetRowsInserted": n_inserted,
                "numOutputRows": n_rows,
                "numRemovedFiles": len(touched),
                "numAddedFiles": len(adds_all),
            }
        v = t._log.commit(
            t.root, "MERGE", adds_all, removes_all,
            t._log.schema_at(t.root),
            parameters={"predicate": self.condition},
            metrics=metrics,
            expected_version=snap,
        )
        if cdf_on:
            upd = is_match & update_hit & ~delete_pred
            pre = joined.filter(upd).select(
                *[F.col(f"t.{c}").alias(c) for c in tgt_cols]
            )
            post = t._apply_generated(
                joined.filter(upd).select(
                    *[matched_exprs[c].cast(t.schema[c].dataType).alias(c) for c in tgt_cols]
                )
            )
            dele = joined.filter(delete_pred).select(
                *[F.col(f"t.{c}").alias(c) for c in tgt_cols]
            )
            ins = t._apply_generated(
                joined.filter(s_only & insert_pred).select(
                    *[insert_exprs[c].cast(t.schema[c].dataType).alias(c) for c in tgt_cols]
                )
            )
            t._write_cdf(pre, "update_preimage", v)
            t._write_cdf(post, "update_postimage", v)
            t._write_cdf(dele, "delete", v)
            t._write_cdf(ins, "insert", v)
        joined.unpersist()
        self._persisted = None
        return metrics
