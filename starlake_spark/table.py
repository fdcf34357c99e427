"""StarTable — the user-facing table API.

Parity target: the reference's Python surface
(python/star/tables.py:20-291 — forPath / forName / isStarTable /
registerMergeOperator, instance methods toDF / alias / delete / update /
upsert / compaction / cleanup / dropPartition / dropTable) plus the
Scala builder StarTable.createTable(... rangePartitions /
hashPartitions / hashBucketNum / shortTableName, tables/StarTable.scala:413-567).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from urllib.parse import unquote

from starlake_spark import catalog
from starlake_spark.local import local_df
from starlake_spark.meta import (
    DataFileInfo,
    ManifestStore,
    MetaError,
    TableInfo,
    encode_range_value,
)
from starlake_spark.operators import dml, reader, writer


def _parse_dtype(d: str) -> T.DataType:
    mapping = {"byte": T.ByteType(), "short": T.ShortType(), "int": T.IntegerType(),
               "integer": T.IntegerType(), "long": T.LongType(), "bigint": T.LongType(),
               "float": T.FloatType(), "double": T.DoubleType(), "string": T.StringType(),
               "boolean": T.BooleanType(), "date": T.DateType(), "binary": T.BinaryType(),
               "timestamp": T.TimestampType()}
    key = d.strip().lower()
    if key in mapping:
        return mapping[key]
    return T._parse_datatype_string(d)


def _transform_struct_at(dtype: T.DataType, steps: list[str], fn,
                         full_path: str) -> T.DataType:
    """Apply ``fn(StructType) -> StructType`` to the struct reached by
    walking ``steps`` from ``dtype``, rebuilding the enclosing type.
    Steps are struct field names (case-insensitive), or the pseudo-names
    ``element`` (into an array) and ``key`` / ``value`` (into a map) —
    Spark's own nested-ALTER path grammar
    (reference AlterTableTests.scala:114-313)."""
    if not steps:
        if not isinstance(dtype, T.StructType):
            raise ValueError(
                f"Cannot add or update '{full_path}': its parent is "
                f"not a StructType ({dtype.simpleString()}) — arrays "
                f"need an 'element' step, maps a 'key'/'value' step")
        return fn(dtype)
    step = steps[0]
    if isinstance(dtype, T.StructType):
        tgt = next((f for f in dtype.fields
                    if f.name.lower() == step.lower()), None)
        if tgt is None:
            raise ValueError(
                f"Cannot update missing field {full_path} in "
                f"{dtype.simpleString()}")
        inner = _transform_struct_at(tgt.dataType, steps[1:], fn, full_path)
        return T.StructType([
            T.StructField(f.name, inner, f.nullable, f.metadata)
            if f.name == tgt.name else f
            for f in dtype.fields])
    if isinstance(dtype, T.ArrayType):
        if step.lower() != "element":
            raise ValueError(
                f"Cannot add or update '{full_path}': "
                f"{dtype.simpleString()} is not a StructType — step "
                f"into an array with 'element'")
        return T.ArrayType(
            _transform_struct_at(dtype.elementType, steps[1:], fn,
                                 full_path),
            dtype.containsNull)
    if isinstance(dtype, T.MapType):
        if step.lower() == "key":
            return T.MapType(
                _transform_struct_at(dtype.keyType, steps[1:], fn,
                                     full_path),
                dtype.valueType, dtype.valueContainsNull)
        if step.lower() == "value":
            return T.MapType(
                dtype.keyType,
                _transform_struct_at(dtype.valueType, steps[1:], fn,
                                     full_path),
                dtype.valueContainsNull)
        raise ValueError(
            f"Cannot add or update '{full_path}': "
            f"{dtype.simpleString()} is not a StructType — step into "
            f"a map with 'key' or 'value'")
    raise ValueError(
        f"Cannot add or update '{full_path}': '{step}' is "
        f"not a StructType ({dtype.simpleString()})")


class StarTable:
    def __init__(self, spark: SparkSession, store: ManifestStore):
        self.spark = spark
        self.store = store

    # ---------- constructors ----------

    @staticmethod
    def for_path(spark: SparkSession, path: str) -> "StarTable":
        store = ManifestStore(path)
        store.table_info()  # raises TableNotFoundError if absent
        return StarTable(spark, store)

    @staticmethod
    def for_name(spark: SparkSession, name: str, warehouse: str | None = None) -> "StarTable":
        """Resolve a SHORT TABLE NAME from the star catalog (reference
        StarTable.forName, tables/StarTable.scala + StarTableSuite
        'forName' cases): names that exist only as Spark-catalog tables
        or temp views, or ``star.`path``` identifiers (forPath's job),
        are refused with the reference's 'not an Star table' shape
        rather than a bare lookup miss."""
        try:
            return StarTable.for_path(spark, catalog.resolve(name, warehouse))
        except KeyError:
            looks_like_path = re.match(r"^star\.`.*`$", name, re.IGNORECASE)
            try:
                known_to_spark = spark.catalog.tableExists(name)
            except Exception:
                known_to_spark = False
            if looks_like_path or known_to_spark:
                raise ValueError(
                    f"{name} is not an Star table "
                    f"(StarTableSuite.scala:59-95: forName takes short "
                    f"table names only — use forPath for paths)")
            raise KeyError(f"unknown table name '{name}'")

    @staticmethod
    def is_star_table(path: str) -> bool:
        return ManifestStore.is_star_table(path)

    # ---------- reads ----------

    def to_df(
        self,
        version: int | None = None,
        merge_operators: dict | None = None,
        partition_filter=None,
        where: str | None = None,
        timestamp=None,
    ) -> DataFrame:
        """Snapshot view. ``version`` = MVCC time travel; ``timestamp``
        (epoch float, datetime, or ISO string — Delta TIMESTAMP AS OF)
        resolves to the latest version committed at or before it;
        ``merge_operators`` = per-column MoR operators (see
        starlake_spark.merge_ops).

        ``where``: SQL predicate used three ways — range-column
        conjuncts prune partitions at the manifest, simple conjuncts
        skip whole files via footer min/max stats, and the full
        predicate is re-applied row-level (so pruning is pure I/O
        savings; semantics identical to .filter(where))."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.store.version_at_timestamp(_to_epoch(timestamp))
        df = reader.scan(
            self.spark,
            self.store,
            version=version,
            merge_operators=merge_operators,
            partition_filter=partition_filter,
            where=where,
        )
        return df.filter(where) if where else df

    toDF = to_df

    @property
    def info(self) -> TableInfo:
        return self.store.table_info(refresh=True)

    def versions(self) -> list[int]:
        return self.store.list_versions()

    def history(self) -> DataFrame:
        """Commit history as a DataFrame (Delta DESCRIBE HISTORY analog;
        the reference keeps the same facts in its undo_log/partition
        versions). One row per manifest version: commit type, UTC
        timestamp, files added/removed vs the previous version, live
        file count/bytes. Manifest-only — no data files are read."""
        from datetime import datetime, timezone

        rows = []
        prev: set[str] = set()
        for v in self.store.list_versions():
            snap = self.store.snapshot(v)
            all_files = list(snap.all_files())
            files = {f.path for f in all_files}
            rows_added = sum(f.num_rows for f in all_files
                             if f.path not in prev and f.num_rows > 0)
            rows.append((
                v,
                snap.commit_type,
                datetime.fromtimestamp(snap.timestamp, tz=timezone.utc)
                .replace(tzinfo=None),
                len(files - prev),
                len(prev - files),
                rows_added,
                len(files),
                sum(f.size for f in all_files),
            ))
            prev = files
        return local_df(
            self.spark, rows,
            "version long, commit_type string, committed_at timestamp, "
            "files_added long, files_removed long, rows_added long, "
            "live_files long, live_bytes long",
        )

    def partitions(self) -> DataFrame:
        """Partition inventory (SHOW PARTITIONS analog): per range
        partition the live file count, MoR delta-file count, bytes, and
        last-update version — the delta_file_num surface the reference
        exposes through its partition_info table."""
        snap = self.store.snapshot()
        rows = [
            (
                p.range_value,
                len(p.files),
                p.delta_file_num,
                sum(f.size for f in p.files),
                p.last_update_version,
            )
            for p in sorted(snap.partitions.values(), key=lambda p: p.range_value)
        ]
        return local_df(
            self.spark, rows,
            "partition string, n_files long, delta_files long, "
            "bytes long, last_update_version long",
        )

    # ---------- writes / DML ----------

    def _guard_replica_dml(self, op: str) -> None:
        """Frozen-replica guard: direct DML against a replica would be
        silently overwritten by the next sync's net-window apply (no
        cross-table conflict detection) — refuse it outside the
        replication apply path. Outs, in decreasing reversibility:
        set ``replication.frozen=false`` (writable replica, divergence
        accepted), ``sync_table(..., full=True)`` after writing (repair
        re-converges to source state), or unset ``replication.source``
        (detach for good)."""
        cfg = self.info.configuration or {}
        if not cfg.get("replication.source"):
            return
        if str(cfg.get("replication.frozen", "true")).lower() == "false":
            return
        from starlake_spark.operators import replication as _rep

        if _rep.is_applying():
            return
        raise ValueError(
            f"{op}: {self.store.table_path} is a frozen replica of "
            f"{cfg['replication.source']} — direct DML would be "
            "overwritten by the next sync. Set replication.frozen=false "
            "to make it writable, or unset replication.source to detach; "
            "sync_table(..., full=True) re-converges a diverged replica.")

    def write(self, df: DataFrame, mode: str = "append", replace_where: str | None = None,
              txn_app_id: str | None = None, txn_version: int | None = None,
              partition_overwrite: str = "static") -> "StarTable":
        """``txn_app_id``/``txn_version`` (Delta txnAppId/txnVersion
        analog) make the write idempotent: retries carrying an
        already-committed version are no-ops, enforced race-free under
        the commit lock. ``partition_overwrite="dynamic"`` with
        mode="overwrite" replaces only the range partitions present in
        ``df`` (Spark/Delta partitionOverwriteMode=dynamic)."""
        self._guard_replica_dml("write")
        if partition_overwrite not in ("static", "dynamic"):
            raise ValueError("partition_overwrite must be 'static' or 'dynamic'")
        if partition_overwrite == "dynamic" and replace_where is not None:
            raise ValueError("dynamic partition overwrite and replaceWhere "
                             "are mutually exclusive")
        dml.write_into(self.spark, self.store, df, mode=mode, replace_where=replace_where,
                       txn_app_id=txn_app_id, txn_version=txn_version,
                       dynamic_partition_overwrite=(partition_overwrite == "dynamic"))
        return self

    def upsert(self, source: DataFrame, use_delta: bool = True,
               txn_app_id: str | None = None, txn_version: int | None = None,
               condition: str | None = None) -> "StarTable":
        """``condition`` scopes the CoW path (use_delta=False) to
        matching range partitions and is REQUIRED there on
        range-partitioned tables — see dml.upsert."""
        self._guard_replica_dml("upsert")
        dml.upsert(self.spark, self.store, source, use_delta=use_delta,
                   txn_app_id=txn_app_id, txn_version=txn_version,
                   condition=condition)
        return self

    def update(self, condition, set_exprs: dict, use_delta: bool = False,
               use_dv: bool = False) -> "StarTable":
        """``use_delta=True``: O(matched rows) delta-upsert UPDATE
        instead of rewriting touched files (hash tables); ``use_dv=True``
        (or dml.dv.enabled=true): deletion-vector UPDATE for non-hash
        tables — old positions vectored out, updated images appended,
        O(changed rows); see dml.update."""
        self._guard_replica_dml("update")
        dml.update(self.spark, self.store, condition, set_exprs,
                   use_delta=use_delta, use_dv=use_dv)
        return self

    def merge(self, source: DataFrame, condition: str,
              matched_update: dict | str | None = None,
              matched_delete: bool = False,
              not_matched_insert: dict | str | None = None,
              target_alias: str = "t", source_alias: str = "s",
              not_matched_by_source_update: dict | None = None,
              not_matched_by_source_delete: bool = False) -> "StarTable":
        """ANSI MERGE INTO — see dml.merge_into. ``"*"`` takes source
        columns by name; dict values are SQL expressions over both
        aliases (default t/s). The by-source clauses act on target rows
        the source doesn't match (sync-to-source deletes/flags)."""
        self._guard_replica_dml("merge")
        dml.merge_into(self.spark, self.store, source, condition,
                       matched_update=matched_update,
                       matched_delete=matched_delete,
                       not_matched_insert=not_matched_insert,
                       target_alias=target_alias, source_alias=source_alias,
                       not_matched_by_source_update=not_matched_by_source_update,
                       not_matched_by_source_delete=not_matched_by_source_delete)
        return self

    def delete(self, condition=None, use_delta: bool = False,
               use_dv: bool = False) -> "StarTable":
        """``use_delta=True``: tombstone-delta DELETE — O(matched keys)
        write instead of rewriting touched files (hash tables).
        ``use_dv=True`` (or dml.dv.enabled=true): deletion-vector
        DELETE for non-hash tables — matched (file, position) pairs
        land in a sidecar, zero data bytes rewritten; see dml.delete."""
        self._guard_replica_dml("delete")
        dml.delete(self.spark, self.store, condition, use_delta=use_delta,
                   use_dv=use_dv)
        return self

    def copy_into(self, source_dir: str, file_format: str = "parquet",
                  checkpoint: str | None = None) -> int:
        """Idempotent directory ingest (COPY INTO) — file-level
        exactly-once via a one-shot file-source stream drain; see
        module-level copy_into."""
        self._guard_replica_dml("copy_into")
        return copy_into(self.spark, self, source_dir,
                         file_format=file_format, checkpoint=checkpoint)

    def delete_keys(self, keys_df: DataFrame) -> "StarTable":
        """Tombstone-delete an explicit key frame — O(keys) write, no
        table scan; the CDC-apply / erasure-list shape (dml.delete_keys)."""
        self._guard_replica_dml("delete_keys")
        dml.delete_keys(self.spark, self.store, keys_df)
        return self

    def upsert_with_tombstones(self, source: DataFrame,
                               tomb_keys: DataFrame,
                               txn_app_id: str | None = None,
                               txn_version: int | None = None) -> "StarTable":
        """Apply one refresh/sync cycle's deletes AND postimages as a
        single delta commit (one write job, one manifest version, one
        lock round) — semantically ``delete_keys(tomb_keys)`` followed
        by ``upsert(source)``; see dml.upsert_with_tombstones."""
        self._guard_replica_dml("upsert_with_tombstones")
        dml.upsert_with_tombstones(self.spark, self.store, source,
                                   tomb_keys, txn_app_id=txn_app_id,
                                   txn_version=txn_version)
        return self

    def compaction(self, force: bool = True, merge_operators: dict | None = None,
                   partition: str | None = None,
                   partition_predicate: str | None = None,
                   sort_columns: list[str] | None = None,
                   target_files: int | None = None,
                   cluster_mode: str = "linear") -> "StarTable":
        """``sort_columns`` = OPTIMIZE-style clustered rewrite so
        footer-stats skipping (to_df(where=...)) gets tight per-file
        bounds; non-hash tables only. ``cluster_mode="zorder"`` (with
        2+ sort columns) interleaves the columns' bits into a Morton
        key so every file gets a tight bounding box in EVERY clustered
        dimension — predicates on any single clustered column skip
        files, where the linear sort only bounds the prefix column."""
        dml.compact(self.spark, self.store, force=force,
                    merge_operators=merge_operators, partition=partition,
                    partition_predicate=partition_predicate,
                    sort_columns=sort_columns, target_files=target_files,
                    cluster_mode=cluster_mode)
        self._maybe_clear_dropped_markers()
        return self

    def compact_small_files(self, threshold_bytes: int = 32 * 1024 * 1024,
                            partition: str | None = None) -> int:
        """Bin-packing small-file merge (Delta OPTIMIZE default shape):
        coalesce only the files under ``threshold_bytes`` per
        partition, leave right-sized files untouched. The maintenance
        op for append-heavy ingest; see dml.compact_small_files."""
        n = dml.compact_small_files(self.spark, self.store,
                                    threshold_bytes=threshold_bytes,
                                    partition=partition)
        self._maybe_clear_dropped_markers()
        return n

    def _maybe_clear_dropped_markers(self) -> None:
        """Once no live file still carries a logically-dropped column
        (exist_cols is the write-time record), the drop is physical and
        the name becomes re-addable. Rename alias markers clear the
        same way: when no live file carries a column's pre-rename
        physical name any more (compaction rewrote them), the alias is
        dead weight and the old name frees up for reuse."""
        probe = self.store.table_info(refresh=True).configuration or {}
        if not probe.get("dropped.columns") \
                and not any(k.startswith("aliases.") for k in probe):
            return
        live = {c.lower() for f in self.store.snapshot().all_files()
                for c in f.exist_cols}

        def mutate(info):
            cfg = dict(info.configuration or {})
            dropped = set(filter(None,
                                 cfg.get("dropped.columns", "").split(",")))
            changed = False
            if dropped:
                remaining = dropped & live
                if remaining != dropped:
                    cfg["dropped.columns"] = ",".join(sorted(remaining))
                    changed = True
            for k in [k for k in cfg if k.startswith("aliases.")]:
                v = cfg[k]
                keep = [a for a in v.split(",") if a and a.lower() in live]
                if keep != [a for a in v.split(",") if a]:
                    if keep:
                        cfg[k] = ",".join(keep)
                    else:
                        cfg.pop(k, None)
                    changed = True
            if changed:
                info.configuration = cfg
            return changed

        self._update_info_retrying(mutate)

    def cleanup(self, retention_s: float = dml.CLEANUP_RETENTION_S,
                dry_run: bool = False,
                manifest_retention_s: float | None = None,
                cdc_retention_s: float | None = None) -> list[str]:
        return dml.cleanup(self.store, retention_s=retention_s,
                           dry_run=dry_run,
                           manifest_retention_s=manifest_retention_s,
                           cdc_retention_s=cdc_retention_s)

    def fsck(self, deep: bool = False, repair: bool = False) -> list[dict]:
        """Consistency check (Delta ``FSCK [REPAIR] TABLE`` analog).
        Metadata pass (always): every manifest-referenced data file, DV
        sidecar, and bloom sidecar must exist on storage, and every
        retained version must still resolve its delta chain. ``deep``
        adds a DISTRIBUTED footer audit — one ``mapInPandas`` job over
        the file list reads each parquet footer on the executors and
        compares physical row counts against the manifest (the 100 TB
        shape: the driver never touches a file). Returns a list of
        issue dicts (empty = healthy).

        ``repair=True`` drops manifest references to MISSING data files
        in one commit so the table reads again (Delta FSCK REPAIR
        semantics: readability over completeness — the lost rows are
        gone either way; restore from an older version if you need
        them). Missing DV sidecars are NOT repaired: dropping a vector
        ref would resurrect deleted rows — reported as irreparable.
        The repair commit is invisible to the change feed (rows cannot
        be emitted from files that no longer exist)."""
        import os as _os

        store = self.store
        snap = store.snapshot()

        def _abs(p: str) -> str:
            return p if _os.path.isabs(p) else _os.path.join(
                store.table_path, p)

        # existence probes route through the lister seam: on an object
        # store these are HEADs (or answered from one prefix LIST by a
        # caching lister), never POSIX stat calls
        from starlake_spark.listing import get_lister

        _exists = get_lister().exists
        issues: list[dict] = []
        missing_files: list[str] = []
        for ps in snap.partitions.values():
            for f in ps.files:
                if not _exists(_abs(f.path)):
                    missing_files.append(f.path)
                    issues.append({"kind": "missing_file",
                                   "partition": ps.range_value,
                                   "path": f.path, "repairable": True})
                if getattr(f, "bloom_ref", None) and \
                        not _exists(_abs(f.bloom_ref)):
                    issues.append({"kind": "missing_bloom_sidecar",
                                   "partition": ps.range_value,
                                   "path": f.bloom_ref, "repairable": False})
            for d in ps.dv_files:
                if not _exists(_abs(d.path)):
                    issues.append({"kind": "missing_dv_sidecar",
                                   "partition": ps.range_value,
                                   "path": d.path, "repairable": False})
        # orphans: physical files under data/ no retained version
        # references — crashed task attempts, writers that died before
        # commit. Report-only: VACUUM removes them after retention
        # (cleanup's sweep uses the same referenced-set), fsck repair
        # never deletes bytes.
        referenced: set[str] = set()
        for v in store.list_versions():
            try:
                sv = store.snapshot(v)
            except Exception:
                continue
            referenced |= {f.path for f in sv.all_files()}
            referenced |= {d.path for ps in sv.partitions.values()
                           for d in ps.dv_files}
            referenced |= {f.bloom_ref for f in sv.all_files()
                           if getattr(f, "bloom_ref", None)}
        # LISTING SEAM (starlake_spark.listing): the orphan report is a
        # prefix listing diffed against the manifest set — same shape
        # and same lister as vacuum's sweep
        from starlake_spark.listing import get_lister

        lister = get_lister()
        data_root = _os.path.join(store.table_path, "data")
        for ent in lister.list_files(data_root):
            n = _os.path.basename(ent.path)
            if n.startswith((".", "_")):
                continue  # Hadoop bookkeeping (_SUCCESS, .crc)
            rel = _os.path.relpath(ent.path, store.table_path)
            if rel not in referenced:
                issues.append({"kind": "orphan_file", "partition": None,
                               "path": rel, "repairable": False,
                               "detail": "unreferenced by any retained "
                                         "version; VACUUM removes it "
                                         "after retention"})
        # orphaned bloom sidecars: bitmaps whose commit no retained
        # version references (same sweep clock as data orphans —
        # readers only load manifest-referenced bitmaps, so these are
        # pure storage leak, removed by VACUUM after retention)
        bloom_root = _os.path.join(store.table_path, "_star_meta", "bloom")
        for ent in lister.list_files(bloom_root):
            rel = _os.path.relpath(ent.path, store.table_path)
            if rel not in referenced:
                issues.append({"kind": "orphan_bloom_sidecar",
                               "partition": None,
                               "path": rel, "repairable": False,
                               "detail": "unreferenced by any retained "
                                         "version; VACUUM removes it "
                                         "after retention"})

        # resolve versions through a COLD store: the live store's
        # snapshot cache would mask on-disk manifest corruption
        cold = ManifestStore(store.table_path)
        for v in cold.list_versions():
            try:
                cold.snapshot(v)
            except Exception as exc:  # noqa: BLE001
                issues.append({"kind": "unresolvable_version",
                               "partition": None, "path": str(v),
                               "repairable": False, "detail": str(exc)})
        if deep:
            gone = set(missing_files)
            audit = [( _abs(f.path), f.path, ps.range_value,
                       int(f.num_rows))
                     for ps in snap.partitions.values() for f in ps.files
                     if f.path not in gone and f.num_rows is not None
                     and f.num_rows >= 0]
            if audit:
                pdf_schema = ("path string, partition string, "
                              "expected long, actual long")

                def _footers(batches):
                    import pandas as _pd
                    import pyarrow.parquet as _pq

                    for b in batches:
                        rows = []
                        for ap, rp, rv, exp in zip(
                                b["abs_path"], b["rel_path"],
                                b["range_value"], b["expected"]):
                            rows.append((rp, rv, int(exp),
                                         _pq.ParquetFile(ap)
                                         .metadata.num_rows))
                        yield _pd.DataFrame(
                            rows, columns=["path", "partition",
                                           "expected", "actual"])

                adf = local_df(
                    self.spark, audit, "abs_path string, rel_path string, "
                           "range_value string, expected long")
                bad = (adf.repartition(
                            max(1, min(len(audit), 64)))
                       .mapInPandas(_footers, pdf_schema)
                       .filter("expected <> actual").collect())
                for r in bad:
                    issues.append({"kind": "row_count_mismatch",
                                   "partition": r["partition"],
                                   "path": r["path"], "repairable": False,
                                   "detail": f"manifest={r['expected']} "
                                             f"footer={r['actual']}"})
        if repair and missing_files:
            txn = store.new_transaction()
            txn.commit_type = "fsck"
            for p in missing_files:
                txn.expire.add(p)
            store.commit(txn)
        return issues

    def generate_symlink_manifest(self, version: int | None = None) -> str:
        """Delta ``GENERATE symlink_format_manifest`` parity: write
        ``_symlink_format_manifest/[<range dirs>/]manifest`` text files
        listing the snapshot's data-file absolute paths, so external
        engines (Trino/Presto/Athena-style symlink readers) see a
        CONSISTENT snapshot without speaking the manifest protocol —
        directory listing would also see in-flight and expired files.
        MoR snapshots (any non-base file) are refused: an external
        engine cannot collapse delta versions — compact first. The
        manifest reflects the snapshot at generation time; regenerate
        after commits (same contract as Delta's non-auto mode)."""
        import shutil as _sh

        snap = self.store.snapshot(version)
        deltas = [f.path for f in snap.all_files() if not f.is_base_file]
        if deltas:
            raise ValueError(
                f"symlink manifest requires an all-base snapshot; "
                f"{len(deltas)} delta file(s) present — run compaction() "
                f"first (external engines cannot collapse MoR versions)")
        if any(ps.dv_files for ps in snap.partitions.values()):
            raise ValueError(
                "symlink manifest refused: snapshot carries deletion "
                "vectors an external engine cannot apply (it would read "
                "deleted rows) — run compaction() to materialize them "
                "first")
        root = os.path.join(self.store.table_path, "_symlink_format_manifest")
        tmp = root + ".tmp"
        _sh.rmtree(tmp, ignore_errors=True)
        for rv, ps in sorted(snap.partitions.items()):
            d = os.path.join(tmp, *(rv.split(",") if rv else []))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "manifest"), "w") as fh:
                for f in sorted(ps.files, key=lambda x: x.path):
                    p = f.path if os.path.isabs(f.path) else os.path.join(
                        self.store.table_path, f.path)
                    fh.write(p + "\n")
        if not snap.partitions:
            os.makedirs(tmp, exist_ok=True)
            open(os.path.join(tmp, "manifest"), "w").close()
        _sh.rmtree(root, ignore_errors=True)
        os.rename(tmp, root)
        return root

    def to_bucketed_table(self, name: str | None = None) -> str:
        """Materialize the current snapshot as a Spark BUCKETED table so
        repeated PK joins/aggs on the hash keys skip exchange AND sort.

        This is the PySpark expression of the reference's bucket-scan
        shuffle elision (rules/SetPartitionAndOrdering.scala:52-141,
        proven by test/.../ParquetScanSuite.scala:188-293): the
        reference's scan reports its hash-bucket layout to Catalyst as
        an output partitioning/ordering; Spark only honors that protocol
        for its own bucketed relations, so we materialize one —
        ``bucketBy(bucket_num, hash_cols).sortBy(hash_cols)`` with a
        pre-repartition on the same keys, which aligns rows to their
        bucket task and yields exactly ONE file per bucket (the
        condition for Spark to also elide the SMJ sort).

        Data lands under ``<table_path>/bucketed/<name>`` (outside the
        manifest's data/ tree, invisible to vacuum); the catalog entry
        is session-scoped, so re-register on a new session by calling
        this again — the write is an idempotent overwrite. Returns the
        catalog table name; read it with ``spark.table(name)``.

        Joins between two tables bucketed this way (same bucket count,
        same key types) plan as zero-exchange zero-sort SortMergeJoins;
        groupBy on the hash keys aggregates without exchange. At 100 TB
        this removes the single biggest recurring shuffle the plain
        path pays on every PK join."""
        import os

        info = self.info
        if not info.hash_cols or info.bucket_num <= 0:
            raise ValueError(
                "to_bucketed_table requires a hash-partitioned table "
                "(hash_partitions + hash_bucket_num at create_table)")
        name = name or f"star_bkt_{info.table_id.replace('table_', '')}"
        data_path = os.path.join(self.store.table_path, "bucketed", name)
        n = info.bucket_num
        cols = list(info.hash_cols)
        (self.to_df()
            .repartition(n, *[F.col(c) for c in cols])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n, *cols)
            .sortBy(*cols)
            .option("path", data_path)
            .saveAsTable(name))
        self.set_properties({"bucketed.table": name,
                             "bucketed.path": data_path,
                             # snapshot stamp: consumers (set-op
                             # rewrite) use the materialization only
                             # while it reflects the CURRENT version
                             "bucketed.version":
                                 str(self.store.latest_version())})
        return name

    def _bucketed_df(self):
        """The bucketed materialization IF it reflects the current
        snapshot (stamped at to_bucketed_table time), else None."""
        cfg = self.info.configuration or {}
        name, ver = cfg.get("bucketed.table"), cfg.get("bucketed.version")
        if (name and ver is not None
                and int(ver) == self.store.latest_version()
                and self.spark.catalog.tableExists(name)):
            return self.spark.table(name)
        return None

    def _setop_keys(self, other: "StarTable", how: str) -> DataFrame:
        """INTERSECT/EXCEPT over the PK columns — the reference's
        StarLakePostHocAnalysis rewrite
        (rules/StarLakePostHocAnalysis.scala:29-96, suite
        StarLakePostHocAnalysisSuite.scala): hash columns are non-null
        primary keys, so the set-op IS a left-semi/left-anti join with
        PLAIN equality and needs no post-dedup. Catalyst's own
        ReplaceIntersectWithSemiJoin keeps null-safe join keys plus a
        Distinct, which defeats bucket layouts (the keys become
        coalesce(k,0)/isnull(k) expressions, so the scan's reported
        partitioning never matches); joining on the raw keys lets two
        CURRENT to_bucketed_table materializations plan a
        zero-exchange bucket-aligned SortMergeJoin
        (test_plan_hygiene pins it)."""
        a, b = self.info, other.info
        if not a.hash_cols or not b.hash_cols:
            raise ValueError(
                "intersect_keys/except_keys require hash-partitioned "
                "tables (the rewrite is sound only for primary keys)")
        if ([c.lower() for c in a.hash_cols]
                != [c.lower() for c in b.hash_cols]
                or a.bucket_num != b.bucket_num):
            raise ValueError(
                f"hash layouts differ: {a.hash_cols} x{a.bucket_num} "
                f"vs {b.hash_cols} x{b.bucket_num} — the PK set-op "
                "rewrite requires identical key columns and bucket "
                "count (StarLakePostHocAnalysis.scala:79-95)")
        cols = list(a.hash_cols)
        left, right = self._bucketed_df(), other._bucketed_df()
        if left is None or right is None:
            left, right = self.to_df(), other.to_df()
        left = left.select(*cols)
        right = right.select(*[F.col(c).alias(f"__r_{c}") for c in cols])
        cond = None
        for c in cols:
            e = left[c] == right[f"__r_{c}"]
            cond = e if cond is None else cond & e
        return left.join(right, cond, how).select(*cols)

    def intersect_keys(self, other: "StarTable") -> DataFrame:
        """``SELECT <pk> FROM self INTERSECT SELECT <pk> FROM other``
        as a semi join (see _setop_keys)."""
        return self._setop_keys(other, "left_semi")

    def except_keys(self, other: "StarTable") -> DataFrame:
        """``SELECT <pk> FROM self EXCEPT SELECT <pk> FROM other``
        as an anti join (see _setop_keys)."""
        return self._setop_keys(other, "left_anti")

    def drop_partition(self, range_value: str) -> "StarTable":
        """DropPartitionCommand (commands/DropTableCommand.scala:150-247)
        with the reference's refusal parity (DropTableSuite.scala
        'drop partition'): exactly ONE partition per call — an OR
        condition raises 'You can only drop one partition once time',
        an unmatched condition 'Partition not found by condition'."""
        self._guard_replica_dml("drop_partition")
        # multi-partition refusal is STRUCTURAL: only an OR that joins
        # full key=value terms counts ("a=1 or a=2"). A bare
        # word-boundary match spuriously refused legitimate single
        # values containing the word ("state=OR", "unit=or").
        if re.match(r"^\s*[^\s=]+=\S*(\s+or\s+[^\s=]+=\S*)+\s*$",
                    range_value, re.IGNORECASE):
            raise ValueError("You can only drop one partition once time")
        txn = self.store.new_transaction()
        if range_value not in txn.read_snapshot.partitions:
            raise KeyError(
                f"Partition not found by condition: {range_value}")
        txn.expire_partition(range_value)
        self.store.commit(txn)
        return self

    def drop_table(self) -> None:
        info = self.store.table_info()
        if info.short_name:
            # the warehouse the name was registered in is stamped at
            # create/convert/clone time — dropping must unregister from
            # THAT catalog, not the default (DropTableSuite.scala
            # tableNotExists parity; pre-round-8 a custom-warehouse
            # registration dangled forever)
            catalog.unregister(info.short_name,
                               (info.configuration or {})
                               .get("catalog.warehouse"))
        self.store.drop()

    def restore(self, version: int | None = None,
                timestamp=None, partition: str | None = None) -> "StarTable":
        """RESTORE TABLE TO VERSION AS OF n / TIMESTAMP AS OF ts
        (Delta-style, beyond the reference): a new commit re-points the
        table at the target snapshot's exact file state. History is
        preserved (interim versions remain time-travelable), restored
        MoR files keep their write_versions so merge ordering survives,
        and the change stream sees nothing (no file carries the new
        commit's write_version).

        ``partition`` = surgical rollback: only that range partition
        rewinds; everything else keeps its current state (merged under
        the commit lock — concurrent commits elsewhere are safe)."""
        if (version is None) == (timestamp is None):
            raise ValueError("pass exactly one of version / timestamp")
        if timestamp is not None:
            version = self.store.version_at_timestamp(_to_epoch(timestamp))
        self.store.restore(version, partition=partition)
        return self

    def clone(self, dest_path: str, version: int | None = None,
              shallow: bool = True, short_name: str | None = None,
              warehouse: str | None = None) -> "StarTable":
        """CLONE (Delta-style, beyond the reference): create a new table
        whose first snapshot references this table's data files as of
        ``version`` (latest if None). Shallow clones point at the SOURCE
        files via absolute paths — zero data copied, O(metadata); a
        later cleanup() on the source can break them (the same caveat
        Delta shallow clones carry). Deep clones copy the files into the
        clone's own directory. Writes to the clone never touch the
        source: new files land under the clone root, and rewrites just
        drop source references from the clone's manifest."""
        import shutil as _sh

        from starlake_spark.meta import PartitionSnapshot as _PS

        src_info = self.store.table_info()
        snap = self.store.snapshot(version)
        dest = ManifestStore(dest_path)
        cfg = dict(src_info.configuration)
        if shallow:
            # sync metadata: sync_clone() catches the clone up to the
            # source incrementally (changed partitions only)
            cfg["clone.source_path"] = os.path.abspath(self.store.table_path)
            cfg["clone.source_version"] = str(snap.version)
        info = TableInfo(
            table_path=dest_path,
            table_id=f"table_{uuid.uuid4().hex[:16]}",
            schema_json=src_info.schema_json,
            range_cols=list(src_info.range_cols),
            hash_cols=list(src_info.hash_cols),
            bucket_num=src_info.bucket_num,
            configuration=cfg,
            short_name=short_name,
        )
        dest.create(info)
        partitions = {}
        for rv, ps in snap.partitions.items():
            files = []
            path_map = {}  # deep clones: old abs path -> new abs path
            for f in ps.files:
                nf = replace(f)
                src_abs = os.path.join(self.store.table_path, f.path)
                # bloom sidecars stay in the SOURCE's meta dir: shallow
                # clones keep probing them via an absolute ref (rows are
                # keyed by file basename, path-agnostic); deep clones
                # drop the ref (fail-open) — their own rewrites rebuild.
                if f.bloom_ref and not os.path.isabs(f.bloom_ref):
                    nf.bloom_ref = (
                        os.path.join(self.store.table_path, f.bloom_ref)
                        if shallow else None)
                if shallow:
                    nf.path = src_abs
                else:
                    rel = os.path.join("data", "clone_v0", f.path.replace(os.sep, "_"))
                    dst_abs = os.path.join(dest_path, rel)
                    os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
                    _sh.copy2(src_abs, dst_abs)
                    nf.path = rel
                    path_map[src_abs] = dst_abs
                files.append(nf)
            dvs = []
            for d in ps.dv_files:
                nd = replace(d)
                src_abs = os.path.join(self.store.table_path, d.path)
                if shallow:
                    # sidecar fids are scheme-stripped absolute SOURCE
                    # paths — exactly what the shallow clone reads
                    nd.path = src_abs
                else:
                    # deep clone moved the data files, so the copied
                    # sidecar must speak the NEW absolute paths
                    import pyarrow as _pa
                    import pyarrow.parquet as _pq

                    rel = os.path.join("data", "clone_v0",
                                       d.path.replace(os.sep, "_"))
                    dst_abs = os.path.join(dest_path, rel)
                    os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
                    tbl = _pq.read_table(src_abs)
                    fids = [path_map.get(p, p)
                            for p in tbl["_star_fid"].to_pylist()]
                    tbl = tbl.set_column(
                        tbl.schema.get_field_index("_star_fid"),
                        "_star_fid", _pa.array(fids, type=_pa.string()))
                    _pq.write_table(tbl, dst_abs)
                    nd.path = rel
                    nd.size = os.path.getsize(dst_abs)
                dvs.append(nd)
            partitions[rv] = _PS(rv, files, 1, dv_files=dvs)
        # Publish the clone's first snapshot at >= the max write_version
        # of the imported files, so every post-clone commit stamps a
        # strictly higher write_version and MoR collapse never prefers
        # stale source rows over fresh clone-side upserts/deletes.
        max_wv = max(
            (f.write_version for ps in partitions.values() for f in ps.files),
            default=0,
        )
        dest.import_state(partitions, commit_type="clone", min_version=max_wv)
        if short_name:
            catalog.register(short_name, dest_path, warehouse)
            if warehouse:
                di = dest.table_info(refresh=True)
                di.configuration["catalog.warehouse"] = \
                    os.path.abspath(warehouse)
                dest.update_table_info(di)
        return StarTable(self.spark, dest)

    def sync_clone(self) -> int:
        """Incremental clone catch-up (beyond Delta, whose shallow
        clones are frozen at clone time): re-point ONLY the partitions
        the SOURCE changed since the last sync at the source's current
        file state — O(changed partitions) metadata, zero data bytes
        moved, one commit. Returns the now-synced source version.

        Semantics are replication: a partition the source touched is
        forced to the source state (local edits to it are superseded —
        history keeps them reachable via time travel); partitions the
        source didn't touch keep any local divergence. Partitions the
        source dropped are dropped. Shallow clones only (the clone
        reads source files in place); requires the source's manifest
        at the last-synced version to still exist for precise removal
        detection, else falls back to a full re-point of every source
        partition."""
        info = self.store.table_info(refresh=True)
        cfg = info.configuration or {}
        src_path = cfg.get("clone.source_path")
        if not src_path:
            raise ValueError(
                "sync_clone: this table is not a shallow clone (no "
                "clone.source_path property) — deep clones are "
                "self-contained and do not sync")
        v0 = int(cfg.get("clone.source_version", "0"))
        src = ManifestStore(src_path)
        cur = src.latest_version()
        if cur == v0:
            return v0
        src_snap = src.snapshot()
        try:
            base = src.snapshot(v0)
        except MetaError:
            base = None  # manifest expired: full re-point below

        def _retarget(ps):
            files = []
            for f in ps.files:
                nf = replace(f)
                if not os.path.isabs(nf.path):
                    nf.path = os.path.join(src_path, nf.path)
                if nf.bloom_ref and not os.path.isabs(nf.bloom_ref):
                    nf.bloom_ref = os.path.join(src_path, nf.bloom_ref)
                files.append(nf)
            dvs = []
            for d in ps.dv_files:
                nd = replace(d)
                if not os.path.isabs(nd.path):
                    nd.path = os.path.join(src_path, nd.path)
                dvs.append(nd)
            from starlake_spark.meta import PartitionSnapshot as _PS

            return _PS(ps.range_value, files, ps.last_update_version,
                       dv_files=dvs)

        updates: dict = {}
        for rv, ps in src_snap.partitions.items():
            if (base is None or rv not in base.partitions
                    or ps.last_update_version > v0):
                updates[rv] = _retarget(ps)
        gone_from = (base.partitions if base is not None
                     else self.store.snapshot().partitions)
        for rv in gone_from:
            if rv not in src_snap.partitions:
                updates[rv] = None
        if updates:
            self.store.sync_partitions(updates)
        # schema follows the source (ALTERs between syncs propagate)
        src_info = src.table_info()
        if src_info.schema_json != info.schema_json:
            info.schema_json = src_info.schema_json
            self.store.update_table_info(info)
        self.set_properties({"clone.source_version": str(cur)})
        return cur

    # ---------- ALTER TABLE (commands/alterTableCommands.scala:58-374) ----------

    @staticmethod
    def _insert_at(fields: list, field, pos: str | None,
                   where: str) -> list:
        """Insert ``field`` into ``fields`` honoring an ADD/CHANGE
        position: None (append), 'first', or 'after:<sibling>'."""
        if pos is None:
            return list(fields) + [field]
        if pos.lower() == "first":
            return [field] + list(fields)
        if pos.lower().startswith("after:"):
            anchor = pos[len("after:"):]
            names = [f.name.lower() for f in fields]
            if anchor.lower() not in names:
                raise ValueError(
                    f"Couldn't resolve positional argument AFTER {anchor} "
                    f"for '{where}': missing field")
            i = names.index(anchor.lower()) + 1
            return list(fields[:i]) + [field] + list(fields[i:])
        raise ValueError(f"invalid position '{pos}': expected 'first' or "
                         f"'after:<column>'")

    def add_columns(self, columns: list[tuple] | T.StructType,
                    comments: dict[str, str] | None = None,
                    positions: dict[str, str] | None = None) -> "StarTable":
        """ALTER TABLE ADD COLUMNS: new nullable columns appended to the
        stored schema; existing files simply lack them and the scan
        fills nulls (file_exist_cols semantics — for NESTED additions
        the parquet reader backfills missing struct fields natively).

        Dotted names add INTO nested types
        (AlterTableTests.scala:114-313): struct fields by name,
        ``element`` steps into an array, ``key``/``value`` into a map —
        e.g. ``("a.element.v3", "long")`` grows the struct inside
        array column ``a``. ``comments`` maps column names to COMMENT
        strings (AlterTableTests.scala:334-352); ``positions`` maps
        them to ``"first"`` / ``"after:<col>"`` placements, applied in
        order so a later column may anchor on an earlier one from the
        same statement (AlterTableTests.scala:428-470)."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        existing = {f.name.lower() for f in schema.fields}
        if isinstance(columns, T.StructType):
            for f in columns.fields:
                if not f.nullable:
                    raise ValueError("added columns must be nullable "
                                     "(existing files cannot backfill "
                                     "values)")
            new_fields = [(f.name, f.dataType) for f in columns.fields]
        else:
            new_fields = [(n, _parse_dtype(d) if isinstance(d, str) else d)
                          for n, d in columns]
        dropped = set(filter(None, (info.configuration or {})
                             .get("dropped.columns", "").split(",")))
        comments = comments or {}
        positions = positions or {}
        for name, dtype in new_fields:
            *parents, leaf = name.split(".")
            if set(leaf) & set(" ,;{}()\n\t="):
                raise ValueError(
                    f"column name '{leaf}' contains invalid character(s): "
                    "parquet field names may not contain "
                    "\" ,;{}()\\n\\t=\" (SchemaUtils.scala:968-972)")
            meta = ({"comment": comments[name]}
                    if name in comments else None)
            field = T.StructField(leaf, dtype, True, meta)
            pos = positions.get(name)
            if not parents:
                if leaf.lower() in existing:
                    raise ValueError(f"column '{leaf}' already exists")
                if leaf.lower() in dropped:
                    raise ValueError(
                        f"column '{leaf}' was dropped but un-compacted "
                        f"files still hold its bytes (no column-id "
                        f"mapping) — run compaction(force=True) first, "
                        f"then re-add")
                existing.add(leaf.lower())
                schema = T.StructType(
                    self._insert_at(schema.fields, field, pos, name))
                continue

            def fn(struct: T.StructType, _leaf=leaf, _field=field,
                   _name=name, _pos=pos) -> T.StructType:
                if any(f.name.lower() == _leaf.lower()
                       for f in struct.fields):
                    raise ValueError(
                        f"column '{_name}' already exists in "
                        f"{struct.simpleString()}")
                return T.StructType(
                    self._insert_at(struct.fields, _field, _pos, _name))

            schema = _transform_struct_at(schema, parents, fn, name)
        info.schema_json = schema.json()
        self.store.update_table_info(info)
        return self

    def drop_columns(self, names: list[str]) -> "StarTable":
        """ALTER TABLE DROP COLUMN[S] (beyond reference — Delta-style
        logical drop, no rewrite): the column leaves the declared schema;
        readers project the schema so existing files' bytes become
        invisible immediately, new writes stop carrying the column, and
        the next compaction physically removes it. Partition/hash keys
        and CHECK-referenced columns are protected. Re-adding the same
        name later would RESURRECT the old bytes from un-compacted files
        (we have no column-id mapping), so dropped names are remembered
        in `dropped.columns` and re-adding one requires compacting
        first."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        lower = {f.name.lower(): f.name for f in schema.fields}
        protected = {c.lower() for c in info.range_cols + info.hash_cols}
        checks = " ".join(v for k, v in (info.configuration or {}).items()
                          if k.startswith("check."))
        drop = set()
        for n in names:
            canon = lower.get(n.lower())
            if canon is None:
                raise ValueError(f"no such column: {n}")
            if n.lower() in protected:
                raise ValueError(f"cannot drop partition/hash column '{canon}'")
            if re.search(rf"\b{re.escape(canon)}\b", checks):
                raise ValueError(
                    f"column '{canon}' is referenced by a CHECK constraint; "
                    f"drop the constraint first")
            drop.add(canon)
        if len(drop) >= len(schema.fields):
            raise ValueError("cannot drop every column")
        info.schema_json = T.StructType(
            [f for f in schema.fields if f.name not in drop]).json()
        cfg = dict(info.configuration or {})
        marked = {d.lower() for d in drop}
        for d in drop:
            # a renamed column's bytes live under its PRE-rename names:
            # mark those physical names dropped too, so neither the new
            # nor any old name can be re-added while un-compacted files
            # still carry the bytes. The alias property itself STAYS —
            # schema-as-of time travel needs it to resolve the column
            # in pre-rename files — and clears with the dropped markers
            # once compaction has rewritten those files.
            chain = cfg.get(f"aliases.{d.lower()}", "")
            marked |= {a.lower() for a in chain.split(",") if a}
        prev = cfg.get("dropped.columns", "")
        cfg["dropped.columns"] = ",".join(
            sorted(set(filter(None, prev.split(","))) | marked))
        info.configuration = cfg
        self.store.update_table_info(info)
        return self

    def relax_nullability(self, name: str) -> "StarTable":
        """ALTER COLUMN ... DROP NOT NULL (reference
        DDLSuite.scala:136-170): relaxing NOT NULL → nullable is always
        safe (every existing value satisfies the weaker contract);
        subsequent writes stop enforcing the invariant. The opposite
        direction is refused at the SQL layer. Dotted paths relax a
        nested struct field."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        *parents, leaf = name.split(".")

        def fn(struct: T.StructType) -> T.StructType:
            if not any(f.name.lower() == leaf.lower()
                       for f in struct.fields):
                raise ValueError(
                    f"Cannot update missing field {name} in "
                    f"{struct.simpleString()}")
            return T.StructType([
                T.StructField(f.name, f.dataType, True, f.metadata)
                if f.name.lower() == leaf.lower() else f
                for f in struct.fields])

        info.schema_json = _transform_struct_at(
            schema, parents, fn, name).json()
        self.store.update_table_info(info)
        return self

    def change_column(self, name: str, comment: str | None = None,
                      position: str | None = None) -> "StarTable":
        """ALTER TABLE CHANGE COLUMN — the reference's supported forms
        (AlterTableTests.scala:563-927): set a column COMMENT and/or
        move it FIRST / AFTER another column, at any nesting depth
        (dotted path; ``element`` / ``key`` / ``value`` step into
        arrays and maps). Renames and type changes through CHANGE are
        not supported, matching the reference (use
        :meth:`rename_column` / :meth:`change_column_type`, which are
        documented supersets). ``position``: ``"first"`` or
        ``"after:<sibling>"``. Metadata-only — zero bytes rewritten;
        scans project by name so a reorder is pure schema cosmetics."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        *parents, leaf = name.split(".")

        def fn(struct: T.StructType) -> T.StructType:
            by_lower = {f.name.lower(): f for f in struct.fields}
            tgt = by_lower.get(leaf.lower())
            if tgt is None:
                raise ValueError(
                    f"Cannot update missing field {name} in "
                    f"{struct.simpleString()}")
            if comment is not None:
                tgt = T.StructField(
                    tgt.name, tgt.dataType, tgt.nullable,
                    {**(tgt.metadata or {}), "comment": comment})
            rest = [f for f in struct.fields
                    if f.name.lower() != leaf.lower()]
            if position is None:
                out = [tgt if f.name.lower() == leaf.lower() else f
                       for f in struct.fields]
            elif position.lower() == "first":
                out = [tgt] + rest
            elif position.lower().startswith("after:"):
                anchor = position[len("after:"):]
                if anchor.lower() == leaf.lower():
                    out = [tgt if f.name.lower() == leaf.lower() else f
                           for f in struct.fields]  # no-op move
                else:
                    names = [f.name.lower() for f in rest]
                    if anchor.lower() not in names:
                        raise ValueError(
                            f"Couldn't resolve positional argument AFTER "
                            f"{anchor}: missing field in "
                            f"{struct.simpleString()}")
                    i = names.index(anchor.lower()) + 1
                    out = rest[:i] + [tgt] + rest[i:]
            else:
                raise ValueError(
                    f"invalid position '{position}': expected 'first' or "
                    f"'after:<column>'")
            return T.StructType(out)

        info.schema_json = _transform_struct_at(
            schema, parents, fn, name).json()
        self.store.update_table_info(info)
        return self

    def rename_column(self, old: str, new: str) -> "StarTable":
        """ALTER TABLE RENAME COLUMN (beyond reference — the Delta
        column-mapping 'name mode' analog, ZERO bytes rewritten): the
        declared schema adopts the new logical name immediately; files
        keep whatever physical name they were written with, and the
        ``aliases.<new>`` table property remembers the historical
        names so every read path (plain scan, MoR ordering, footer
        stats skipping, CDC logs) resolves per file group. New writes
        carry the new name; compaction converges the physical layout,
        after which the alias marker clears itself and the old name
        frees up (same lifecycle as ``dropped.columns``).

        Partition/hash columns cannot rename — their names are layout
        contracts (hive directory fragments, manifest range keys, the
        bucket hash input). Columns referenced by CHECK constraints or
        generated-column expressions must shed those first (the
        expressions store the name as SQL text)."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        lower = {f.name.lower(): f.name for f in schema.fields}
        canon = lower.get(old.lower())
        if canon is None:
            raise ValueError(f"no such column: {old}")
        if new.lower() in lower and new.lower() != old.lower():
            raise ValueError(f"column '{new}' already exists")
        if old.lower() in {c.lower() for c in info.range_cols + info.hash_cols}:
            raise ValueError(
                f"cannot rename partition/hash column '{canon}' — its name "
                f"is baked into the physical layout (directories, bucket "
                f"hashing)")
        cfg = dict(info.configuration or {})
        exprs = " ".join(v for k, v in cfg.items()
                         if k.startswith("check.") or k.startswith("generated."))
        if re.search(rf"\b{re.escape(canon)}\b", exprs):
            raise ValueError(
                f"column '{canon}' is referenced by a CHECK constraint or "
                f"generated-column expression; drop those first")
        live = {c.lower() for f in self.store.snapshot().all_files()
                for c in f.exist_cols}
        if new.lower() != old.lower() and new.lower() in live:
            raise ValueError(
                f"live files still physically carry a column named '{new}' "
                f"(dropped or previously renamed away) — compact first, or "
                f"the old bytes would resurrect under the new name")
        # the new logical name inherits the old name's alias chain plus
        # the old name itself (files written before THIS rename)
        chain = [a for a in cfg.pop(f"aliases.{old.lower()}", "").split(",") if a]
        cfg[f"aliases.{new.lower()}"] = ",".join(chain + [canon])
        # per-column property keys follow the logical name
        prop = cfg.get("compaction.merge_operators")
        if prop:
            ops = json.loads(prop)
            if canon in ops:
                ops[new] = ops.pop(canon)
                cfg["compaction.merge_operators"] = json.dumps(ops)
        bloom = cfg.get("bloom.index.cols")
        if bloom:
            cfg["bloom.index.cols"] = ",".join(
                new if c.strip().lower() == old.lower() else c.strip()
                for c in bloom.split(","))
        info.schema_json = T.StructType([
            T.StructField(new, f.dataType, f.nullable, f.metadata)
            if f.name == canon else f
            for f in schema.fields]).json()
        info.configuration = cfg
        self.store.update_table_info(info)
        return self

    def change_column_type(self, name: str, new_type: str) -> "StarTable":
        """ALTER TABLE ALTER COLUMN TYPE — safe widenings only (the
        reference's SchemaUtils.canChangeDataType discipline)."""
        widenings = {("byte", "short"), ("byte", "integer"), ("byte", "long"),
                     ("short", "integer"), ("short", "long"),
                     ("integer", "long"), ("float", "double")}
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        fields = []
        found = False
        for f in schema.fields:
            if f.name.lower() == name.lower():
                found = True
                tgt = _parse_dtype(new_type)
                if (f.dataType.typeName(), tgt.typeName()) not in widenings:
                    raise ValueError(
                        f"cannot change {f.name}: {f.dataType.simpleString()} → "
                        f"{tgt.simpleString()} is not a safe widening")
                f = T.StructField(f.name, tgt, f.nullable, f.metadata)
            fields.append(f)
        if not found:
            raise KeyError(f"no such column: {name}")
        info.schema_json = T.StructType(fields).json()
        self.store.update_table_info(info)
        return self

    def add_constraint(self, name: str, expr: str) -> "StarTable":
        """CHECK-expression invariant enforced on every subsequent write
        (Invariants.scala:29-99); existing rows are validated first so a
        constraint can never be added in an already-violated state."""
        from starlake_spark.operators import writer as _w

        df = self.to_df()
        if df.filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1).count():
            raise ValueError(f"existing rows violate CHECK constraint '{name}' ({expr})")
        return self.set_properties({f"{_w.CHECK_PREFIX}{name}": expr})

    def drop_constraint(self, name: str) -> "StarTable":
        from starlake_spark.operators import writer as _w

        return self.unset_properties([f"{_w.CHECK_PREFIX}{name}"])

    def set_column_default(self, name: str, expr: str) -> "StarTable":
        """ALTER COLUMN ... SET DEFAULT (Delta column-default analog):
        base/append writes that omit the column materialize ``expr``
        (cast to the declared type) instead of leaving it null. Stored
        as the ``default.<col>`` table property; never applied to
        partial-column upserts, where an absent column means "keep the
        existing value" under MoR merge. Hash (primary-key) columns
        can't default — keys must always be explicit."""
        info = self.store.table_info(refresh=True)
        schema = T.StructType.fromJson(json.loads(info.schema_json))
        declared = {f.name: f for f in schema.fields}
        if name not in declared:
            raise KeyError(f"no such column: {name}")
        if name in info.hash_cols:
            raise ValueError(f"hash (primary-key) column '{name}' cannot "
                             f"have a DEFAULT — keys must be explicit")
        # validate the expression compiles and casts to the column type
        probe = self.spark.range(1).select(
            F.expr(expr).cast(declared[name].dataType))
        _ = probe.schema
        return self.set_properties({f"default.{name}": expr})

    def drop_column_default(self, name: str) -> "StarTable":
        return self.unset_properties([f"default.{name}"])

    def stats(self, version: int | None = None) -> dict:
        """Zero-job size estimates from the manifest: file count, total
        bytes, and an approximate row count summed from the per-file
        footer counts harvested at write time. For MoR snapshots the
        row figure is an UPPER bound (delta versions of the same key
        each count once — the collapse dedups them); files written
        before row-count harvesting contribute 0 rows but are tallied
        in ``files_without_rowcount``. This is the parameter-defaulting
        and join-size-hint path — at 100 TB an operator should consult
        this, never run a count job, to pick a knob."""
        snap = self.store.snapshot(version)
        files = list(snap.all_files())
        missing = sum(1 for f in files if f.num_rows < 0)
        dead = sum(max(ps.dv_row_count, 0)
                   for ps in snap.partitions.values() if ps.dv_files)
        return {
            "num_files": len(files),
            "total_bytes": sum(f.size for f in files),
            "approx_rows": max(
                sum(f.num_rows for f in files if f.num_rows > 0) - dead, 0),
            "files_without_rowcount": missing,
            "num_partitions": len(snap.partitions),
            "dv_dead_rows": dead,
        }

    def metadata_agg(self, col: str, version: int | None = None) -> dict:
        """EXACT min/max/count/null-count for one column with ZERO Spark
        jobs — the aggregate-pushdown-to-manifest path (Spark's own
        parquet aggregate pushdown reads every footer at query time;
        here the bounds were harvested once at write time and ride the
        manifest, so a million-file table answers ``max(ts)`` from
        metadata). Exactness conditions, all enforced: an all-base
        snapshot (delta versions overlap keys), no deletion vectors
        (a vectored row may BE the extremum), footer stats + row counts
        present on every file, and a non-string column — long string
        stats are stored truncated (min) / widen-truncated (max), which
        are valid pruning BOUNDS but not values. Raises ValueError when
        any condition fails: callers fall back to the scan aggregate,
        never get an approximation. Values return as Python types per
        the table schema (dates/timestamps/decimals parsed back from
        their JSON-safe manifest encoding)."""
        import datetime as _dt
        import decimal as _decimal

        snap = self.store.snapshot(version)
        files = list(snap.all_files())
        if not files:
            return {"min": None, "max": None, "count": 0, "nulls": 0}
        if any(not f.is_base_file for f in files):
            raise ValueError("metadata_agg requires an all-base snapshot "
                             "(MoR delta versions overlap keys) — run "
                             "compaction() or aggregate through to_df()")
        if any(ps.dv_files for ps in snap.partitions.values()):
            raise ValueError("metadata_agg is unavailable under deletion "
                             "vectors (a vectored row may be the extremum)")
        schema = T.StructType.fromJson(json.loads(
            self.store.table_info().schema_json))
        if col not in schema.fieldNames():
            raise ValueError(f"unknown column '{col}'")
        dt = schema[col].dataType
        if isinstance(dt, T.StringType):
            raise ValueError(
                "metadata_agg does not serve string columns: manifest "
                "string stats are truncated bounds, not exact values")
        def _to_py(v):
            # decode BEFORE comparing: decimal strings (and any future
            # string-encoded numeric) order lexicographically, not
            # numerically; ISO temporals would compare fine either way
            if v is None:
                return None
            if isinstance(dt, T.DateType):
                return _dt.date.fromisoformat(v)
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                return _dt.datetime.fromisoformat(v)
            if isinstance(dt, T.DecimalType):
                return _decimal.Decimal(v)
            return v

        # RENAME COLUMN: files written pre-rename keyed their stats by
        # the historical physical name — resolve through the alias chain
        lookup = [col] + [
            a for a in (self.store.table_info().configuration or {})
            .get(f"aliases.{col.lower()}", "").split(",") if a]
        mins, maxs, total = [], [], 0
        nulls: int | None = 0
        for f in files:
            if f.num_rows == 0:
                continue
            st = next((s for n in lookup
                       for s in [(f.stats or {}).get(n)] if s), None)
            if f.num_rows < 0 or st is None:
                raise ValueError(
                    f"file {f.path} carries no footer stats for '{col}' "
                    "(written pre-stats?) — fall back to a scan aggregate")
            all_null = st.get("nulls") == f.num_rows
            if ("min" not in st or "max" not in st) and not all_null:
                raise ValueError(
                    f"file {f.path} has no '{col}' bounds and isn't "
                    "all-null — fall back to a scan aggregate")
            total += f.num_rows
            if nulls is not None:
                # the writer omits the key when a footer lacked null
                # counts — then the exact figure is unknowable here
                nulls = (nulls + st["nulls"]) if "nulls" in st else None
            if st.get("min") is not None:
                mins.append(_to_py(st["min"]))
            if st.get("max") is not None:
                maxs.append(_to_py(st["max"]))

        return {"min": min(mins) if mins else None,
                "max": max(maxs) if maxs else None,
                "count": total, "nulls": nulls}

    def count(self, version: int | None = None) -> int:
        """Row count — metadata-only when the snapshot can answer
        exactly: an all-base snapshot with footer row counts on every
        file returns sum(num_rows) with ZERO Spark jobs (every row in a
        base file is live, so the manifest figure is exact — the
        count-star pushdown a 100 TB table needs). MoR snapshots (delta
        versions overlap keys) and pre-rowcount files fall back to the
        full scan count."""
        try:
            return self.metadata_count(version)
        except ValueError:
            return self.to_df(version=version).count()

    def metadata_count(self, version: int | None = None) -> int:
        """The strict metadata-only count: raises ValueError when the
        snapshot can't answer exactly (MoR deltas, stats-less files,
        uncounted DVs) instead of falling back to a scan — for callers
        that must guarantee zero jobs (the SQL layer's aggregate
        pushdown)."""
        snap = self.store.snapshot(version)
        files = list(snap.all_files())
        if not files:
            return 0
        if not all(f.is_base_file and f.num_rows >= 0 for f in files):
            raise ValueError("count is not metadata-servable: MoR deltas "
                             "or stats-less files present")
        # deletion vectors subtract exactly: DV commits record each
        # live position at most once (the candidate scan is itself
        # DV-filtered), so sum(dv rows) = dead rows. A DV without a
        # footer count (dv_row_count < 0) forces the scan path.
        dv = [ps.dv_row_count for ps in snap.partitions.values()
              if ps.dv_files]
        if not all(n >= 0 for n in dv):
            raise ValueError("count is not metadata-servable: "
                             "uncounted deletion vectors")
        return sum(f.num_rows for f in files) - sum(dv)

    def _update_info_retrying(self, mutate) -> None:
        """Read-modify-write table_info with CAS retry: ``mutate(info)``
        edits in place and returns whether anything changed. A
        'Schema has been changed' conflict (update_table_info's CAS,
        reference takeSchemaLock) re-reads and re-applies — correct for
        commutative edits like property sets; explicit ALTERs stay
        loud-fail instead (reference parity)."""
        from starlake_spark.meta import MetaError

        last: MetaError | None = None
        for _ in range(10):
            info = self.store.table_info(refresh=True)
            if not mutate(info):
                return
            try:
                self.store.update_table_info(info)
                return
            except MetaError as e:
                if "Schema has been changed" not in str(e):
                    raise
                last = e
        raise last

    def set_properties(self, props: dict[str, str]) -> "StarTable":
        def mutate(info):
            info.configuration = {**info.configuration,
                                  **{k: str(v) for k, v in props.items()}}
            return True

        self._update_info_retrying(mutate)
        return self

    def unset_properties(self, keys: list[str]) -> "StarTable":
        def mutate(info):
            info.configuration = {k: v for k, v in info.configuration.items()
                                  if k not in set(keys)}
            return True

        self._update_info_retrying(mutate)
        return self

    # ---------- reference-API camelCase surface (tables.py:20-291) ----------

    def alias(self, name: str) -> DataFrame:
        """StarTable.alias / as — an aliased snapshot DataFrame."""
        return self.to_df().alias(name)

    forPath = for_path
    forName = for_name
    isStarTable = is_star_table
    dropPartition = drop_partition
    dropTable = drop_table

    @staticmethod
    def register_merge_operator(name: str, factory) -> None:
        """StarTable.registerMergeOperator (tables.py:20-291): register a
        named custom merge operator usable in to_df(merge_operators=...)."""
        from starlake_spark import merge_ops as _mo

        _mo.register_merge_operator(name, factory)

    registerMergeOperator = register_merge_operator

    def update_material_view(self) -> bool:
        """StarTable.updateMaterialView (tables/StarTable.scala:401-409):
        refresh THIS materialized view through its warehouse registry
        (incremental when the view's shape allows, plans/mv.py).
        Refuses on non-MV tables with the reference's message shape
        (StarLakeErrors.notMaterialViewException)."""
        info = self.info
        if (info.configuration or {}).get("is_material_view") != "true":
            raise ValueError(
                f"Table `{self.store.table_path}` with short name "
                f"`{info.short_name or 'None'}` is not a material view")
        from starlake_spark.plans import mv
        from starlake_spark.sql import StarSession

        sess = StarSession(
            self.spark,
            warehouse=(info.configuration or {}).get("catalog.warehouse"))
        return mv.update_material_view(sess, info.short_name)

    updateMaterialView = update_material_view

    @staticmethod
    def create_material_view(spark: SparkSession, view_name: str,
                             view_path: str, sql_text: str,
                             auto_update: bool = False,
                             warehouse: str | None = None) -> "StarTable":
        """StarTable.createMaterialView (tables/StarTable.scala:483-500):
        static creation against catalog-registered source tables. The
        reference's rangePartitions/hashPartitions knobs are owned by
        the engine here: incremental-maintainable views hash-partition
        on their group keys automatically (plans/mv.py)."""
        from starlake_spark.plans import mv
        from starlake_spark.sql import StarSession

        sess = StarSession(spark, warehouse=warehouse)
        sess._load_catalog_names(sql_text)
        return mv.create_material_view(sess, view_name, view_path,
                                       sql_text, auto_update)

    createMaterialView = create_material_view

    def update_expr(self, condition: str | None, set_exprs: dict) -> "StarTable":
        """StarTable.updateExpr (tables/StarTable.scala:36-411): SQL-text
        condition + set expressions — same engine path as ``update``."""
        return self.update(condition, set_exprs)

    updateExpr = update_expr


def _to_epoch(ts) -> float:
    """datetime / ISO string / epoch number → epoch seconds."""
    import datetime as _dt

    if isinstance(ts, (int, float)):
        return float(ts)
    if isinstance(ts, _dt.datetime):
        return ts.timestamp()
    if isinstance(ts, str):
        return _dt.datetime.fromisoformat(ts.replace(" ", "T")).timestamp()
    raise TypeError(f"cannot interpret timestamp {ts!r}")


def convert_to_star(
    spark: SparkSession,
    path: str,
    range_partitions: list[str] | None = None,
    short_name: str | None = None,
    warehouse: str | None = None,
    configuration: dict[str, str] | None = None,
) -> StarTable:
    """CONVERT TO STAR (Delta's CONVERT TO DELTA analog): adopt an
    existing parquet directory as a star table IN PLACE — zero data
    rewritten, O(files) metadata work. Every parquet file under
    ``path`` becomes a referenced base file; footer min/max stats and
    row counts are harvested during the same footer read, so data
    skipping and metadata-only count() work immediately on adopted
    data. ``range_partitions`` declares hive-style ``col=value``
    directory partitioning (values recovered from the layout, as
    Spark's own partition discovery would). The converted table has no
    hash buckets (adopted files carry no bucket-sort contract) — use
    the normal write/overwrite/delete/compaction lifecycle, or rewrite
    into a hash table for upserts.

    Caveat (documented trade): adopted files live OUTSIDE the table's
    ``data/`` directory, so cleanup() never physically deletes them
    even after a rewrite expires them — the same conservative stance
    Delta takes on converted files."""
    from starlake_spark.operators.writer import _footer_stats

    range_partitions = list(range_partitions or [])
    store = ManifestStore(path)
    if store.exists():
        raise MetaError(f"already a star table: {path}")
    reader_ = spark.read
    if range_partitions:
        reader_ = reader_.option("basePath", path)
    df = reader_.parquet(path)
    schema = df.schema
    for c in range_partitions:
        if c not in schema.fieldNames():
            raise ValueError(f"partition column '{c}' not found in layout")

    # LISTING SEAM (starlake_spark.listing): the one-time adoption
    # inventory of a foreign parquet layout — the only non-maintenance
    # listing in the engine (every later read is manifest-driven)
    from starlake_spark.listing import get_lister

    files = []
    for ent in sorted(get_lister().list_files(path), key=lambda e: e.path):
        rel = os.path.relpath(ent.path, path)
        if any(part.startswith("_star_meta")
               for part in rel.split(os.sep)[:-1]):
            continue
        n = os.path.basename(ent.path)
        if not n.endswith(".parquet") or n.startswith((".", "_")):
            continue
        fp = ent.path
        decoded = {}
        for part in os.path.dirname(rel).split(os.sep):
            k, sep, v = part.partition("=")
            if sep:
                decoded[k] = unquote(v)
        missing = [c for c in range_partitions if c not in decoded]
        if missing:
            raise ValueError(
                f"file {rel} lacks hive directories for {missing}")
        rv = ",".join(f"{c}={decoded[c]}" for c in range_partitions)
        stats, num_rows = _footer_stats(fp)
        import pyarrow.parquet as pq

        phys_cols = [f for f in pq.ParquetFile(fp).schema_arrow.names
                     if f in schema.fieldNames()]
        files.append(DataFileInfo(
            path=rel, range_value=rv, bucket_id=-1,
            size=ent.size, write_version=-1,
            is_base_file=True, exist_cols=phys_cols,
            stats=stats, num_rows=num_rows))
    if not files:
        raise ValueError(f"no parquet files found under {path}")

    info = TableInfo(
        table_path=path,
        table_id=f"table_{uuid.uuid4().hex[:16]}",
        schema_json=schema.json(),
        range_cols=range_partitions,
        hash_cols=[],
        bucket_num=-1,
        configuration=dict(configuration or {}),
        short_name=short_name,
    )
    store.create(info)
    txn = store.new_transaction()
    txn.commit_type = "convert"
    txn.add_files(files)
    store.commit(txn)
    if short_name:
        catalog.register(short_name, path, warehouse)
        if warehouse:
            info.configuration["catalog.warehouse"] = os.path.abspath(warehouse)
            store.update_table_info(info)
    return StarTable(spark, store)


def create_table(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    range_partitions: list[str] | None = None,
    hash_partitions: list[str] | None = None,
    hash_bucket_num: int = -1,
    short_name: str | None = None,
    configuration: dict[str, str] | None = None,
    warehouse: str | None = None,
    generated: dict[str, str] | None = None,
) -> StarTable:
    """TableCreator equivalent (tables/StarTable.scala:413-567): create a
    table from a DataFrame with optional range (directory) partitions and
    hash-bucketed primary keys, then write the data as base files.

    ``generated`` (beyond reference — Delta generated-column analog):
    {range_col: sql_expr}, e.g. ``{"day": "to_date(ts)"}`` — the
    canonical time-partitioned event layout. Writers compute the column
    automatically when absent (and enforce consistency when present),
    and reads translate predicates on the SOURCE column into partition
    pruning on the generated column (reader.scan), so
    ``to_df(where="ts >= X")`` prunes day directories without the query
    mentioning ``day``."""
    range_partitions = list(range_partitions or [])
    hash_partitions = list(hash_partitions or [])
    if hash_partitions and hash_bucket_num <= 0:
        raise ValueError("hash_partitions requires hash_bucket_num > 0 "
                         "(TableCreationTests.scala:99-405)")
    generated = dict(generated or {})
    for c, expr in generated.items():
        if c not in range_partitions:
            raise ValueError(
                f"generated column '{c}' must be a range partition column "
                f"(its purpose is ingest-time partitioning + query-time "
                f"pruning)")
        if c not in df.columns:
            df = df.withColumn(c, F.expr(expr))
    # invalid column names (reference SchemaUtils.scala:968-972
    # checkFieldNames → parquet's banned set " ,;{}()\n\t="): rejected
    # at creation for EVERY column — for partition columns the chars
    # would additionally corrupt the 'k=v,k2=v2' range-value encoding
    _BANNED = set(" ,;{}()\n\t=")
    for c in df.columns:
        if set(c) & _BANNED:
            raise ValueError(
                f"invalid column name '{c}': parquet field names may not "
                "contain \" ,;{}()\\n\\t=\" (SchemaUtils.scala:968-972)")

    # partition option names resolve case-insensitively against the data
    # (reference schema/CaseSensitivitySuite.scala "set partition columns
    # - case insensitive": Spark's default resolver), canonicalized to
    # the data's casing so manifests and directory names stay consistent
    by_lower: dict[str, str] = {}
    for c in df.columns:
        by_lower.setdefault(c.lower(), c)
    range_partitions = [by_lower.get(c.lower(), c) for c in range_partitions]
    hash_partitions = [by_lower.get(c.lower(), c) for c in hash_partitions]
    for c in range_partitions + hash_partitions:
        if c not in df.columns:
            raise ValueError(f"partition column '{c}' not in data")

    # identity column (Delta GENERATED AS IDENTITY analog): declared
    # via configuration {"identity.column": name}; absent from the
    # source data it joins the schema as BIGINT and the write stamps
    # engine-assigned ids (writer.write_files). GENERATED ALWAYS
    # (default mode) rejects caller-supplied values.
    schema = df.schema
    idcol = (configuration or {}).get("identity.column")
    if idcol:
        if idcol in range_partitions + hash_partitions:
            raise ValueError(
                f"identity column '{idcol}' cannot be a partition/hash "
                f"column (its values are assigned after partitioning)")
        if idcol in df.columns:
            if (configuration or {}).get("identity.mode",
                                         "always") == "always":
                raise ValueError(
                    f"identity column '{idcol}' is GENERATED ALWAYS — "
                    f"the source data may not supply it (set "
                    f"identity.mode=default to allow explicit values)")
        else:
            schema = T.StructType(
                list(schema.fields) + [T.StructField(idcol, T.LongType(),
                                                     True)])

    info = TableInfo(
        table_path=path,
        table_id=f"table_{uuid.uuid4().hex[:16]}",
        schema_json=schema.json(),
        range_cols=range_partitions,
        hash_cols=hash_partitions,
        bucket_num=hash_bucket_num,
        configuration={"schema.autoMerge.enabled": "true",
                       **{f"generated.{c}": x for c, x in generated.items()},
                       **(configuration or {})},
        short_name=short_name,
    )
    store = ManifestStore(path)
    store.create(info)
    txn = store.new_transaction()
    files = writer.write_files(spark, df, info, txn, is_base=True,
                               dedup_batch=True)
    txn.add_files(files)
    store.commit(txn)
    if short_name:
        catalog.register(short_name, path, warehouse)
        if warehouse:
            info.configuration["catalog.warehouse"] = os.path.abspath(warehouse)
            store.update_table_info(info)
    return StarTable(spark, store)


def copy_into(spark: SparkSession, table: "StarTable", source_dir: str,
              file_format: str = "parquet",
              checkpoint: str | None = None) -> int:
    """COPY INTO (Databricks/Delta ingest command analog): load data
    files from a directory into the table with FILE-LEVEL exactly-once
    — re-running after new files arrive loads only the new files, and a
    crashed run resumes without duplicating. Spark-first: instead of a
    hand-rolled loaded-file registry, the drain is a one-shot
    availableNow pass of Spark's FILE-SOURCE stream over the directory
    — its checkpoint (kept under ``_star_meta/copy_into/<digest>``)
    already tracks ingested files at any directory size. Hash tables
    apply each micro-batch as an upsert (replays converge by key);
    non-hash tables append through the exactly-once batch registry.
    Files read under the TABLE's schema (COPY INTO contract: extra
    columns are an analysis error, missing ones null-fill). Returns the
    number of rows loaded this invocation."""
    import hashlib as _hashlib
    import os as _os

    schema = T.StructType.fromJson(json.loads(table.info.schema_json))
    digest = _hashlib.md5(_os.path.abspath(source_dir).encode()).hexdigest()[:16]
    ckpt = checkpoint or _os.path.join(table.store.table_path, "_star_meta",
                                       "copy_into", digest)
    path = table.store.table_path
    loaded = spark.sparkContext.accumulator(0)

    def _apply(batch, batch_id):
        n = batch.count()
        if n == 0:
            return
        loaded.add(n)
        t = StarTable.for_path(batch.sparkSession, path)
        if t.info.hash_cols:
            t.upsert(batch)
        else:
            from starlake_spark.operators import dml as _dml

            _dml.write_into(batch.sparkSession, t.store, batch,
                            mode="append",
                            txn_app_id=f"copy_into:{digest}",
                            txn_version=int(batch_id))

    q = (spark.readStream.format(file_format).schema(schema)
         .load(source_dir)
         .writeStream.foreachBatch(_apply)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return loaded.value
