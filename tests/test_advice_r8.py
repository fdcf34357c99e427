"""Round-8 ADVICE regression tests.

1. overwriteSchema publishes atomically WITH the data commit
   (sources/datasource.py + meta.ManifestStore._publish_version): a
   failed/conflicted commit leaves the OLD schema fully intact —
   readers never see the new schema over old data files.
2. cleanup's stale-lock sweep honours the registered
   FileLockProvider's configured staleness (operators/dml.py).
3. Nested schema-evolution detection matches file columns to declared
   columns case-insensitively (operators/reader.py).
4. ALTER ... COMMENT parses doubled-quote escapes ('it''s')
   (sql.py _ADDCOL_ENTRY_RE / _ALTER_CHANGE_RE).
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from starlake_spark.meta import (DataFileInfo, ManifestStore, MetaError,
                                 TableInfo)


def _mk_table(path, schema_json=None):
    store = ManifestStore(path)
    info = TableInfo(
        table_path=os.path.abspath(path), table_id="t-advice",
        schema_json=schema_json or T.StructType(
            [T.StructField("a", T.LongType())]).json())
    store.create(info)
    return store


def _add_one_file(store, name="f1.parquet"):
    txn = store.new_transaction()
    p = os.path.join(store.table_path, name)
    with open(p, "wb") as f:
        f.write(b"x")
    txn.add_files([DataFileInfo(path=name, range_value="", bucket_id=-1,
                                size=1, write_version=-1, is_base_file=True,
                                exist_cols=["a"])])
    return txn


# ---------- 1. atomic overwriteSchema ----------

NEW_SCHEMA = T.StructType([T.StructField("b", T.StringType())]).json()


def test_schema_overwrite_commits_atomically(tmp_path):
    store = _mk_table(str(tmp_path / "t"))
    txn = _add_one_file(store)
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info
    snap = store.commit(txn)
    # version stamp AND served table_info both carry the new schema
    assert snap.schema_json == NEW_SCHEMA
    assert store.table_info(refresh=True).schema_json == NEW_SCHEMA
    state = store._read_version_state(snap.version)
    assert state["schema_json"] == NEW_SCHEMA


def test_schema_overwrite_refused_on_concurrent_alter(tmp_path):
    """A concurrent ALTER lands between the write's validation and its
    commit: the schema_version guard fails the WHOLE write with nothing
    published — old schema intact, no new version."""
    store = _mk_table(str(tmp_path / "t"))
    old_schema = store.table_info().schema_json
    txn = _add_one_file(store)
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info

    # concurrent ALTER bumps schema_version
    alter = ManifestStore(store.table_path)
    ai = alter.table_info(refresh=True)
    ai.configuration = dict(ai.configuration, **{"comment": "altered"})
    alter.update_table_info(ai)
    altered_schema_version = ai.schema_version

    v0 = store.latest_version()
    with pytest.raises(MetaError, match="Schema has been changed"):
        store.commit(txn)
    fresh = ManifestStore(store.table_path)
    assert fresh.latest_version() == v0  # nothing published
    served = fresh.table_info(refresh=True)
    assert served.schema_json == old_schema  # ALTER's info intact
    assert served.schema_version == altered_schema_version


def test_schema_overwrite_failed_publish_leaves_old_schema(
        tmp_path, monkeypatch):
    """Every version-CAS attempt loses (simulated fenced-out publish):
    the commit raises and the old schema is still served — the
    pre-round-8 bug published the new schema BEFORE the data commit,
    so this exact failure served new schema over old files."""
    import starlake_spark.meta as M

    store = _mk_table(str(tmp_path / "t"))
    old_schema = store.table_info().schema_json
    txn = _add_one_file(store)
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info

    def always_exists(path, content):
        raise M.VersionExistsError(path)

    monkeypatch.setattr(M, "_exclusive_write", always_exists)
    with pytest.raises(M.VersionExistsError):
        store.commit(txn)
    monkeypatch.undo()
    fresh = ManifestStore(store.table_path)
    assert fresh.table_info(refresh=True).schema_json == old_schema


# ---------- 2. cleanup honours provider staleness ----------

def test_cleanup_respects_registered_provider_staleness(tmp_path):
    from starlake_spark.locking import FileLockProvider, set_lock_provider
    from starlake_spark.operators.dml import cleanup

    store = _mk_table(str(tmp_path / "t"))
    lock = os.path.join(store.meta_dir, "_commit.lock.pdeadbeef")
    with open(lock, "w") as f:
        f.write(json.dumps({"owner": "o", "table": store.table_path}))
    # older than the default STALE_LOCK_S (120 s) but younger than the
    # deployment's configured staleness
    old = time.time() - 600
    os.utime(lock, (old, old))
    set_lock_provider(FileLockProvider(stale_s=100000))
    try:
        cleanup(store, retention_s=0)
        assert os.path.exists(lock), (
            "cleanup broke a lock the registered provider still "
            "considers held")
    finally:
        set_lock_provider(None)
    # with the default provider (stale_s=120) the 600 s-old artifact
    # IS stale and sweeps
    cleanup(store, retention_s=0)
    assert not os.path.exists(lock)


# ---------- 3. case-insensitive nested schema evolution ----------

def test_nested_evolution_case_insensitive(spark, tmp_path):
    """File stores struct column 'Payload'; declared schema says
    'payload' with an ADDED nested field: the parquet-level null
    backfill must engage (pre-fix the cast path raised on struct
    arity)."""
    from starlake_spark.table import StarTable, create_table

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long").withColumn(
        "Payload", F.struct(F.lit(1).alias("a"), F.lit("x").alias("b")))
    create_table(spark, df, path)
    t = StarTable.for_path(spark, path)
    # declared schema: rename case payload + add nested field c (the
    # white-box twin of a case-divergent file produced by a racing
    # first-write adoption)
    info = t.store.table_info(refresh=True)
    sch = T.StructType.fromJson(json.loads(info.schema_json))
    fields = []
    for f in sch.fields:
        if f.name == "Payload":
            inner = T.StructType(list(f.dataType.fields) + [
                T.StructField("c", T.LongType(), True)])
            fields.append(T.StructField("payload", inner, True, f.metadata))
        else:
            fields.append(f)
    info.schema_json = T.StructType(fields).json()
    t.store.update_table_info(info)

    out = StarTable.for_path(spark, path).to_df()
    rows = out.select("payload.a", "payload.b", "payload.c").collect()
    assert rows[0].a == 1 and rows[0].b == "x" and rows[0].c is None


# ---------- 4. COMMENT with escaped quotes ----------

@pytest.fixture()
def sess(spark, tmp_path):
    from starlake_spark.sql import StarSession

    s = StarSession(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "v1 int, v2 string")
    s.create_table(df, str(tmp_path / "t"), name="esc_t")
    return s


def _schema_of(sess, name="esc_t"):
    info = sess.table(name).store.table_info(refresh=True)
    return T.StructType.fromJson(json.loads(info.schema_json))


def test_add_columns_comment_escaped_quote(sess):
    sess.sql("ALTER TABLE esc_t ADD COLUMNS (v3 long COMMENT 'it''s')")
    assert _schema_of(sess)["v3"].metadata.get("comment") == "it's"


def test_change_column_comment_escaped_quote(sess):
    sess.sql("ALTER TABLE esc_t CHANGE COLUMN v1 v1 int "
             "COMMENT 'don''t worry'")
    assert _schema_of(sess)["v1"].metadata.get("comment") == "don't worry"
