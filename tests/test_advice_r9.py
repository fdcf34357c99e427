"""Round-9 ADVICE + verdict-task regression tests (meta layer).

1. overwriteSchema commits never self-deadlock on the table lock:
   _acquire_commit_locks takes the table lock up front for any txn with
   new_table_info, and _publish_version no longer re-acquires it
   (FileLockProvider is O_CREAT|O_EXCL, non-reentrant — the old nesting
   blocked LOCK_TIMEOUT_S then failed the write).
2. Same property with an UNSCOPED provider, where the publish lock IS
   the table lock held around _publish_version.
3. overwriteSchema crash-window self-heal (verdict task #5): a crash
   between the version CAS and the table_info.json swap is repaired on
   the next cold table_info() read from the version file's embedded
   metadata (Delta's metadata-in-log model).
"""

import json
import os
import time

import pytest
from pyspark.sql import types as T

from starlake_spark import locking
from starlake_spark.meta import (DataFileInfo, ManifestStore, TableInfo)


def _mk_table(path):
    store = ManifestStore(path)
    info = TableInfo(
        table_path=os.path.abspath(path), table_id="t-advice9",
        schema_json=T.StructType([T.StructField("a", T.LongType())]).json())
    store.create(info)
    return store


def _file_txn(store, name, extra=None):
    txn = store.new_transaction()
    p = os.path.join(store.table_path, name)
    with open(p, "wb") as f:
        f.write(b"x")
    txn.add_files([DataFileInfo(path=name, range_value="", bucket_id=-1,
                                size=1, write_version=-1, is_base_file=True,
                                exist_cols=["a"])])
    return txn


NEW_SCHEMA = T.StructType([T.StructField("b", T.StringType())]).json()


def _schema_overwrite_txn(store, name="f2.parquet"):
    txn = _file_txn(store, name)
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info
    return txn


def test_overwrite_schema_unprovable_scope_no_self_deadlock(tmp_path):
    """touched_ranges() -> None (an expired path outside the read
    snapshot) used to make commit hold the table lock while
    _publish_version re-acquired it — a 60 s self-deadlock."""
    store = _mk_table(str(tmp_path / "t"))
    store.commit(_file_txn(store, "f1.parquet"))
    txn = _schema_overwrite_txn(store)
    txn.expire_files(["ghost.parquet"])  # unknown path -> table-wide lock
    assert txn.touched_ranges() is None
    t0 = time.monotonic()
    store.commit(txn)
    assert time.monotonic() - t0 < 20, "publish re-acquired the table lock"
    assert store.table_info(refresh=True).schema_json == NEW_SCHEMA


def test_overwrite_schema_scoped_commit_takes_table_lock(tmp_path):
    """Any txn carrying new_table_info must take the table-wide lock in
    _acquire_commit_locks (before the publish micro-lock) so the global
    lock order stays table->publish."""
    store = _mk_table(str(tmp_path / "t"))
    txn = _schema_overwrite_txn(store, "f1.parquet")
    locks = store._acquire_commit_locks(txn)
    try:
        assert len(locks) == 1
        # the handle is the plain (unscoped) table lock file
        lock_path = locks[0][0] if isinstance(locks[0], tuple) else locks[0]
        assert "\x00" not in str(lock_path)
    finally:
        for h in locks:
            store._release_lock(h)
    t0 = time.monotonic()
    store.commit(txn)
    assert time.monotonic() - t0 < 20
    assert store.table_info(refresh=True).schema_json == NEW_SCHEMA


class _Unscoped:
    """Delegates to the file provider but hides scope support — the
    pre-partition-lock protocol, where the table lock doubles as the
    publish lock."""

    supports_scopes = False

    def __init__(self):
        self._inner = locking.FileLockProvider()

    def acquire(self, meta_dir, table_path, timeout):
        return self._inner.acquire(meta_dir, table_path, timeout)

    def release(self, handle):
        self._inner.release(handle)

    def validate(self, handle):
        return self._inner.validate(handle)


def test_overwrite_schema_unscoped_provider_no_deadlock(tmp_path):
    old = locking.get_lock_provider()
    locking.set_lock_provider(_Unscoped())
    try:
        store = _mk_table(str(tmp_path / "t"))
        txn = _schema_overwrite_txn(store, "f1.parquet")
        t0 = time.monotonic()
        store.commit(txn)
        assert time.monotonic() - t0 < 20, \
            "publish re-acquired the (already-held) table lock"
        assert store.table_info(refresh=True).schema_json == NEW_SCHEMA
    finally:
        locking.set_lock_provider(old)


def test_overwrite_schema_crash_window_selfheals(tmp_path):
    """Kill the writer between the version-file CAS and the
    table_info.json swap: the published version embeds the replacement
    TableInfo, so the next cold reader heals the divergence and serves
    (and persists) the new schema."""
    path = str(tmp_path / "t")
    store = _mk_table(path)
    txn = _schema_overwrite_txn(store, "f1.parquet")

    def _boom(info):
        raise RuntimeError("injected crash after version CAS")

    store._update_info_under_lock = _boom
    with pytest.raises(RuntimeError, match="injected crash"):
        store.commit(txn)

    # on-disk state: version published, info swap lost
    info_p = os.path.join(path, "_star_meta", "table_info.json")
    with open(info_p) as f:
        stale = TableInfo.from_json(f.read())
    assert stale.schema_json != NEW_SCHEMA
    vmax = max(int(n[1:13]) for n in
               os.listdir(os.path.join(path, "_star_meta", "versions"))
               if n.endswith(".json"))
    with open(os.path.join(path, "_star_meta", "versions",
                           f"v{vmax:012d}.json")) as f:
        assert json.load(f)["table_info"]["schema_json"] == NEW_SCHEMA

    # a FRESH store (new process) heals on first read...
    fresh = ManifestStore(path)
    healed = fresh.table_info()
    assert healed.schema_json == NEW_SCHEMA
    # ...and persists the repair for everyone else
    with open(info_p) as f:
        assert TableInfo.from_json(f.read()).schema_json == NEW_SCHEMA
    # a subsequent ALTER descends from the healed metadata
    nxt = TableInfo.from_json(healed.to_json())
    nxt.configuration = dict(nxt.configuration or {})
    nxt.configuration["comment.b"] = "healed"
    fresh.update_table_info(nxt)
    assert fresh.table_info(refresh=True).configuration["comment.b"] == "healed"


def test_heal_does_not_fire_without_divergence(tmp_path):
    """A clean overwriteSchema (no crash) round-trips: the embedded
    metadata matches the swapped file, and a cold read changes nothing."""
    path = str(tmp_path / "t")
    store = _mk_table(path)
    store.commit(_schema_overwrite_txn(store, "f1.parquet"))
    before = store.table_info(refresh=True)
    fresh = ManifestStore(path)
    got = fresh.table_info()
    assert got.schema_json == NEW_SCHEMA
    assert got.schema_version == before.schema_version


# ---------- ADVICE (low): drop_partition OR detection ----------

def test_drop_partition_value_containing_or(spark, tmp_path):
    """'state=OR' is ONE partition — the old word-boundary regex
    refused it as a multi-partition condition."""
    from starlake_spark import create_table
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("OR", 1), ("WA", 2), ("or", 3)], "state string, v int")
    t = create_table(spark, df, str(tmp_path / "t"),
                     range_partitions=["state"])
    t.drop_partition("state=OR")
    left = {r.state for r in t.to_df().collect()}
    assert left == {"WA", "or"}
    # real multi-partition conditions still refuse
    with pytest.raises(ValueError, match="only drop one partition"):
        t.drop_partition("state=WA or state=or")
    with pytest.raises(ValueError, match="only drop one partition"):
        t.drop_partition("state=WA OR state=or")


# ---------- ADVICE (low): _resolve_physical precedence ----------

def test_resolve_physical_alias_beats_case_collision():
    """A physical column case-colliding with a rename alias's logical
    name must NOT shadow the alias-mapped column."""
    from starlake_spark.operators.reader import _resolve_physical

    # logical 'price' was renamed from 'amount'; the file also carries
    # an unrelated 'PRICE' physical column
    amap = {"price": ["amount"]}
    assert _resolve_physical("price", ["PRICE", "amount"], amap) == "amount"
    # exact match still wins over everything
    assert _resolve_physical("price", ["price", "amount"], amap) == "price"
    # no alias present: case-insensitive fallback serves the column
    assert _resolve_physical("price", ["PRICE"], {}) == "PRICE"


def test_resolve_physical_ambiguous_case_raises():
    from starlake_spark.operators.reader import _resolve_physical

    with pytest.raises(ValueError, match="ambiguous"):
        _resolve_physical("price", ["PRICE", "Price"], {})
