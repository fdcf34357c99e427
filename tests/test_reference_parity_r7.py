"""Reference MetaCommitSuite parity (MetaCommitSuite.scala:1-412).

The reference arbitrates concurrent commits with per-partition LWT
write locks + an undo log over Cassandra; here the same observable
contracts hold over ManifestStore's partition-scoped locks + the
version-file CAS (meta.py commit protocol):

* every commit type lands add+expire atomically across partitions
  (commitTest simple/delta/compaction, MetaCommitSuite.scala:100-127);
* N concurrent committers to one partition / many partitions (in any
  acquisition order) all land exactly once
  (concurrentCommit, MetaCommitSuite.scala:130-184);
* a crashed committer holding partition locks stalls others only until
  the staleness TTL ("Committing state will roll back when timeout",
  MetaCommitSuite.scala:215-262);
* add+expire over files a concurrent commit already expired raises
  ("Another job added file" / MetaRerunException,
  MetaCommitSuite.scala:265-290 → CommitConflictError here);
* the same full-partition rewrite twice from one read snapshot raises
  ("can't delete file twice", MetaCommitSuite.scala:293-318);
* a schema change built against a stale table_info raises
  ("Schema has been changed for table" / takeSchemaLock,
  MetaCommitSuite.scala:321-373);
* concurrent upserts CREATING the same new partition all land
  ("create range partition concurrently", MetaCommitSuite.scala:376-408).
"""

import json
import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from starlake_spark import locking
from starlake_spark.locking import FileLockProvider
from starlake_spark.meta import (CommitConflictError, DataFileInfo,
                                 ManifestStore, MetaError, TableInfo)


@pytest.fixture(autouse=True)
def _file_provider():
    locking.set_lock_provider(None)
    yield
    locking.set_lock_provider(None)


def _store(tmp_path, name="t"):
    p = str(tmp_path / name)
    st = ManifestStore(p)
    st.create(TableInfo(table_path=p, table_id="tid-" + name,
                        schema_json="{}", range_cols=["key"]))
    return st


def _file(store, partition, name):
    """Write a real single-row parquet under the table and return its
    DataFileInfo (the reference's addDataFileInfo fabricates paths; we
    keep them real so scans stay possible)."""
    rel = os.path.join("data", "t", partition, f"{name}.parquet")
    abs_p = os.path.join(store.table_path, rel)
    os.makedirs(os.path.dirname(abs_p), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1], type=pa.int64())}), abs_p)
    return DataFileInfo(path=rel, range_value=partition, bucket_id=-1,
                        size=os.path.getsize(abs_p), write_version=-1,
                        is_base_file=True, exist_cols=["id"], num_rows=1)


def _init_table(store):
    """initTable analog (MetaCommitSuite.scala:45-49): one base file in
    each of key=a / key=b / key=c."""
    txn = store.new_transaction()
    txn.add_files([_file(store, f"key={k}", "init") for k in "abc"])
    store.commit(txn)


# ---------- commitTest: simple / delta / compaction ----------


@pytest.mark.parametrize("commit_type", ["write", "delta", "compact"])
def test_commit_add_and_expire_every_partition(tmp_path, commit_type):
    """commitTest (MetaCommitSuite.scala:100-127): one commit that adds
    a new file AND expires the old one in EVERY partition — afterwards
    each partition serves exactly the new file and its read version
    advanced once."""
    store = _store(tmp_path)
    _init_table(store)
    snap = store.snapshot()
    txn = store.new_transaction()
    txn.commit_type = commit_type
    for rv, ps in snap.partitions.items():
        txn.expire_files([f.path for f in ps.files])
        txn.add_files([_file(store, rv, "added_1")])
    store.commit(txn)
    after = store.snapshot()
    assert after.version == snap.version + 1
    for rv, ps in after.partitions.items():
        assert ps.last_update_version == after.version
        assert [os.path.basename(f.path) for f in ps.files] \
            == ["added_1.parquet"]
    assert after.commit_type == commit_type


# ---------- concurrentCommit: single / multiple / deranged ----------


def _concurrent_commit(store, task_partitions, task_num):
    errs: list[Exception] = []

    def work(i: int):
        try:
            txn = store.new_transaction()
            txn.commit_type = "delta"
            txn.add_files([_file(store, rv, f"task{i}")
                           for rv in task_partitions(i)])
            store.commit(txn)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(task_num)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs


def test_concurrent_delta_commit_single_partition(tmp_path):
    """concurrentCommit 'single' (MetaCommitSuite.scala:130-184): 5
    concurrent delta commits to ONE partition all land exactly once —
    the partition's version advanced taskNum times."""
    store = _store(tmp_path)
    _init_table(store)
    base = store.snapshot().version
    _concurrent_commit(store, lambda i: ["key=a"], 5)
    snap = store.snapshot()
    assert snap.version == base + 5
    assert len(snap.partitions["key=a"].files) == 1 + 5
    assert snap.partitions["key=a"].last_update_version == snap.version


@pytest.mark.parametrize("derange", [False, True])
def test_concurrent_delta_commit_multiple_partitions(tmp_path, derange):
    """concurrentCommit 'multiple' (+ deranged acquisition order,
    MetaCommitSuite.scala:144-151): every task writes ALL partitions;
    the derange variant shuffles the per-task partition order — the
    sorted-order scoped acquisition (reference sortBy(range_id)) makes
    the outcome order-independent and deadlock-free."""
    store = _store(tmp_path)
    _init_table(store)
    base = store.snapshot().version
    parts = ["key=a", "key=b", "key=c"]
    task_num = 3 if derange else 5

    def task_partitions(i):
        if derange:
            rotated = parts[i % 3:] + parts[:i % 3]
            return rotated
        return parts

    _concurrent_commit(store, task_partitions, task_num)
    snap = store.snapshot()
    assert snap.version == base + task_num
    for rv in parts:
        assert len(snap.partitions[rv].files) == 1 + task_num


# ---------- crashed lock holder: stale-break recovery ----------


def test_stalled_partition_lock_holder_rolls_back(tmp_path):
    """'Committing state will roll back when timeout'
    (MetaCommitSuite.scala:215-262): a committer that took partition
    write locks and died mid-commit must not wedge the table — a new
    commit to the same partitions succeeds once the locks go stale, and
    the dead committer's work is simply absent (nothing half-applied)."""
    locking.set_lock_provider(FileLockProvider(stale_s=0.3, poll_s=0.02))
    store = _store(tmp_path)
    _init_table(store)
    snap = store.snapshot()
    # dead committer: scoped locks acquired, never released
    prov = locking.get_lock_provider()
    for rv in sorted(snap.partitions):
        prov.acquire_scoped(store.meta_dir, store.table_path, 5, scope=rv)
    txn = store.new_transaction()
    for rv, ps in snap.partitions.items():
        txn.expire_files([f.path for f in ps.files])
        txn.add_files([_file(store, rv, "added_2")])
    store.commit(txn)  # must stale-break and land
    after = store.snapshot()
    assert after.version == snap.version + 1
    for ps in after.partitions.values():
        assert [os.path.basename(f.path) for f in ps.files] \
            == ["added_2.parquet"]


# ---------- file conflicts ----------


def test_files_conflict_expire_raced_raises(tmp_path):
    """'check files conflict - files change while commit'
    (MetaCommitSuite.scala:265-290): two committers read the same
    snapshot and both replace the same files; the loser must raise
    (reference MetaRerunException 'Another job added file' →
    CommitConflictError), never double-apply."""
    store = _store(tmp_path)
    _init_table(store)
    snap = store.snapshot()

    def replace_txn(tag):
        txn = store.new_transaction()
        for rv, ps in snap.partitions.items():
            txn.expire_files([f.path for f in ps.files])
            txn.add_files([_file(store, rv, tag)])
        return txn

    t1, t2 = replace_txn("first"), replace_txn("second")
    store.commit(t1)
    with pytest.raises(CommitConflictError, match="expired by a concurrent"):
        store.commit(t2)
    # winner's state intact
    for ps in store.snapshot().partitions.values():
        assert [os.path.basename(f.path) for f in ps.files] \
            == ["first.parquet"]


def test_files_conflict_cannot_compact_twice(tmp_path):
    """'check files conflict - can't delete file twice'
    (MetaCommitSuite.scala:293-318): two full-partition compactions
    from one read snapshot — the second must raise, not silently drop
    the first's output."""
    store = _store(tmp_path)
    _init_table(store)
    snap = store.snapshot()

    def compaction_txn(tag):
        txn = store.new_transaction()
        txn.commit_type = "compact"
        for rv in snap.partitions:
            txn.expire_partition(rv)
            txn.add_files([_file(store, rv, tag)])
        return txn

    t1, t2 = compaction_txn("compact1"), compaction_txn("compact2")
    store.commit(t1)
    with pytest.raises(CommitConflictError,
                       match="changed by a concurrent commit"):
        store.commit(t2)
    for ps in store.snapshot().partitions.values():
        assert [os.path.basename(f.path) for f in ps.files] \
            == ["compact1.parquet"]


# ---------- schema change CAS ----------


def test_schema_change_against_stale_info_raises(tmp_path):
    """'take schema lock concurrently' (MetaCommitSuite.scala:321-373):
    updater A and updater B both read table_info; A publishes a new
    schema; B's publish — built against the STALE info — must raise
    'Schema has been changed for table', and A's schema survives."""
    store = _store(tmp_path)
    _init_table(store)
    info_a = store.table_info(refresh=True)
    stale = TableInfo.from_json(info_a.to_json())  # independent copy
    info_a.schema_json = json.dumps({"v": "schema2"})
    store.update_table_info(info_a)
    stale.schema_json = json.dumps({"v": "schema3"})
    with pytest.raises(MetaError, match="Schema has been changed for table"):
        store.update_table_info(stale)
    assert json.loads(store.table_info(refresh=True).schema_json) \
        == {"v": "schema2"}
    # a fresh read-modify-write retries fine and bumps the CAS counter
    info_c = store.table_info(refresh=True)
    v = info_c.schema_version
    info_c.schema_json = json.dumps({"v": "schema3"})
    store.update_table_info(info_c)
    assert store.table_info(refresh=True).schema_version == v + 1


def test_concurrent_property_updates_never_lose_one(tmp_path):
    """The CAS closes the lost-update window for ALL metadata updates:
    8 writers each read-modify-write their own property with
    read-retry loops; every property must survive."""
    store = _store(tmp_path)
    errs: list[Exception] = []

    def work(i):
        for attempt in range(20):
            try:
                info = store.table_info(refresh=True)
                info.configuration = {**info.configuration,
                                      f"prop.{i}": str(i)}
                store.update_table_info(info)
                return
            except MetaError as e:
                if "Schema has been changed" not in str(e):
                    errs.append(e)
                    return
                time.sleep(0.01)
        errs.append(AssertionError(f"writer {i} starved"))

    ts = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    cfg = store.table_info(refresh=True).configuration
    for i in range(8):
        assert cfg.get(f"prop.{i}") == str(i)


# ---------- create range partition concurrently (end-to-end) ----------


def test_create_range_partition_concurrently(spark, tmp_path):
    """'create range partition concurrently'
    (MetaCommitSuite.scala:376-408): 5 concurrent upserts all CREATE
    the same new partition key=d on a hash table; every one lands
    (read_version == taskNum) and MoR serves the last value per key."""
    from starlake_spark.table import StarTable, create_table

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1, 1), ("b", 1, 2), ("c", 1, 3)], "key string, hash int, value int")
    # compaction.auto=false so the 5 delta files stay visible (the
    # reference's read_version == taskNum assertion counts commits)
    create_table(spark, df, path, range_partitions=["key"],
                 hash_partitions=["hash"], hash_bucket_num=1,
                 configuration={"compaction.auto": "false"})
    table = StarTable.for_path(spark, path)
    errs: list[Exception] = []

    def work(i):
        try:
            table.upsert(spark.createDataFrame(
                [("d", 1, i)], "key string, hash int, value int"))
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(5)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    store = ManifestStore(path)
    snap = store.snapshot()
    assert "key=d" in snap.partitions
    # all five upserts landed as distinct commits on the new partition
    assert len(snap.partitions["key=d"].files) == 5
    rows = table.to_df().filter("key = 'd'").collect()
    assert len(rows) == 1  # MoR collapse: one row for hash=1
    assert rows[0]["value"] in range(5)


# ---------- UpsertWithDuplicateData* (manual_execute_suites) ----------
#
# UpsertWithDuplicateDataBySame.scala / ...ByDifferent.scala /
# ...AndFields.scala: upsert batches that contain DUPLICATE primary
# keys collapse to the LAST occurrence in input order (the reference's
# groupBy(range,hash).agg(last(...)) expectation; writer.py stamps
# monotonically_increasing_id so "last" is input order here too), and
# sequential partial-column upserts compose as full-outer-join +
# newest-non-null-wins per column.


def _dup_data(rng, n, only_one_partition, fields):
    """getDataNew analog (TestUtils.scala:95-109), deterministic."""
    rows = []
    for _ in range(n):
        rows.append((
            "range1" if only_one_partition
            else ("range1" if rng.randint(0, 2) == 1 else "range2"),
            rng.randint(0, 2 * n - 1),
            *[rng.randint(0, 34) for _ in fields],
        ))
    return rows


def _last_wins(rows, n_fields):
    """Expected collapse: last occurrence per (range, hash), column-wise
    non-null composition handled by the caller."""
    out = {}
    for r in rows:
        out[(r[0], r[1])] = r
    return out


def _check(table, expected, cols):
    got = {(r["range"], r["hash"]): tuple(r[c] for c in cols)
           for r in table.to_df().collect()}
    want = {k: tuple(v) for k, v in expected.items()}
    assert got == want


@pytest.mark.parametrize("only_one_partition", [True, False])
def test_upsert_duplicate_data_by_same_fields(spark, tmp_path,
                                              only_one_partition):
    """UpsertWithDuplicateDataBySame: init with (name, age) dup-keyed
    batch, then upsert the SAME keys with (stu, grade) — every key
    serves last(name,age) from init composed with last(stu,grade) from
    the upsert (schema widens in the upsert)."""
    import random

    from starlake_spark.table import StarTable, create_table

    rng = random.Random(7)
    n = 600
    rows = _dup_data(rng, n, only_one_partition, ["name", "age", "stu", "grade"])
    path = str(tmp_path / "t")
    init_df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "range string, hash int, name int, age int")
    create_table(spark, init_df, path, range_partitions=["range"],
                 hash_partitions=["hash"], hash_bucket_num=2,
                 configuration={"compaction.auto": "false"})
    table = StarTable.for_path(spark, path)
    last = _last_wins(rows, 4)
    _check(table, {k: (v[2], v[3]) for k, v in last.items()},
           ["name", "age"])
    up_df = spark.createDataFrame(
        [(r[0], r[1], r[4], r[5]) for r in rows],
        "range string, hash int, stu int, grade int")
    table.upsert(up_df)
    _check(table, {k: (v[2], v[3], v[4], v[5]) for k, v in last.items()},
           ["name", "age", "stu", "grade"])


@pytest.mark.parametrize("only_one_partition", [True, False])
def test_upsert_duplicate_data_by_different_fields(spark, tmp_path,
                                                   only_one_partition):
    """UpsertWithDuplicateDataByDifferent: four dup-keyed batches each
    carrying ONE new column over DIFFERENT key sets — cumulative state
    composes as full-outer join with last-wins per column."""
    import random

    from starlake_spark.table import StarTable, create_table

    rng = random.Random(11)
    n = 400
    path = str(tmp_path / "t")
    batches = {c: _dup_data(rng, n, only_one_partition, [c])
               for c in ["name", "age", "stu", "grade"]}
    create_table(
        spark,
        spark.createDataFrame(batches["name"],
                              "range string, hash int, name int"),
        path, range_partitions=["range"], hash_partitions=["hash"],
        hash_bucket_num=2, configuration={"compaction.auto": "false"})
    table = StarTable.for_path(spark, path)
    state: dict = {}
    for i, col in enumerate(["name", "age", "stu", "grade"]):
        last = _last_wins(batches[col], 1)
        for k, v in last.items():
            cur = state.setdefault(k, [None, None, None, None])
            cur[i] = v[2]
        if i > 0:
            table.upsert(spark.createDataFrame(
                batches[col], f"range string, hash int, {col} int"))
        _check(table, {k: tuple(v[:i + 1]) for k, v in state.items()},
               ["name", "age", "stu", "grade"][:i + 1])


def test_upsert_duplicate_data_and_fields(spark, tmp_path):
    """UpsertWithDuplicateDataAndFields: upserts with OVERLAPPING field
    sets — (name), then (name, age, grade), then (grade), then
    (age, grade) — newest non-null wins column-wise, duplicates collapse
    last-wins in every batch."""
    import random

    from starlake_spark.table import StarTable, create_table

    rng = random.Random(13)
    n = 400
    path = str(tmp_path / "t")
    field_sets = [["name"], ["name", "age", "grade"], ["grade"],
                  ["age", "grade"]]
    all_cols = ["name", "age", "grade"]
    batches = [_dup_data(rng, n, False, fs) for fs in field_sets]
    create_table(
        spark,
        spark.createDataFrame(batches[0], "range string, hash int, name int"),
        path, range_partitions=["range"], hash_partitions=["hash"],
        hash_bucket_num=2, configuration={"compaction.auto": "false"})
    table = StarTable.for_path(spark, path)
    state: dict = {}
    for bi, (fs, rows) in enumerate(zip(field_sets, batches)):
        last = _last_wins(rows, len(fs))
        for k, v in last.items():
            cur = state.setdefault(k, [None] * len(all_cols))
            for fi, c in enumerate(fs):
                cur[all_cols.index(c)] = v[2 + fi]
        if bi > 0:
            schema = ("range string, hash int, "
                      + ", ".join(f"{c} int" for c in fs))
            table.upsert(spark.createDataFrame(rows, schema))
    _check(table, {k: tuple(v) for k, v in state.items()}, all_cols)


# ---------- AlterTableTests (AlterTableTests.scala:95-1145) ----------
#
# Nested ADD COLUMNS (into struct / array element / map key / value),
# CHANGE COLUMN comment + FIRST/AFTER positions, and the refusal matrix
# (rename/type-change/complex-edit through CHANGE, duplicate names,
# invalid names, non-struct parents, unknown move anchors).


@pytest.fixture()
def alter_tbl(spark, tmp_path):
    from pyspark.sql import functions as F

    from starlake_spark.sql import StarSession

    sess = StarSession(spark, warehouse=str(tmp_path / "wh"))
    df = (spark.createDataFrame([(1, "a"), (2, "b")], "v1 int, v2 string")
          .withColumn("a", F.array(F.struct("v1")))
          .withColumn("m", F.create_map(F.col("v1"), F.struct("v2")))
          .withColumn("s", F.struct("v1", "v2")))
    sess.create_table(df, str(tmp_path / "alter_t"), name="alter_t")
    return sess


def _schema_of(sess, name="alter_t"):
    t = sess.table(name)
    info = t.store.table_info(refresh=True)
    from pyspark.sql import types as T

    return T.StructType.fromJson(json.loads(info.schema_json))


def test_add_columns_simple_sql(alter_tbl):
    """'ADD COLUMNS - simple' (AlterTableTests.scala:95-112)."""
    alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (v3 long, v4 double)")
    sch = _schema_of(alter_tbl)
    assert [f.name for f in sch.fields][-2:] == ["v3", "v4"]
    rows = alter_tbl.table("alter_t").to_df() \
        .select("v1", "v3", "v4").collect()
    assert all(r["v3"] is None and r["v4"] is None for r in rows)
    assert len(rows) == 2


def test_add_columns_into_array(alter_tbl):
    """'ADD COLUMNS into complex types - Array'
    (AlterTableTests.scala:114-156): grow the struct inside an array,
    a struct inside that, then a field inside THAT."""
    alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (a.element.v3 long)")
    alter_tbl.sql(
        "ALTER TABLE alter_t ADD COLUMNS (a.element.v4 struct<f1:long>)")
    alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (a.element.v4.f2 string)")
    sch = _schema_of(alter_tbl)
    elem = sch["a"].dataType.elementType
    assert [f.name for f in elem.fields] == ["v1", "v3", "v4"]
    assert [f.name for f in elem["v4"].dataType.fields] == ["f1", "f2"]
    # old rows scan with nulls backfilled inside the array struct
    row = alter_tbl.table("alter_t").to_df() \
        .filter("v1 = 1").select("a").collect()[0]["a"][0]
    assert row["v1"] == 1 and row["v3"] is None and row["v4"] is None


def test_add_columns_into_map_value_and_key(alter_tbl):
    """'ADD COLUMNS into complex types - Map with simple key/value'
    (AlterTableTests.scala:157-239): value-struct adds work with a
    simple key; adding into a BASIC key/value fails."""
    alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (m.value.v5 long)")
    sch = _schema_of(alter_tbl)
    assert [f.name for f in sch["m"].dataType.valueType.fields] \
        == ["v2", "v5"]
    with pytest.raises(ValueError, match="not a StructType"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (m.key.x long)")
    row = alter_tbl.table("alter_t").to_df() \
        .filter("v1 = 1").select("m").collect()[0]["m"]
    assert row[1]["v2"] == "a" and row[1]["v5"] is None


def test_add_columns_map_or_array_without_step_fails(alter_tbl):
    """'ADD COLUMNS into Map/Array should fail if key/value/element not
    specified' (AlterTableTests.scala:286-313)."""
    with pytest.raises(ValueError, match="not a StructType"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (m.x long)")
    with pytest.raises(ValueError, match="not a StructType"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (a.x long)")


def test_add_columns_with_comment(alter_tbl):
    """'ADD COLUMNS - with a comment' (AlterTableTests.scala:334-352)."""
    alter_tbl.sql(
        "ALTER TABLE alter_t ADD COLUMNS (v3 long COMMENT 'new column')")
    sch = _schema_of(alter_tbl)
    assert sch["v3"].metadata.get("comment") == "new column"


def test_add_columns_refusals(alter_tbl):
    """'adding to a non-struct column' / 'a duplicate name (nested)' /
    'an invalid column name (nested)' (AlterTableTests.scala:354-403)."""
    with pytest.raises(ValueError) as e:
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (v2.x long)")
    assert "not a StructType" in str(e.value)
    with pytest.raises(ValueError, match="already exists"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (v2 long)")
    with pytest.raises(ValueError, match="already exists"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (s.v2 long)")
    with pytest.raises(ValueError, match="invalid character"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS "
                      "(`a column name with spaces` long)")
    with pytest.raises(ValueError, match="invalid character"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS "
                      "(s.`a column name with spaces` long)")


def test_change_column_comment(alter_tbl):
    """'CHANGE COLUMN - add a comment' (+ nested,
    AlterTableTests.scala:563-572,977-992)."""
    alter_tbl.sql(
        "ALTER TABLE alter_t CHANGE COLUMN v1 v1 integer COMMENT 'a comment'")
    sch = _schema_of(alter_tbl)
    assert sch["v1"].metadata.get("comment") == "a comment"
    alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s.v1 v1 integer "
                  "COMMENT 'nested comment'")
    sch = _schema_of(alter_tbl)
    assert sch["s"].dataType["v1"].metadata.get("comment") \
        == "nested comment"


def test_change_column_positions(alter_tbl):
    """'CHANGE COLUMN - move to first / after some column / after the
    same column' (AlterTableTests.scala:691-866), data unchanged."""
    before = {r["v1"]: r["v2"]
              for r in alter_tbl.table("alter_t").to_df().collect()}
    alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN v2 v2 string FIRST")
    assert [f.name for f in _schema_of(alter_tbl).fields][:2] == ["v2", "v1"]
    alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN v2 v2 string AFTER v1")
    assert [f.name for f in _schema_of(alter_tbl).fields][:2] == ["v1", "v2"]
    # nested move
    alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s.v2 v2 string FIRST")
    assert [f.name for f in _schema_of(alter_tbl)["s"].dataType.fields] \
        == ["v2", "v1"]
    after = {r["v1"]: r["v2"]
             for r in alter_tbl.table("alter_t").to_df().collect()}
    assert after == before


def test_change_column_refusals(alter_tbl):
    """'change name' / 'incompatible' (+nested) / 'complex types not
    supported' / 'move unknown column'
    (AlterTableTests.scala:662-689,994-1045)."""
    with pytest.raises(ValueError, match="not supported"):
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN v2 v3 string")
    with pytest.raises(ValueError) as e:
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN v1 v1 long")
    assert "'v1' with type 'IntegerType (nullable = true)'" in str(e.value)
    assert "'v1' with type 'LongType (nullable = true)'" in str(e.value)
    with pytest.raises(ValueError) as e:
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s.v1 v1 long")
    assert "'s.v1' with type 'IntegerType (nullable = true)'" in str(e.value)
    with pytest.raises(ValueError, match="not supported"):
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s s "
                      "STRUCT<v1:int, v2:string, sv3:long>")
    with pytest.raises(ValueError, match="not supported"):
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s s STRUCT<v1:int>")
    with pytest.raises(ValueError, match="Cannot update missing field"):
        alter_tbl.sql(
            "ALTER TABLE alter_t CHANGE COLUMN unknown unknown string FIRST")
    with pytest.raises(ValueError, match="Cannot update missing field"):
        alter_tbl.sql("ALTER TABLE alter_t CHANGE COLUMN s.unknown unknown "
                      "string FIRST")
    with pytest.raises(ValueError, match="missing field"):
        alter_tbl.sql(
            "ALTER TABLE alter_t CHANGE COLUMN v1 v1 integer AFTER unknown")


def test_add_columns_case_insensitive_duplicate(alter_tbl):
    """'ADD COLUMNS - case insensitive' (AlterTableTests.scala:532-545):
    adding V1 over existing v1 is a duplicate, not a new column."""
    with pytest.raises(ValueError, match="already exists"):
        alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS (V1 long)")


def test_nested_add_then_write_and_merge_read(spark, tmp_path):
    """End-to-end nested evolution: old files (pre-ALTER) and new files
    (post-ALTER, carrying the nested field) merge in one scan with
    nulls backfilled only where the bytes are genuinely absent."""
    from pyspark.sql import functions as F

    from starlake_spark.table import StarTable, create_table

    path = str(tmp_path / "t")
    df = (spark.createDataFrame([(1,), (2,)], "k int")
          .withColumn("payload", F.struct(F.col("k").alias("x"))))
    t = create_table(spark, df, path,
                     configuration={"compaction.auto": "false"})
    t.add_columns([("payload.y", "long")])
    new = (spark.createDataFrame([(3, 30)], "k int, yv long")
           .select("k", F.struct(F.col("k").alias("x"),
                                 F.col("yv").alias("y")).alias("payload")))
    t.write(new, mode="append")
    rows = {r["k"]: r["payload"]
            for r in t.to_df().select("k", "payload").collect()}
    assert rows[1]["x"] == 1 and rows[1]["y"] is None
    assert rows[3]["x"] == 3 and rows[3]["y"] == 30


def test_add_columns_with_positions(alter_tbl):
    """'ADD COLUMNS - with positions' (+ using an added column,
    AlterTableTests.scala:428-470): FIRST / AFTER placements, including
    anchoring on a column added earlier in the same statement."""
    alter_tbl.sql("ALTER TABLE alter_t ADD COLUMNS "
                  "(v3 long FIRST, v4 long AFTER v3, v5 long)")
    names = [f.name for f in _schema_of(alter_tbl).fields]
    assert names[:3] == ["v3", "v4", "v1"]
    assert names[-1] == "v5"
    with pytest.raises(ValueError, match="AFTER unknown"):
        alter_tbl.sql(
            "ALTER TABLE alter_t ADD COLUMNS (v6 long AFTER unknown)")


# ---------- DDLSuite nullability (DDLSuite.scala:58-199) ----------


def test_not_null_create_and_write_violation(spark, tmp_path):
    """'create table with NOT NULL - check violation through file
    writing' + 'through SQL' (DDLSuite.scala:58-199)."""
    from starlake_spark.sql import StarSession

    sess = StarSession(spark, warehouse=str(tmp_path / "wh"))
    sess.sql("CREATE TABLE nn_t (a LONG, b STRING NOT NULL) USING star")
    t = sess.table("nn_t")
    t.write(spark.createDataFrame([(1, "x")], "a long, b string"),
            mode="append")
    with pytest.raises(Exception, match="NOT NULL invariant"):
        t.write(spark.createDataFrame([(2, None)], "a long, b string"),
                mode="append")
    with pytest.raises(Exception, match="NOT NULL invariant"):
        sess.sql("INSERT INTO nn_t VALUES (3, NULL)")
    rows = t.to_df().collect()
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x")]


def test_not_null_nullability_alters(spark, tmp_path):
    """'ALTER TABLE CHANGE COLUMN from NOT NULL to nullable' is
    supported; the tightening direction and NOT NULL adds are refused
    (DDLSuite.scala:87-170)."""
    from starlake_spark.sql import StarSession
    from pyspark.sql import types as T

    sess = StarSession(spark, warehouse=str(tmp_path / "wh"))
    sess.sql("CREATE TABLE nn_u (a LONG NOT NULL, b STRING) USING star")
    t = sess.table("nn_u")
    # NOT NULL adds refused (DDLSuite.scala:87-110)
    with pytest.raises(ValueError, match="must be nullable"):
        t.add_columns(T.StructType([T.StructField("c", T.LongType(),
                                                  False)]))
    # nullable -> NOT NULL refused (DDLSuite.scala:111-134)
    with pytest.raises(ValueError, match="not supported"):
        sess.sql("ALTER TABLE nn_u ALTER COLUMN b SET NOT NULL")
    # NOT NULL -> nullable supported (DDLSuite.scala:136-170)
    with pytest.raises(Exception, match="NOT NULL invariant"):
        t.write(spark.createDataFrame([(None, "x")], "a long, b string"),
                mode="append")
    sess.sql("ALTER TABLE nn_u ALTER COLUMN a DROP NOT NULL")
    t.write(spark.createDataFrame([(None, "x")], "a long, b string"),
            mode="append")
    assert t.to_df().count() == 1


# ---------- StarTableSuite (tables/StarTableSuite.scala:30-120) ----------


def test_startable_forname_refusals(spark, tmp_path):
    """forName on a Spark-catalog (non-star) table, a temp view, or a
    star.`path` identifier refuses with 'not an Star table'
    (StarTableSuite.scala:59-95); forPath + alias + isStarTable round
    out the surface (:30-41, :97-119)."""
    from starlake_spark.table import StarTable, create_table

    df = spark.createDataFrame([(i, str(i)) for i in range(5)],
                               "key int, value string")
    path = str(tmp_path / "st")
    create_table(spark, df, path)
    # forPath + as/alias
    t = StarTable.for_path(spark, path)
    got = t.alias("tbl").select("tbl.value").collect()
    assert sorted(r["value"] for r in got) == [str(i) for i in range(5)]
    # isStarTable on a star path; false on a plain parquet dir
    assert StarTable.is_star_table(path)
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    assert not StarTable.is_star_table(plain)
    # temp view name -> refused
    spark.read.parquet(plain).createOrReplaceTempView("viewOnTable")
    with pytest.raises(ValueError, match="not an Star table"):
        StarTable.for_name(spark, "viewOnTable",
                           str(tmp_path / "wh"))
    spark.catalog.dropTempView("viewOnTable")
    # star.`path` identifier -> refused (forPath's job)
    with pytest.raises(ValueError, match="not an Star table"):
        StarTable.for_name(spark, f"star.`{path}`", str(tmp_path / "wh"))
    # truly unknown names keep the plain lookup error
    with pytest.raises(KeyError, match="unknown table name"):
        StarTable.for_name(spark, "no_such", str(tmp_path / "wh"))


# ---------- DataOperationSuite (meta/DataOperationSuite.scala:50-147) ----------


def test_mvcc_visibility_at_version_boundaries(tmp_path):
    """'write and read data info': file visibility obeys
    write_version <= read_version < expire_version — snapshot(1) serves
    only file1, snapshot(2) both, snapshot(3) only the replacement."""
    store = _store(tmp_path)
    f1, f2, f3 = (_file(store, "", n) for n in ("file1", "file2", "file3"))
    for f in (f1, f2):
        txn = store.new_transaction()
        txn.add_files([f])
        store.commit(txn)
    txn = store.new_transaction()
    txn.add_files([f3])
    txn.expire_files([f1.path, f2.path])
    store.commit(txn)

    def paths(v):
        return sorted(os.path.basename(f.path)
                      for f in store.snapshot(v).all_files())

    assert paths(1) == ["file1.parquet"]
    assert paths(2) == ["file1.parquet", "file2.parquet"]
    assert paths(3) == ["file3.parquet"]
    # write_versions stamped per commit (the MoR collapse ordering key)
    by_name = {os.path.basename(f.path): f.write_version
               for f in store.snapshot(2).all_files()}
    assert by_name == {"file1.parquet": 1, "file2.parquet": 2}


# ---------- ShuffleJoinSuite (manual_execute_suites) ----------


def test_mor_join_adds_no_exchange_beyond_collapse(spark, tmp_path):
    """ShuffleJoinSuite analog: two hash tables, each base + one
    partial-column upsert, joined on the hash key. The reference's
    bucket-reporting scan plans zero Exchange/Sort; the DataFrame
    translation pays exactly the per-side MoR collapse shuffles and the
    JOIN must add NO further exchange (both collapses land on the same
    hashpartitioning, which also satisfies the SMJ). The materialized
    to_bucketed_table path (star_bucketed_join, plan-pinned elsewhere)
    removes even the collapse shuffles. Results must equal the
    last-wins composition."""
    import random

    from starlake_spark.table import StarTable, create_table

    rng = random.Random(23)
    n, buckets = 800, 8
    paths, want = [], []
    for t in range(2):
        rows = _dup_data(rng, n, True, ["name", "stu"])
        path = str(tmp_path / f"t{t}")
        create_table(
            spark,
            spark.createDataFrame([(r[0], r[1], r[2]) for r in rows],
                                  "range string, hash int, name int"),
            path, range_partitions=["range"], hash_partitions=["hash"],
            hash_bucket_num=buckets,
            configuration={"compaction.auto": "false"})
        StarTable.for_path(spark, path).upsert(spark.createDataFrame(
            [(r[0], r[1], r[3]) for r in rows],
            "range string, hash int, stu int"))
        paths.append(path)
        want.append(_last_wins(rows, 2))
    from pyspark.sql import functions as F

    e1 = StarTable.for_path(spark, paths[0]).to_df().alias("e1")
    e2 = StarTable.for_path(spark, paths[1]).to_df().alias("e2")
    j = e1.join(e2, F.col("e1.hash") == F.col("e2.hash")).select(
        F.col("e1.hash").alias("h"),
        F.col("e1.name").alias("n1"), F.col("e1.stu").alias("s1"),
        F.col("e2.name").alias("n2"), F.col("e2.stu").alias("s2"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2, f"join added exchanges beyond collapse:\n{plan}"
    got = {(r["h"]): (r["n1"], r["s1"], r["n2"], r["s2"])
           for r in j.collect()}
    w1 = {k[1]: (v[2], v[3]) for k, v in want[0].items()}
    w2 = {k[1]: (v[2], v[3]) for k, v in want[1].items()}
    expect = {h: (*w1[h], *w2[h]) for h in set(w1) & set(w2)}
    assert got == expect


# ---------- FragmentValueSuite (meta/FragmentValueSuite.scala) ----------


def test_large_schema_roundtrips_without_fragmentation(tmp_path):
    """FragmentValueSuite analog: the reference fragments >50KB values
    (schemas, MV queryInfo) around Cassandra's cell limit
    (FragmentValue.scala:23-103); file manifests have no such limit —
    a 3000-column schema (~100KB json) must round-trip verbatim through
    create / update_table_info / commit-stamped snapshot schema."""
    p = str(tmp_path / "t")
    store = ManifestStore(p)
    fields = [{"name": f"col_{i:04d}", "type": "string",
               "nullable": True, "metadata": {"comment": "x" * 20}}
              for i in range(3000)]
    schema_json = json.dumps({"type": "struct", "fields": fields})
    assert len(schema_json) > 50_000  # past the reference's threshold
    store.create(TableInfo(table_path=p, table_id="tid-big",
                           schema_json=schema_json))
    assert store.table_info(refresh=True).schema_json == schema_json
    info = store.table_info()
    info.configuration = {"big": "v" * 60_000}  # >50KB property value
    store.update_table_info(info)
    got = ManifestStore(p).table_info(refresh=True)
    assert got.schema_json == schema_json
    assert got.configuration["big"] == "v" * 60_000
    txn = store.new_transaction()
    txn.add_files([_file(store, "", "one")])
    snap = store.commit(txn)
    assert store.snapshot(snap.version).schema_json == schema_json


# ---------- SchemaEnforcementSuite: mergeSchema / overwriteSchema ----------


@pytest.fixture()
def star_source(spark):
    from starlake_spark import sources

    sources.register(spark)
    return spark


def test_merge_schema_writer_option_overrides_property(star_source, spark,
                                                       tmp_path):
    """'reject schema changes by default' / 'allow schema change with
    option' / 'disallow when enabled but writer config disabled'
    (SchemaEnforcementSuite.scala:91-136): the per-write mergeSchema
    option beats the table property in BOTH directions."""
    from pyspark.sql import functions as F

    from starlake_spark.table import StarTable, create_table

    p1 = str(tmp_path / "deny")
    create_table(spark, spark.range(10), p1,
                 configuration={"schema.autoMerge.enabled": "false"})
    wide = spark.range(10).withColumn("part", F.col("id") + 1)
    with pytest.raises(Exception, match="mergeSchema"):
        wide.write.format("star").mode("append").save(p1)
    # option=true overrides the disabled property
    wide.write.format("star").mode("append").option(
        "mergeSchema", "true").save(p1)
    assert "part" in StarTable.for_path(spark, p1).to_df().columns
    # option=false overrides the (default-true) property
    p2 = str(tmp_path / "allow")
    create_table(spark, spark.range(10), p2)
    with pytest.raises(Exception, match="mergeSchema"):
        wide.write.format("star").mode("append").option(
            "mergeSchema", "false").save(p2)


def test_overwrite_schema_option(star_source, spark, tmp_path):
    """'complete mode can overwrite schema with option' (batch form;
    SchemaEnforcementSuite.scala:783-835) + SchemaValidationSuite's
    overwriteSchema writes: a truncate-overwrite with
    overwriteSchema=true REPLACES the declared schema; without the
    option the write must keep evolving instead; appends refuse; the
    replacement version's snapshot stamps the new schema and time
    travel still serves the old one."""
    from starlake_spark.meta import ManifestStore
    from starlake_spark.table import StarTable, create_table

    path = str(tmp_path / "t")
    create_table(
        spark,
        spark.createDataFrame([(1, "a")], "id long, old_col string"),
        path, range_partitions=["id"])
    v_before = ManifestStore(path).latest_version()
    replacement = spark.createDataFrame([(2, 9.5)], "id long, score double")
    with pytest.raises(Exception, match="overwriteSchema"):
        replacement.write.format("star").mode("append").option(
            "overwriteSchema", "true").save(path)
    replacement.write.format("star").mode("overwrite").option(
        "overwriteSchema", "true").save(path)
    t = StarTable.for_path(spark, path)
    assert t.to_df().columns == ["id", "score"]
    assert [(r["id"], r["score"]) for r in t.to_df().collect()] == [(2, 9.5)]
    # versioned schema: the pre-overwrite version still reads old_col
    old = t.to_df(version=v_before)
    assert "old_col" in old.columns and "score" not in old.columns
    # partition/hash layout columns cannot be dropped or retyped
    with pytest.raises(Exception, match="layout contract"):
        spark.createDataFrame([(1.5, 2.0)], "id double, score double") \
            .write.format("star").mode("overwrite") \
            .option("overwriteSchema", "true").save(path)
    with pytest.raises(Exception, match="layout contract"):
        spark.createDataFrame([("x",)], "score string") \
            .write.format("star").mode("overwrite") \
            .option("overwriteSchema", "true").save(path)


# ---------- SchemaValidationSuite (schema change mid-command) ----------


def test_concurrent_alter_not_reverted_by_inflight_commit(spark, tmp_path):
    """SchemaValidationSuite's contract class: a schema-altering commit
    that lands while another command is between analysis and its
    transaction must not be corrupted by that command. Here: an ALTER
    ADD COLUMNS lands after a writer built its transaction but before
    it commits — the writer's version stamp must carry the POST-alter
    schema (versioned-schema coherence), the new column reads as null
    for the written rows, and table_info keeps the alter."""
    from starlake_spark.table import StarTable, create_table

    path = str(tmp_path / "t")
    t = create_table(spark, spark.createDataFrame([(1, "a")],
                                                  "id long, s string"), path)
    store = ManifestStore(path)
    orig = ManifestStore._build_commit
    fired = []

    def alter_mid_commit(self, txn, current):
        if not fired:
            fired.append(True)
            StarTable.for_path(spark, path).add_columns([("added", "long")])
        return orig(self, txn, current)

    ManifestStore._build_commit = alter_mid_commit
    try:
        t.write(spark.createDataFrame([(2, "b")], "id long, s string"),
                mode="append")
    finally:
        ManifestStore._build_commit = orig
    snap = store.snapshot()
    sch = json.loads(snap.schema_json)
    assert "added" in [f["name"] for f in sch["fields"]]
    rows = {r["id"]: r["added"] for r in t.to_df().collect()}
    assert rows == {1: None, 2: None}


def test_nulltype_edge_cases(star_source, spark, tmp_path):
    """'JSON ETL workflow' NullType matrix
    (SchemaEnforcementSuite.scala:185-250): nested NullType (untyped
    JSON like "top":[]) refuses with a NullType message; a write whose
    only data columns are NullType refuses with 'NullType have been
    dropped'; a NullType PARTITION column fails (case-insensitively)."""
    from pyspark.sql import types as T

    row1 = '{"key":"abc","top":[]}'
    df1 = spark.read.schema(
        T.StructType().add("key", "string")
        .add("top", T.ArrayType(T.NullType()))
    ).json(spark.createDataFrame([(row1,)], "value string").rdd
           .map(lambda r: r.value))
    with pytest.raises(Exception, match="NullType"):
        df1.write.format("star").mode("append").save(str(tmp_path / "a"))
    df2 = spark.read.schema(
        T.StructType().add("key", "string")
        .add("top", T.ArrayType(T.StructType().add("id", T.NullType())))
    ).json(spark.createDataFrame([('{"key":"abc","top":[{"id":null}]}',)],
                                 "value string").rdd.map(lambda r: r.value))
    with pytest.raises(Exception, match="NullType"):
        df2.write.format("star").mode("append").save(str(tmp_path / "b"))
    # NullType as the only data column
    df3 = spark.read.schema(
        T.StructType().add("key", "string").add("id", T.NullType())
    ).json(spark.createDataFrame([('{"key":"abc","id":null}',)],
                                 "value string").rdd.map(lambda r: r.value))
    with pytest.raises(Exception, match="NullType have been dropped"):
        df3.write.format("star").mode("append") \
            .option("rangePartitions", "key").save(str(tmp_path / "c"))
    with pytest.raises(Exception, match="NullType have been dropped"):
        df3.write.format("star").mode("append") \
            .option("hashPartitions", "key").option("hashBucketNum", "2") \
            .save(str(tmp_path / "d"))
    # NullType partition column (case-insensitive resolution)
    for spec in ("id", "iD"):
        with pytest.raises(Exception, match="not in data"):
            df3.write.format("star").mode("append") \
                .option("rangePartitions", spec).save(str(tmp_path / "e"))


def test_all_columns_as_partitions_refused(star_source, spark, tmp_path):
    """StarSinkSuite 'can't write out with all columns being partition
    columns' (StarSinkSuite.scala:460-480): a first write declaring
    every column a partition key refuses with the reference message
    (distinct from the NullType-drop refusal)."""
    df = spark.createDataFrame([(1, 2)], "id int, value int")
    with pytest.raises(Exception,
                       match="Cannot use all columns for partition"):
        df.write.format("star").mode("append") \
            .option("rangePartitions", "id,value") \
            .save(str(tmp_path / "t"))
    with pytest.raises(Exception,
                       match="Cannot use all columns for partition"):
        df.write.format("star").mode("append") \
            .option("rangePartitions", "id") \
            .option("hashPartitions", "value") \
            .option("hashBucketNum", "2") \
            .save(str(tmp_path / "t2"))
