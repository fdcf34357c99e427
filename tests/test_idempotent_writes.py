"""Idempotent batch writes (Delta txnAppId/txnVersion analog): retries
of an already-committed (app, version) are no-ops, enforced both by the
cheap pre-check and race-free under the commit lock."""

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.meta import DuplicateTxnError


def test_idempotent_append_skips_retry(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    t = create_table(spark, df, tmp_table_dir, range_partitions=["v"])
    t.write(spark.createDataFrame([(2, "b")], "id int, v string"),
            txn_app_id="loader", txn_version=1)
    t.write(spark.createDataFrame([(2, "b")], "id int, v string"),
            txn_app_id="loader", txn_version=1)  # retry: no-op
    assert t.to_df().count() == 2
    t.write(spark.createDataFrame([(3, "c")], "id int, v string"),
            txn_app_id="loader", txn_version=2)
    assert t.to_df().count() == 3
    # a different app id is an independent sequence
    t.write(spark.createDataFrame([(4, "d")], "id int, v string"),
            txn_app_id="other", txn_version=1)
    assert t.to_df().count() == 4


def test_idempotent_upsert_delta_path(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, 10)], "id int, v int")
    t = create_table(spark, df, tmp_table_dir, hash_partitions=["id"],
                     hash_bucket_num=2)
    src = spark.createDataFrame([(1, 99)], "id int, v int")
    t.upsert(src, txn_app_id="u", txn_version=7)
    versions_after = t.versions()[-1]
    t.upsert(src, txn_app_id="u", txn_version=7)  # retry: no commit
    assert t.versions()[-1] == versions_after
    assert t.to_df().collect()[0]["v"] == 99
    with pytest.raises(ValueError, match="delta path"):
        t.upsert(src, use_delta=False, txn_app_id="u", txn_version=8)


def test_commit_lock_enforces_monotonic_registry(spark, tmp_table_dir):
    """Bypassing the pre-check (simulating the retry race) must raise
    DuplicateTxnError under the lock instead of double-committing."""
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    t = create_table(spark, df, tmp_table_dir)
    store = t.store
    from starlake_spark.operators import writer as w
    txn = store.new_transaction()
    txn.set_streaming_batch("txn:race", 5)
    store.commit(txn)
    txn2 = store.new_transaction()
    txn2.set_streaming_batch("txn:race", 5)
    with pytest.raises(DuplicateTxnError):
        store.commit(txn2)


def test_mismatched_txn_params_rejected(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    t = create_table(spark, df, tmp_table_dir)
    with pytest.raises(ValueError, match="set together"):
        t.write(df, txn_app_id="x")
