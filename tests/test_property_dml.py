"""Randomized DML churn vs an in-memory model — the pytest analogue of
the reference's soak suites (manual_execute_suites/
UpsertWithDuplicateDataAndFields.scala, UpsertAfterCompaction.scala,
CompactionDoNotChangeResult.scala): arbitrary interleavings of
full-row upserts, partial-column upserts, updates, deletes and
compactions must leave the table equal to a dict-model applying the
documented MoR semantics (per column, the latest version whose file
contains the column wins, explicit nulls included)."""

import random

import pytest
from pyspark.sql import functions as F, types as T

from starlake_spark.table import create_table

KEYS = list(range(1, 41))
SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("v", T.LongType(), True),
    T.StructField("tag", T.StringType(), True),
])


def _apply_model(model, op, payload):
    if op == "upsert_full":
        for k, v, tag in payload:
            model[k] = {"v": v, "tag": tag}
    elif op == "upsert_partial":  # only (k, v) columns in the delta file
        for k, v in payload:
            if k in model:
                model[k]["v"] = v
            else:
                model[k] = {"v": v, "tag": None}
    elif op == "update":
        mod, add = payload
        for k in list(model):
            if k % mod == 0:
                model[k]["v"] = (model[k]["v"] or 0) + add
    elif op == "delete":
        (mod,) = payload
        for k in list(model):
            if k % mod == 0:
                del model[k]
    # compact: no model change by definition


def _random_ops(rng, n):
    ops = []
    for _ in range(n):
        kind = rng.choice(
            ["upsert_full", "upsert_partial", "update", "delete", "compact"])
        if kind == "upsert_full":
            ks = rng.sample(KEYS, rng.randint(1, 12))
            ops.append((kind, [
                (k, rng.choice([None, rng.randint(0, 99)]), rng.choice(["a", "b", "c"]))
                for k in ks
            ]))
        elif kind == "upsert_partial":
            ks = rng.sample(KEYS, rng.randint(1, 12))
            ops.append((kind, [(k, rng.randint(100, 199)) for k in ks]))
        elif kind == "update":
            ops.append((kind, (rng.choice([2, 3, 5]), rng.randint(1, 9))))
        elif kind == "delete":
            ops.append((kind, (rng.choice([4, 6, 7]),)))
        else:
            ops.append((kind, None))
    return ops


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_dml_churn_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    base = [(k, rng.randint(0, 99), rng.choice(["a", "b", "c"])) for k in KEYS]
    df = spark.createDataFrame(base, SCHEMA)
    t = create_table(spark, df, str(tmp_path / f"t{seed}"),
                     hash_partitions=["k"], hash_bucket_num=4)
    model = {k: {"v": v, "tag": tag} for k, v, tag in base}

    for i, (op, payload) in enumerate(_random_ops(rng, 8)):
        if op == "upsert_full":
            t.upsert(spark.createDataFrame(payload, SCHEMA))
        elif op == "upsert_partial":
            t.upsert(spark.createDataFrame(
                payload,
                T.StructType([SCHEMA[0], SCHEMA[1]])))
        elif op == "update":
            mod, add = payload
            t.update(F.col("k") % mod == 0,
                     {"v": F.coalesce(F.col("v"), F.lit(0)) + add})
        elif op == "delete":
            (mod,) = payload
            t.delete(F.col("k") % mod == 0)
        else:
            t.compaction(force=True)
        _apply_model(model, op, payload)

        got = {r["k"]: {"v": r["v"], "tag": r["tag"]}
               for r in t.to_df().collect()}
        assert got == model, f"seed={seed} diverged after op {i} ({op})"