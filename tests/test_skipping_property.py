"""Randomized differential pin of the data-skipping stack: for ANY
generated predicate, `to_df(where=p)` must equal `to_df().filter(p)` —
file pruning (python fast path AND Spark-coercion path) is pure I/O
savings, never a semantics change. Predicates mix comparisons, IN
lists, LIKE prefixes, IS [NOT] NULL, and AND-conjuncts across int,
double, date, and string columns; the python/Spark path split is
exercised by including shapes the python envelope rejects (floats with
exotic formats stay in, non-ASCII strings force the bail)."""

import random

import pytest
from pyspark.sql import functions as F

from starlake_spark.table import create_table

COLS = {
    "o_orderkey": "int",
    "o_custkey": "int",
    "o_totalprice": "double",
    "o_orderdate": "date",
    "o_orderstatus": "str",
    "o_orderpriority": "str",
}


def _rand_pred(rng) -> str:
    col = rng.choice(list(COLS))
    kind = COLS[col]
    which = rng.random()
    if which < 0.08:
        # OR shapes: same-column (normalizes to IN) and cross-column
        # (unanalyzable — must stay exact with zero pruning)
        a, b = rng.randint(1, 1500), rng.randint(1, 1500)
        if rng.random() < 0.5:
            return f"(o_orderkey = {a} OR o_orderkey = {b})"
        return f"o_orderkey = {a} OR o_custkey = {b}"
    if which < 0.12:
        return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    if kind == "int":
        v = rng.randint(-10, 1600)
        if which < 0.3:
            vals = ", ".join(str(rng.randint(1, 1500)) for _ in range(3))
            return f"{col} IN ({vals})"
        op = rng.choice(["<", "<=", ">", ">=", "="])
        return f"{col} {op} {v}"
    if kind == "double":
        v = round(rng.uniform(0, 400000), rng.choice([0, 2, 5]))
        op = rng.choice(["<", "<=", ">", ">="])
        return f"{col} {op} {v}"
    if kind == "date":
        d = f"199{rng.randint(2, 8)}-0{rng.randint(1, 9)}-1{rng.randint(0, 9)}"
        op = rng.choice(["<", "<=", ">", ">=", "="])
        return f"{col} {op} DATE '{d}'"
    # strings
    r = rng.random()
    if r < 0.3:
        return f"{col} LIKE '{rng.choice(['1-', '3-', 'P', 'zz', 'MED'])}%'"
    if r < 0.4:
        return f"{col} LIKE '%{rng.choice(['GENT', 'OW'])}'"  # not prefix: no prune
    if r < 0.55:
        vals = ", ".join(f"'{s}'" for s in rng.sample(
            ["O", "F", "P", "café", "zz"], 2))
        return f"{col} IN ({vals})"
    op = rng.choice(["<", "<=", ">", ">=", "="])
    s = rng.choice(["1-URGENT", "F", "O", "P", "café", "5-LOW"])
    return f"{col} {op} '{s}'"


@pytest.fixture(scope="module")
def skiptbl(spark, sf_dir, tmp_path_factory):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path_factory.mktemp("skip") / "t")
    t = create_table(spark, orders, path,
                     configuration={"write.files.per.partition": "6"})
    # clustered rewrite → tight per-file bounds on the sort prefix,
    # loose on everything else: both prune-hit and prune-miss shapes
    t.compaction(sort_columns=["o_orderkey"], target_files=6)
    return t


@pytest.mark.parametrize("seed", [101, 211, 307])
def test_random_predicates_exact(spark, skiptbl, seed):
    rng = random.Random(seed)
    full = skiptbl.to_df()
    for i in range(25):
        preds = [_rand_pred(rng) for _ in range(rng.choice([1, 1, 2]))]
        p = " AND ".join(preds)
        got = skiptbl.to_df(where=p).count()
        want = full.filter(p).count()
        assert got == want, f"seed={seed} pred #{i}: '{p}' {got} != {want}"


@pytest.fixture(scope="module")
def mor_tbl(spark, sf_dir, tmp_path_factory):
    """Hash table with live MoR deltas AND a tombstone delete — the
    pruning rules differ here (key-column conjuncts only; delta arms
    must never be lost), so the predicate soak runs separately."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path_factory.mktemp("skipmor") / "t")
    t = create_table(spark, orders, path,
                     hash_partitions=["o_orderkey"], hash_bucket_num=8,
                     configuration={"compaction.auto": "false"})
    t.upsert(orders.filter("o_orderkey % 7 = 0")
             .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    t.delete("o_orderkey % 31 = 0", use_delta=True)
    return t


@pytest.mark.parametrize("seed", [401, 503])
def test_random_predicates_exact_on_mor(spark, mor_tbl, seed):
    rng = random.Random(seed)
    full = mor_tbl.to_df()
    for i in range(20):
        p = " AND ".join(_rand_pred(rng)
                         for _ in range(rng.choice([1, 1, 2])))
        got = mor_tbl.to_df(where=p).count()
        want = full.filter(p).count()
        assert got == want, f"seed={seed} pred #{i}: '{p}' {got} != {want}"
