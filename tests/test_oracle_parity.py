"""Differential harness: every declared query vs its duckdb oracle at
sf0.001 — the local twin of the driver's CORRECTNESS gate. Exact value
comparison (no tolerance): the query suites are designed so Spark and
duckdb produce bit-identical values (decimal money sums, rounded
averages, deterministic scalar math)."""

import math

import duckdb
import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _diff_report(a: pd.DataFrame, b: pd.DataFrame) -> str:
    msgs = []
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].fillna(0), b[c].fillna(0)
            d = (av - bv).abs().max()
            if d and not math.isclose(d, 0.0, abs_tol=0.0):
                msgs.append(f"col {c}: max abs diff {d}")
        else:
            neq = (a[c].astype(str) != b[c].astype(str)).sum()
            if neq:
                msgs.append(f"col {c}: {neq} mismatched values")
    return "; ".join(msgs) or "row-level ordering/NaN mismatch"


def _queries():
    from starlake_spark.queries import all_queries

    return all_queries()


QUERY_ITEMS = sorted(_queries().items())


@pytest.mark.parametrize("name", [n for n, (_f, s) in QUERY_ITEMS if s is not None])
def test_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = _queries()[name]
    sdf = fn(spark, sf_dir)
    spark_pdf = _canon(sdf.toPandas())
    duck_pdf = _canon(duck.execute(sql).df())

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: columns {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    try:
        pd.testing.assert_frame_equal(
            spark_pdf, duck_pdf, check_dtype=False, check_exact=True
        )
    except AssertionError:
        raise AssertionError(f"{name}: {_diff_report(spark_pdf, duck_pdf)}")


@pytest.mark.parametrize("name", [n for n, (_f, s) in QUERY_ITEMS if s is None])
def test_rows_only_queries_run(spark, sf_dir, name):
    fn, _ = _queries()[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    keys = set(e.queries())
    oracle_keys = set(e.oracle_sql())
    assert oracle_keys <= keys
