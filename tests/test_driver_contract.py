"""Mimics the driver's verify: run queries() on Spark and oracle_sql() on
DuckDB over the same sf0.01 parquet, compare row count + schema + values
(order-insensitive, column-name-sorted)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    return val


def _sort_key(row):
    # NULLs are not comparable to values in Python's sort: key each cell by
    # (type-rank, value) so mixed None/int/str columns stay sortable
    return tuple((v is None, str(type(v)), "" if v is None else v) for v in row)


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_normalize(r[i]) for i in idx) for r in rows), key=_sort_key
    )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


# genuinely non-SQL-expressible ops (iterative algorithms): the driver
# records a weaker rows-only check for these; correctness is pytest-anchored
ROWS_ONLY = {"bpe_token_counts", "quality_classifier_scores"}


def test_every_query_has_oracle():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle_sql: {missing}"


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_query_runs(spark, name):
    out = QUERIES[name](spark, SF_DIR)
    assert out.count() > 0 and len(out.columns) >= 2


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    if name not in ORACLES:
        pytest.skip("rows-only query")
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    s = _rows_to_set(spark_cols, spark_rows)
    d = _rows_to_set(duck_cols, duck_rows)
    if s != d:
        diff_s = [r for r in s if r not in d][:5]
        diff_d = [r for r in d if r not in s][:5]
        raise AssertionError(f"value mismatch in {name}:\n spark-only={diff_s}\n duck-only={diff_d}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score", "text"]
