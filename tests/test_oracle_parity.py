"""Oracle-parity harness: every registry query vs DuckDB on the same
parquet — a local mirror of the driver's t2 correctness gate (row count +
schema-width + order-insensitive values).

Runs at sf0.001 for speed; the driver re-checks at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from bd_delete_records_from_external_hive_table_spark import plans
from bd_delete_records_from_external_hive_table_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols, rows):
    """Order-insensitive, column-name-sorted normalization."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(plans.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = plans.REGISTRY[name]
    sdf = spec.spark_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(spec.oracle)
    duck_cols = res.columns
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == \
           sorted(c.lower() for c in duck_cols), \
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    assert _norm_rows(spark_cols, spark_rows) == \
           _norm_rows(duck_cols, duck_rows), f"{name}: value mismatch"


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["d", "c"]
    # every queries() key with an oracle is a subset of queries()
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10
