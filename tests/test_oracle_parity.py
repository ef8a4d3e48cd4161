"""Oracle-parity harness: every registry query vs DuckDB on the same
parquet — a local mirror of the driver's t2 correctness gate (row count +
schema-width + order-insensitive values).

Round-3 hardening: the driver hashes PANDAS-converted values (Spark
``toPandas()`` vs DuckDB ``.df()``), where DuckDB DECIMAL/HUGEINT columns
degrade to float64 and drop trailing zeros ('73.0') while Spark keeps
``Decimal('73.00')`` — six round-2 rows went red on exactly this even
though the native row sets were identical. This suite therefore:

1. compares pandas-converted values (same conversion path as the driver),
   so decimal/float drift fails HERE before it burns a driver budget row;
2. asserts the type invariant outright — no oracle-checked query may
   output DECIMAL on the Spark side or DECIMAL/HUGEINT on the DuckDB
   side (final numeric outputs must be DOUBLE or BIGINT on both engines).

Runs at sf0.001 for speed; the driver re-checks at sf0.01 (and
``SPARK_GRAFT_SF_DIR`` points the whole suite at any SF).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb
import numpy as np
import pandas as pd
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
    """Normalize one pandas cell to a comparison string.

    Deliberately type-sensitive for numerics: int 5 → '5', float 5.0 →
    '5.0', Decimal('73.00') → 'dec:73.00' — so a Decimal on one side vs a
    float on the other can NEVER compare equal, mirroring the driver's
    pandas-value hash. Dates normalize to midnight timestamps because
    DuckDB ``.df()`` returns DATE columns as datetime64 while Spark
    ``toPandas()`` yields ``datetime.date`` objects.
    """
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return "<nan>" if math.isnan(f) else repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    # Decimals (and anything else exotic) keep a type tag so silent
    # decimal-vs-float drift cannot round-trip to equality.
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    return str(v)


def _norm_pdf(pdf: pd.DataFrame):
    """Order-insensitive, column-name-sorted normalization of a pandas
    frame — the same shape the driver hashes."""
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    # itertuples, NOT iterrows: iterrows() coerces each row to one common
    # dtype (int64 + uint64 → float64), destroying exactly the type
    # distinctions this harness exists to check.
    rows = [tuple(_norm_cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows)


_BANNED_DUCK = ("DECIMAL", "HUGEINT", "UHUGEINT")

ORACLE_NAMES = sorted(plans.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    from pyspark.sql.types import DecimalType

    spec = plans.REGISTRY[name]
    sdf = spec.spark_fn(spark, sf_dir)

    # Type invariant: final outputs must be DOUBLE/BIGINT, never decimal
    # (pandas conversion of DuckDB decimals → float64 drops trailing
    # zeros and the driver's value hash goes red).
    dec_cols = [f.name for f in sdf.schema.fields
                if isinstance(f.dataType, DecimalType)]
    assert not dec_cols, \
        f"{name}: Spark output has DECIMAL columns {dec_cols} — cast " \
        f"final numerics to DOUBLE (after ROUND) or BIGINT"

    res = duck.sql(spec.oracle)
    bad = [(c, str(t)) for c, t in zip(res.columns, res.types)
           if any(b in str(t).upper() for b in _BANNED_DUCK)]
    assert not bad, \
        f"{name}: oracle output has decimal-class columns {bad} — cast " \
        f"to DOUBLE or BIGINT in the SQL"

    spark_pdf = sdf.toPandas()
    duck_pdf = res.df()

    assert sorted(c.lower() for c in spark_pdf.columns) == \
           sorted(c.lower() for c in duck_pdf.columns), \
        f"{name}: column mismatch {list(spark_pdf.columns)} " \
        f"vs {list(duck_pdf.columns)}"
    assert len(spark_pdf) == len(duck_pdf), \
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    srows, drows = _norm_pdf(spark_pdf), _norm_pdf(duck_pdf)
    if srows != drows:
        diff = [(a, b) for a, b in zip(srows, drows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


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


def test_every_no_oracle_query_has_parity_rationale():
    """Round-11 (r10 verdict item 8): guard the no-oracle perimeter.
    Every registry query shipped without a DuckDB value-oracle must
    carry a documented impossibility rationale in PARITY.md's
    rows-only table — this invariant makes it impossible to silently
    add a rows-only query without saying WHY no oracle can exist.
    The check requires the name inside a markdown table row (not a
    passing mention in a recert log line)."""
    import os

    from bd_delete_records_from_external_hive_table_spark import plans

    parity = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.md")
    with open(parity) as fh:
        table_rows = [l for l in fh if l.startswith("|")]
    missing = [name for name, spec in plans.REGISTRY.items()
               if spec.oracle is None
               and not any(name in row for row in table_rows)]
    assert not missing, (
        f"rows-only queries without a PARITY.md rationale row: {missing} "
        f"— add a '| query | why no oracle | covering invariant |' row "
        f"before shipping")
