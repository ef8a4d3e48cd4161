"""Ad-hoc driver-faithful parity harness: run named registry queries
against their DuckDB oracles at an arbitrary SF dir — the '/tmp/check
harness' PARITY.md's per-wave entries refer to, now committed so every
round's sweep is reproducible.

Usage:
  python tools/check_parity.py <sf_dir> [name1,name2,... | sentinel]

With no names, checks every oracle-bearing registry query; the literal
``sentinel`` selects the FIXED sentinel panel below. Prints one line
per query (rows + match) and exits non-zero on any mismatch.
Comparison mirrors tests/test_oracle_parity.py: pandas-converted
values, column-name-sorted, order-insensitive, type-sensitive cells.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bd_delete_records_from_external_hive_table_spark import plans  # noqa: E402
from bd_delete_records_from_external_hive_table_spark.session import SessionFactory  # noqa: E402
from bd_delete_records_from_external_hive_table_spark.sources.tables import TABLES  # noqa: E402

#: Round-12 (r11 verdict Next-round #7): the driver's per-round
#: correctness sample is ~50 of 219 queries and consecutive rounds'
#: samples can be DISJOINT, so round-over-round "newly failing" is
#: structurally unmeasurable for most queries. This FIXED sentinel
#: panel — the profiled heavy composites every optimization round
#: touches, plus the 10 reference-anchor q-queries — is swept at every
#: change wave (``check_parity.py <sf> sentinel``) and the result
#: recorded in PARITY.md's sentinel table, so the blind spot is closed
#: by the builder's own committed evidence. Oracle-bearing names only
#: (rows-only heavies — ml01/t15/e09 — are covered by their parity
#: tests in tests/).
SENTINEL = [
    "d04_minhash_lsh_neardup", "d15_fuzzy_dedup_survivors",
    "d16_fuzzy_decontamination", "d17_prefix_filter_jaccard",
    "d18_minhash_calibration", "d19_dup_span_coverage",
    "d20_lsh_planted_recall", "g01_triangle_count",
    "g03_dup_graph_assortativity", "ml02_naive_bayes_source",
    "ml03_kmeans_training", "p02_data_profile", "t22_duplication_profile",
    "t23_bigram_ce_filter",
    "q01_scan_count", "q02_time_window", "q03_conjunctive_criteria",
    "q04_retention_complement", "q05_in_list_filter",
    "q06_affected_partition_probe", "q07_delete_retain_complement",
    "q08_ordered_projection", "q09_count_reconciliation",
    "q10_per_partition_counts",
]


def _norm(pdf):
    import datetime as dt
    import decimal
    import math

    import numpy as np
    import pandas as pd

    def cell(v):
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
        if isinstance(v, dt.datetime):
            return v.isoformat()
        if isinstance(v, dt.date):
            return dt.datetime(v.year, v.month, v.day).isoformat()
        if isinstance(v, (bytes, bytearray)):
            return "0x" + bytes(v).hex()
        if isinstance(v, (list, tuple, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, decimal.Decimal):
            return f"dec:{v}"
        return str(v)

    cols = sorted(pdf.columns, key=lambda c: c.lower())
    return sorted(tuple(cell(v) for v in row)
                  for row in pdf[cols].itertuples(index=False, name=None))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if len(sys.argv) > 2:
        names = (list(SENTINEL) if sys.argv[2] == "sentinel"
                 else sys.argv[2].split(","))
    else:
        names = sorted(plans.oracle_sql())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    spark = SessionFactory.create(app_name="check-parity",
                                  master="local[8]",
                                  shuffle_partitions=8)
    bad = []
    try:
        for name in names:
            spec = plans.REGISTRY[name]
            if spec.oracle is None:
                print(f"{name}: SKIP (rows-only)")
                continue
            s = _norm(spec.spark_fn(spark, sf_dir).toPandas())
            d = _norm(con.sql(spec.oracle).df())
            ok = s == d
            print(f"{name}: rows {len(s)} vs {len(d)} "
                  f"{'MATCH' if ok else 'MISMATCH'}")
            if not ok:
                bad.append(name)
                for a, b in [(a, b) for a, b in zip(s, d) if a != b][:3]:
                    print(f"  spark={a}\n  duck ={b}")
    finally:
        spark.stop()
    if bad:
        print("MISMATCHES:", ",".join(bad))
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
