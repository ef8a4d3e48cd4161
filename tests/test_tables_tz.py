"""Driver-timezone independence of load_table's timestamp bounds.

Regression test for the naive-literal bug: ``F.lit(naive datetime)`` is
interpreted by the py4j converter in the driver *OS* timezone, so on a
non-UTC driver the pushed [ts_start, ts_end) pre-filter bounds would
shift by the UTC offset and silently drop in-range rows. The bounds are
now built from epoch micros (``timestamp_micros``), which depends only
on the pinned UTC session timezone. Each timezone runs in its own
subprocess because both the Python tz machinery (time.mktime) and the
JVM default zone latch at startup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_SCRIPT = """
import json
from datetime import datetime
from bd_delete_records_from_external_hive_table_spark.session import SessionFactory
from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
spark = SessionFactory.create(app_name="tz-probe", master="local[2]",
                              shuffle_partitions=2)
n = load_table(spark, "/root/testdata/sf0.001", "events",
               ts_start=datetime(2024, 1, 10),
               ts_end=datetime(2024, 1, 20)).count()
print("RESULT" + json.dumps({"n": n}))
spark.stop()
"""


def _count_in_tz(tz: str) -> int:
    env = dict(os.environ, TZ=tz)
    out = subprocess.run([sys.executable, "-c", _SCRIPT],
                         capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))),
                         timeout=300)
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, f"no RESULT line in TZ={tz}:\n{out.stdout}\n{out.stderr}"
    return json.loads(lines[-1][len("RESULT"):])["n"]


def test_ts_bounds_reach_parquet_pushed_filters(spark, sf_dir):
    """The type-matched (ntz) bound literals must reach the parquet
    reader as PushedFilters — an ltz literal against an ntz column wraps
    the COLUMN in a cast and loses the row-group skip."""
    from datetime import datetime

    from bd_delete_records_from_external_hive_table_spark.sources.tables import load_table
    df = load_table(spark, sf_dir, "events",
                    ts_start=datetime(2024, 1, 10),
                    ts_end=datetime(2024, 1, 20))
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    line = pushed[0]
    assert ("GreaterThanOrEqual(ts" in line and "LessThan(ts" in line), line


def test_ts_bounds_independent_of_driver_os_timezone():
    n_utc = _count_in_tz("UTC")
    n_east = _count_in_tz("America/New_York")   # UTC-5: bounds would shift late
    n_west = _count_in_tz("Asia/Tokyo")         # UTC+9: bounds would shift early
    assert n_utc > 0
    assert n_east == n_utc, (n_east, n_utc)
    assert n_west == n_utc, (n_west, n_utc)
