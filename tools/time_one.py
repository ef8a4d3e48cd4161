"""Round-11 measurement harness: isolate named registry queries — time
them min-of-N in ONE fresh JVM (bench-identical session + warmup) and
optionally dump .explain("formatted") to plans/<dir>/<name>_<tag>.txt.

Usage:
  python tools/time_one.py --names d17_prefix_filter_jaccard[,...]
      [--n 3] [--plan-tag before] [--plan-dir r12]
      [--sf-dir /root/testdata/sf0.1]

Timing protocol matches bench.py's time_query (collect(), cold then
warm), so isolated numbers are comparable with BENCH_DETAIL rows; the
quiet gate is bench.wait_for_quiet_host() and the run records whole-run
cpu_steal, so every printed number self-adjudicates.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bd_delete_records_from_external_hive_table_spark import plans  # noqa: E402
from bd_delete_records_from_external_hive_table_spark.session import SessionFactory  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plan-tag", default=None,
                    help="write plans/<dir>/<name>_<tag>.txt explain output")
    ap.add_argument("--plan-dir", default="r12",
                    help="subdirectory of plans/ for --plan-tag dumps")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--no-gate", action="store_true")
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    for n in names:
        if n not in plans.REGISTRY:
            print(f"unknown query: {n}", file=sys.stderr)
            return 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = SessionFactory.create(
        app_name="r11-time-one", master=f"local[{cpus}]",
        shuffle_partitions=(int(cpus) if cpus.isdigit()
                            else (os.cpu_count() or 8)))
    gate = None if args.no_gate else bench.wait_for_quiet_host()
    ticks0 = bench._cpu_ticks()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", args.plan_dir)
    try:
        bench.warmup(spark, args.sf_dir)
        out = {}
        for name in names:
            spec = plans.REGISTRY[name]
            if args.plan_tag:
                os.makedirs(plan_dir, exist_ok=True)
                df = spec.spark_fn(spark, args.sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                with open(os.path.join(
                        plan_dir, f"{name}_{args.plan_tag}.txt"), "w") as f:
                    f.write(txt)
            spark.sparkContext.setJobDescription(f"isolate: {name}")
            samples = []
            for _ in range(max(1, args.n)):
                t0 = time.perf_counter()
                spec.spark_fn(spark, args.sf_dir).collect()
                samples.append(round(time.perf_counter() - t0, 4))
            out[name] = {"cold": samples[0],
                         "min": min(samples),
                         "samples": samples}
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({
            "sf_dir": args.sf_dir,
            "gate": gate,
            "cpu_steal": bench._steal_stats(ticks0, bench._cpu_ticks()),
            "results": out}, indent=1))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
