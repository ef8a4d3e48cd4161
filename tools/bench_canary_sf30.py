"""Third-decade canary: one sf10 → sf30 datapoint for the worst
second-decade scalers.

Two decades of sublinear growth (sf0.1→sf1→sf10, tools/bench_scaling*.py)
still leave room for a slow quadratic whose constant hides under the
linear term — d14's gram space and u04's per-key multiplicity growth are
the two plausible candidates the round-5 verdict named. This tool takes
ONE more datapoint at 3× the sf10 data (sf30 = 300 sf0.1-replicas:
180M-row lineitem, 1.5M docs) and flags any query whose warm time grows
by more than the 3× data factor.

Protocol: min-of-3 warm (4 runs, drop the first) per query per SF — the
canary is a point estimate, so it uses the noise-robust confirmation
protocol from bench_scaling directly rather than the single-sample
cold/warm pass. Merges into BENCH_DETAIL.json under ``sf30_canary``.
Run SOLO on a quiet host (loadavg < 1), like every bench.

Usage:
  SPARK_GRAFT_SF1_DIR=/tmp/sf30 python tools/make_sf1.py 300   # ~5 GB
  SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_canary_sf30.py [names=a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")
SF30 = os.environ.get("SPARK_GRAFT_SF30_DIR", "/tmp/sf30")
DATA_FACTOR = 3.0

#: the 3 worst sf1→sf10 warm ratios (round-5 sf10_scaling table)
DEFAULT_NAMES = ["u04_except_all", "d14_repeated_substring_stats",
                 "t11_boilerplate_ngrams"]

#: queries whose OUTPUT grows with SF (sf10_scaling `collect_bound`
#: adjudication): the canary times their computation through a noop
#: sink, because collecting a 17M-row result to the driver measures
#: row serialization, not plan shape — at 100 TB such results go to a
#: sink, never the driver.
NOOP_SINK = {"u04_except_all"}


def _min_warm(names: list[str]) -> dict[str, dict[str, float]]:
    from bench import warmup
    from bd_delete_records_from_external_hive_table_spark import plans
    from bd_delete_records_from_external_hive_table_spark.session import SessionFactory

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out: dict[str, dict[str, float]] = {}
    for key, sf_dir in (("sf10", SF10), ("sf30", SF30)):
        out[key] = {}
        # ONE SESSION PER QUERY: at multi-GB SFs a heavyweight query's
        # session residue (shuffle files, old-gen heap, codegen cache)
        # inflates the NEXT query's wall time — round 7 measured t22 at
        # 138 s after three sf30 heavyweights in a shared session vs
        # ~95 s flat in its own (a 45% phantom). Isolation costs one
        # ~15 s session spin-up per query and makes the point estimate
        # mean what the table says it means.
        for name in names:
            spark = SessionFactory.create(app_name=f"bd-canary-{key}",
                                          master=f"local[{cpus}]",
                                          shuffle_partitions=int(cpus))
            try:
                warmup(spark, sf_dir)
                times = []
                for _ in range(4):
                    # spark_fn INSIDE the window: queries with eager
                    # phases (quantizer training, component iteration
                    # actions) do most of their work during plan
                    # construction — timing collect() alone measured
                    # e09 at 0.42 s where the full pipeline costs ~20 s
                    t0 = time.perf_counter()
                    df = plans.REGISTRY[name].spark_fn(spark, sf_dir)
                    if name in NOOP_SINK:
                        df.write.format("noop").mode("overwrite").save()
                    else:
                        df.collect()
                    times.append(time.perf_counter() - t0)
                rows = plans.REGISTRY[name].spark_fn(spark,
                                                     sf_dir).count()
                out[key][name] = {"warm_min3": round(min(times[1:]), 4),
                                  "rows_out": rows}
            finally:
                spark.stop()
    return out


def main(names: list[str]) -> None:
    if not os.path.exists(os.path.join(SF30, "lineitem.parquet")):
        sys.exit(f"{SF30} missing — run "
                 "SPARK_GRAFT_SF1_DIR=/tmp/sf30 tools/make_sf1.py 300 first")
    load0 = os.getloadavg()[0]
    timed = _min_warm(names)
    canary = {}
    for name in names:
        w10 = timed["sf10"][name]["warm_min3"]
        w30 = timed["sf30"][name]["warm_min3"]
        ro10 = timed["sf10"][name]["rows_out"]
        ro30 = timed["sf30"][name]["rows_out"]
        canary[name] = {
            "sf10_warm_min3": w10, "sf30_warm_min3": w30,
            "warm_ratio": round(w30 / w10, 2) if w10 else None,
            "superlinear": bool(w10 and w30 / w10 > DATA_FACTOR),
            "rows_out_sf10": ro10, "rows_out_sf30": ro30,
        }
        if ro10 and ro30 and w10 and w30:
            rr = ro30 / ro10
            canary[name]["rows_out_ratio"] = round(rr, 2)
            per_row = (w30 / ro30) / (w10 / ro10)
            canary[name]["warm_per_row_ratio"] = round(per_row, 2)
            if rr > DATA_FACTOR and per_row <= DATA_FACTOR:
                # wall ratio measures result size, not plan shape
                canary[name]["output_bound"] = True
                canary[name]["superlinear"] = False
        if name in NOOP_SINK:
            canary[name]["noop_sink"] = True
    result = {
        "data_factor": DATA_FACTOR,
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "queries": canary,
    }
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(path) as f:
        detail = json.load(f)
    if isinstance(detail.get("sf30_canary"), dict):
        detail["sf30_canary"]["queries"].update(canary)
        detail["sf30_canary"]["loadavg_start"] = result["loadavg_start"]
        detail["sf30_canary"]["loadavg_end"] = result["loadavg_end"]
    else:
        detail["sf30_canary"] = result
    with open(path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({
        "sf30_flags": [n for n, s in canary.items() if s["superlinear"]],
        "ratios": {n: s["warm_ratio"] for n, s in canary.items()},
    }))


if __name__ == "__main__":
    bad = [a for a in sys.argv[1:] if not a.startswith("names=")]
    if bad:
        # bare names used to SILENTLY run the default trio instead
        # (round-10 verdict What's-wrong #4) — fail loudly
        sys.exit(f"usage: bench_canary_sf30.py [names=a,b,c] — "
                 f"unrecognized args {bad}")
    arg = [a for a in sys.argv[1:] if a.startswith("names=")]
    main(arg[0][6:].split(",") if arg else DEFAULT_NAMES)
