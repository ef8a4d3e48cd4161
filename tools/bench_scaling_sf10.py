"""Second-decade scaling datapoint: sf1 → sf10 warm ratios for the
queries with the worst sf0.1→sf1 ratios.

One decade of growth (tools/bench_scaling.py) can hide a quadratic
behind a large constant; the round-4 verdict asked for a second decade
on the ~15 worst scalers (a26's basket² bound at 5.91× being the most
likely to break) plus the bucketed-join canaries (d04/e01/n02) whose
LSH/bucket sizing is exactly what corpus growth stresses.

Data: /tmp/sf10 from ``SPARK_GRAFT_SF_SRC=/root/testdata/sf0.1
SPARK_GRAFT_SF1_DIR=/tmp/sf10 python tools/make_sf1.py 100``. Note one
deliberate skew: embedding replicas rotate by k positions and dim=64,
so replicas k≥64 are EXACT duplicate vectors of rotation k−64 (~36% of
the corpus) — a bucket-occupancy worst case for the ANN canaries, kept
because near-dup-heavy corpora are the scenario LSH sizing must
survive.

Protocol identical to bench_scaling.py (same _run_at: bench.py warmup +
cold/warm timing, checkpointed state for shell-timeout resume); flags
confirmed min-of-3 before they stand. Merges into BENCH_DETAIL.json
under ``sf10_scaling``. Run SOLO.

Heap: run with ``SPARK_GRAFT_DRIVER_MEM=48g`` — the session default
(8g) OOM'd at sf10 (60M-row lineitem shuffles across 32 in-JVM
executor threads); the host has 125 GiB, and a real cluster sizes
executor heap per core anyway.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/bench_scaling_sf10.py [names=a,b,c]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import OUTPUT_HEAVY, _run_at  # noqa: E402  (tools/ sibling import)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")
DATA_FACTOR = 10.0
STATE = "/tmp/bench_scaling_sf10_state.json"

#: the 9 worst sf0.1→sf1 warm ratios (r4 table) + the bucketed-join
#: canaries whose candidate generation corpus growth stresses.
DEFAULT_NAMES = [
    "f08_from_json", "t11_boilerplate_ngrams", "st03_session_window",
    "u04_except_all", "a26_frequent_pairs", "t14_unigram_surprisal",
    "e06_matryoshka_ablation", "a28_heavy_hitters", "j12_tpch_q10_shape",
    "d04_minhash_lsh_neardup", "e01_embedding_neardup", "n02_ann_lsh_topk",
]


def _min_of_3(names: list[str]) -> dict[str, dict[str, float]]:
    import time

    from bd_delete_records_from_external_hive_table_spark import plans
    from bd_delete_records_from_external_hive_table_spark.session import SessionFactory
    from bench import warmup

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out: dict[str, dict[str, float]] = {}
    for key, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        spark = SessionFactory.create(
            app_name=f"bd-sf10-confirm-{key}", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus))
        out[key] = {}
        try:
            warmup(spark, sf_dir)
            for name in names:
                times = []
                for _ in range(4):
                    # spark_fn INSIDE the window (eager training /
                    # component-iteration phases run at plan build;
                    # see bench_canary_sf30.py)
                    t0 = time.perf_counter()
                    df = plans.REGISTRY[name].spark_fn(spark, sf_dir)
                    if name in OUTPUT_HEAVY:
                        df.write.format("noop").mode("overwrite").save()
                    else:
                        df.collect()
                    times.append(time.perf_counter() - t0)
                out[key][name] = round(min(times[1:]), 4)
        finally:
            spark.stop()
    return out


def main(names: list[str]) -> None:
    if not os.path.exists(os.path.join(SF10, "lineitem.parquet")):
        sys.exit(f"{SF10} missing — run make_sf1.py 100 first (see docstring)")
    load0 = os.getloadavg()[0]
    state: dict = {}
    if os.path.exists(STATE):
        with open(STATE) as f:
            state = json.load(f)

    def _half(key: str, sf_dir: str) -> None:
        done = state.get(key, {})
        if set(names) <= set(done):
            return

        def save(out):
            state[key] = out
            with open(STATE, "w") as f:
                json.dump(state, f)

        state[key] = _run_at(sf_dir, names, done, save)
        save(state[key])

    _half("sf1", SF1)
    _half("sf10", SF10)
    from bd_delete_records_from_external_hive_table_spark.plans import FIXED_INPUT

    r1, r10 = state["sf1"], state["sf10"]
    scaling = {}
    for name in names:
        w1, w10 = r1[name]["warm"], r10[name]["warm"]
        scaling[name] = {
            "sf1_cold": r1[name]["cold"], "sf1_warm": w1,
            "sf10_cold": r10[name]["cold"], "sf10_warm": w10,
            "warm_ratio": round(w10 / w1, 2) if w1 else None,
            "superlinear": bool(w1 and w10 / w1 > DATA_FACTOR),
        }
        # output-cardinality columns (see bench_scaling.py): queries
        # whose result grows faster than the data self-adjudicate via
        # wall-per-output-row instead of standing as superlinear flags
        if r1[name].get("noop_sink"):
            scaling[name]["noop_sink"] = True
        ro1 = r1[name].get("rows_out")
        ro10 = r10[name].get("rows_out")
        if ro1 is not None and ro10 is not None:
            scaling[name]["rows_out_sf1"] = ro1
            scaling[name]["rows_out_sf10"] = ro10
            if ro1 and ro10 and w1 and w10:
                rr = ro10 / ro1
                scaling[name]["rows_out_ratio"] = round(rr, 2)
                per_row = (w10 / ro10) / (w1 / ro1)
                scaling[name]["warm_per_row_ratio"] = round(per_row, 2)
                if rr > DATA_FACTOR and per_row <= DATA_FACTOR:
                    # wall ratio measures result size, not plan shape
                    # (see bench_scaling.py) — superlinear means
                    # superlinear COMPUTE
                    scaling[name]["output_bound"] = True
                    scaling[name]["superlinear"] = False
        if name in FIXED_INPUT:
            scaling[name]["fixed_input"] = FIXED_INPUT[name]
    flagged = [n for n, s in scaling.items() if s["superlinear"]]
    if flagged:
        confirmed = _min_of_3(flagged)
        for name in flagged:
            c1, c10 = confirmed["sf1"][name], confirmed["sf10"][name]
            scaling[name].update({
                "confirmed_sf1_warm": c1, "confirmed_sf10_warm": c10,
                "warm_ratio": round(c10 / c1, 2) if c1 else None,
                "superlinear": bool(c1 and c10 / c1 > DATA_FACTOR),
            })
    result = {
        "data_factor": DATA_FACTOR,
        "loadavg_start": round(load0, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "queries": scaling,
    }
    path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(path) as f:
        detail = json.load(f)
    if isinstance(detail.get("sf10_scaling"), dict):
        detail["sf10_scaling"]["queries"].update(scaling)
        # both load fields describe the LATEST measuring run
        detail["sf10_scaling"]["loadavg_start"] = result["loadavg_start"]
        detail["sf10_scaling"]["loadavg_end"] = result["loadavg_end"]
    else:
        detail["sf10_scaling"] = result
    with open(path, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({
        "sf10_flags": [n for n, s in scaling.items() if s["superlinear"]],
        "worst": dict(sorted(((n, s["warm_ratio"]) for n, s in
                              scaling.items()),
                             key=lambda kv: -(kv[1] or 0))[:5]),
    }))


if __name__ == "__main__":
    bad = [a for a in sys.argv[1:] if not a.startswith("names=")]
    if bad:
        # bare names used to SILENTLY run the default trio instead
        # (round-10 verdict What's-wrong #4) — fail loudly
        sys.exit(f"usage: bench_scaling_sf10.py [names=a,b,c] — "
                 f"unrecognized args {bad}")
    arg = [a for a in sys.argv[1:] if a.startswith("names=")]
    main(arg[0][6:].split(",") if arg else DEFAULT_NAMES)
