#!/usr/bin/env python
"""Extra per-query benchmarks (guide §1.4 noop-sink isolation).

NOT part of the frozen driver contract (bench.py is the driver's timed
entry point); this harness exists for optimization-round evidence:

  python bench_extra.py --sf /root/testdata/sf1.0 --queries dedup_embedding_cosine \
      --runs 3 --plans plans/r06 --suffix before

Per query it times N noop-sink runs of the catalog implementation, prints a
JSON line {"sf": ..., "queries": {name: [runs...]}, ...}, and (with --plans)
writes the physical plan to <plans>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="", help="comma-separated names; default = bench.py list")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--plans", default="", help="directory to write explain('formatted') plans into")
    ap.add_argument("--suffix", default="before", help="plan file suffix: <query>_<suffix>.txt")
    args = ap.parse_args()

    from symspark.plans import queries as Q
    from symspark.session import get_spark
    from bench import BENCH_QUERIES, multicore_calibration

    names = [n for n in args.queries.split(",") if n] or list(BENCH_QUERIES)
    spark = get_spark(app_name="symspark-bench-extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    if any(n.startswith("pipeline_") for n in names):
        Q.prepare(args.sf)

    out = {"sf": os.path.basename(os.path.normpath(args.sf)), "cpus": args.cpus,
           "probe_before": multicore_calibration(), "queries": {}, "probes": {}}
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    for name in names:
        fn = Q.SPARK_QUERIES[name]
        if args.plans:
            df = fn(spark, args.sf)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out["queries"][name] = runs
        out["probes"][name] = multicore_calibration()
        print(f"[bench_extra] {name}: {runs} (probe {out['probes'][name]})", file=sys.stderr, flush=True)
    Q.release_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
