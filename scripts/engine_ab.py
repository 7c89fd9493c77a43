#!/usr/bin/env python
"""Same-window A/B of the two parse engines at one parallelism level.

    python scripts/engine_ab.py 8     # local[8]
    python scripts/engine_ab.py 32    # local[32]

Prints one JSON line: full-pipeline wall seconds (min of 2 warm runs),
GC delta, and turns/s for parse_engine="sql" (JVM expressions) vs "udf"
(Arrow).  Run both levels back-to-back for an engine-scaling comparison
that shares one host-noise window.

Round-3 measurements on the sandbox host (9.6M turns, 16x-replicated
sf0.1 fixtures; recorded in BASELINE.md "round 3" section):

    {"cpus": 8,  "n": 9600000, "sql": {"sec": 367.0, "tput": 26161},
                               "udf": {"sec": 260.6, "tput": 36839}}
    {"cpus": 32, "n": 9600000, "sql": {"sec": 138.6, "tput": 69259},
                               "udf": {"sec": 148.9, "tput": 64458}}

-> sql efficiency 0.66, udf 0.44: the JVM engine wins at 32 cores and
scales better (the round-2 Python-oversubscription diagnosis), while the
residual sub-linearity is the single-socket memory-bandwidth ceiling
(bench.bandwidth_probe: ~113 GB/s at 8 workers, ~183 GB/s at 32).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(cpus: int) -> dict:
    from symspark.config import PipelineConfig
    from symspark.pipeline import load_lookups, prepare_dims, run_pipeline
    from symspark.plans.queries import transcripts_dir
    from symspark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    tdir = transcripts_dir(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    repl = os.path.join(tdir, "transcripts_x16.parquet")
    src = repl if os.path.isdir(repl) else os.path.join(tdir, "transcripts.parquet")
    t = spark.read.parquet(src)
    n = t.count()
    lookups = load_lookups(spark, tdir)
    dims = prepare_dims(lookups)

    def gc_ms():
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    out = {"cpus": cpus, "n": n}
    for engine in ("sql", "udf"):
        cfg = PipelineConfig(parse_engine=engine)
        enr = run_pipeline(t, lookups, cfg, dims=dims)
        run_pipeline(t.limit(2000), lookups, cfg, dims=dims).write.format("noop").mode(
            "overwrite"
        ).save()
        best, gcd = 1e9, None
        for _ in range(2):
            g0, t0 = gc_ms(), time.perf_counter()
            enr.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if el < best:
                best, gcd = el, gc_ms() - g0
        out[engine] = {"sec": round(best, 1), "gc_ms": gcd, "tput": round(n / best)}
    return out


if __name__ == "__main__":
    print(json.dumps(main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)))
