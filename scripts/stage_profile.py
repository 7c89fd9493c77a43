#!/usr/bin/env python
"""Two timed pipeline runs at local[N] with per-run stage attribution via
the UI REST API. Prints stage deltas (runtime/cpu/gc) for each run."""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SYMSPARK_UI", "true")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SYMSPARK_BENCH_REPLICATE", "2"))

from symspark.plans import queries as Q
from symspark.pipeline import load_lookups, prepare_dims, run_pipeline
from symspark.session import get_spark


def stages():
    url = "http://127.0.0.1:4040/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=20))
    sid = apps[0]["id"]
    st = json.load(urllib.request.urlopen(f"{url}/{sid}/stages?status=complete", timeout=30))
    return {
        s["stageId"]: (
            s["numCompleteTasks"],
            round(s.get("executorRunTime", 0) / 1000, 1),
            round(s.get("executorCpuTime", 0) / 1e9, 1),
            round(s.get("jvmGcTime", 0) / 1000, 1),
        )
        for s in st
    }


def main():
    spark = get_spark(app_name="stage-prof", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    tdir = Q.transcripts_dir(SF_DIR)
    src = os.path.join(tdir, f"transcripts_x{REPL}.parquet" if REPL > 1 else "transcripts.parquet")
    t = spark.read.parquet(src)
    lookups = load_lookups(spark, tdir)
    n = t.count()
    dims = prepare_dims(lookups)
    enriched = run_pipeline(t, lookups, dims=dims)
    enriched.limit(2000).write.format("noop").mode("overwrite").save()
    for run in (1, 2):
        before = stages()
        t0 = time.perf_counter()
        enriched.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        after = stages()
        new = {k: v for k, v in after.items() if k not in before}
        print(f"--- run {run}: wall {wall}s  tput {round(n / wall, 1)}")
        for k, (tasks, rt, cpu, gc) in sorted(new.items(), key=lambda kv: -kv[1][1]):
            print(f"  stage {k}: tasks={tasks} runtime={rt}s cpu={cpu}s gc={gc}s")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
