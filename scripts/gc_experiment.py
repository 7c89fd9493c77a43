#!/usr/bin/env python
"""Controlled local[N] pipeline timing for GC/flag experiments.

Runs warmup + N timed pipeline passes on the replicated sf0.1 input and
prints one JSON line with run times and jstat GC totals.  Drive it with
SYMSPARK_JAVA_OPTS / SPARK_GRAFT_CPUS env vars, one subprocess per config
(JVM flags are session-construction-time).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SYMSPARK_BENCH_RUNS", "2"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPL = int(os.environ.get("SYMSPARK_BENCH_REPLICATE", "8"))

from symspark.plans import queries as Q
from symspark.pipeline import load_lookups, prepare_dims, run_pipeline
from symspark.session import get_spark


def main():
    extra = {}
    for kv in os.environ.get("SYMSPARK_EXTRA_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(app_name="gc-exp", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS, extra_conf=extra)
    tdir = Q.transcripts_dir(SF_DIR)
    src = os.path.join(tdir, "transcripts.parquet")
    if REPL > 1:
        rdir = os.path.join(tdir, f"transcripts_x{REPL}.parquet")
        if not os.path.isdir(rdir):
            os.makedirs(rdir, exist_ok=True)
            for i in range(REPL):
                for name in sorted(os.listdir(src)):
                    if name.endswith(".parquet"):
                        os.link(os.path.join(src, name), os.path.join(rdir, f"r{i:02d}-{name}"))
        src = rdir
    t = spark.read.parquet(src)
    lookups = load_lookups(spark, tdir)
    n = t.count()
    dims = prepare_dims(lookups)
    enriched = run_pipeline(t, lookups, dims=dims)
    enriched.limit(2000).write.format("noop").mode("overwrite").save()  # warmup
    from bench import multicore_calibration

    times, probes = [], []
    best_quiet = None
    for _ in range(RUNS):
        probes.append(multicore_calibration())
        t0 = time.perf_counter()
        enriched.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 2))
        if probes[-1] <= 0.5:
            best_quiet = min(best_quiet or 1e9, times[-1])
    gct = None
    try:
        out = subprocess.run(
            ["jstat", "-gcutil", str(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())],
            capture_output=True, text=True, timeout=20,
        )
        gct = out.stdout.splitlines()[-1].split()[-1]
    except Exception:
        pass
    print(json.dumps({
        "cpus": CPUS, "n_turns": n, "runs": times, "probes": probes,
        "tput": round(n / min(times), 1),
        "tput_quiet": round(n / best_quiet, 1) if best_quiet else None,
        "gct_sec": gct, "java_opts": os.environ.get("SYMSPARK_JAVA_OPTS", ""),
    }))


if __name__ == "__main__":
    main()
