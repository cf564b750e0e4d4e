#!/usr/bin/env python
"""r12 optimization tooling: decompose a catalog query's cost into
plan-BUILD time (the run() call: py4j DataFrame construction + any
driver-side collects the runner performs) vs EXECUTION time (the timed
action over an already-built DataFrame), labeled per query (guide
§1.5). The bench's count() number is build + first execution; this
separates them so the per-query fixed-overhead floor (VERDICT r11 item
2) can be attributed.

Usage:
    python tools_r12_decompose.py [-n REPS] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributedvectordatabase_spark.catalog import build_catalog
from distributedvectordatabase_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r12-decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = build_catalog()
    cat["lsh_buckets"].run(spark, sf_dir).count()
    spark.range(int(cpus)).mapInPandas(lambda it: it, schema="id long").count()
    for name in args:
        run = cat[name].run
        builds, execs = [], []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}[build] rep{i}")
            t0 = time.perf_counter()
            df = run(spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}[count] rep{i}")
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        spark.sparkContext.setJobDescription(None)
        builds.sort()
        execs.sort()
        print(
            f"{name:32s} build min={builds[0]:7.3f} med={builds[len(builds)//2]:7.3f}"
            f"  exec min={execs[0]:7.3f} med={execs[len(execs)//2]:7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
