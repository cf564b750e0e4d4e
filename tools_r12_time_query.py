#!/usr/bin/env python
"""r12 optimization tooling: time individual catalog queries in
isolation with the noop sink (guide §1.4) AND the bench's count()
action, labeled per query (guide §1.5).

Usage:
    python tools_r12_time_query.py [-n REPS] query [query ...]
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
        app_name="r12-time",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = build_catalog()
    # warmup: same as bench.py
    cat["lsh_buckets"].run(spark, sf_dir).count()
    spark.range(int(cpus)).mapInPandas(lambda it: it, schema="id long").count()
    for name in args:
        run = cat[name].run
        for action, label in (("count", "count"), ("noop", "noop")):
            times = []
            for i in range(reps):
                spark.sparkContext.setJobDescription(f"{name}[{label}] rep{i}")
                t0 = time.perf_counter()
                df = run(spark, sf_dir)
                if action == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            times.sort()
            print(
                f"{name:32s} {label:6s} min={times[0]:7.3f} "
                f"med={times[len(times) // 2]:7.3f} max={times[-1]:7.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
