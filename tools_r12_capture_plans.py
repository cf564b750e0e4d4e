#!/usr/bin/env python
"""r12 optimization tooling: capture .explain('formatted') for bench
queries into plans/r12/<query>_<tag>.txt, and summarize plan shape
(Exchange count, join strategies, Python eval nodes, PushedFilters).

Usage:
    python tools_r12_capture_plans.py before [query ...]
    python tools_r12_capture_plans.py after  [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from distributedvectordatabase_spark.catalog import build_catalog
from distributedvectordatabase_spark.session import get_spark


def capture(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    py = re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan)
    from collections import Counter

    return (
        f"exchanges={n_ex} joins={dict(Counter(joins))} "
        f"python={dict(Counter(py))}"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12-plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    cat = build_catalog()
    import bench

    if not names:
        names = list(bench.HEADLINE) + [n for n in bench.EXTRA if n in cat]
    out_dir = Path(__file__).resolve().parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = cat[name].run(spark, sf_dir)
            plan = capture(df)
        except Exception as e:  # pragma: no cover - tooling
            print(f"{name}: ERROR {e}")
            continue
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
