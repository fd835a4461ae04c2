"""Per-query phase profiler for the headline set (guide §1).

For each headline query, measures separately:
  - build_s: Python-side DataFrame construction (registry fn call)
  - plan_s: analysis + optimization + physical planning (touch
    queryExecution().executedPlan without executing)
  - exec_count_s: the bench's timed action (.count()) on a fresh df
  - exec_noop_s: noop-sink execution (computes every column, §1.4)

Each phase is measured RUNS times on fresh DataFrames after one
warm-up; medians are printed as one JSON line per query. This is a
diagnostic tool — bench.py's methodology is unchanged.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    import bench

    from ts_data_pipeline_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("ts-data-pipeline-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    resolved = bench._resolve()
    for name, fn in resolved.items():
        if only and name not in only:
            continue
        try:
            fn(spark, SF_DIR).count()  # warm: caches, codegen, JIT
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            continue
        phases: dict[str, list[float]] = {
            "build_s": [], "plan_s": [], "exec_count_s": [], "exec_noop_s": []
        }
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            phases["build_s"].append(t1 - t0)
            phases["plan_s"].append(t2 - t1)

            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            phases["exec_count_s"].append(time.perf_counter() - t0)

            df2 = fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df2.write.format("noop").mode("overwrite").save()
            phases["exec_noop_s"].append(time.perf_counter() - t0)
        out = {"query": name}
        for k, v in phases.items():
            out[k] = round(statistics.median(v), 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
