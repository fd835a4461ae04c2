"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Runs on local[$SPARK_GRAFT_CPUS] (default 32). Each query is timed
end-to-end (plan + execute + count) after a warm-up of the session;
value = total seconds across headline queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from ts_data_pipeline_spark import registry  # noqa: E402
from ts_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: curated, scale-sensitive queries. Extended as
# operators land; every name must exist in the registry.
HEADLINE = [
    "flagship_option_window_agg",
]


def main() -> None:
    spark = get_spark("ts-data-pipeline-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]
    # Warm the JVM + parquet footer caches with a trivial action.
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
