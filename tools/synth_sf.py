"""Synthesize the ten TESTDATA.md tables at an arbitrary SF.

Usage: python tools/synth_sf.py <sf> <out_dir> [seed]

Writes one parquet directory per table under <out_dir> (the layout
``ts_data_pipeline_spark.io.load`` reads) and prints the row counts.
Used by tools/bench_scaling.py to put a measured number on the
sf1/sf0.1 scaling slope (VERDICT r14 ask #1)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ts_data_pipeline_spark.operators import synth  # noqa: E402
from ts_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    spark = get_spark()
    written = synth.synth_tables(spark, sf, out_dir, seed=seed)
    print(json.dumps({"sf": sf, "out_dir": out_dir, "rows": written}))


if __name__ == "__main__":
    main()
