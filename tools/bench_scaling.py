"""Measured scaling slope: the 11 headline queries + the composed
recipe at two SFs from the SAME generator (tools/synth_sf.py), with
per-query time ratios (VERDICT r14 ask #1).

Usage:
  python tools/bench_scaling.py <lo_dir> <hi_dir> <lo_sf> <hi_sf> [runs]

Prints ONE JSON line:
  {"metric": "scaling_slope", "lo": {...}, "hi": {...},
   "ratio": {q: hi_sec/lo_sec}, "sf_ratio": N}

Both SF dirs run in ONE session (same JVM/JIT/host draw), headline
queries timed as median of `runs` (default 2) after a session warm-up,
the recipe as a single un-warmed run (same convention as bench.py).
Near-linearity = ratio <= ~1.2x the sf ratio (fixed overheads make
small-SF times look better; a super-linear query names its plan)."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    lo_dir, hi_dir = sys.argv[1], sys.argv[2]
    lo_sf, hi_sf = float(sys.argv[3]), float(sys.argv[4])
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import bench
    from ts_data_pipeline_spark.session import get_spark

    spark = get_spark()
    queries = bench._resolve()

    # recipe config mirroring bench.py's recipe_build_corpus row
    from ts_data_pipeline_spark import io as _io
    from ts_data_pipeline_spark import recipes
    from ts_data_pipeline_spark.queries.llmdata import (
        KMEANS_SEED_IDS,
        RECIPE_DECON_N,
        RECIPE_DECON_THRESHOLD,
        RECIPE_DOMAIN_CAP,
        RECIPE_DOMAIN_MEGA,
    )

    def recipe(sf_dir):
        return recipes.build_training_corpus(
            _io.load(spark, sf_dir, "documents"),
            embeddings=_io.load(spark, sf_dir, "embeddings"),
            semdedup_seeds=KMEANS_SEED_IDS,
            source_cap=5000,
            domain_cap=RECIPE_DOMAIN_CAP * 100,
            domain_quota_mega_threshold=RECIPE_DOMAIN_MEGA,
            html_input=True,
            url_dedup=True,
            line_dedup_max=2,
            charset_input=True,
            decontaminate_n=RECIPE_DECON_N,
            decontaminate_threshold=RECIPE_DECON_THRESHOLD,
        )

    # one session warm-up on the small side (JIT, codegen caches)
    for name, fn in queries.items():
        try:
            fn(spark, lo_dir).count()
        except Exception as exc:
            print(f"# warmup {name}: {exc}", file=sys.stderr)

    out = {"lo": {}, "hi": {}}
    for side, sf_dir in (("lo", lo_dir), ("hi", hi_dir)):
        # Drop every cached relation from the previous SF phase: the
        # first scaling run held both SFs' operator caches (minhash
        # shingles/buckets at lo AND hi) live in one session, and the
        # resulting executor-storage pressure inflated the hi-side
        # medians ~5x for the cache-heavy queries (minhash read
        # 15.8 s in-session vs ~10 s cold-isolated; ann 8.2 vs 1.8).
        # Per-SF cache hygiene makes the ratio measure the QUERY, not
        # the harness's memory footprint.
        spark.catalog.clearCache()
        for name, fn in queries.items():
            try:
                ts = []
                for _ in range(runs):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).count()
                    ts.append(time.perf_counter() - t0)
                out[side][name] = round(statistics.median(ts), 3)
            except Exception as exc:
                print(f"# {side} {name} failed: {exc}", file=sys.stderr)
        try:
            t0 = time.perf_counter()
            recipe(sf_dir).count()
            out[side]["recipe_build_corpus"] = round(
                time.perf_counter() - t0, 3
            )
        except Exception as exc:
            print(f"# {side} recipe failed: {exc}", file=sys.stderr)

    ratio = {
        q: round(out["hi"][q] / out["lo"][q], 2)
        for q in out["hi"]
        if q in out["lo"] and out["lo"][q] > 0
    }
    print(json.dumps({
        "metric": "scaling_slope",
        "lo_dir": lo_dir, "hi_dir": hi_dir,
        "lo_sf": lo_sf, "hi_sf": hi_sf,
        "sf_ratio": hi_sf / lo_sf,
        "runs": runs,
        "lo": out["lo"], "hi": out["hi"], "ratio": ratio,
    }))


if __name__ == "__main__":
    main()
