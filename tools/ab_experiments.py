"""A/B experiments for round-15 optimization candidates (guide §1).

Each experiment times the CURRENT implementation against a candidate
variant on the bench session at $SPARK_GRAFT_SF_DIR, using the bench's
timed action (.count()) after a warm-up, and FIRST verifies the
variant returns the identical result set (collected, sorted compare).

Diagnostic-only tool; nothing here ships into query paths.
Usage: python tools/ab_experiments.py [exp ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

from pyspark.sql import Column, DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def same_rows(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(str, a.collect()))
    rb = sorted(map(str, b.collect()))
    if ra != rb:
        for x, y in zip(ra, rb):
            if x != y:
                print("  DIFF:", x, "!=", y)
                break
        print(f"  rows: {len(ra)} vs {len(rb)}")
    return ra == rb


def timeit(mk, warm: int = 1) -> float:
    for _ in range(warm):
        mk().count()
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        mk().count()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


# ---------------------------------------------------------------- exp 1
def exp_text_quality(spark) -> None:
    """quality_features: explode+groupBy+join vs zero-shuffle array
    expressions in one projection."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.functions import text as text_fns
    from ts_data_pipeline_spark.functions.text import STOPWORDS

    def variant(docs: DataFrame, text_col: str = "text") -> DataFrame:
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
        )
        stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
        n_tokens = F.size(toks)
        tok_lens = F.transform(toks, lambda t: F.length(t))
        sum_len = F.aggregate(
            tok_lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        )
        stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        out = docs.select(
            "doc_id",
            toks.alias("_toks"),
            F.md5(F.col(text_col)).alias("fingerprint"),
            F.round(
                (
                    F.length(text_col)
                    - F.length(F.regexp_replace(F.col(text_col), "[aeiou]", ""))
                )
                / F.length(text_col),
                4,
            ).alias("vowel_ratio"),
        ).filter(F.size("_toks") > 0).select(
            "doc_id",
            F.size("_toks").alias("n_tokens"),
            F.size(F.array_distinct("_toks")).alias("n_distinct_tokens"),
            F.round(
                F.aggregate(
                    F.transform(F.col("_toks"), lambda t: F.length(t).cast("bigint")),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x,
                )
                / F.size("_toks"),
                4,
            ).alias("avg_token_len"),
            F.size(
                F.filter(F.col("_toks"), lambda t: F.array_contains(stop_arr, t))
            ).alias("_stop_cnt"),
            "fingerprint",
            "vowel_ratio",
        )
        stop_ratio = F.round(F.col("_stop_cnt") / F.col("n_tokens"), 4)
        quality = F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.lit(0.01) * F.col("n_tokens")
                        + F.lit(5.0) * stop_ratio
                        - F.lit(2.0)
                    )
                )
            ),
            4,
        )
        return out.select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "avg_token_len",
            stop_ratio.alias("stop_ratio"),
            "vowel_ratio",
            quality.alias("quality_score"),
            F.when(stop_ratio > 0.05, F.lit("en"))
            .otherwise(F.lit("other"))
            .alias("lang_guess"),
            "fingerprint",
        )

    docs = io.load(spark, SF_DIR, "documents")
    cur = lambda: text_fns.quality_features(io.load(spark, SF_DIR, "documents"))
    var = lambda: variant(io.load(spark, SF_DIR, "documents"))
    ok = same_rows(cur(), var())
    print(f"text_quality identical={ok}")
    if ok:
        print(f"  current: {timeit(cur):.3f}s  variant: {timeit(var):.3f}s")


# ---------------------------------------------------------------- exp 2
def exp_dot_unrolled(spark) -> None:
    """ann brute: fold dot vs unrolled fixed-dim sum (codegen)."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS

    DIM = 64

    def dotu(a: Column, b: Column) -> Column:
        out = F.get(a, 0) * F.get(b, 0)
        for i in range(1, DIM):
            out = out + F.get(a, i) * F.get(b, i)
        return out

    def variant() -> DataFrame:
        embeddings = io.load(spark, SF_DIR, "embeddings")
        id_col, vec_col, k = "vec_id", "embedding", 10
        q = embeddings.filter(F.col(id_col).isin(ANN_QUERY_IDS)).select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.sqrt(dotu(F.col("v"), F.col("v"))).alias("qn"),
        )
        c = embeddings.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("v"),
        ).select(
            F.col(id_col).alias("cand_id"),
            F.col("v").alias("cv"),
            F.sqrt(dotu(F.col("v"), F.col("v"))).alias("cn"),
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id",
                "cand_id",
                F.round(
                    dotu(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
                ).alias("cos_sim"),
            )
            .repartition("query_id")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("cand_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "cos_sim", "rank")
        )

    cur = lambda: similarity.brute_force_topk(
        io.load(spark, SF_DIR, "embeddings"), ANN_QUERY_IDS, k=10
    )
    ok = same_rows(cur(), variant())
    print(f"dot_unrolled identical={ok}")
    if ok:
        print(f"  current: {timeit(cur):.3f}s  variant: {timeit(variant):.3f}s")


# ---------------------------------------------------------------- exp 3
def exp_minhash_sig(spark) -> None:
    """minhash: transform+array_min per perm vs aggregate fold min."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import dedup
    from ts_data_pipeline_spark.operators.dedup import (
        _MH_PRIME,
        _U32_MD5_SPARK,
        _minhash_perms,
    )
    from ts_data_pipeline_spark.operators.dedup import shingles_col

    docs = io.load(spark, SF_DIR, "documents")
    n, num_hashes = 3, 32

    base = docs.select(
        "doc_id", F.array_distinct(shingles_col(n)).alias("sh_arr")
    ).filter(F.size("sh_arr") > 0)
    hs = F.expr(
        "transform(sh_arr, s -> " + _U32_MD5_SPARK.format(x="s") + ")"
    )

    def mk_current() -> DataFrame:
        return base.select(
            "doc_id",
            hs.alias("hs"),
        ).select(
            "doc_id",
            *[
                F.array_min(
                    F.expr(
                        f"transform(hs, h -> (h * {a}L + {b}L) % {_MH_PRIME}L)"
                    )
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(_minhash_perms(num_hashes))
            ],
        )

    def mk_variant() -> DataFrame:
        return base.select(
            "doc_id",
            hs.alias("hs"),
        ).select(
            "doc_id",
            *[
                F.expr(
                    f"aggregate(hs, {_MH_PRIME}L, "
                    f"(acc, h) -> least(acc, (h * {a}L + {b}L) % {_MH_PRIME}L))"
                ).alias(f"mh{i}")
                for i, (a, b) in enumerate(_minhash_perms(num_hashes))
            ],
        )

    ok = same_rows(mk_current(), mk_variant())
    print(f"minhash_sig identical={ok}")
    if ok:
        print(
            f"  current: {timeit(mk_current):.3f}s"
            f"  variant: {timeit(mk_variant):.3f}s"
        )


# ---------------------------------------------------------------- exp 4
def exp_flagship_cse(spark) -> None:
    """flagship: is get_json_object CSE'd by codegen? Time the current
    projection vs one that parses k once (nondeterministic barrier)."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import trades, window_agg

    def cur() -> DataFrame:
        return window_agg.option_window_agg(
            trades.events_as_option_trades(io.load(spark, SF_DIR, "events"))
        )

    print(f"  flagship current: {timeit(cur):.3f}s")

    # variant: k extracted once in its own projection; json parsed once
    from ts_data_pipeline_spark.operators.trades import BUY_EVENTS, SELL_EVENTS, WHALE

    def variant_trades(events: DataFrame) -> DataFrame:
        pre = events.select(
            F.col("event_id"),
            F.col("user_id"),
            F.col("ts"),
            F.col("value"),
            F.col("event_type"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("_k"),
        )
        return pre.select(
            F.col("event_id").alias("trade_id"),
            F.col("user_id").alias("osym"),
            F.col("ts"),
            F.col("value").alias("premium"),
            ((F.col("_k") % 2) == 0).alias("_is_call"),
            ((F.col("_k") % 10) + 1).alias("qty"),
            F.when(F.col("event_type").isin(*BUY_EVENTS), F.lit("buy"))
            .when(F.col("event_type").isin(*SELL_EVENTS), F.lit("sell"))
            .otherwise(F.lit("no_side"))
            .alias("side"),
        ).withColumn(
            "otype",
            F.when(F.col("_is_call"), F.lit("call")).otherwise(F.lit("put")),
        ).withColumn("whale", F.col("premium") > WHALE).drop("_is_call")

    def var() -> DataFrame:
        return window_agg.option_window_agg(
            variant_trades(io.load(spark, SF_DIR, "events"))
        )

    ok = same_rows(cur(), var())
    print(f"flagship_cse identical={ok}")
    if ok:
        print(f"  variant: {timeit(var):.3f}s")


# ---------------------------------------------------------------- exp 5
def exp_dot_variants(spark) -> None:
    """ann brute: zip_with fold (current) vs index fold over a
    constant-folded sequence (no per-pair product array) vs 4-way
    partially-unrolled index fold (same left-to-right add order, so
    bit-identical floats)."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS

    DIM = 64

    def mk(dot_sql):
        def build() -> DataFrame:
            embeddings = io.load(spark, SF_DIR, "embeddings")
            q = embeddings.filter(F.col("vec_id").isin(ANN_QUERY_IDS)).selectExpr(
                "vec_id AS query_id",
                "CAST(embedding AS array<double>) AS qv",
            ).selectExpr(
                "query_id", "qv",
                f"sqrt({dot_sql.format(a='qv', b='qv')}) AS qn",
            )
            c = embeddings.selectExpr(
                "vec_id AS cand_id",
                "CAST(embedding AS array<double>) AS cv",
            ).selectExpr(
                "cand_id", "cv",
                f"sqrt({dot_sql.format(a='cv', b='cv')}) AS cn",
            )
            scored = (
                c.crossJoin(F.broadcast(q))
                .filter(F.col("cand_id") != F.col("query_id"))
                .selectExpr(
                    "query_id", "cand_id",
                    f"round(({dot_sql.format(a='qv', b='cv')}) / (qn * cn), 6)"
                    " AS cos_sim",
                )
                .repartition("query_id")
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cos_sim").desc(), F.col("cand_id").asc()
            )
            return (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 10)
                .select("query_id", "cand_id", "cos_sim", "rank")
            )
        return build

    zipw = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    ixfold = f"aggregate(sequence(0, {DIM-1}), 0D, (acc, i) -> acc + {{a}}[i] * {{b}}[i])"
    ix4 = (
        f"aggregate(sequence(0, {DIM-1}, 4), 0D, (acc, i) -> "
        "acc + {a}[i] * {b}[i] + {a}[i+1] * {b}[i+1]"
        " + {a}[i+2] * {b}[i+2] + {a}[i+3] * {b}[i+3])"
    )
    cur = lambda: similarity.brute_force_topk(
        io.load(spark, SF_DIR, "embeddings"), ANN_QUERY_IDS, k=10
    )
    for name, v in (("ixfold", mk(ixfold)), ("ix4", mk(ix4)), ("zipw_sql", mk(zipw))):
        ok = same_rows(cur(), v())
        print(f"dot_{name} identical={ok}")
        if ok:
            print(f"  variant {name}: {timeit(v):.3f}s")
    print(f"  current: {timeit(cur):.3f}s")


# ---------------------------------------------------------------- exp 6
def exp_jaccard_barrier(spark) -> None:
    """minhash verify tail: the threshold filter is pushed into the
    verify join's condition, so array_intersect evaluates 2-3x per
    pair. Variant computes i under a shuffle() nondeterminism barrier
    (size is permutation-invariant -> value-identical) so the filter
    stays above the projection and intersect runs once."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import dedup

    n, num_hashes, bands, threshold, max_bucket_size = 3, 32, 8, 0.2, 64
    rows_per_band = num_hashes // bands

    def tail(barrier: bool) -> DataFrame:
        docs = io.load(spark, SF_DIR, "documents")
        base = docs.select(
            "doc_id", F.array_distinct(dedup.shingles_col(n)).alias("sh_arr")
        ).cache().filter(F.size("sh_arr") > 0)
        sig = base.selectExpr(
            "doc_id",
            "transform(sh_arr, s -> "
            + dedup._U32_MD5_SPARK.format(x="s") + ") AS hs",
        ).selectExpr(
            "doc_id",
            *[
                f"aggregate(hs, {dedup._MH_PRIME}L, (acc, h) -> "
                f"least(acc, (h * {a}L + {b}L) % {dedup._MH_PRIME}L)) AS mh{i}"
                for i, (a, b) in enumerate(dedup._minhash_perms(num_hashes))
            ],
        )
        band_hashes = [
            F.expr(
                dedup._U32_MD5_SPARK.format(
                    x="concat_ws('-', "
                    + ", ".join(
                        f"cast(mh{band * rows_per_band + r} as string)"
                        for r in range(rows_per_band)
                    )
                    + ")"
                )
            )
            for band in range(bands)
        ]
        buckets = sig.select(
            "doc_id", F.posexplode(F.array(*band_hashes)).alias("band", "bucket")
        )
        bw = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_bw", F.count(F.lit(1)).over(bw))
            .filter(F.col("_bw") <= max_bucket_size)
            .drop("_bw")
        ).cache()
        cand = (
            buckets.alias("x")
            .join(
                buckets.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
            .distinct()
        )
        a_arr = F.shuffle(F.col("a.sh_arr")) if barrier else F.col("a.sh_arr")
        return (
            cand.join(base.alias("a"), F.col("da") == F.col("a.doc_id"))
            .join(base.alias("b"), F.col("db") == F.col("b.doc_id"))
            .select(
                "da", "db",
                F.size(F.array_intersect(a_arr, F.col("b.sh_arr"))).alias("i"),
                F.size(F.col("a.sh_arr")).alias("ca"),
                F.size(F.col("b.sh_arr")).alias("cb"),
            )
            .select(
                "da", "db",
                F.round(
                    F.col("i") / (F.col("ca") + F.col("cb") - F.col("i")), 4
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    cur = lambda: tail(False)
    var = lambda: tail(True)
    ok = same_rows(cur(), var())
    print(f"jaccard_barrier identical={ok}")
    if ok:
        print(f"  current: {timeit(cur):.3f}s  variant: {timeit(var):.3f}s")


EXPS = {
    "text_quality": exp_text_quality,
    "dot_unrolled": exp_dot_unrolled,
    "minhash_sig": exp_minhash_sig,
    "flagship_cse": exp_flagship_cse,
    "dot_variants": exp_dot_variants,
    "jaccard_barrier": exp_jaccard_barrier,
}


def main() -> None:
    from ts_data_pipeline_spark.session import get_spark

    spark = get_spark("ts-data-pipeline-spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:] or list(EXPS)
    for name in only:
        print(f"== {name} ==")
        EXPS[name](spark)


if __name__ == "__main__":
    main()
