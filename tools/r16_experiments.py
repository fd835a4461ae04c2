"""A/B experiments for round-16 optimization candidates (guide §1).

Each experiment times the CURRENT implementation against candidate
variants on the bench session at $SPARK_GRAFT_SF_DIR, using the
bench's timed action (.count()) after a warm-up, and FIRST verifies
the variant returns the identical result set (collected, sorted
compare). Interleaved sampling (A,B,A,B,...) so host drift hits both
arms equally.

Diagnostic-only tool; nothing here ships into query paths.
Usage: python tools/r16_experiments.py [exp ...]
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

from pyspark.sql import DataFrame, Window  # noqa: E402
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


def interleaved(variants: dict, runs: int = RUNS) -> dict[str, float]:
    """A,B,C,A,B,C... timing; median per variant."""
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for name, mk in variants.items():  # warm each once
        mk().count()
    for _ in range(runs):
        for name, mk in variants.items():
            t0 = time.perf_counter()
            mk().count()
            samples[name].append(time.perf_counter() - t0)
    out = {}
    for name, ts in samples.items():
        out[name] = round(statistics.median(ts), 3)
        print(f"  {name}: median={out[name]}s "
              f"min={min(ts):.3f} max={max(ts):.3f}")
    return out


# ------------------------------------------------------------- minhash
def _minhash_variant(
    docs: DataFrame,
    verify: str = "current",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Copy of operators/dedup.minhash_lsh_pairs with a parametrized
    verify-join strategy (measurement only; the shipped operator is
    unchanged until an arm wins and is verified)."""
    from ts_data_pipeline_spark.operators.dedup import (
        _MH_PRIME,
        _minhash_perms,
        _U32_MD5_SPARK,
        shingles_col,
    )

    rows_per_band = num_hashes // bands
    base = docs.select(
        "doc_id", F.array_distinct(shingles_col(n)).alias("sh_arr")
    ).cache().filter(F.size("sh_arr") > 0)
    sig = base.selectExpr(
        "doc_id",
        "transform(sh_arr, s -> " + _U32_MD5_SPARK.format(x="s") + ") AS hs",
    ).selectExpr(
        "doc_id",
        *[
            f"aggregate(hs, {_MH_PRIME}L, "
            f"(acc, h) -> least(acc, (h * {a}L + {b}L) % {_MH_PRIME}L)) AS mh{i}"
            for i, (a, b) in enumerate(_minhash_perms(num_hashes))
        ],
    )
    band_hashes = [
        F.expr(
            _U32_MD5_SPARK.format(
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
    if max_bucket_size is not None:
        bw = Window.partitionBy("band", "bucket")
        buckets = (
            buckets.withColumn("_bw", F.count(F.lit(1)).over(bw))
            .filter(F.col("_bw") <= max_bucket_size)
            .drop("_bw")
        )
    buckets = buckets.cache()
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
    if verify == "cand_only":
        return cand
    a_side, b_side = base.alias("a"), base.alias("b")
    cj = cand
    if verify == "bcand":
        cj = F.broadcast(cand)
    elif verify in ("semijoin", "semijoin_bcand"):
        ids = cand.select(
            F.explode(F.array("da", "db")).alias("doc_id")
        ).distinct()
        surv = base.join(F.broadcast(ids), "doc_id", "left_semi")
        a_side, b_side = surv.alias("a"), surv.alias("b")
        if verify == "semijoin_bcand":
            cj = F.broadcast(cand)
    return (
        cj.join(a_side, F.col("da") == F.col("a.doc_id"))
        .join(b_side, F.col("db") == F.col("b.doc_id"))
        .select(
            "da",
            "db",
            F.size(F.array_intersect(F.col("a.sh_arr"), F.col("b.sh_arr"))).alias("i"),
            F.size(F.col("a.sh_arr")).alias("ca"),
            F.size(F.col("b.sh_arr")).alias("cb"),
        )
        .select(
            "da",
            "db",
            F.round(F.col("i") / (F.col("ca") + F.col("cb") - F.col("i")), 4).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def exp_minhash(spark) -> None:
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import dedup

    docs = io.load(spark, SF_DIR, "documents")
    cur = lambda: dedup.minhash_lsh_pairs(docs)  # noqa: E731
    variants = {
        "current": cur,
        "cand_only": lambda: _minhash_variant(docs, "cand_only"),
        "bcand": lambda: _minhash_variant(docs, "bcand"),
        "semijoin": lambda: _minhash_variant(docs, "semijoin"),
        "semijoin_bcand": lambda: _minhash_variant(docs, "semijoin_bcand"),
    }
    print("verify variants vs current result set...")
    for name in ("bcand", "semijoin", "semijoin_bcand"):
        ok = same_rows(cur(), variants[name]())
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            return
    interleaved(variants)


# ------------------------------------------------------ ann barriers
def exp_annbarrier(spark) -> None:
    """Per-vector high-cardinality repartition(id_col) barriers in
    _cell_ranked / kmeans loops: current vs barrier-removed, via
    monkeypatch (VERDICT r15 ask #3)."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity as sim
    from ts_data_pipeline_spark.queries.llmdata import ANN_QUERY_IDS
    from ts_data_pipeline_spark.queries.timeseries import IVF_CENTROID_IDS

    emb = io.load(spark, SF_DIR, "embeddings")

    orig_cell_ranked = sim._cell_ranked

    def cell_ranked_nobarrier(norm, cents, id_col):
        paired = (
            norm.crossJoin(F.broadcast(cents))
            .select(
                id_col,
                "ccid",
                F.round(
                    sim.dot(F.col("v"), F.col("cv")) / (F.col("n") * F.col("cn")), 6
                ).alias("cc"),
            )
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("cc").desc(), F.col("ccid").asc()
        )
        return paired.withColumn("crk", F.row_number().over(w))

    def mk_ivf(nobarrier: bool):
        def run():
            sim._cell_ranked = (
                cell_ranked_nobarrier if nobarrier else orig_cell_ranked
            )
            try:
                return sim.ivf_topk(
                    emb, ANN_QUERY_IDS, IVF_CENTROID_IDS, k=10, nprobe=4
                )
            finally:
                sim._cell_ranked = orig_cell_ranked
        return run

    print("ivf_topk: verify nobarrier vs current...")
    ok = same_rows(mk_ivf(False)(), mk_ivf(True)())
    print(f"  {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        return
    interleaved({"ivf_current": mk_ivf(False), "ivf_nobarrier": mk_ivf(True)})


def exp_kmeansbarrier(spark) -> None:
    """kmeans_assign's per-iteration repartition(id_col): current vs
    removed (copied variant), measured through dedup_embedding's
    operator entry."""
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import similarity as sim
    from ts_data_pipeline_spark.queries.llmdata import KMEANS_SEED_IDS

    emb = io.load(spark, SF_DIR, "embeddings")

    def kmeans_nobarrier(embeddings, seed_ids, n_iter=2,
                         id_col="vec_id", vec_col="embedding"):
        norm = sim._unit_vectors(embeddings, id_col, vec_col).cache()
        cents = norm.filter(F.col(id_col).isin(seed_ids)).select(
            F.col(id_col).alias("cell"), F.col("v").alias("cv")
        )

        def _assign(c):
            w = Window.partitionBy(id_col).orderBy(
                F.col("cos_sim").desc(), F.col("cell").asc()
            )
            slim = (
                norm.crossJoin(F.broadcast(c))
                .select(
                    id_col,
                    "cell",
                    F.round(sim.dot(F.col("v"), F.col("cv")), 6).alias("cos_sim"),
                )
            )
            winners = (
                slim.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") == 1)
                .drop("rk")
            )
            return norm.join(winners, id_col).select(
                id_col, "v", "cell", "cos_sim", F.lit(1).alias("rk")
            )

        for _ in range(n_iter):
            members = _assign(cents)
            means = (
                members.select("cell", F.posexplode("v").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg("val").alias("m"))
            )
            assembled = (
                means.groupBy("cell")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                .select("cell", F.transform("pm", lambda s: s["m"]).alias("mv"))
            )
            cents = (
                assembled.select(
                    "cell", "mv",
                    F.sqrt(sim.dot(F.col("mv"), F.col("mv"))).alias("mn"),
                )
                .filter(F.col("mn") > 0)
                .select(
                    "cell",
                    F.transform("mv", lambda x: x / F.col("mn")).alias("cv"),
                )
            )
        return _assign(cents).select(id_col, "cell", "cos_sim")

    cur = lambda: sim.kmeans_assign(emb, KMEANS_SEED_IDS)  # noqa: E731
    var = lambda: kmeans_nobarrier(emb, KMEANS_SEED_IDS)  # noqa: E731
    print("kmeans_assign: verify nobarrier vs current...")
    ok = same_rows(cur(), var())
    print(f"  {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        return
    interleaved({"kmeans_current": cur, "kmeans_nobarrier": var})


# ----------------------------------------------------- join_segment
def exp_joinsegment(spark) -> None:
    from ts_data_pipeline_spark import io
    from ts_data_pipeline_spark.operators import joins

    customer = io.load(spark, SF_DIR, "customer")
    orders = io.load(spark, SF_DIR, "orders")
    lineitem = io.load(spark, SF_DIR, "lineitem")

    def current():
        return joins.segment_order_revenue(customer, orders, lineitem)

    def preagg():
        c = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
        li = (
            lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
            .groupBy("l_orderkey")
            .agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("_rev")
            )
        )
        return (
            c.join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.round(F.sum("_rev"), 4).alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(10)
        )

    def noshuffle_hint():
        c = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
        o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
        li = lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        return (
            c.join(o, F.col("c_custkey") == F.col("o_custkey"))
            .join(li.hint("shuffle_merge"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
                ).alias("revenue")
            )
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(10)
        )

    print("verify variants vs current result set...")
    for name, mk in (("preagg", preagg), ("shuffle_merge", noshuffle_hint)):
        ok = same_rows(current(), mk())
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'}")
    interleaved({
        "current": current,
        "preagg": preagg,
        "shuffle_merge": noshuffle_hint,
    })


EXPS = {
    "minhash": exp_minhash,
    "annbarrier": exp_annbarrier,
    "kmeansbarrier": exp_kmeansbarrier,
    "joinsegment": exp_joinsegment,
}


def main() -> None:
    from ts_data_pipeline_spark.session import get_spark

    spark = get_spark("ts-data-pipeline-spark-r16exp")
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:] or list(EXPS)
    for name in only:
        print(f"== {name} ==")
        EXPS[name](spark)


if __name__ == "__main__":
    main()
