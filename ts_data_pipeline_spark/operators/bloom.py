"""Bloom-filter join pruning: cut fact-side shuffle volume before a
large-large join.

The runtime-filter pattern Spark applies internally
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), expressed
explicitly so the engine can (a) apply it where the optimizer's
heuristics decline — e.g. below a streaming sink, or on a key the
optimizer cannot see through an expression — and (b) make the
mechanism testable. Shape:

1. **Build** (one pass over the build-side keys): each key sets
   ``num_hashes`` bit positions (portable md5 lanes). Positions are
   partially aggregated map-side into 64-bit words — the shuffle and
   the result are bounded at ``num_bits / 64`` rows BY CONSTRUCTION,
   no matter how many build keys there are. The word table is then
   materialized driver-side (exactly how Spark's own
   BloomFilterAggregate -> InSubqueryExec runtime filter works: the
   sketch, never the data, crosses to the driver) and re-enters the
   plan as a literal array.
2. **Probe** (scan-side expression, whole-stage codegen): each fact
   row tests its key's ``num_hashes`` bits with
   ``element_at(words, pos / 64 + 1)`` + shift/mask — O(1) per row,
   no join, no shuffle. False positives pass (standard
   (1 - e^{-kn/m})^k rate); false negatives are impossible, so a
   following exact join returns EXACTLY the unpruned result while
   shuffling only the surviving fraction of the fact table.

At 100 TB the win is the fact-side exchange: a 1%-selective build
side turns a full-fact shuffle into a ~1% shuffle for the cost of
one scan-side expression. The filter itself is ``num_bits / 64``
longs (default 8 KiB) regardless of data scale. NULL probe keys
evaluate NULL and are dropped, matching inner/semi join semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key_expr: str, i: int, num_bits: int) -> Column:
    """Portable bit position i: a u32 lane of md5('bf<d>:' || key).

    md5 yields four independent u32 lanes; for i >= 4 the salt rolls
    to a fresh digest. Same digit math a DuckDB twin can replay.
    """
    digest, lane = divmod(i, 4)
    h = F.md5(F.concat(F.lit(f"bf{digest}:"), F.expr(key_expr)))
    u32 = F.conv(F.substring(h, 8 * lane + 1, 8), 16, 10).cast("bigint")
    return u32 % num_bits


def bloom_build_words(
    build: DataFrame,
    key_expr: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
) -> list[int]:
    """One pass over the build side -> dense list of ``num_bits/64``
    words. Runs a Spark job (as any runtime-filter build does); the
    collected relation is sketch-sized by construction, bounded at
    ``num_bits / 64`` rows however many build keys exist."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    # NULL build keys hash to NULL positions; drop them up front —
    # inner/semi join semantics never match NULL anyway, and a NULL
    # `w` group would crash the dense-array fill below.
    pos = build.filter(F.expr(key_expr).isNotNull()).select(
        F.explode(
            F.array(
                *[_position(key_expr, i, num_bits) for i in range(num_hashes)]
            )
        ).alias("pos")
    )
    rows = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(1L, b)")).alias("word"))
        .collect()
    )
    dense = [0] * (num_bits // 64)
    for row in rows:
        dense[row["w"]] = row["word"]
    return dense


def bloom_prune(
    fact: DataFrame,
    words: list[int],
    key_expr: str,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep fact rows whose key MIGHT be in the build set.

    Pure scan-side expressions (projected position columns + literal
    word-array lookups), so the predicate rides inside
    WholeStageCodegen and prunes BEFORE any exchange. Never drops a
    true match; passes false positives at the standard bloom rate.
    """
    num_bits = len(words) * 64
    out = fact
    pos_cols = []
    conds = []
    for i in range(num_hashes):
        pc = f"__bf_pos{i}"
        out = out.withColumn(pc, _position(key_expr, i, num_bits))
        pos_cols.append(pc)
        conds.append(
            f"(element_at(__bf_words, cast({pc} / 64 as int) + 1)"
            f" & shiftleft(1L, cast({pc} % 64 as int))) != 0"
        )
    out = out.withColumn("__bf_words", F.lit(words))
    out = out.filter(" AND ".join(conds))
    return out.drop("__bf_words", *pos_cols)


def bloom_semi_join(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
) -> DataFrame:
    """Semi join with an explicit bloom runtime filter on the fact
    scan: build the sketch from ``build[build_key]``, prune the fact
    scan to probable matches, then run the EXACT semi join over the
    surviving fraction. Result is identical to a plain semi join
    (bloom false positives are removed by the exact join; false
    negatives cannot occur); only the fact-side shuffle volume
    changes. The build side pays one extra sketch pass — at scale
    that pass is a fraction of the exchange bytes it saves.
    """
    words = bloom_build_words(
        build, f"cast({build_key} as string)", num_bits, num_hashes
    )
    pruned = bloom_prune(
        fact, words, f"cast({fact_key} as string)", num_hashes
    )
    # dataframe-qualified refs: fact_key == build_key (the natural
    # same-named join) must not trip AMBIGUOUS_REFERENCE
    keys = build.select(build_key)
    return pruned.join(
        keys, pruned[fact_key] == keys[build_key], "left_semi"
    )


def bloom_pays(
    fact_rows: int,
    survivor_frac: float,
    breakeven_saved_rows: int = 1_000_000,
) -> bool:
    """The measured-crossover decision rule, as a pure function.

    The bloom path's cost is a FIXED extra build job (sketch pass +
    driver collect of num_bits/64 words); its benefit is the fact
    rows NOT exchanged: ``fact_rows * (1 - survivor_frac)``. At the
    sf0.1 local[32] measurement (SCALE.md; bench extras
    plain_semi_orders 0.184 s vs bloom_semi_orders 1.107 s at
    survivor_frac 0.198) the overhead equals roughly a local shuffle
    of ~750k rows, so the default breakeven is 1M saved rows — local
    toy sizes correctly pick plain, a cluster fact table crosses over
    almost immediately (and a deployment on a real network should
    LOWER the breakeven: exchange bytes there cost far more than a
    local memory shuffle).
    """
    return fact_rows * (1.0 - survivor_frac) >= breakeven_saved_rows


def semi_join_adaptive(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
    breakeven_saved_rows: int = 1_000_000,
) -> tuple[DataFrame, dict]:
    """Semi join that PICKS bloom vs plain from estimated volumes
    (VERDICT r6 #6) instead of leaving the trade to the caller.

    Estimation is two cheap aggregates (count + approx_count_distinct
    per side, map-side partial, no shuffle of the data itself): the
    survivor fraction of a semi join under uniform key spread is
    ~|distinct build keys| / |distinct fact keys|, capped at 1. The
    decision then applies :func:`bloom_pays`. Returns (result,
    decision) where decision records the estimates and the chosen
    path — both join forms produce IDENTICAL rows (bloom false
    positives die in the exact join), so the choice is purely
    physical and safe to automate.
    """
    n_fact, d_fact = fact.agg(
        F.count(F.lit(1)), F.approx_count_distinct(fact_key)
    ).first()
    d_build = build.agg(F.approx_count_distinct(build_key)).first()[0]
    est_frac = min(1.0, d_build / max(d_fact, 1))
    use_bloom = bloom_pays(n_fact, est_frac, breakeven_saved_rows)
    decision = {
        "fact_rows": n_fact,
        "fact_distinct_keys": d_fact,
        "build_distinct_keys": d_build,
        "est_survivor_frac": round(est_frac, 4),
        "use_bloom": use_bloom,
    }
    if use_bloom:
        out = bloom_semi_join(
            fact, build, fact_key, build_key, num_bits, num_hashes
        )
    else:
        keys = build.select(build_key)
        out = fact.join(
            keys, fact[fact_key] == keys[build_key], "left_semi"
        )
    return out, decision
