"""The engine-portable uniform hash: first 32 bits of md5 as bigint.

This single construction backs every deterministic draw in the repo —
sampling inclusion (weighted_mix / importance_resample / hash_split /
corpus_shuffle), MinHash shingle + band hashing, and the hashed
linear-classifier features — so Spark results are bit-identical to
the DuckDB oracle. ONE definition per engine lives here; if the
construction ever changes (e.g. widening to u64), both sides change
together or hash parity silently diverges.

Spark evaluates ``conv(hex, 16, 10)`` natively; DuckDB has no conv(),
so its twin sums the hex digits positionally (the same digit math
simhash uses for bit extraction).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark SQL fragment; use .format(x=<string expr>) inside larger
#: expressions (lambdas in transform(), nested hashes).
U32_MD5_SPARK = "cast(conv(substring(md5({x}), 1, 8), 16, 10) as bigint)"


def u32_md5_spark(expr: str) -> Column:
    """Column form of :data:`U32_MD5_SPARK` over a SQL string expr."""
    return F.expr(U32_MD5_SPARK.format(x=expr))


def u32_md5_sql(expr: str) -> str:
    """DuckDB twin of :data:`U32_MD5_SPARK` (digit math, no conv)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring(md5({expr}), {i}, 1)) - 1)"
        f" * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"({terms})"
